"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in research_index_backend_spark/ (operators,
functions, plans); this module is the thin registry the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Harness-only split sizing (see queries._ensure_conf): the driver's
# verify/bench runs read tiny single-file parquet that must still fan out
# across cores. Production imports of the package never set this.
os.environ.setdefault("RIB_TEST_SPLIT_MB", "16")

from research_index_backend_spark.plans.queries import ORACLE, QUERIES  # noqa: E402
from research_index_backend_spark.plans.queries_ext import (  # noqa: E402
    ORACLE_EXT,
    QUERIES_EXT,
)
from research_index_backend_spark.plans.queries_ext2 import (  # noqa: E402
    ORACLE_EXT2,
    QUERIES_EXT2,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the containment theta-join
    + anti-join tagging plan (SURVEY.md §2 J6+J7 — the reference's
    country-tagging query, create_graph.py:244-258)."""
    return QUERIES["flagship_contains_tag"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {**QUERIES, **QUERIES_EXT, **QUERIES_EXT2}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every SQL-expressible query."""
    return {**ORACLE, **ORACLE_EXT, **ORACLE_EXT2}
