"""Table registry + SQL-view surface: load_tables reads every driver
table (including the nanos-typed events via the pinned session conf) and
register_views makes spark.sql() plans work over them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from research_index_backend_spark.plans.queries import _ensure_conf
from research_index_backend_spark.sources.tables import (
    TABLES,
    load_tables,
    register_views,
)

SF_DIR = "/root/testdata/sf0.001"


def test_load_all_tables(spark):
    _ensure_conf(spark)  # events.parquet is TIMESTAMP(NANOS)
    tables = load_tables(spark, SF_DIR)
    assert set(tables) == set(TABLES)
    for name, df in tables.items():
        assert df.limit(1).count() == 1, f"{name} empty"


def test_register_views_sql(spark):
    _ensure_conf(spark)
    register_views(spark, SF_DIR)
    row = spark.sql("""
        SELECT n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC, n_name LIMIT 1
    """).collect()[0]
    assert row["n"] > 0
