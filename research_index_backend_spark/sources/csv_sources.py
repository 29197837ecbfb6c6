"""CSV scan layer for the consortium init files (S1).

Reference behavior: 7 pandas read_csv calls (reference
src/research_index_backend/create_graph.py:292-310), schema inferred,
one file quoted. Several files carry a UTF-8 BOM on the header line.

Spark-first: spark.read.csv with EXPLICIT schemas (schemas.py) —
header=true + schema means the header (and its BOM) is skipped, types are
fixed, and the scan prunes columns. countries.csv is a quoted ~68-column
export; the explicit quote option plus projection keeps only the 4 used
columns (reference create_graph.py:106-123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import (
    AUTHOR_CSV,
    PARTNER_CSV,
    PARTNER_MEMBER_CSV,
    SUBWS_CSV,
    WORKSTREAM_CSV,
    WP_MEMBER_CSV,
)

INIT_SCHEMAS = {
    "workstream": WORKSTREAM_CSV,
    "subws": SUBWS_CSV,
    "project_partners": PARTNER_CSV,
    "authors": AUTHOR_CSV,
    "wp_members": WP_MEMBER_CSV,
    "partner_members": PARTNER_MEMBER_CSV,
}


def read_init_csv(spark: SparkSession, path: str, name: str) -> DataFrame:
    """One init file by short name ('authors', 'countries', ...)."""
    if name == "countries":
        # quoted export, ~68 cols — infer header then project downstream
        # (reference create_graph.py:298 passes quotechar='"')
        return (spark.read.option("header", "true").option("quote", '"')
                .csv(path))
    return (spark.read.option("header", "true")
            .schema(INIT_SCHEMAS[name]).csv(path))


def read_init_csvs(spark: SparkSession, init_dir: str) -> dict[str, DataFrame]:
    """All seven consortium files keyed by short name
    (reference create_graph.py:292-310)."""
    out = {}
    for name in (*INIT_SCHEMAS, "countries"):
        out[name] = read_init_csv(spark, f"{init_dir}/{name}.csv", name)
    return out
