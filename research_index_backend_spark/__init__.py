"""research_index_backend_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query / data-processing capabilities of
ClimateCompatibleGrowth/research_index_backend (reference read-only at
/root/reference) as idiomatic PySpark: the property graph becomes typed
node/edge DataFrames (Parquet-backed), every Cypher pattern becomes a
DataFrame/Spark-SQL plan, fuzzy dedup and text analysis become column
expressions / pandas UDFs, and graph analytics become iterative DataFrame
algorithms.

Nothing here is a port: the reference executes row-at-a-time Cypher over a
Bolt socket (reference src/research_index_backend/session.py:17-32); this
engine declares lazy DataFrame plans and lets Catalyst/Tungsten pick the
physical strategy, so the same logical operations scale from 60k rows on
local[32] to 100 TB on a real cluster.
"""

from .session import get_spark
from .sources.tables import load_table, load_tables, TABLES

__all__ = ["get_spark", "load_table", "load_tables", "TABLES"]
