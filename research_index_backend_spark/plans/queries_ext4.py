"""Catalog extension 4 (round 7): property-graph motif queries.

Queries here run through graph.queries.PropertyGraph.match — the Cypher-
MATCH-shaped motif compiler (reference models.py:36-66 /
create_graph_from_doi.py:53-65 query the Memgraph property graph with
exactly these pattern shapes). Each entry is oracle-checked against
DuckDB like every other catalog query.

  graph_motif_wedge   heterogeneous co-location wedge
                      (s)-[:s_loc]->(n:nation)<-[:c_loc]-(c)
  graph_motif_path    labeled 2-hop chain with node properties
                      (s:supplier)->(n:nation)->(r:region)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph.queries import PropertyGraph
from .queries import _t

QUERIES_EXT4: dict = {}
ORACLE_EXT4: dict = {}


# ---------------------------------------------------------------------------
# graph_motif_wedge — heterogeneous co-location wedge
# ---------------------------------------------------------------------------


def q_graph_motif_wedge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier/customer co-location wedge via the motif compiler:
    (s)-[:s_loc]->(n:nation)<-[:c_loc]-(c) — the reference's
    co-authorship shape ((a1)-[:author_of]->(o)<-[:author_of]-(a2)) on
    two DIFFERENT edge types meeting at the center var.

    The match compiles to one hash equi-join of the two edge lists on
    the nation key plus a broadcast label join for n_name — no driver
    loop, no cartesian. The wedge BINDING TABLE is the motif's product;
    the rollup keeps the checked output nation-sized. (For the counts
    alone you'd pre-aggregate each side and multiply — the binding
    table is what downstream per-pair logic consumes.)

    Scale: wedge size is sum over nations of |S_n|*|C_n| — quadratic in
    co-located entities, the same blow-up q_graph_two_hop hub-caps; a
    25-nation dim keeps it bounded here, and the center var of any
    unbounded wedge gets the same degree cap before registration.
    """
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    g = (PropertyGraph()
         .with_nodes("nation", n, id_col="n_nationkey",
                     props=("n_name",), broadcast=True)
         .with_edges("s_loc", s.select("s_suppkey", "s_nationkey"),
                     src="s_suppkey", dst="s_nationkey")
         .with_edges("c_loc", c.select("c_custkey", "c_nationkey"),
                     src="c_custkey", dst="c_nationkey"))
    wedge = g.match("(s)-[:s_loc]->(n:nation)<-[:c_loc]-(c)")
    return (wedge.groupBy(F.col("n_n_name").alias("nation"))
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.count_distinct("s").alias("n_suppliers"),
                 F.count_distinct("c").alias("n_customers")))


ORACLE_MOTIF_WEDGE = """
SELECT n_name AS nation,
       count(*) AS n_pairs,
       count(DISTINCT s_suppkey) AS n_suppliers,
       count(DISTINCT c_custkey) AS n_customers
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN customer ON c_nationkey = n_nationkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# graph_motif_path — labeled chain with node properties
# ---------------------------------------------------------------------------


def q_graph_motif_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy path (s:supplier)-[:in_nation]->(n:nation)-[:in_region]->
    (r:region) — the reference's unit-hierarchy traversal
    ((unit)-[:unit_of]->(parent), create_graph.py partOf edges), rolled
    up to suppliers per (nation, region).

    Both label frames carry properties, so the compiler attaches them as
    broadcast inner joins after the chain — the chain itself is two hash
    joins on int keys, dims never shuffle the supplier scan.
    """
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    g = (PropertyGraph()
         .with_nodes("nation", n, id_col="n_nationkey",
                     props=("n_name",), broadcast=True)
         .with_nodes("region", r, id_col="r_regionkey",
                     props=("r_name",), broadcast=True)
         .with_edges("in_nation", s.select("s_suppkey", "s_nationkey"),
                     src="s_suppkey", dst="s_nationkey")
         .with_edges("in_region", n.select("n_nationkey", "n_regionkey"),
                     src="n_nationkey", dst="n_regionkey"))
    path = g.match("(s)-[:in_nation]->(n:nation)-[:in_region]->(r:region)")
    return (path.groupBy(F.col("r_r_name").alias("region"),
                         F.col("n_n_name").alias("nation"))
            .agg(F.count(F.lit(1)).alias("n_suppliers")))


ORACLE_MOTIF_PATH = """
SELECT r_name AS region, n_name AS nation, count(*) AS n_suppliers
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


QUERIES_EXT4.update({
    "graph_motif_wedge": q_graph_motif_wedge,
    "graph_motif_path": q_graph_motif_path,
})

ORACLE_EXT4.update({
    "graph_motif_wedge": ORACLE_MOTIF_WEDGE,
    "graph_motif_path": ORACLE_MOTIF_PATH,
})
