"""SQL surface: register the property-graph tables as temp views so the
whole engine is queryable with plain `spark.sql(...)`.

The reference exposes Cypher through Memgraph; the engine's equivalent
declarative surface is Spark SQL over the node/edge tables — every Cypher
pattern in the reference has a SQL twin (SURVEY §2.3 maps them join by
join). Registration is zero-cost (temp views over lazy frames); Catalyst
sees straight through to the parquet scans, so pushdown/pruning behave
exactly as in the DataFrame API.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

GRAPH_TABLES = ("authors", "outputs", "countries", "units",
                "author_of", "member_of", "unit_of", "refers_to")


def register_graph_views(spark: SparkSession, data_dir: str,
                         tables: tuple[str, ...] = GRAPH_TABLES) -> list[str]:
    """Create a temp view per existing table dir under data_dir.
    Returns the view names registered."""
    done = []
    for name in tables:
        p = Path(data_dir) / name
        if p.exists():
            spark.read.parquet(str(p)).createOrReplaceTempView(name)
            done.append(name)
    return done


def cypher_examples() -> dict[str, str]:
    """The reference's most-used Cypher patterns as SQL twins — documentation
    by example (each cites the Cypher original)."""
    return {
        # MATCH (a:Author {orcid: $orcid}) RETURN a  (models.py:76-88)
        "author_by_orcid":
            "SELECT * FROM authors WHERE orcid = :orcid",
        # MATCH (o:Output {doi: $doi}) RETURN count(o) > 0 (doi.py:151-191)
        "output_exists":
            "SELECT count(*) > 0 AS exists_flag FROM outputs WHERE doi = :doi",
        # MATCH (a)-[:author_of]->(o) WHERE o.doi = $doi RETURN a
        # (create_graph_from_doi.py pattern)
        "authors_of_output": """
            SELECT a.* FROM authors a
            JOIN author_of e ON a.uuid = e.author_uuid
            JOIN outputs o ON o.uuid = e.output_uuid
            WHERE o.doi = :doi
        """,
        # MATCH (o)-[:refers_to]->(c:Country) RETURN c.name, count(*)
        # (the country report, create_graph.py:244-258 family)
        "outputs_per_country": """
            SELECT c.name, count(*) AS n_outputs
            FROM refers_to r JOIN countries c ON r.country_id = c.id
            GROUP BY c.name ORDER BY n_outputs DESC, c.name
        """,
    }
