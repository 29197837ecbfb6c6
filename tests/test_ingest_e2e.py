"""End-to-end ingest: fixture envelope -> property-graph tables
(the reference's entry point 1, create_graph_from_doi.py:195-256, as one
composed plan) including author resolution, doi-keyed output upsert,
author_of edges, and refers_to country tagging. Re-ingest must be a no-op
(idempotence — the reference's match-before-create)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from research_index_backend_spark.ingest.parse import read_openaire_json
from research_index_backend_spark.ingest.pipeline import (
    build_graph_from_envelopes,
)
from research_index_backend_spark.schemas import AUTHOR_NODE

FIXTURE = "/root/reference/tests/fixtures/openaire_v2_simple.json"
DOI = "10.5281/zenodo.4650794"


@pytest.fixture(scope="module")
def envelopes(spark):
    return read_openaire_json(spark, FIXTURE).withColumn(
        "query_doi", F.lit(DOI))


@pytest.fixture(scope="module")
def empty_authors(spark):
    return spark.createDataFrame([], AUTHOR_NODE)


def _empty_outputs(spark):
    from pyspark.sql.types import (IntegerType, StringType, StructField,
                                   StructType)
    schema = StructType([
        StructField("uuid", StringType()),
        StructField("doi", StringType()),
        StructField("title", StringType()),
        StructField("abstract", StringType()),
        StructField("journal", StringType()),
        StructField("publication_year", IntegerType()),
        StructField("publication_month", IntegerType()),
        StructField("publication_day", IntegerType()),
        StructField("publisher", StringType()),
        StructField("result_type", StringType()),
        StructField("resource_type", StringType()),
        StructField("cited_by_count_date", IntegerType()),
    ])
    return spark.createDataFrame([], schema)


class TestGraphBuild:
    def test_nodes_and_edges(self, spark, envelopes, empty_authors):
        countries = spark.createDataFrame(
            [("LBR", "Liberia"), ("KEN", "Kenya")], ["id", "name"])
        g = build_graph_from_envelopes(
            envelopes, empty_authors, _empty_outputs(spark),
            countries=countries)
        outputs = g["outputs"].collect()
        assert len(outputs) == 1
        assert outputs[0]["doi"] == DOI
        assert outputs[0]["title"] == "CCG Starter Data Kit: Liberia"

        authors = g["authors"].collect()
        assert len(authors) == 1
        assert authors[0]["first_name"] == "Lucy"

        edges = g["author_of"].collect()
        assert len(edges) == 1
        assert edges[0]["author_uuid"] == authors[0]["uuid"]
        assert edges[0]["output_uuid"] == outputs[0]["uuid"]
        assert edges[0]["rank"] == 1

        # refers_to: abstract 'A starter data kit for Liberia' CONTAINS
        # Liberia (case-sensitive, like the Cypher original) but not Kenya
        refers = g["refers_to"].collect()
        assert [(r["country_id"]) for r in refers] == ["LBR"]

    def test_reingest_idempotent(self, spark, envelopes, empty_authors):
        g1 = build_graph_from_envelopes(envelopes, empty_authors,
                                        _empty_outputs(spark))
        # second ingest against the tables produced by the first
        g2 = build_graph_from_envelopes(envelopes, g1["authors"],
                                        g1["outputs"])
        assert g2["outputs"].count() == 1
        assert g2["authors"].count() == 1
        # the known author resolves (matched, not re-created) and the edge
        # set stays identical
        assert g2["author_of"].count() == 1
        assert (g1["outputs"].select("uuid").collect()
                == g2["outputs"].select("uuid").collect())
