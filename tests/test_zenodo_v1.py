"""Legacy v1 oaf-envelope parse golden against the reference's zenodo
fixture (reference tests/fixtures/zenodo.json — the
response.results.result[] XML-to-JSON dialect)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from research_index_backend_spark.ingest.parse import (
    parse_zenodo_v1,
    read_zenodo_v1_json,
)

FIXTURE = "/root/reference/tests/fixtures/zenodo.json"


def test_zenodo_v1_golden(spark):
    env = read_zenodo_v1_json(spark, FIXTURE)
    rows = parse_zenodo_v1(env).collect()
    assert len(rows) == 1
    r = rows[0].asDict()

    # doi from the @classid='doi' pid ($ value); no query_doi side channel
    assert r["doi"] == "10.5281/zenodo.4650794"
    assert r["title"] == "CCG Starter Data Kit: Liberia"
    assert r["abstract"] == "A starter data kit for Liberia"
    assert r["journal"] == ""          # zenodo records carry no journal
    assert r["publisher"] == "Zenodo"
    # dateofacceptance.$ = 2023-01-16
    assert (r["publication_year"], r["publication_month"],
            r["publication_day"]) == (2023, 1, 16)
    # resulttype @classid; resourcetype schemeid is dnet:dataCite_resource,
    # which the scheme dispatch (parser.py:150-163) does NOT map
    assert r["result_type"] == "dataset"
    assert r["resource_type"] is None
    assert r["cited_by_count_date"] == datetime.now().year

    # creator[0]: @rank=1 @name=Lucy @surname=Allington
    # @orcid_pending=0000-0003-1801-899x
    assert len(r["authors"]) == 1
    a = r["authors"][0].asDict()
    assert a == {
        "first_name": "Lucy",
        "last_name": "Allington",
        "orcid": "https://orcid.org/0000-0003-1801-899x",
        "rank": 1,
    }


def test_zenodo_v1_query_doi_side_channel(spark):
    env = read_zenodo_v1_json(spark, FIXTURE).withColumn(
        "query_doi", F.lit("10.9999/landed"))
    r = parse_zenodo_v1(env).collect()[0]
    assert r["doi"] == "10.9999/landed"
