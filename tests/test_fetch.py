"""Distributed REST fetch stage (S3/S4) with a hermetic transport:
error mapping as data (403 token message, error key, empty results),
idempotent re-fetch via anti-join (S6), F21 filename cleaning."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from research_index_backend_spark.ingest.fetch import (
    clean_filename,
    fetch_metadata,
    unfetched_dois,
)

GOOD = json.dumps({"results": [{"id": "r1"}], "header": {}})
EMPTY = json.dumps({"results": []})
ERRKEY = json.dumps({"error": "boom"})


def make_fake_transport():
    """Returned closure pickles BY VALUE (cloudpickle), so executors don't
    need this test module importable."""
    good, empty, errkey = GOOD, EMPTY, ERRKEY

    def fake_transport(url: str, headers: dict) -> tuple[int, str]:
        if "forbidden" in url:
            return 403, ""
        if "empty" in url:
            return 200, empty
        if "errkey" in url:
            return 200, errkey
        if "garbled" in url:
            return 200, "not json"
        return 200, good

    return fake_transport


@pytest.fixture()
def dois(spark):
    return spark.createDataFrame(
        [("10.1/ok",), ("10.1/forbidden",), ("10.1/empty",),
         ("10.1/errkey",), ("10.1/garbled",)], ["doi"])


def test_fetch_error_mapping_as_data(spark, dois):
    rows = {r["query_doi"]: r for r in
            fetch_metadata(dois, transport=make_fake_transport()).collect()}
    assert rows["10.1/ok"]["error"] is None
    assert json.loads(rows["10.1/ok"]["body"])["results"][0]["id"] == "r1"
    # 403 -> the reference's token message (get_metadata.py:61-66)
    assert "refresh token" in rows["10.1/forbidden"]["error"]
    assert rows["10.1/forbidden"]["status"] == 403
    # empty results / error key / bad json -> error rows, not exceptions
    assert rows["10.1/empty"]["error"] == "no results"
    assert rows["10.1/errkey"]["error"] == "boom"
    assert rows["10.1/garbled"]["error"] == "invalid JSON"


def test_unfetched_anti_join(spark, dois):
    landed = spark.createDataFrame(
        [("10.1/ok",), ("10.1/empty",)], ["query_doi"])
    remaining = {r["doi"] for r in unfetched_dois(dois, landed).collect()}
    assert remaining == {"10.1/forbidden", "10.1/errkey", "10.1/garbled"}


def test_clean_filename(spark):
    df = spark.createDataFrame([("10.5281/zenodo.1",)], ["doi"])
    assert df.select(clean_filename("doi").alias("f")).collect()[0]["f"] == \
        "10.5281zenodo.1"
