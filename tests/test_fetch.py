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

def test_unfetched_max_age_ttl(spark, dois):
    """Cache-TTL semantics (reference requests_cache expire_after=30,
    create_graph_from_doi.py:215): stale envelopes expire, null landed_at
    counts as expired, fresh envelopes still suppress the fetch."""
    now = 1_000_000.0
    landed = spark.createDataFrame(
        [("10.1/ok", now - 5.0),        # fresh -> covered
         ("10.1/empty", now - 120.0),   # stale -> refetch
         ("10.1/errkey", None)],        # unknown age -> refetch
        "query_doi string, landed_at double")
    remaining = {r["doi"] for r in
                 unfetched_dois(dois, landed, max_age=30.0, now=now).collect()}
    assert remaining == {"10.1/forbidden", "10.1/empty", "10.1/errkey",
                         "10.1/garbled"}
    # no TTL -> old behavior: everything landed is covered
    remaining = {r["doi"] for r in unfetched_dois(dois, landed).collect()}
    assert remaining == {"10.1/forbidden", "10.1/garbled"}


def test_land_envelopes_overwrite_semantics(spark, tmp_path):
    """Fresh envelopes REPLACE matching (query_doi, source) landed rows
    (the reference's per-DOI open(..., 'w'), get_metadata.py:29-38);
    untouched keys survive; an empty landed dir (only _SUCCESS) doesn't
    break the read (round-4 ADVICE)."""
    from research_index_backend_spark.sources.json_sink import (
        land_envelopes,
        read_landed,
    )
    path = str(tmp_path / "json")
    cols = ("query_doi string, source string, status int, "
            "error string, body string")
    first = spark.createDataFrame(
        [("10.1/a", "openaire", 200, None, '{"v": 1}'),
         ("10.1/b", "openaire", 200, None, '{"v": 1}')], cols)
    land_envelopes(spark, first, path, now=100.0)

    # re-land 10.1/a with a fresh body: it must replace, not be dropped
    second = spark.createDataFrame(
        [("10.1/a", "openaire", 200, None, '{"v": 2}')], cols)
    land_envelopes(spark, second, path, now=200.0)

    rows = {r["query_doi"]: r for r in read_landed(spark, path).collect()}
    assert len(rows) == 2
    assert rows["10.1/a"]["body"] == '{"v": 2}'
    assert rows["10.1/a"]["landed_at"] == 200.0
    assert rows["10.1/b"]["body"] == '{"v": 1}'
    assert rows["10.1/b"]["landed_at"] == 100.0


def test_land_envelopes_zero_rows_then_read(spark, tmp_path):
    """A run that lands zero envelopes leaves a dir with no data files;
    the next read and the next landing must both cope."""
    from research_index_backend_spark.sources.json_sink import (
        LANDED_SCHEMA,
        land_envelopes,
        read_landed,
    )
    path = str(tmp_path / "json")
    empty = spark.createDataFrame(
        [], "query_doi string, source string, status int, error string, "
            "body string")
    land_envelopes(spark, empty, path, now=1.0)
    assert read_landed(spark, path).count() == 0
    assert read_landed(spark, path).schema == LANDED_SCHEMA

    fresh = spark.createDataFrame(
        [("10.1/a", "openaire", 200, None, "{}")],
        "query_doi string, source string, status int, error string, "
        "body string")
    land_envelopes(spark, fresh, path, now=2.0)
    assert read_landed(spark, path).count() == 1
