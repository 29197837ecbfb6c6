"""Consortium bulk-load pipeline (S1 CSV sources -> node/edge tables)
against the reference's shipped init data (row counts from
reference data/init/*.csv), plus the DOI work-list source and the
ingestion-metrics report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from research_index_backend_spark.ingest.pipeline import (
    ingestion_metrics,
    load_initial_data,
)
from research_index_backend_spark.sources.doi_list import read_doi_list

INIT_DIR = "/root/reference/data/init"


@pytest.fixture(scope="module")
def tables(spark):
    return load_initial_data(spark, INIT_DIR)


class TestInitialLoad:
    def test_author_count(self, tables):
        assert tables["authors"].count() == 156

    def test_country_count_and_shape(self, tables):
        countries = tables["countries"]
        assert countries.count() == 250
        aw = countries.filter(F.col("id") == "ABW").collect()[0]
        assert aw["name"] == "Aruba"
        assert aw["dbpedia"] == "Aruba"
        assert aw["latitude"] == pytest.approx(12.5)
        assert aw["longitude"] == pytest.approx(-69.97, abs=0.1)

    def test_units_multi_label(self, tables):
        units = tables["units"]
        by_type = {r["unit_type"]: r["n"] for r in
                   units.groupBy("unit_type").agg(
                       F.count(F.lit(1)).alias("n")).collect()}
        assert by_type == {"workstream": 33, "partner": 11}

    def test_unit_of_edges(self, tables):
        assert tables["unit_of"].count() == 31

    def test_member_of_edges_resolved(self, tables):
        """wp_members (48) + partner_members (31) resolve through the
        orcid-else-name branch; members absent from authors.csv are dropped
        (the reference's 'Could not find' branch). All resolved uuids must
        exist in the authors table."""
        member_of = tables["member_of"]
        n = member_of.count()
        assert 0 < n <= 79
        orphans = member_of.join(
            tables["authors"], member_of.author_uuid == F.col("uuid"),
            "left_anti").count()
        assert orphans == 0

    def test_author_null_orcid_branch(self, tables):
        """P4: authors.csv has both orcid'd and orcid-less rows; empties
        land as NULL, not empty string."""
        a = tables["authors"]
        assert a.filter(F.col("orcid").isNull()).count() > 0
        assert a.filter(F.col("orcid") == "").count() == 0


class TestDoiList:
    def test_read_normalize_cap(self, spark, tmp_path):
        p = tmp_path / "dois.txt"
        p.write_text(
            "10.5281/zenodo.11395518.\n"
            "  https://doi.org/10.1371/journal.pclm.0000331  \n"
            "\n"
            "not-a-doi\n")
        rows = read_doi_list(spark, str(p)).collect()
        got = {r["doi"]: r["valid_pattern"] for r in rows}
        assert got == {
            "10.5281/zenodo.11395518": True,
            "10.1371/journal.pclm.0000331": True,
            "not-a-doi": False,
        }

    def test_limit(self, spark, tmp_path):
        p = tmp_path / "dois.txt"
        p.write_text("\n".join(f"10.5281/zenodo.{i}" for i in range(10)))
        assert read_doi_list(spark, str(p), limit=3).count() == 3

    def test_limit_is_first_n_in_file_order(self, spark, tmp_path):
        """The cap must take the FIRST N lines deterministically
        (reference list_of_dois[:limit], doi.py:104-110) — not an
        arbitrary N from whichever split finishes first (round-2 ADVICE)."""
        p = tmp_path / "dois.txt"
        p.write_text("\n".join(f"10.5281/zenodo.{i}" for i in range(100)))
        got = {r["doi"] for r in
               read_doi_list(spark, str(p), limit=5).collect()}
        assert got == {f"10.5281/zenodo.{i}" for i in range(5)}


class TestIngestionMetrics:
    def test_report_fourteen_metrics(self, spark):
        tracker = spark.createDataFrame(
            [  # doi, n_submitted, valid, exists, alex, aire, success
                ("a", 2, True, False, True, True, True),
                ("b", 1, True, True, False, True, True),
                ("c", 1, False, False, False, False, False),
                ("d", 1, True, False, True, False, False),
            ],
            ["doi", "n_submitted", "valid_pattern", "already_exists",
             "openalex_metadata", "openaire_metadata", "ingestion_success"])
        m = ingestion_metrics(tracker).collect()[0].asDict()
        assert m["submitted_dois"] == 5
        assert m["duplicated_submissions"] == 1
        assert m["processed_dois"] == 2          # valid & new: a, d
        assert m["new_dois"] == 2
        assert m["existing_dois"] == 1           # b
        assert m["updated_existing_dois"] == 0
        assert m["ingested_dois"] == 2           # a, b
        assert m["metadata_pass"] == 1           # a
        assert m["metadata_failure"] == 1        # d
        assert m["valid_pattern_dois"] == 3
        assert m["invalid_pattern_dois"] == 1
        assert m["openalex_success"] == 2        # a, d
        assert m["openaire_success"] == 1        # a
        assert m["total_time_seconds"] == 0.0
        assert len(m) == 14
