"""DOI validation / normalization corpus ported from the reference
(reference tests/test_dois.py:5-41, 44-120) against the engine's pure
column expressions (functions/doi.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_index_backend_spark.functions.doi import normalize_doi, valid_doi

VALID_DOIS = [
    "10.5281/zenodo.8140241",
    "10.5281/ZENODO.8140241",
    "10.5281/zenodo.8141555",
    "10.5281/zenodo.8140100",
    "10.5281/zenodo.8140153",
    "10.5281/zenodo.8139242",
    "10.5281/zenodo.8140226",
    "10.5281/zenodo.8140289",
]

INVALID_DOIS = [
    "",
    "non_empty_string",
    "10.5281zenodo.8140226",
    "10.5281/zenodo",
]

RAW_DOIS = [
    "10.1371/journal.pclm.0000331",
    "doi.org/10.5281/zenodo.11395843",
    "doi.org/10.5281/zenodo.11396572",
    "10.5281/zenodo.11396370",
    "https://doi.org/10.5281/zenodo.11395518",
    "10.5281/zenodo.11395518.",
    "  10.5281/zenodo.11395519  ",
]

CLEANED_DOIS = [
    "10.1371/journal.pclm.0000331",
    "10.5281/zenodo.11395843",
    "10.5281/zenodo.11396572",
    "10.5281/zenodo.11396370",
    "10.5281/zenodo.11395518",
    "10.5281/zenodo.11395518",
    "10.5281/zenodo.11395519",
]


def _flags(spark, dois):
    df = spark.createDataFrame([(d,) for d in dois], ["doi"])
    return [r["v"] for r in
            df.select(valid_doi("doi").alias("v")).collect()]


def test_valid_dois(spark):
    assert all(_flags(spark, VALID_DOIS))


def test_invalid_dois(spark):
    assert not any(_flags(spark, INVALID_DOIS))


def test_mixed_dois(spark):
    flags = _flags(spark, VALID_DOIS + INVALID_DOIS)
    assert sum(flags) == len(VALID_DOIS)
    assert len(flags) - sum(flags) == len(INVALID_DOIS)


def test_pattern_cleaner(spark):
    """Raw->cleaned golden pairs (reference tests/test_dois.py:104-109),
    order-preserving."""
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(RAW_DOIS)], ["i", "doi"])
    got = [r["c"] for r in
           df.select("i", normalize_doi("doi").alias("c")).orderBy("i").collect()]
    assert got == CLEANED_DOIS


def test_case_insensitive_pattern(spark):
    assert all(_flags(spark, ["10.5281/zenodo.8140241",
                              "10.5281/ZENODO.8140241"]))
