"""clean_html goldens ported from the reference
(reference tests/test_utilities.py:4-26) against BOTH implementations:
the exact Python twin (clean_html_py, used by the ingest UDF) and the
JVM column-expression chain (clean_html_col)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from research_index_backend_spark.functions.text import (
    clean_html_col,
    clean_html_py,
)
from research_index_backend_spark.functions.pytext import clean_html_udf

GOLDENS = [
    # JATS tag strip
    ("<jats:title>Abstract</jats:title><jats:p>Beneficiaries</jats:p>",
     "AbstractBeneficiaries"),
    # soft hyphen -> space
    ("renewa­ble", "renewa ble"),
    # line-break collapse + trim
    (" \n bla\n bla", "bla bla"),
]


@pytest.mark.parametrize("raw,expected", GOLDENS)
def test_clean_html_py(raw, expected):
    assert clean_html_py(raw) == expected


def test_clean_html_py_none():
    assert clean_html_py(None) is None


def test_clean_html_col_matches(spark):
    """The JVM chain must agree with the exact Python twin on the golden
    corpus (it only diverges on non-NFC unicode / exotic entities)."""
    df = spark.createDataFrame([(r,) for r, _ in GOLDENS], ["raw"])
    got = [r["c"] for r in df.select(clean_html_col("raw").alias("c")).collect()]
    assert got == [e for _, e in GOLDENS]


def test_clean_html_udf_matches(spark):
    df = spark.createDataFrame([(r,) for r, _ in GOLDENS], ["raw"])
    got = [r["c"] for r in df.select(clean_html_udf("raw").alias("c")).collect()]
    assert got == [e for _, e in GOLDENS]


def test_entity_unescape():
    """&amp; handled pre-unescape; other entities via html.unescape
    (reference utils.py:20-23)."""
    assert clean_html_py("Tom &amp; Jerry") == "Tom & Jerry"
    assert clean_html_py("a &lt; b") == "a < b"
