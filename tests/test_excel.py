"""S10 Excel source: sheet select / column projection / NA normalization
through the real read_excel path with an injected reader (openpyxl is an
extra, not bundled — same seam pattern as the NLP backends)."""

from __future__ import annotations

import pandas as pd
import pytest

from research_index_backend_spark.sources.excel import read_excel


def _fake_workbook(path, sheet_name=0, usecols=None):
    sheets = {
        "Papers": pd.DataFrame({
            "paper_id": [1, 2], "title": ["A", "B"],
            "doi": ["10.1/x", None]}),
        "Author Paper": pd.DataFrame({
            "author": ["Lucy", "Joe"], "paper_id": [1, 1]}),
    }
    if isinstance(sheet_name, int):
        sheet_name = list(sheets)[sheet_name]
    pdf = sheets[sheet_name]
    if usecols is not None:
        pdf = pdf[[c for c in usecols if c in pdf.columns]]
    return pdf


def test_sheet_and_projection(spark):
    df = read_excel(spark, "wb.xlsx", sheet_name="Papers",
                    usecols=["paper_id", "title"], reader=_fake_workbook)
    assert df.columns == ["paper_id", "title"]
    assert {(r["paper_id"], r["title"]) for r in df.collect()} == \
        {(1, "A"), (2, "B")}


def test_nan_becomes_null(spark):
    df = read_excel(spark, "wb.xlsx", sheet_name="Papers",
                    reader=_fake_workbook)
    rows = {r["paper_id"]: r["doi"] for r in df.collect()}
    assert rows == {1: "10.1/x", 2: None}


def test_relations_sheet_joins(spark):
    """The reference's cleaning notebook joins 'Papers' to
    'Author Paper' on paper_id — the same join works on the Spark side."""
    papers = read_excel(spark, "wb.xlsx", sheet_name="Papers",
                        reader=_fake_workbook)
    rel = read_excel(spark, "wb.xlsx", sheet_name="Author Paper",
                     reader=_fake_workbook)
    j = rel.join(papers, "paper_id").select("author", "title")
    assert {(r["author"], r["title"]) for r in j.collect()} == \
        {("Lucy", "A"), ("Joe", "A")}


def test_missing_column_raises(spark):
    with pytest.raises(ValueError, match="missing columns"):
        read_excel(spark, "wb.xlsx", sheet_name="Papers",
                   usecols=["paper_id", "nope"], reader=_fake_workbook)


def test_missing_engine_raises():
    pytest.importorskip  # (not used: we assert the ImportError branch)
    try:
        import openpyxl  # noqa: F401
        pytest.skip("openpyxl installed; guard branch unreachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="pip install"):
        read_excel(None, "wb.xlsx")
