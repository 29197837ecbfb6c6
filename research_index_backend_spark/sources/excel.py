"""Excel source (SURVEY §2.1 S10): the reference's notebook ingest reads
author/paper sheets with pd.read_excel (reference notebooks/
cleaning.ipynb cells 2,11: sheet_name='Papers' / 'Author Paper';
optimus.ipynb cell 1: usecols projection).

Spark-first shape: an .xlsx is a zipped XML workbook — not splittable,
not columnar, and in every real pipeline a DIMENSION-sized curation
artifact (hand-maintained author lists), so the right plan is a
driver-side pandas parse into createDataFrame, exactly like the CSV dims
in sources/csv_sources.py get broadcast downstream. A directory of many
workbooks would fan out per-file over a binaryFile scan + mapInPandas
(same seam as ingest.fetch); single-file is the reference's actual shape.

The pandas engine (openpyxl) is an extra, not bundled — import-guarded
with an injectable `reader` like every other optional backend
(nlp_backends pipeline_factory, fetch transport): tests drive the real
sheet-select/column-projection/schema path with a fake reader.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_excel(spark: SparkSession, path: str,
               sheet_name: str | int = 0,
               usecols: list[str] | None = None,
               reader: Callable[..., "pd.DataFrame"] | None = None,
               ) -> DataFrame:
    """One worksheet -> Spark DataFrame.

    sheet_name / usecols mirror pd.read_excel (the reference's exact
    call surface). `reader` overrides the parse (tests; alternative
    engines); default requires openpyxl and fails fast driver-side with
    an install hint.
    """
    if reader is None:
        import importlib.util
        if importlib.util.find_spec("openpyxl") is None:
            raise ImportError(
                "the 'openpyxl' package is required to read .xlsx files "
                "and is not installed; install it with `pip install "
                "openpyxl` (driver only — the parse runs driver-side)")
        reader = pd.read_excel
    pdf = reader(path, sheet_name=sheet_name, usecols=usecols)
    if usecols is not None:
        missing = [c for c in usecols if c not in pdf.columns]
        if missing:
            raise ValueError(
                f"sheet {sheet_name!r} is missing columns {missing}")
        pdf = pdf[list(usecols)]
    # object columns with NaN holes break schema inference; normalize the
    # pandas NA artifacts to None like the reference's .where(notnull)
    pdf = pdf.astype(object).where(pd.notnull(pdf), None)
    return spark.createDataFrame(pdf)
