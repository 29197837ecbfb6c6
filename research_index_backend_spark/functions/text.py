"""Text cleaning: HTML/JATS strip + unicode normalization.

Reference semantics (reference src/research_index_backend/utils.py:5-23):
strip `<.*?>` tags, replace {\\n, \\xa0, soft-hyphen, U+FFFD, &amp;,
narrow-NBSP} with spaces, collapse 4/3/2-space runs once each, strip, then
html.unescape(unicodedata.normalize("NFC", text)).

Spark-first split: everything up to the strip is a regexp_replace chain
(JVM codegen). The NFC + full HTML-entity unescape tail has no built-in
equivalent, so it lives in an Arrow-batched pandas UDF — the documented
slow path, used only where exact parity matters (abstracts/titles at
ingest, not in hot analytic queries).
"""

from __future__ import annotations

import html
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def clean_html_py(raw: str) -> str:
    """Driver/UDF-side exact implementation of the reference's clean_html
    (utils.py:5-23): same replacement set, same fixed-width space collapse
    order, then NFC + unescape."""
    if raw is None:
        return None
    text = raw
    # strip tags
    import re
    text = re.sub(r"<.*?>", "", text)
    for ch in ("\n", "\xa0", "­", "�", " "):
        text = text.replace(ch, " ")
    text = text.replace("&amp;", "&")
    text = text.replace("    ", " ").replace("   ", " ").replace("  ", " ")
    text = text.strip()
    return html.unescape(unicodedata.normalize("NFC", text))


def clean_html_col(col: Column | str) -> Column:
    """Column-expression portion of clean_html — JVM-side, codegen'd.

    Handles tag strip, whitespace-char replacement, &amp;, the reference's
    fixed 4/3/2 space collapses, and trim. Sufficient whenever the input is
    ASCII-ish (the benchmark corpus); chain normalize_text_udf after it for
    full NFC/entity parity.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"<.*?>", "")
    c = F.regexp_replace(c, "[\\n ­� ]", " ")
    c = F.regexp_replace(c, "&amp;", "&")
    # the reference collapses exactly 4-, then 3-, then 2-space runs once
    c = F.regexp_replace(c, r"    ", " ")
    c = F.regexp_replace(c, r"   ", " ")
    c = F.regexp_replace(c, r"  ", " ")
    return F.trim(c)


@F.pandas_udf(StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched NFC + html.unescape tail (utils.py:23 parity)."""
    return s.map(lambda x: None if x is None
                 else html.unescape(unicodedata.normalize("NFC", x)))
