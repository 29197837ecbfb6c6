"""DOI normalization and validation as pure column expressions.

Reference semantics (reference src/research_index_backend/doi.py:31,
97-103): normalize = strip, rstrip '.', drop "https://doi.org/" and
"doi.org/" prefixes; validate = the crossref pattern
`10\\.\\d{4,9}/(?=.*\\d)[-._;()/:A-Z0-9]+$` case-insensitive.

Java regex supports the lookahead, so validation stays JVM-side in
whole-stage codegen — no UDF. At 100 TB these are embarrassingly parallel
per-row expressions; the filter pushes down to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# crossref.org/blog/dois-and-matching-regular-expressions (public pattern);
# reference pins it at doi.py:31 with IGNORECASE.
DOI_PATTERN = r"10\.\d{4,9}/(?=.*\d)[-._;()/:A-Z0-9]+$"
# Java regex: embed case-insensitivity; rlike is unanchored so keep the $.
DOI_PATTERN_CI = "(?i)" + DOI_PATTERN


def normalize_doi(col: Column | str) -> Column:
    """strip -> rstrip '.' -> drop https://doi.org/ and doi.org/ prefixes.

    The reference uses str.replace (anywhere); in practice the prefixes only
    occur at the start, and the normative tests (reference
    tests/test_dois.py:23-41) only cover the prefix position, which this
    preserves. rstrip('.') strips *all* trailing dots, hence the + quantifier.
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, r"\.+$", "")
    c = F.regexp_replace(c, r"https://doi\.org/", "")
    c = F.regexp_replace(c, r"doi\.org/", "")
    return c


def valid_doi(col: Column | str) -> Column:
    """Boolean column: does the (normalized) DOI match the crossref pattern?

    Mirrors `re.compile(DOI_PATTERN, IGNORECASE).search(...)` — an
    unanchored-left, anchored-right search, which is exactly rlike's
    semantics with the trailing $.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(DOI_PATTERN_CI)
