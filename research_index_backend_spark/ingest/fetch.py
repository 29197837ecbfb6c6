"""REST JSON sources (S3/S4) as a distributed fetch stage.

Reference behavior (reference src/research_index_backend/get_metadata.py:40-87):
sequential driver-side requests per DOI — OpenAire
`/researchProducts?originalId={doi}` with a bearer token (403 -> token
error, `error` key -> ValueError, empty `results` -> ValueError) and
OpenAlex `works/doi:{doi}`; responses optionally saved one file per DOI
(F21 slash-strip names, get_metadata.py:29-38); a 30-second
requests_cache dedupes repeats (S6).

Spark-first design: the HTTP boundary is the ONLY place imperative code
belongs (SURVEY §1.6). Fetch runs inside mapInPandas — one Arrow batch of
DOIs per executor task, N partitions fetch concurrently, and the result
lands as (query_doi, source, status, body) rows written once as JSONL
(sources.json_sink). Everything downstream is a lazy plan over the landed
envelopes. Error mapping becomes DATA (status/error columns — the P7
side-channel), not exceptions: at 100k DOIs you triage failures with a
groupBy, not a stack trace.

The transport is injectable (`transport(url, headers) -> (status, text)`)
so tests run hermetically; a requests-based default is provided behind an
import guard (the library may be absent in a minimal executor image).

Idempotent re-fetch (S6): `unfetched_dois` anti-joins the work list
against already-landed query_doi keys — re-runs only touch the gap, the
engine's equivalent of the HTTP cache + existence short-circuit
(create_graph_from_doi.py:219-224).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..config import get_config

OPENALEX_API = "https://api.openalex.org"

FETCH_SCHEMA = StructType([
    StructField("query_doi", StringType()),
    StructField("source", StringType()),
    StructField("status", IntegerType()),
    StructField("error", StringType()),
    StructField("body", StringType()),
])

Transport = Callable[[str, dict], tuple[int, str]]


def default_transport(url: str, headers: dict) -> tuple[int, str]:
    """requests-backed transport; import-guarded (environment may lack it)."""
    import requests  # noqa: PLC0415 — deliberate lazy import

    resp = requests.get(url, headers=headers, timeout=30)
    return resp.status_code, resp.text


def openaire_url(doi: str) -> str:
    # base is (RIB_)OPENAIRE_API, default https://api.openaire.eu/graph/v2 —
    # reference get_metadata.py:44 builds f"{config.openaire_api}/researchProducts".
    return f"{get_config().openaire_api}/researchProducts?originalId={doi}"


def openalex_url(doi: str) -> str:
    return f"{OPENALEX_API}/works/doi:{doi}"


def clean_filename(doi_col) -> "F.Column":
    """F21: slash-strip filename (get_metadata.py:31)."""
    c = F.col(doi_col) if isinstance(doi_col, str) else doi_col
    return F.regexp_replace(c, "/", "")


def _classify(source: str, status: int, text: str) -> tuple[str | None, str | None]:
    """Reference error mapping as (error, body): 403 -> token message
    (get_metadata.py:61-66), `error` key and empty results -> error rows
    (get_metadata.py:51-60)."""
    if status == 403 and source == "openaire":
        return ("OpenAire refresh token is invalid or expired. "
                "Please update token and try again.", None)
    if status >= 400:
        return (f"HTTP {status}", None)
    try:
        payload = json.loads(text)
    except ValueError:
        return ("invalid JSON", None)
    if isinstance(payload, dict) and payload.get("error"):
        return (str(payload["error"]), None)
    if source == "openaire" and not payload.get("results"):
        return ("no results", None)
    return (None, text)


def fetch_metadata(dois: DataFrame, source: str = "openaire",
                   token: str = "",
                   transport: Transport | None = None) -> DataFrame:
    """Distributed fetch: dois(doi) -> FETCH_SCHEMA rows via mapInPandas.

    One HTTP call per DOI inside the executor task; partition count is the
    concurrency knob (repartition the work list to tune). The transport
    runs OUTSIDE any hot analytic path — this stage lands data once.
    """
    tx = transport or default_transport
    url_fn = openaire_url if source == "openaire" else openalex_url
    headers = {"Authorization": f"Bearer {token}"} if token else {}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("query_doi", "source", "status", "error", "body")}
            for doi in pdf["doi"]:
                try:
                    status, text = tx(url_fn(doi), headers)
                except Exception as exc:  # network failure -> data, not crash
                    status, text = -1, ""
                    err, body = str(exc), None
                else:
                    err, body = _classify(source, status, text)
                out["query_doi"].append(doi)
                out["source"].append(source)
                out["status"].append(status)
                out["error"].append(err)
                out["body"].append(body)
            yield pd.DataFrame(out)

    return dois.select("doi").mapInPandas(run, FETCH_SCHEMA)


def unfetched_dois(dois: DataFrame, landed: DataFrame,
                   max_age: float | None = None,
                   now: float | None = None) -> DataFrame:
    """S6 idempotence: only DOIs with no landed envelope are fetched on a
    re-run (anti-join against the landed query_doi keys).

    max_age (seconds) is the cache-TTL semantics of the reference's
    `requests_cache(expire_after=30)` (create_graph_from_doi.py:215): a
    landed envelope older than max_age — judged by the `landed_at` column
    the JSON sink stamps (sources/json_sink.py) — no longer counts as
    landed, so the DOI is re-fetched. Rows with a NULL landed_at (datasets
    landed before the stamp existed) are treated as expired: age unknown
    -> refetch is the conservative choice. max_age=None keeps the
    never-expires behavior.
    """
    covered = landed
    if max_age is not None:
        import time as _time
        cutoff = (now if now is not None else _time.time()) - max_age
        covered = landed.filter(F.col("landed_at").isNotNull()
                                & (F.col("landed_at") >= cutoff))
    return dois.join(
        covered.select(F.col("query_doi").alias("doi")).distinct(),
        "doi", "left_anti")
