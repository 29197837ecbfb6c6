"""Environment-overridable engine configuration.

Parity target: reference src/research_index_backend/config.py:12-35 — the
reference reads ORCID_NAME_SIMILARITY_THRESHOLD, NAME_SIMILARITY_THRESHOLD,
OPENAIRE_API and OPENAIRE_SERVICE from the environment (via dotenv) and
validates the thresholds into [0, 1]. The engine mirrors that surface so a
deployment can tune resolution strictness without code changes.

Each knob reads, in priority order:
  1. ``RIB_<NAME>``  (engine-namespaced, avoids collisions on shared hosts)
  2. ``<NAME>``      (the reference's original variable, drop-in compat)
  3. the reference's default.

Unlike the reference this is NOT an import-time singleton that can raise on
import (reference config.py:107 constructs Config() at module load, so a bad
env kills every import); ``get_config()`` builds lazily and callers that never
touch config never validate it. Graph-database (MG_*) and OAuth token knobs
are out of scope — the engine's sinks are parquet/JSON, not Bolt, and its
transport is injectable (ingest/fetch.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass


def _env(name: str, default: str) -> str:
    return os.getenv(f"RIB_{name}", os.getenv(name, default))


@dataclass(frozen=True)
class EngineConfig:
    orcid_name_similarity_threshold: float
    name_similarity_threshold: float
    openaire_api: str
    openaire_service: str

    def __post_init__(self) -> None:
        # reference config.py:59-67 (_validate)
        for attr in ("orcid_name_similarity_threshold",
                     "name_similarity_threshold"):
            v = getattr(self, attr)
            if not 0 <= v <= 1:
                raise ValueError(
                    f"{attr.upper()} must be between 0 and 1")


def get_config() -> EngineConfig:
    """Build config from the current environment (reference config.py:12-35)."""
    return EngineConfig(
        orcid_name_similarity_threshold=float(
            _env("ORCID_NAME_SIMILARITY_THRESHOLD", "0.8")),
        name_similarity_threshold=float(
            _env("NAME_SIMILARITY_THRESHOLD", "0.8")),
        openaire_api=_env("OPENAIRE_API", "https://api.openaire.eu/graph/v2"),
        openaire_service=_env("OPENAIRE_SERVICE",
                              "https://services.openaire.eu"),
    )
