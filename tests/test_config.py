"""Env-overridable config (reference config.py:12-35, 59-67)."""

import pytest

from research_index_backend_spark.config import get_config
from research_index_backend_spark.ingest.fetch import openaire_url


def test_defaults(monkeypatch):
    for v in ("RIB_ORCID_NAME_SIMILARITY_THRESHOLD",
              "ORCID_NAME_SIMILARITY_THRESHOLD",
              "RIB_NAME_SIMILARITY_THRESHOLD", "NAME_SIMILARITY_THRESHOLD",
              "RIB_OPENAIRE_API", "OPENAIRE_API"):
        monkeypatch.delenv(v, raising=False)
    cfg = get_config()
    assert cfg.orcid_name_similarity_threshold == 0.8
    assert cfg.name_similarity_threshold == 0.8
    # reference config.py:28 default
    assert cfg.openaire_api == "https://api.openaire.eu/graph/v2"


def test_reference_env_names(monkeypatch):
    monkeypatch.setenv("ORCID_NAME_SIMILARITY_THRESHOLD", "0.9")
    monkeypatch.setenv("NAME_SIMILARITY_THRESHOLD", "0.7")
    cfg = get_config()
    assert cfg.orcid_name_similarity_threshold == 0.9
    assert cfg.name_similarity_threshold == 0.7


def test_rib_prefix_wins(monkeypatch):
    monkeypatch.setenv("ORCID_NAME_SIMILARITY_THRESHOLD", "0.9")
    monkeypatch.setenv("RIB_ORCID_NAME_SIMILARITY_THRESHOLD", "0.95")
    assert get_config().orcid_name_similarity_threshold == 0.95


def test_threshold_validation(monkeypatch):
    # reference config.py:59-67 rejects thresholds outside [0, 1]
    monkeypatch.setenv("RIB_NAME_SIMILARITY_THRESHOLD", "1.5")
    with pytest.raises(ValueError, match="NAME_SIMILARITY_THRESHOLD"):
        get_config()


def test_openaire_url_uses_config(monkeypatch):
    monkeypatch.setenv("RIB_OPENAIRE_API", "http://localhost:9999/v2")
    assert openaire_url("10.1/x") == \
        "http://localhost:9999/v2/researchProducts?originalId=10.1/x"
