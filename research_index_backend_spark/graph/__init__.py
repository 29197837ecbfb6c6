"""Graph analytics over node/edge DataFrames (SURVEY.md M5)."""

from .analytics import connected_components, degrees, pagerank  # noqa: F401
