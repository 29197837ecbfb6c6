"""Ingest layer: JSON landing, parsing, DOI validation, metrics."""
