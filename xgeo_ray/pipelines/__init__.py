"""End-to-end Ray Data pipelines (ingest / resume / snapshot / compact)."""
