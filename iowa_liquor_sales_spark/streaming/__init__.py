"""Structured Streaming surface (the reference's chunked-ingest analog)."""
