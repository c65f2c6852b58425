"""Structured Streaming surface (SURVEY §2.9, M4): file-source ingest with
exactly-once run/lineage bookkeeping, plus windowed/watermarked event
aggregation."""
