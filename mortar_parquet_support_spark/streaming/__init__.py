"""Structured Streaming over the lake: windowed rollups with watermarks,
file-source incremental ingest."""
