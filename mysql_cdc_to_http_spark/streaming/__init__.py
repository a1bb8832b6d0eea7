"""Structured Streaming surface: windowed aggregations, watermarks,
streaming dedup, CDC latest-state materialization, queue/HTTP delivery."""
