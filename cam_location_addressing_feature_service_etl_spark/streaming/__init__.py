"""Structured Streaming surface.

The reference has none (SURVEY §2.10) — its only Kafka use is a
single-message producer and its incrementality is batch-level. These
modules provide the streaming equivalents a continuous deployment
would use: watermarked windowed aggregation and session windows over
an event stream, with batch-equivalent semantics (the batch forms in
``workload/events.py`` carry the DuckDB correctness checks)."""
