"""Structured Streaming surface: event pipelines, windows, watermarks, stateful dedup."""
