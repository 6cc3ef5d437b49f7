"""Structured Streaming pipelines (SURVEY §2.9)."""
