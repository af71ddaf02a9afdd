"""Structured Streaming incremental pipeline (SURVEY.md §2.8 T1-T8)."""
