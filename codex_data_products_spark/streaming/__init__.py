"""Structured Streaming jobs (green-field — the reference is pure batch,
SURVEY.md §2.10)."""
