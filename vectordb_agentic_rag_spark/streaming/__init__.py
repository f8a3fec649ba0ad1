"""Structured Streaming surface (SURVEY.md §2B streaming-only ops)."""
