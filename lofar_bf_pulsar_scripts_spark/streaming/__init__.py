"""Structured Streaming duals of the windowed operators (SURVEY §2.9)."""
