"""Pipelines recreating each reference script as a composition of
operators (SURVEY §3)."""
