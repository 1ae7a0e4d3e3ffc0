"""Operator library: pure DataFrame -> DataFrame functions.

Each module cites the reference file:line whose *semantics* it
re-expresses (SURVEY.md §2); the implementations are idiomatic Spark —
declarative plans that Catalyst can push down, prune, and codegen —
never translations of the reference's per-sample loops.
"""
