"""Readers normalizing reference input formats into canonical
DataFrames (SURVEY §2.1 S1-S12)."""
