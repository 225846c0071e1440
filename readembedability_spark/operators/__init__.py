"""Relational/dataflow operators of the extraction pipeline (SURVEY.md §2.B)."""
