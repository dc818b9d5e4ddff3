"""Reusable DataFrame transforms — the reference's operator inventory
(SURVEY.md §2) re-expressed as declarative Spark primitives."""
