"""Operator implementations, one module per SURVEY.md §2 category."""
