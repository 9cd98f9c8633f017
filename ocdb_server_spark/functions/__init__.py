"""Reusable column-expression libraries (vector math, text analysis)."""
