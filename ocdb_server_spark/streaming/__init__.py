"""Structured Streaming execution of the §2.9 operators."""
