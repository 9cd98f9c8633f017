"""Sources: ingest readers (SeaBASS-style delimited text, multimodal
binary columns)."""
