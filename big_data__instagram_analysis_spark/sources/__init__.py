"""File-format readers/writers (SURVEY.md §2.1).

The fixture parquet reader lives in io.py; round-trip sink/source helpers
used by queries/sources_sinks.py live in readers_writers.py.
"""
