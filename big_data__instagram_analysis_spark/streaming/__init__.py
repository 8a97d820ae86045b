"""Structured Streaming surface (SURVEY.md §2.9).

harness.py — file-replay source over the events fixture + run-to-memory-sink
helpers. The queries live in queries/streaming.py so they register with the
driver contract like every other §2 row.
"""
