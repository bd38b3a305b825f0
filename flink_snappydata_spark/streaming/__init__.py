"""Streaming surface (SURVEY.md §2.6, §3.2-3.3).

The reference's streaming jobs (Flink DataStream word counts, event-time
windows, watermarks, windowed stream-stream join) map to Structured
Streaming. Window/join builders here are written against plain
DataFrames so the *same* code path serves:

* batch execution over the bounded ``events`` fixture (this is what the
  DuckDB oracle checks — streaming and batch share Catalyst plans), and
* true streaming execution via ``readStream`` + watermarks (smoke-tested
  with memory sinks in tests/).
"""
