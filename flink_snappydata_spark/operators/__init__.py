"""Batch relational operators (SURVEY.md §2.1-2.5, 2.7).

Each builder takes already-loaded DataFrames and returns a DataFrame with
stable, fully-aliased output columns (the correctness harness hashes by
column name). Builders never collect and never depend on partitioning —
results are deterministic at any cluster size.
"""
