"""Scalar-function surface of the engine (SURVEY.md §2.8).

The reference delegates its scalar library to SnappyData SQL via the
``SN_SQL`` pushdown (reference ``SnappyDataInputFormat.java:31,49``); our
store side *is* Spark SQL, so the library is ``pyspark.sql.functions``.
These modules add the engine-specific helpers on top.
"""
