"""Local replica of the driver's correctness gate.

Runs a declared query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count + column names + values
(order-insensitive: columns sorted by name, rows sorted by all columns).
Used by tests so every registry entry is verified locally before the
driver sees it.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from flink_snappydata_spark.catalog import TABLES

SF_CORRECT = "/root/testdata/sf0.01"


def duck_connection(sf_dir: str = SF_CORRECT) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # Timestamps: compare tz-naive at microsecond resolution.
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            col = df[c]
            if getattr(col.dtype, "tz", None) is not None:
                col = col.dt.tz_localize(None)
            df[c] = col.astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [f"column mismatch: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"]
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in s.columns:
        sc, dc = s[c], d[c]
        try:
            if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(dc):
                sc = sc.astype("float64")
                dc = dc.astype("float64")
                neq = ~((sc == dc) | (sc.isna() & dc.isna()))
            else:
                neq = ~((sc == dc) | (sc.isna() & dc.isna()))
        except Exception as e:  # dtype-level incompatibility
            problems.append(f"column {c}: compare error {e}: {sc.dtype} vs {dc.dtype}")
            continue
        if neq.any():
            i = int(neq.idxmax())
            problems.append(
                f"column {c}: {int(neq.sum())}/{len(sc)} values differ; "
                f"first at row {i}: spark={sc.iloc[i]!r} duck={dc.iloc[i]!r}"
            )
    return problems


def check_query(spark, name: str, sf_dir: str = SF_CORRECT, con=None) -> list[str]:
    from flink_snappydata_spark import registry

    spec = registry.QUERIES[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        # Rows-only check must still be falsifiable: an oracle-less query
        # that returns nothing is a silently-degenerated pipeline.
        return [] if len(spark_pdf) > 0 else [f"oracle-less query {name} returned 0 rows"]
    own_con = con is None
    if own_con:
        con = duck_connection(sf_dir)
    try:
        duck_pdf = con.execute(spec.oracle).df()
    finally:
        if own_con:
            con.close()
    return compare_frames(spark_pdf, duck_pdf)
