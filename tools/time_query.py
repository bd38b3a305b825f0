#!/usr/bin/env python
"""Time a single registry query with the bench's methodology (table
cache on, noop sink, warm-up rep + median of N) — the per-query A/B
harness for optimization rounds.

Usage: python tools/time_query.py name [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from flink_snappydata_spark import registry  # noqa: E402
from flink_snappydata_spark.catalog import (  # noqa: E402
    TABLES,
    enable_table_cache,
    load_table,
)
from flink_snappydata_spark.session import get_spark  # noqa: E402
from flink_snappydata_spark.util import release_caches  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name=f"fss-ab-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    enable_table_cache()
    for t in TABLES:
        load_table(spark, SF_DIR, t).count()
    fn = registry.queries()[name]
    runs = []
    for i in range(reps + 1):
        release_caches()
        start = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - start
        if i > 0:  # rep 0 is warm-up
            runs.append(dt)
    runs.sort()
    print(
        f"{name}: median {runs[len(runs) // 2]:.3f}s "
        f"min {runs[0]:.3f} max {runs[-1]:.3f} n={len(runs)}"
    )


if __name__ == "__main__":
    main()
