#!/usr/bin/env python
"""Dump `.explain("formatted")` for named registry queries to files —
the per-query before/after plan evidence the optimization rounds
commit under plans/r{N}/.

Usage: python tools/dump_query_plan.py OUTDIR SUFFIX name [name ...]
Writes OUTDIR/<name>_<SUFFIX>.txt for each query, built at sf0.01.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from flink_snappydata_spark import registry  # noqa: E402
from flink_snappydata_spark.plans import inspect as P  # noqa: E402
from flink_snappydata_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="fss-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(P.formatted_plan(df).rstrip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
