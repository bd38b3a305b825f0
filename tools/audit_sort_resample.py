#!/usr/bin/env python
"""Audit: find queries whose range-partitioning Exchange (a global
``orderBy``) has expensive compute in the SAME stage below it.

``ShuffleExchangeExec`` with ``RangePartitioning`` computes its range
bounds by SAMPLING the child RDD — which executes the child plan a
second time. When the exchange's same-stage subtree (everything below
it down to the next exchange / leaf) contains a Python kernel
(ArrowEvalPython / MapInPandas / BatchEvalPython) or a heavyweight JVM
projection (regexp / md5 / higher-order transform), that work runs
TWICE per query. This tool walks every registry query's executed plan
and prints the offenders, so presentation sorts can be restructured to
sort the cheap keys first and compute above the exchange.

Usage: python tools/audit_sort_resample.py [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from flink_snappydata_spark import registry  # noqa: E402
from flink_snappydata_spark.session import get_spark  # noqa: E402
from flink_snappydata_spark.util import release_caches  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

PY_NODES = ("ArrowEvalPython", "MapInPandas", "BatchEvalPython", "MapInArrow")
HEAVY_EXPRS = ("regexp_", "md5(", "transform(", "aes_", "sha2(", "crc32(")


def _children(node):
    if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        # initialPlan = post-EnsureRequirements (exchanges present);
        # inputPlan would lack ENSURE exchanges and over-flag.
        try:
            return [node.initialPlan()]
        except Exception:
            return [node.inputPlan()]
    out = []
    cs = node.children()
    it = cs.iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def _same_stage_heavy(node) -> list[str]:
    """Expensive markers in the subtree below ``node`` down to (and
    excluding) the next exchange boundary."""
    hits: list[str] = []
    stack = _children(node)
    while stack:
        n = stack.pop()
        name = n.nodeName()
        if "Exchange" in name or "InMemoryTableScan" in name:
            continue  # stage/cache boundary — sampling reads it cheaply
        if any(m in name for m in PY_NODES):
            hits.append(name)
        elif name in ("Project", "Filter"):
            s = n.simpleString(200)
            hits.extend(m for m in HEAVY_EXPRS if m in s)
        stack.extend(_children(n))
    return hits


def audit(df) -> list[tuple[str, list[str]]]:
    plan = df._jdf.queryExecution().executedPlan()
    out = []
    stack = [plan]
    while stack:
        n = stack.pop()
        name = n.nodeName()
        s = n.simpleString(100)
        is_range_ex = "Exchange" in name and "rangepartitioning" in s
        is_global_sort = name == "Sort" and ", true," in s
        if is_range_ex or is_global_sort:
            hits = _same_stage_heavy(n)
            if hits:
                out.append((s[:90], sorted(set(hits))))
        stack.extend(_children(n))
    return out


def main() -> None:
    spark = get_spark(app_name="fss-sort-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()
    names = sys.argv[1:] or list(queries)
    for name in names:
        try:
            df = queries[name](spark, SF_DIR)
            found = audit(df)
        except Exception as e:  # builder probes can fail mid-audit
            print(f"{name}: AUDIT ERROR {type(e).__name__}: {e}")
            release_caches()
            continue
        release_caches()
        if found:
            for exch, hits in found:
                print(f"{name}: {hits}  [{exch}]")


if __name__ == "__main__":
    main()
