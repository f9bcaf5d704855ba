"""Benchmark harness: runs the engine's headline queries and prints one
JSON line with per-query wall times.

Env:
  SPARK_GRAFT_SF_DIR  — data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    — local[N] (default: all cores)
  SKYFIT_BENCH_QUERIES — comma-separated subset override
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_lake_skyfit_spark.session import get_spark
from data_lake_skyfit_spark.queries import registry


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("skyfit-bench")

    queries = registry()
    subset = os.environ.get("SKYFIT_BENCH_QUERIES")
    names = [n for n in subset.split(",") if n] if subset else [
        n for n, q in sorted(queries.items()) if "no-bench" not in q.tags
    ]

    # Warm the JVM/IO path AND the Arrow Python-worker path once, so
    # per-query times measure the queries — not classloading and not
    # the first mapInPandas call's worker spawn (alphabetical order put
    # that cost on ann_* for two rounds).
    queries["union_audit_counts"].fn(spark, sf_dir).collect()
    spark.range(32).mapInPandas(lambda it: it, "id long").collect()
    # …and the localCheckpoint machinery (first materialization carries
    # ~0.26 s of one-time block-manager/codegen setup, measured r10 —
    # it landed on whichever checkpoint-using query ran first).
    spark.range(32).localCheckpoint(eager=False).count()

    times: dict[str, float] = {}
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        queries[name].fn(spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 4)
        # Operators that fan one frame into several consumers hold
        # localCheckpoint blocks; across ~90 queries those accumulate
        # into executor-memory pressure that surfaces as a multi-second
        # GC spike on some unlucky later query. Freeing them after each
        # query keeps every measurement at steady-state memory.
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        # Spark's ContextCleaner frees broadcast blocks and shuffle
        # files only when a DRIVER GC collects their references — and a
        # 128 GiB heap may never GC across one battery, so ~139 queries
        # of broadcasts pile into executor storage memory and the
        # alphabet-tail queries measured 2-3x their fresh-session times
        # (r4e finding: window_analytics 10.6s in-battery vs 2.0s
        # fresh). A periodic explicit GC keeps the cleaner draining.
        if i % 20 == 19:
            spark.sparkContext._jvm.System.gc()

    total = round(sum(times.values()), 4)
    doc = {
        "metric": "skyfit_spark_query_battery_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": _sf_from_dir(sf_dir),
    }

    # Full-precision per-query detail always lands in the repo for
    # cross-round comparison…
    # Subset runs (SKYFIT_BENCH_QUERIES) must NOT clobber the committed
    # full-battery detail — a one-query file labeled battery_total
    # poisons cross-round comparison (code-review r4).
    if not subset:
        detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "BENCH_DETAIL.json")
        try:
            with open(detail_path, "w") as f:
                json.dump(doc, f, indent=1, sort_keys=True)
        except OSError:
            pass

    print(compact_line(doc, budget=1900))


def compact_line(doc: dict, *, budget: int = 1900) -> str:
    """One JSON line that survives the driver's tail capture, which
    keeps only the LAST 2000 bytes of stdout (round-2 lesson: the full
    83-query dict is ~2.7 KB, so the line's head — metric/value — was
    truncated away and the driver recorded parsed=null). 2-decimal
    times; if the dict still doesn't fit, the FASTEST queries drop
    first (the slow ones carry the perf signal) with an explicit
    queries_omitted count."""
    times = doc["queries"]
    compact = dict(doc)
    compact["value"] = round(doc["value"], 2)
    kept = {k: round(v, 2) for k, v in times.items()}
    while True:
        compact["queries"] = dict(sorted(kept.items()))
        omitted = len(times) - len(kept)
        if omitted:
            compact["queries_omitted"] = omitted
            compact["detail"] = "BENCH_DETAIL.json"
        line = json.dumps(compact, separators=(",", ":"))
        if len(line) <= budget or len(kept) <= 1:
            return line
        kept.pop(min(kept, key=kept.get))


if __name__ == "__main__":
    main()
