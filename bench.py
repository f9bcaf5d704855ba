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

    # Warm the JVM/IO path once so per-query times measure the queries,
    # not classloading.
    queries["union_audit_counts"].fn(spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        queries[name].fn(spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "skyfit_spark_query_battery_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": _sf_from_dir(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
