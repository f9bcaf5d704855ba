"""Property test: asof_join agrees with pandas.merge_asof (backward,
allow_exact_matches) on arbitrary keyed time series — an independent
oracle for the engine's custom temporal operator."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lake_skyfit_spark.operators.temporal import asof_join

KEY = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=50)  # epoch-second grid

LEFT = st.lists(st.tuples(KEY, TS), min_size=1, max_size=15)
RIGHT = st.lists(st.tuples(KEY, TS, st.integers(0, 999)), min_size=0, max_size=15)


@given(left=LEFT, right=RIGHT)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    # de-dup (k, ts) on the right — equal keys+timestamps make the match
    # ambiguous in both engines; keep the max value deterministically.
    rmap: dict[tuple[int, int], int] = {}
    for k, t, v in right:
        rmap[(k, t)] = max(v, rmap.get((k, t), -1))
    right_rows = [(k, t, v) for (k, t), v in rmap.items()]
    left_rows = sorted(set(left))

    ldf = spark.createDataFrame(
        [(k, t) for k, t in left_rows], "k long, ts_s long"
    ).selectExpr("k", "timestamp_seconds(ts_s) AS ts")
    rdf = spark.createDataFrame(
        right_rows or [(None, None, None)], "k long, ts_s long, v long"
    ).filter("k IS NOT NULL").selectExpr("k", "timestamp_seconds(ts_s) AS ts", "v")

    got = {
        (r["k"], int(r["ts"].timestamp())): r["v"]
        for r in asof_join(ldf, rdf, ["k"]).collect()
    }

    lpd = pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts")
    if len(rpd):
        merged = pd.merge_asof(
            lpd, rpd, on="ts", by="k", direction="backward", allow_exact_matches=True
        )
        want = {
            (int(r.k), int(r.ts)): (None if pd.isna(r.v) else int(r.v))
            for r in merged.itertuples()
        }
    else:
        want = {(int(k), int(t)): None for k, t in left_rows}

    assert got == want
