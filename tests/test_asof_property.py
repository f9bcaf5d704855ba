"""Property test: asof_join agrees with pandas.merge_asof (backward,
allow_exact_matches) on arbitrary keyed time series — an independent
oracle for the engine's custom temporal operator."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lake_skyfit_spark.operators.temporal import asof_join

from data_lake_skyfit_spark.operators.temporal import bucketed_range_join  # noqa: E402

KEY = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=50)  # epoch-second grid

# Values are NULLABLE: a matched right row carrying NULL must propagate
# that NULL (merge_asof semantics) — per-column ignorenulls forward-fill
# would wrongly back-fill from an OLDER right row (ADVICE r1). Two value
# columns catch the companion bug: columns sourced from DIFFERENT rows.
VAL = st.one_of(st.none(), st.integers(0, 999))
LEFT = st.lists(st.tuples(KEY, TS), min_size=1, max_size=15)
RIGHT = st.lists(st.tuples(KEY, TS, VAL, VAL), min_size=0, max_size=15)


def _rank(x: int | None) -> tuple[bool, int]:
    return (x is not None, x if x is not None else -1)


@given(left=LEFT, right=RIGHT)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    # de-dup (k, ts) on the right — equal keys+timestamps make the match
    # ambiguous in both engines; keep the max row deterministically.
    rmap: dict[tuple[int, int], tuple[int | None, int | None]] = {}
    for k, t, v, w in right:
        old = rmap.get((k, t))
        if old is None or (_rank(v), _rank(w)) > (_rank(old[0]), _rank(old[1])):
            rmap[(k, t)] = (v, w)
    right_rows = [(k, t, v, w) for (k, t), (v, w) in rmap.items()]
    left_rows = sorted(set(left))

    ldf = spark.createDataFrame(
        [(k, t) for k, t in left_rows], "k long, ts_s long"
    ).selectExpr("k", "timestamp_seconds(ts_s) AS ts")
    rdf = spark.createDataFrame(
        right_rows or [(None, None, None, None)], "k long, ts_s long, v long, w long"
    ).filter("k IS NOT NULL").selectExpr(
        "k", "timestamp_seconds(ts_s) AS ts", "v", "w"
    )

    got = {
        (r["k"], int(r["ts"].timestamp())): (r["v"], r["w"])
        for r in asof_join(ldf, rdf, ["k"]).collect()
    }

    lpd = pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "v", "w"]).sort_values("ts")
    if len(rpd):
        merged = pd.merge_asof(
            lpd, rpd, on="ts", by="k", direction="backward", allow_exact_matches=True
        )
        want = {
            (int(r.k), int(r.ts)): (
                None if pd.isna(r.v) else int(r.v),
                None if pd.isna(r.w) else int(r.w),
            )
            for r in merged.itertuples()
        }
    else:
        want = {(int(k), int(t)): (None, None) for k, t in left_rows}

    assert got == want


INTERVALS = st.lists(
    st.tuples(st.integers(0, 40), st.integers(1, 30)), min_size=1, max_size=8
)
POINTS = st.lists(st.integers(0, 80), min_size=1, max_size=20)


@given(points=POINTS, intervals=INTERVALS)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_range_join_matches_naive_cross_join(spark, points, intervals):
    """bucketed_range_join ≡ cross join + range predicate, for any
    point/interval sets and a bucket width smaller than most
    intervals (forces multi-bucket replication paths)."""
    pts = spark.createDataFrame(
        [(i, t) for i, t in enumerate(points)], "pid long, ts_s long"
    ).selectExpr("pid", "timestamp_seconds(ts_s) AS ts")
    ivl = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(intervals)],
        "wid long, s_s long, e_s long",
    ).selectExpr(
        "wid",
        "timestamp_seconds(s_s) AS start",
        "timestamp_seconds(e_s) AS end",
    )
    got = {
        (r["pid"], r["wid"])
        for r in bucketed_range_join(
            pts, ivl, bucket_seconds=7
        ).select("pid", "wid").collect()
    }
    # Naive reference computed in plain Python over the same integer
    # seconds (timestamp_seconds is injective/monotone on them, so the
    # predicate is identical) — the Spark crossJoin reference cost ~19 s
    # of fixed job overhead PER hypothesis example (155 s total, the
    # slowest test in the suite) without exercising any operator code.
    want = {
        (pid, wid)
        for pid, t in enumerate(points)
        for wid, (s, d) in enumerate(intervals)
        if s <= t < s + d
    }
    assert got == want
