"""As-of and range join edge cases: no-match leaves NULL, equal
timestamps match (<= semantics), tolerance cuts stale matches, interval
boundaries are half-open."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_lake_skyfit_spark.operators.temporal import asof_join, bucketed_range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "l1"),
            (1, _ts("2024-01-01T12:00:00"), "l2"),
            (2, _ts("2024-01-01T09:00:00"), "l3"),  # before any right row
            (3, _ts("2024-01-01T10:00:00"), "l4"),  # key with no right rows
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),  # equal ts → matches l1
            (1, _ts("2024-01-01T11:30:00"), 200.0),
            (2, _ts("2024-01-01T09:30:00"), 300.0),
        ],
        "k long, ts timestamp, value double",
    )
    out = {r["tag"]: r for r in asof_join(left, right, ["k"]).collect()}
    assert out["l1"]["value"] == 100.0  # <= includes equal timestamp
    assert out["l2"]["value"] == 200.0  # latest at-or-before
    assert out["l3"]["value"] is None  # nothing before
    assert out["l4"]["value"] is None  # key absent from right


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "x")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 5.0)], "k long, ts timestamp, value double"
    )
    fresh = asof_join(left, right, ["k"], tolerance_seconds=3 * 3600).collect()[0]
    stale = asof_join(left, right, ["k"], tolerance_seconds=3600).collect()[0]
    assert fresh["value"] == 5.0
    assert stale["value"] is None  # 2h-old match cut by 1h tolerance


def test_range_join_half_open_bounds(spark):
    pts = spark.createDataFrame(
        [
            (1, _ts("2024-01-05T02:00:00")),  # == start → in
            (2, _ts("2024-01-05T06:00:00")),  # == end → out
            (3, _ts("2024-01-05T04:00:00")),  # inside
            (4, _ts("2024-01-06T04:00:00")),  # other day
        ],
        "pid long, ts timestamp",
    )
    ivl = spark.createDataFrame(
        [(10, _ts("2024-01-05T02:00:00"), _ts("2024-01-05T06:00:00"))],
        "wid long, start timestamp, end timestamp",
    )
    got = {
        r["pid"]
        for r in bucketed_range_join(pts, ivl).select("pid").collect()
    }
    assert got == {1, 3}


def test_range_join_interval_spanning_buckets(spark):
    """An interval wider than the bucket lands in several buckets but
    each point still matches exactly once."""
    pts = spark.createDataFrame(
        [(i, _ts(f"2024-01-0{d}T12:00:00")) for i, d in enumerate([1, 2, 3, 4], 1)],
        "pid long, ts timestamp",
    )
    ivl = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), _ts("2024-01-03T00:00:00"))],
        "wid long, start timestamp, end timestamp",
    )
    out = bucketed_range_join(pts, ivl, bucket_seconds=3600).collect()
    assert sorted(r["pid"] for r in out) == [1, 2]  # exactly once each


def test_asof_join_with_no_value_columns(spark):
    """value_cols may be empty (right side carries only key+timestamp);
    the struct cast must not emit a trailing comma and the join still
    attaches the matched timestamp."""
    from data_lake_skyfit_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00")], "k long, rts string"
    ).withColumn("rts", F.to_timestamp("rts"))
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts").collect()
    assert len(out) == 1 and out[0]["k"] == 1


def test_gapfill_locf_hand_computed(spark):
    """Gap filling + LOCF on a corpus small enough to verify every
    spine bucket and fill by hand, including multi-bucket gaps and
    per-key span isolation."""
    import datetime as dt

    from data_lake_skyfit_spark.operators.temporal import gapfill_locf

    T0 = dt.datetime(2024, 1, 1, 10, 15)
    rows = [
        (1, T0, 5.0),                                 # 10:00 -> 5.0
        (1, T0.replace(minute=45), 7.0),              # same bucket: max 7.0
        (1, T0 + dt.timedelta(hours=3), 2.0),         # 13:00; 11:00/12:00 gaps
        (2, T0 + dt.timedelta(hours=1), 9.0),         # key 2 spans one bucket
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = sorted(
        (
            (r["user_id"], r["bucket_ts"].hour, r["value"], r["is_gap"])
            for r in gapfill_locf(df, key_cols=["user_id"]).collect()
        )
    )
    assert got == [
        (1, 10, 7.0, 0),
        (1, 11, 7.0, 1),
        (1, 12, 7.0, 1),
        (1, 13, 2.0, 0),
        (2, 11, 9.0, 0),
    ]
