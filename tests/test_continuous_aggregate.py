"""Continuous aggregate: incremental refresh touches only the buckets
new data lands in, stays equal to a full recompute, and is idempotent
under replayed rows."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_lake_skyfit_spark.operators.rollup import ContinuousAggregate


def _agg(df, bucket_col):
    return df.groupBy(bucket_col, "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(15,2)")).cast("decimal(18,2)").alias("total"),
    )


def _rows(spark, specs):
    return spark.createDataFrame(
        [(datetime.fromisoformat(t), et, v) for t, et, v in specs],
        "ts timestamp, event_type string, value double",
    )


def _snapshot(agg, spark):
    return {
        (r["__bucket_start"], r["event_type"]): (r["n"], str(r["total"]))
        for r in agg.read(spark).collect()
    }


def test_incremental_refresh_equals_full_rebuild(spark, tmp_path):
    base_rows = [
        ("2024-01-01T10:05:00", "click", 1.0),
        ("2024-01-01T10:45:00", "click", 2.0),
        ("2024-01-01T11:10:00", "view", 3.0),
        ("2024-01-01T12:30:00", "click", 4.0),
    ]
    base = _rows(spark, base_rows)
    agg = ContinuousAggregate(
        str(tmp_path / "rollup"), ts_col="ts", bucket="1 hour", agg_fn=_agg
    )
    agg.build(base)
    assert len(_snapshot(agg, spark)) == 3  # 10h click, 11h view, 12h click

    # New data lands in the 11h bucket only:
    new = _rows(spark, [("2024-01-01T11:50:00", "view", 10.0)])
    full = base.unionByName(new)
    touched = agg.refresh(full, new)
    assert len(touched) == 1 and "11:00" in touched[0]

    # rollup == full rebuild of the same aggregation:
    expected = {
        (r["__bucket_start"], r["event_type"]): (r["n"], str(r["total"]))
        for r in _agg(full, F.date_trunc("hour", F.col("ts")).alias("__bucket_start")).collect()
    }
    assert _snapshot(agg, spark) == expected

    # Idempotency: refreshing with the SAME new rows changes nothing.
    before = _snapshot(agg, spark)
    agg.refresh(full, new)
    assert _snapshot(agg, spark) == before


def test_untouched_buckets_not_recomputed(spark, tmp_path):
    """The refresh slice only scans the touched buckets of base — other
    buckets' rollup rows survive even if base rows for them vanish
    (proof the refresh didn't recompute them)."""
    base = _rows(spark, [
        ("2024-01-01T10:05:00", "click", 1.0),
        ("2024-01-01T11:05:00", "view", 2.0),
    ])
    agg = ContinuousAggregate(
        str(tmp_path / "r2"), ts_col="ts", bucket="1 hour", agg_fn=_agg
    )
    agg.build(base)
    # base "loses" the 10h rows (simulating retention); refresh for an
    # 11h-only delta must leave the 10h rollup row intact:
    base_pruned = base.filter(F.hour("ts") != 10)
    new = _rows(spark, [("2024-01-01T11:30:00", "view", 5.0)])
    agg.refresh(base_pruned.unionByName(new), new)
    snap = _snapshot(agg, spark)
    assert (datetime.fromisoformat("2024-01-01T10:00:00"), "click") in snap
    assert snap[(datetime.fromisoformat("2024-01-01T11:00:00"), "view")][0] == 2
