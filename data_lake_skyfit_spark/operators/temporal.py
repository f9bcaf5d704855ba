"""Temporal join operators Spark lacks natively: as-of join and
bucketed range join.

The reference delegates all joins to Postgres equi-joins (SURVEY.md
§2.4) and has neither; they are core operators for time-series /
training-data pipelines, so the engine provides them as compositions of
built-in DataFrame ops (no UDFs, no cross joins):

- asof_join: each left row picks the latest right row with
  right_ts <= left_ts per key. One union + one window over (key, ts) —
  single shuffle, linear state, no per-row subqueries. This is the
  classic "sort-merge as-of" expressed declaratively.
- bucketed_range_join: point-in-interval join without a key. Intervals
  explode into coarse time buckets, points join on their bucket
  (equi-join → hash shuffle, never a nested-loop cross product), then
  the exact containment predicate filters. Bucket width trades
  replication (intervals spanning many buckets) against join fan-in.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "bucketed_range_join", "gapfill_locf"]


def gapfill_locf(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Time-bucket gap filling with last-observation-carried-forward —
    the TimescaleDB `time_bucket_gapfill(..., locf(...))` analog the
    reference's Postgres warehouse would reach for on sensor/metric
    tables, composed from built-in ops (no UDF, no driver loop):

    1. downsample: per (key, bucket) keep MAX(value) — an exact,
       order-free aggregate (a 'last by ts' variant would need a
       deterministic tie-break across engines; max is total);
    2. spine: per key, explode sequence(min_bucket, max_bucket, 1
       bucket) — each key's own observed range, so no global window
       and no cross join against a calendar dimension;
    3. fill: left-join the spine to the observations and carry the
       last non-null value forward with last(ignorenulls) over an
       UNBOUNDED-PRECEDING row frame per key. The first spine bucket
       is observed by construction, so the filled value is never null.

    Returns key_cols + (bucket_ts, value, is_gap). Scale: one groupBy
    shuffle for the downsample, one per-key window for the fill —
    state linear in buckets, spine rows ∝ key time-spans (never
    keys × global calendar)."""
    keys = list(key_cols)
    b = F.date_trunc(bucket, F.col(ts_col))
    obs = (
        df.select(*keys, b.alias("bucket_ts"), F.col(value_col).alias("_v"))
        .groupBy(*keys, "bucket_ts")
        .agg(F.max("_v").alias("_v"))
        .localCheckpoint(eager=False)  # feeds the span agg AND the join
    )
    span = obs.groupBy(*keys).agg(
        F.min("bucket_ts").alias("_b0"), F.max("bucket_ts").alias("_b1")
    )
    spine = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("_b0"), F.col("_b1"), F.expr(f"INTERVAL 1 {bucket}"))
        ).alias("bucket_ts"),
    )
    joined = spine.join(obs, keys + ["bucket_ts"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("bucket_ts").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *keys,
        "bucket_ts",
        F.last("_v", ignorenulls=True).over(w).alias(value_col),
        F.when(F.col("_v").isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("int")
        .alias("is_gap"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row at-or-before
    its timestamp (per join key). Ties on equal timestamps take the
    right row (<= semantics, matching DuckDB/pandas ASOF).

    Plan: tag both sides, unionByName, window `last(row_struct,
    ignorenulls)` ordered by (ts, side) per key, keep left rows. One
    exchange on the key, sorted within partitions — the same physical
    shape a native as-of join operator would pick.

    The forward-fill carries ONE struct holding the matched right row's
    timestamp and every value column, so the whole row travels
    atomically: a NULL inside the matched row propagates to the output
    (merge_asof/DuckDB ASOF semantics), and all value columns always
    come from the SAME right row — per-column last(ignorenulls) would
    back-fill each column from a different older row.
    """
    on = list(on)
    value_cols = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c not in on and c != right_ts]
    )

    row_struct = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                [f"__rts:{right.schema[right_ts].dataType.simpleString()}"]
                + [
                    f"{c}:{right.schema[c].dataType.simpleString()}"
                    for c in value_cols
                ]
            )
            + ">"
        )
        .alias("__r"),
        *[F.col(c) for c in left.columns if c not in on and c != left_ts],
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        row_struct.alias("__r"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on and c != left_ts
        ],
    )
    unioned = l_tag.unionByName(r_tag)

    # Right rows sort BEFORE left rows at equal ts (__is_left asc), so a
    # same-timestamp right row is visible to the left row (<= semantics).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # last(ignorenulls) skips only left rows (their __r is NULL); a right
    # row's struct is never NULL even when its value fields all are.
    filled = unioned.select("*", F.last("__r", ignorenulls=True).over(w).alias("__m"))
    out = filled.filter(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        within = F.col("__m").isNotNull() & (
            F.unix_timestamp("__ts") - F.unix_timestamp(F.col("__m.__rts"))
            <= tolerance_seconds
        )
        out = out.withColumn("__m", F.when(within, F.col("__m")))

    return out.select(
        *on,
        F.col("__ts").alias(left_ts),
        *[c for c in left.columns if c not in on and c != left_ts],
        *[F.col(f"__m.{c}").alias(c) for c in value_cols],
    )


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 86_400,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (start <= ts < end) via bucket equi-join.

    Each interval lands in every bucket it overlaps; points join their
    single bucket, then the exact range predicate filters. The physical
    join is a hash equi-join on the bucket id — shuffle ∝ rows ·
    avg-buckets-per-interval, never |points| × |intervals|.
    """
    bucket = lambda c: F.floor(F.unix_timestamp(c) / bucket_seconds)  # noqa: E731
    ivl = intervals.select(
        "*",
        F.explode(
            F.sequence(bucket(F.col(start_col)), bucket(F.col(end_col)))
        ).alias("__bucket"),
    )
    pts = points.withColumn("__bucket", bucket(F.col(point_ts)))
    cond = (
        (pts["__bucket"] == ivl["__bucket"])
        & (ivl[start_col] <= pts[point_ts])
        & (pts[point_ts] < ivl[end_col])
    )
    return pts.join(ivl, cond, how).drop("__bucket")
