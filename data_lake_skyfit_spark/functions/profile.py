"""Generic table profiling: per-column null / distinct / count stats.

The reference profiles tables with ad-hoc audit SQL (counts, null
checks, distinct keys — sql/validations/audit_stg.sql:12-241,
scripts/health_check.ps1); this is the generic operator form: ONE
aggregation pass over the table computes every column's stats, then a
cheap unpivot emits one row per column.

Scale: a single scan with partial (map-side) aggregation — 3·k agg
buffers for k columns, no per-column jobs. COUNT(DISTINCT c1), ...,
COUNT(DISTINCT ck) in one agg expands to k shuffles in Spark's expand
plan; for wide tables at 100 TB pass `approx=True` to use HLL++
(approx_count_distinct), which partial-aggregates in one pass with no
expand. The battery uses exact mode (DuckDB oracle parity needs exact
counts); at production scale approx is the default choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table", "equi_width_histogram"]


def profile_table(
    df: DataFrame, cols: list[str] | None = None, *, approx: bool = False
) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct).

    n_distinct counts distinct non-null values (COUNT(DISTINCT c)
    semantics in both Spark and ANSI SQL). Deterministic output order
    is the caller's sort; the frame itself is unordered.
    """
    cols = list(cols if cols is not None else df.columns)
    distinct_fn = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"))
        aggs.append(distinct_fn(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    # Unpivot the single wide row into one row per column.
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.col("__n").alias("n_rows"), F.explode(pairs).alias("p")).select(
        F.col("p.column").alias("column"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("p.n_nulls").alias("n_nulls"),
        F.col("p.n_distinct").alias("n_distinct"),
    )


def equi_width_histogram(df: DataFrame, col: str, nbins: int = 16) -> DataFrame:
    """Value-distribution histogram of a numeric column: `nbins`
    equal-width buckets over [min, max], one row per non-empty bucket
    with (bucket, bucket_lo, n, frac).

    Two jobs: a min/max aggregate (two scalars to the driver — bounded,
    like any aggregate result) and one map-side-combining groupBy on the
    bucket ordinal, shuffling at most `nbins` rows per task. The bucket
    expression stays JVM-side whole-stage-codegen; NULLs are excluded.

    Determinism: width = (max-min)/nbins, bucket = floor((x-min)/width)
    clamped to nbins-1 — subtraction, division, and floor are
    correctly-rounded IEEE ops, so any engine computing the same
    formula lands every value in the identical bucket (no epsilon
    nudging needed: the boundary cases resolve the same way on every
    IEEE-compliant engine).
    """
    if nbins < 1:
        raise ValueError("nbins must be >= 1")
    x = F.col(col).cast("double")
    lo, hi, n_total = df.select(F.min(x), F.max(x), F.count(x)).first()
    if lo is None:  # all-NULL or empty input → empty histogram
        return (
            df.sparkSession.createDataFrame(
                [], "bucket int, bucket_lo double, n long, frac double"
            )
        )
    if hi == lo:
        width = 1.0  # degenerate range: everything lands in bucket 0
    else:
        width = (hi - lo) / nbins
    bucket = F.least(F.lit(nbins - 1), F.floor((x - F.lit(lo)) / F.lit(width))).cast(
        "int"
    )
    return (
        df.filter(x.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("bucket_lo", F.lit(lo) + F.col("bucket") * F.lit(width))
        .withColumn("frac", F.col("n").cast("double") / F.lit(float(n_total)))
        .select("bucket", "bucket_lo", "n", "frac")
    )
