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

__all__ = ["profile_table"]


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
