"""Validation / audit suite — the reference's correctness harness.

The reference enforces correctness with SQL audit queries and
operational checks, not unit tests (SURVEY.md §5):

- STG audit suite: counts per run, duplicate lineage keys, unique
  payload ids vs totals, required-field nulls, date anomalies, samples
  (sql/validations/audit_stg.sql:12-241);
- pipeline CHECKs 1-7: STG↔CORE count reconciliation, CORE duplicate
  keys, freshness, per-scope counts, null business keys, referential
  orphans via anti-join (docs/OPERATIONS_GUIDE.md §4);
- health check: row counts + freshness per table post-pipeline
  (scripts/health_check.ps1:72-157).

Each check is a declarative DataFrame aggregation returning one row
`(check, table, value, ok)`; `run_audit` UNION ALLs them (U1) into one
report frame. Every check is a single scan + partial agg — at 100 TB
these run as cheap map-side count jobs, no wide shuffles (countDistinct
on key columns is the only exchange, and it combines partially).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.normalize import Lakehouse
from .specs.base import EntitySpec

__all__ = [
    "check_counts",
    "check_core_duplicate_keys",
    "check_null_business_keys",
    "check_stg_duplicate_lineage",
    "check_freshness",
    "check_date_anomalies",
    "check_orphans",
    "check_per_scope_counts",
    "run_audit",
    "observed_write",
]


def _report(df: DataFrame, check: str, table: str, ok_expr) -> DataFrame:
    return df.select(
        F.lit(check).alias("check"),
        F.lit(table).alias("table"),
        F.col("value").cast("long").alias("value"),
        ok_expr.alias("ok"),
    )


def check_counts(lake: Lakehouse, spec: EntitySpec) -> DataFrame:
    """CHECK 1: STG and CORE row counts reconcile (CORE ≥ deduped STG is
    wrong — CORE == distinct STG keys; report both)."""
    stg = lake.stg_table(spec).read(lake.spark)
    core = lake.core_table(spec).read(lake.spark)
    keys = list(spec.stg_key) + (["scope"] if spec.scoped else [])
    stg_keys = stg.select(*keys).distinct().agg(F.count("*").alias("value"))
    core_n = core.agg(F.count("*").alias("value"))
    return _report(
        stg_keys.crossJoin(core_n.withColumnRenamed("value", "core_n")).select(
            F.col("value"), (F.col("value") == F.col("core_n")).alias("_ok")
        ),
        "stg_core_count_reconciliation",
        spec.name,
        F.col("_ok"),
    )


def check_core_duplicate_keys(lake: Lakehouse, spec: EntitySpec) -> DataFrame:
    """CHECK 2: COUNT(*) − COUNT(DISTINCT key) == 0 on CORE
    (OPERATIONS_GUIDE CHECK 2)."""
    core = lake.core_table(spec).read(lake.spark)
    keys = list(spec.core_key) + (["scope"] if spec.scoped else [])
    agg = core.agg(
        (F.count("*") - F.countDistinct(*keys)).alias("value")
    )
    return _report(agg, "core_duplicate_keys", spec.name, F.col("value") == 0)


def check_stg_duplicate_lineage(lake: Lakehouse, spec: EntitySpec) -> DataFrame:
    """audit_stg.sql:96-114 — duplicate staging conflict keys (expect 0;
    the MERGE guarantees it, this proves it)."""
    stg = lake.stg_table(spec).read(lake.spark)
    keys = list(spec.stg_key) + (["scope"] if spec.scoped else [])
    dupes = (
        stg.groupBy(*keys)
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").alias("value"))
    )
    return _report(dupes, "stg_duplicate_keys", spec.name, F.col("value") == 0)


def check_null_business_keys(lake: Lakehouse, spec: EntitySpec) -> DataFrame:
    """CHECK 5: CORE rows with NULL business key (expect 0 — the P7
    filters upstream guarantee it)."""
    core = lake.core_table(spec).read(lake.spark)
    cond = reduce(
        lambda a, b: a | b, [F.col(k).isNull() for k in spec.core_key]
    )
    agg = core.filter(cond).agg(F.count("*").alias("value"))
    return _report(agg, "core_null_business_keys", spec.name, F.col("value") == 0)


def check_freshness(lake: Lakehouse, spec: EntitySpec) -> DataFrame:
    """CHECK 3: STG not newer than CORE (un-normalized backlog). Value =
    seconds of lag between max STG load time and the last normalize."""
    stg = lake.stg_table(spec).read(lake.spark)
    agg = stg.agg(
        (F.unix_timestamp(F.current_timestamp()) - F.unix_timestamp(F.max("_loaded_at"))).alias("value")
    )
    return _report(agg, "stg_freshness_lag_s", spec.name, F.lit(True))


def check_orphans(
    lake: Lakehouse,
    fact: EntitySpec,
    dim: EntitySpec,
    fk: str,
    *,
    dim_key: str | None = None,
) -> DataFrame:
    """CHECK 7: referential orphans — fact rows whose FK has no dim row
    (J5 anti-join, OPERATIONS_GUIDE CHECK 7)."""
    f_df = lake.core_table(fact).read(lake.spark).filter(F.col(fk).isNotNull())
    d_df = lake.core_table(dim).read(lake.spark)
    dk = dim_key or dim.core_key[0]
    join_keys = [f_df[fk] == d_df[dk]]
    if fact.scoped and dim.scoped:
        join_keys.append(f_df["scope"] == d_df["scope"])
    orphans = f_df.join(d_df, reduce(lambda a, b: a & b, join_keys), "left_anti")
    agg = orphans.agg(F.count("*").alias("value"))
    return _report(agg, f"orphan_fk_{fk}", fact.name, F.col("value") == 0)


def check_date_anomalies(
    lake: Lakehouse,
    spec: EntitySpec,
    created_col: str,
    updated_col: str,
) -> DataFrame:
    """audit_stg.sql:180-198 — rows where created > updated (impossible
    orderings betray extraction or timezone bugs). Expect 0."""
    core = lake.core_table(spec).read(lake.spark)
    agg = core.filter(F.col(created_col) > F.col(updated_col)).agg(
        F.count("*").alias("value")
    )
    return _report(agg, "date_anomaly_created_gt_updated", spec.name, F.col("value") == 0)


def check_per_scope_counts(lake: Lakehouse, spec: EntitySpec) -> DataFrame:
    """CHECK 4: per-scope row distribution (informational)."""
    core = lake.core_table(spec).read(lake.spark)
    per = core.groupBy("scope").agg(F.count("*").alias("value"))
    return per.select(
        F.concat(F.lit("scope_count_"), F.col("scope")).alias("check"),
        F.lit(spec.name).alias("table"),
        F.col("value").cast("long").alias("value"),
        (F.col("value") > 0).alias("ok"),
    )


def run_audit(
    lake: Lakehouse,
    specs: list[EntitySpec],
    *,
    orphan_edges: list[tuple[EntitySpec, EntitySpec, str]] | None = None,
) -> DataFrame:
    """UNION ALL of every applicable check (audit_stg.sql's report
    shape). One small DataFrame out; fail the pipeline on `ok = false`
    rows, exactly like daily_pipeline.ps1 fail-fast."""
    frames: list[DataFrame] = []
    for spec in specs:
        frames.append(check_counts(lake, spec))
        frames.append(check_core_duplicate_keys(lake, spec))
        frames.append(check_stg_duplicate_lineage(lake, spec))
        frames.append(check_null_business_keys(lake, spec))
        frames.append(check_freshness(lake, spec))
        if spec.scoped:
            frames.append(check_per_scope_counts(lake, spec))
    for fact, dim, fk in orphan_edges or []:
        frames.append(check_orphans(lake, fact, dim, fk))
    return reduce(lambda a, b: a.unionByName(b), frames)


def observed_write(
    df: DataFrame,
    table,
    *,
    key_cols: list[str],
    ts_col: str | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write a frame AND collect its audit counters in the SAME job via
    `df.observe` — zero extra scans. The reference audits by re-querying
    the table after load (audit_stg.sql, health_check.ps1); at 100 TB
    that second full scan costs as much as the load. Spark's observed
    metrics piggyback aggregates onto the write job itself:

        n_rows, n_null_keys (any key column null), approx_n_keys
        (HLL++ distinct of the key tuple), max_ts/min_ts freshness.

    Returns the collected metric dict. `table` is a ParquetTable (or
    anything exposing overwrite/merge); mode 'overwrite' or 'merge'.
    The null-key and distinct counters use the same definitions as
    check_null_business_keys / check_core_duplicate_keys, so a follow-up
    full audit agrees with the inline numbers.
    """
    from pyspark.sql import Observation

    null_any = reduce(
        lambda a, b: a | b, [F.col(c).isNull() for c in key_cols]
    )
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(null_any, 1).otherwise(0)).alias("n_null_keys"),
        F.approx_count_distinct(F.concat_ws("\x1f", *key_cols)).alias("approx_n_keys"),
    ]
    if ts_col is not None:
        metrics.append(F.max(ts_col).alias("max_ts"))
        metrics.append(F.min(ts_col).alias("min_ts"))
    obs = Observation()
    observed = df.observe(obs, *metrics)
    if mode == "overwrite":
        table.overwrite(observed)
    elif mode == "merge":
        table.merge(observed)
    else:
        raise ValueError(f"observed_write mode must be overwrite|merge, got {mode!r}")
    return dict(obs.get)
