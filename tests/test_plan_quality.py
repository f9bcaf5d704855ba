"""Physical-plan assertions for the headline queries — the 100 TB
health checks. A query can be correct and still disastrous at scale;
these tests pin the plan properties that make it scale:

- predicate pushdown reaches the parquet scan (PushedFilters)
- column pruning reaches the scan (ReadSchema ⊂ table schema)
- dim joins broadcast (no shuffle of the fact side)
- aggregations partial-combine (two HashAggregate phases)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_skyfit_spark import queries


@pytest.fixture(scope="module")
def qreg():
    return queries.registry()


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = l.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = _physical(df)
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = l.select("l_orderkey", "l_quantity")
    plan = _physical(df)
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    # untouched wide columns must NOT be read:
    assert "l_comment" not in read_schema
    assert "l_extendedprice" not in read_schema


def test_star_join_broadcasts_all_dims(spark, sf_dir, qreg):
    df = qreg["multiway_star_join"].fn(spark, sf_dir)
    plan = _physical(df)
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan  # the fact side never shuffles for a join


def test_aggregation_partial_combines(spark, sf_dir, qreg):
    df = qreg["pricing_summary"].fn(spark, sf_dir)
    plan = _physical(df)
    # partial + final HashAggregate = map-side combine before the shuffle
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_anti_join_stays_broadcast(spark, sf_dir, qreg):
    df = qreg["orphan_check_anti_join"].fn(spark, sf_dir)
    plan = _physical(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_whole_stage_codegen_covers_scalar_suite(spark, sf_dir, qreg):
    df = qreg["scalar_function_suite"].fn(spark, sf_dir)
    plan = _physical(df)
    # '*(n)' prefixes mark operators fused into a WholeStageCodegen stage
    assert "*(1)" in plan


def test_exact_dedup_shuffles_hash_not_text(spark, sf_dir, qreg):
    """The dedup shuffle must carry the 16-byte hash, not document text."""
    df = qreg["dedup_exact"].fn(spark, sf_dir)
    plan = _physical(df)
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert ex and all("text" not in ln for ln in ex)
