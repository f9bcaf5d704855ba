"""Scale-operator tests: salted joins/aggregations match their plain
equivalents, and bucketed tables join without a shuffle (verified on
the physical plan, not just the result).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_skyfit_spark.operators import scale


@pytest.fixture()
def skewed_events(spark):
    # 10k rows, 90% on one hot key — the shape that melts a plain shuffle.
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 3).alias("v"),
    )


@pytest.fixture()
def dim(spark):
    return spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("name-"), F.col("id")).alias("name")
    )


def test_salted_join_matches_plain_join(spark, skewed_events, dim):
    plain = skewed_events.join(dim, "k").agg(
        F.count(F.lit(1)), F.sum("v"), F.countDistinct("name")
    ).collect()[0]
    salted = scale.salted_join(skewed_events, dim, ["k"], buckets=8).agg(
        F.count(F.lit(1)), F.sum("v"), F.countDistinct("name")
    ).collect()[0]
    assert salted == plain


def test_salted_join_left_outer(spark, skewed_events, dim):
    sparse_dim = dim.filter(F.col("k") < 50)
    plain = (
        skewed_events.join(sparse_dim, "k", "left")
        .agg(F.count(F.lit(1)), F.count("name"))
        .collect()[0]
    )
    salted = (
        scale.salted_join(skewed_events, sparse_dim, ["k"], buckets=4, how="left")
        .agg(F.count(F.lit(1)), F.count("name"))
        .collect()[0]
    )
    assert salted == plain


def test_salted_count_distinct(spark, skewed_events):
    exact = {
        r["k"]: r["n"]
        for r in skewed_events.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {
        r["k"]: r["n_distinct"]
        for r in scale.salted_count_distinct(skewed_events, ["k"], "v").collect()
    }
    assert salted == exact


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    facts = spark.range(5_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    dims = spark.range(500).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    scale.write_bucketed(facts, "t_facts_b", ["k"], buckets=8, path=str(tmp_path / "f"))
    scale.write_bucketed(dims, "t_dims_b", ["k"], buckets=8, path=str(tmp_path / "d"))
    try:
        f, d = spark.table("t_facts_b"), spark.table("t_dims_b")
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = f.join(d, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_facts_b")
        spark.sql("DROP TABLE IF EXISTS t_dims_b")
