"""The reference's documented analytics queries run against a loaded
lake and return sane, internally-consistent results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_skyfit_spark import analytics
from data_lake_skyfit_spark.operators.normalize import Lakehouse
from data_lake_skyfit_spark.specs import get_spec

from . import fixtures


@pytest.fixture(scope="module")
def alake(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("analytics_lake"))
    fixtures.gen_members(root)
    fixtures.gen_sales(root)
    fixtures.gen_entries(root)
    lake = Lakehouse(spark, root)
    for name in ("evo_members", "evo_sales", "evo_entries"):
        lake.run_pipeline(get_spec(name))
    return lake


def test_active_members_by_branch(alake):
    out = analytics.active_members_by_branch(alake).collect()
    assert out
    total_active = sum(r["n_members"] for r in out)
    members = alake.read("core", "evo_members")
    assert total_active == members.filter(F.col("status") == "Active").count()
    # sorted descending:
    counts = [r["n_members"] for r in out]
    assert counts == sorted(counts, reverse=True)


def test_revenue_by_month(alake):
    out = analytics.revenue_by_month(alake).collect()
    assert out
    sales = alake.read("core", "evo_sales").filter("NOT removed")
    items = alake.read("core", "evo_sale_items")
    total = (
        items.join(sales.select("sale_id"), "sale_id", "left_semi")
        .agg(F.sum("sale_value").cast("decimal(18,2)"))
        .collect()[0][0]
    )
    assert sum((r["revenue"] for r in out), start=0) == total
    assert sum(r["n_sales"] for r in out) <= sales.count()


def test_member_retention(alake):
    out = {r["membership_status"]: r for r in analytics.member_retention(alake).collect()}
    mm = alake.read("core", "evo_member_memberships")
    assert sum(r["n_memberships"] for r in out.values()) == mm.count()


def test_entry_channels(alake):
    out = analytics.entry_channels(alake).collect()
    entries = alake.read("core", "evo_entries")
    assert sum(r["n_entries"] for r in out) == entries.count()
    assert {r["channel"] for r in out} <= {"Gympass", "Totalpass", "Direct"}


def test_sketch_stats_error_bounds(spark):
    """The true sketch tier (HLL++ distinct counts, KLL-style quantiles,
    queries.sketch_stats) must track the exact battery query
    (approx_sketch_stats) within its configured error bounds — the
    accuracy contract that justifies swapping sketches in at 100 TB."""
    import os

    from data_lake_skyfit_spark.queries import approx_sketch_stats, sketch_stats

    sf_dir = os.environ.get("SKYFIT_TEST_SF_DIR", "/root/testdata/sf0.001")
    from data_lake_skyfit_spark.tables import load_table

    exact = {r["event_type"]: r for r in approx_sketch_stats(spark, sf_dir).collect()}
    approx = {r["event_type"]: r for r in sketch_stats(spark, sf_dir).collect()}
    assert set(exact) == set(approx)

    values = {
        r["event_type"]: sorted(r["vals"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.collect_list("value").alias("vals"))
        .collect()
    }
    for etype, ex in exact.items():
        ap = approx[etype]
        # HLL++ at rsd=0.02: allow generous sigma plus integer slack on
        # tiny groups.
        assert abs(ap["approx_users"] - ex["n_users"]) <= max(0.1 * ex["n_users"], 5)
        assert ap["n"] == ex["n"]  # exact count unaffected by sketching
        # KLL-style quantiles guarantee bounded RANK error (a tail value
        # one rank off can be far away in VALUE — that is expected):
        # the returned quantile's empirical rank must sit within
        # p·n ± (0.01·n + 2).
        vals, n = values[etype], ex["n"]
        for p, q in zip((0.5, 0.95, 0.99), ap["value_quantiles"]):
            rank = sum(1 for v in vals if v <= q)
            assert abs(rank - p * n) <= 0.01 * n + 2, (etype, p, q, rank)
