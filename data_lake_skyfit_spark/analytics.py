"""The reference's documented analytics queries over CORE tables.

These are the queries the reference ships as its analytical surface
(docs/evo/EVO_DATA_MODEL.md): active members by branch (:324-331),
revenue by month (:335-344), member retention via membership join
(:349-354), entry channel distribution (:369-381). A reference user
switching engines runs these verbatim shapes against the Lakehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.normalize import Lakehouse

__all__ = [
    "active_members_by_branch",
    "revenue_by_month",
    "member_retention",
    "entry_channels",
]


def active_members_by_branch(lake: Lakehouse) -> DataFrame:
    """EVO_DATA_MODEL.md:324-331 — the §7.2 minimum-slice query."""
    m = lake.read("core", "evo_members")
    return (
        m.filter(F.col("status") == "Active")
        .groupBy("branch_name")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), "branch_name")
    )


def revenue_by_month(lake: Lakehouse) -> DataFrame:
    """EVO_DATA_MODEL.md:335-344: monthly revenue over non-removed
    sales — DATE_TRUNC bucket, SUM(money) from the sale items fact,
    distinct buyers. Items join their parent sale for date/removed
    (item rows ≫ sales, so sales is the broadcast side at scale)."""
    s = lake.read("core", "evo_sales").select(
        "sale_id", "sale_date", "removed", "member_id"
    )
    items = lake.read("core", "evo_sale_items")
    return (
        items.join(F.broadcast(s), "sale_id")
        .filter(~F.coalesce(F.col("removed"), F.lit(False)))
        .groupBy(F.date_trunc("month", F.col("sale_date")).alias("month"))
        .agg(
            F.sum("sale_value").cast("decimal(18,2)").alias("revenue"),
            F.countDistinct("member_id").alias("n_buyers"),
            F.countDistinct("sale_id").alias("n_sales"),
        )
        .orderBy("month")
    )


def member_retention(lake: Lakehouse) -> DataFrame:
    """EVO_DATA_MODEL.md:349-354: members joined to their memberships
    (J4 dim⋈fact), per-status membership counts."""
    m = lake.read("core", "evo_members").select("member_id", "full_name")
    mm = lake.read("core", "evo_member_memberships")
    return (
        mm.join(F.broadcast(m), "member_id")
        .groupBy("membership_status")
        .agg(
            F.countDistinct("member_id").alias("n_members"),
            F.count(F.lit(1)).alias("n_memberships"),
        )
    )


def entry_channels(lake: Lakehouse) -> DataFrame:
    """EVO_DATA_MODEL.md:369-381 — A7 conditional bucketing: classify
    entries into Gympass / Totalpass / Direct channels, then count."""
    e = lake.read("core", "evo_entries")
    device = F.coalesce(F.col("device"), F.lit(""))
    channel = (
        F.when(F.lower(device).contains("gympass"), F.lit("Gympass"))
        .when(F.lower(device).contains("totalpass"), F.lit("Totalpass"))
        .otherwise(F.lit("Direct"))
    )
    return (
        e.groupBy(channel.alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_entries"))
        .orderBy(F.desc("n_entries"))
    )
