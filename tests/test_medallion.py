"""End-to-end medallion pipeline tests on reference-shaped fixtures:
bronze JSONL → STG (dedupe+merge) → CORE (typed + children), exercising
the SURVEY.md §2 operator semantics (W1 latest-wins, J1 explode, J2/J3
array extraction, P3 coalesce fallbacks, P7 null-key filter, P10
custom-fields rescue, P11 safe coercion, K3-K5 merge modes, ADR-004
hash keys, idempotent re-runs)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_lake_skyfit_spark.operators.normalize import Lakehouse
from data_lake_skyfit_spark.specs import get_spec

from . import fixtures


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lake"))
    fixtures.gen_members(root)
    fixtures.gen_sales(root)
    fixtures.gen_entries(root)
    fixtures.gen_prospects(root)
    fixtures.gen_deals(root)
    fixtures.gen_persons(root)
    fixtures.gen_activities(root)
    fixtures.gen_tickets(root)
    return Lakehouse(spark, root)


# ---------------------------------------------------------------------------
# EVO members
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def members_core(lake):
    lake.run_pipeline(get_spec("evo_members"))
    return lake


def test_members_latest_wins(members_core, spark):
    """Run2's newer updateDate must win for overlapping keys (W1)."""
    core = members_core.read("core", "evo_members")
    assert core.count() == 70  # 60 + 10 new, null-key dropped (P7)
    overlap = core.filter(F.col("member_id") == 0).collect()[0]
    assert overlap["update_date"].month == 2  # version-1 record

def test_members_coalesce_and_contacts(members_core):
    core = members_core.read("core", "evo_members")
    rows = {r["member_id"]: r for r in core.collect()}
    # P3: addressNumber vs number alternate keys both land:
    assert rows[2]["address_number"] == "102"
    assert rows[3]["address_number"] == "103"
    # J2: email extracted from contacts type 3/4:
    assert rows[4]["email"] == "m4@example.com"
    assert rows[4]["cellphone"] == "+551190000004"
    # P2/P3 flat-or-nested employee ref:
    assert rows[2]["consultant_employee_id"] == 902
    assert rows[3]["consultant_employee_id"] == 903
    # generated full_name:
    assert rows[5]["full_name"] == "First5 Last5"


def test_members_children_exploded(members_core, spark):
    mm = members_core.read("core", "evo_member_memberships")
    contacts = members_core.read("core", "evo_member_contacts")
    assert mm.count() > 0
    assert contacts.filter(F.col("member_id") == 4).count() == 2
    # child key uniqueness (A5 audit invariant):
    dupes = mm.groupBy("member_id", "member_membership_id").count().filter("count > 1")
    assert dupes.count() == 0


def test_members_idempotent_rerun(members_core):
    """OPERATIONS_GUIDE idempotency contract: re-running the pipeline
    must be a no-op."""
    before = members_core.read("core", "evo_members")
    sum_before = before.agg(F.sum("member_id"), F.count(F.lit(1))).collect()[0]
    members_core.run_pipeline(get_spec("evo_members"))
    after = members_core.read("core", "evo_members")
    assert after.agg(F.sum("member_id"), F.count(F.lit(1))).collect()[0] == sum_before


# ---------------------------------------------------------------------------
# EVO sales / entries / prospects
# ---------------------------------------------------------------------------


def test_sales_children_and_nested(lake):
    lake.run_pipeline(get_spec("evo_sales"))
    core = lake.read("core", "evo_sales")
    assert core.count() == 50
    assert core.filter("removed").count() == 5
    recv = lake.read("core", "evo_receivables")
    r = recv.filter((F.col("sale_id") == 1) & (F.col("receivable_id") == 10)).collect()[0]
    # P2 2-level nested projections:
    assert r["status_name"] == "paid"
    assert r["payment_type_name"] == "credit_card"
    assert str(r["amount"]) == "120.00"


def test_entries_hash_dedupe_and_partitions(lake):
    import os

    lake.run_pipeline(get_spec("evo_entries"))
    core = lake.read("core", "evo_entries")
    n = core.count()
    # exact duplicates collapse onto one 7-field hash (ADR-004):
    assert n == core.select("entry_id").distinct().count()
    assert core.filter(F.col("entry_date").isNull()).count() == 0
    # year partitioning on disk:
    part_dirs = os.listdir(os.path.join(lake.root, "core", "evo_entries"))
    assert any(p.startswith("entry_year=2020") for p in part_dirs)
    assert any(p.startswith("entry_year=2025") for p in part_dirs)


def test_prospects_custom_fields_and_positional(lake):
    lake.run_pipeline(get_spec("evo_prospects"))
    core = lake.read("core", "evo_prospects")
    rows = {r["prospect_id"]: r for r in core.collect()}
    assert rows[0]["is_converted"] is True
    assert rows[1]["is_converted"] is False
    # P4 conditional custom_fields:
    assert rows[3]["custom_fields"] is not None and "crossfit" in rows[3]["custom_fields"]
    assert rows[1]["custom_fields"] is None
    # J3 positional array access:
    assert rows[2]["financial_responsible_name"] == "Resp2"
    assert rows[1]["financial_responsible_name"] is None


# ---------------------------------------------------------------------------
# Pipedrive (multi-scope, custom fields, primary contacts, safe_text)
# ---------------------------------------------------------------------------


def test_deals_scoped_and_custom_fields(lake):
    lake.run_pipeline(get_spec("pd_deals"))
    core = lake.read("core", "pd_deals")
    # (id, scope) keying: same ids in both scopes:
    assert core.count() == 80
    assert core.select("deal_id", "scope").distinct().count() == 80
    row = core.filter((F.col("deal_id") == 4) & (F.col("scope") == "comercial")).collect()[0]
    # P10 rescue: unknown key captured, known keys not duplicated:
    assert row["custom_fields"] is not None
    assert "custom-4" in row["custom_fields"]
    assert "title" not in row["custom_fields"]
    # latest-wins applied per scope (deal 4 is re-sent in run2):
    assert row["update_time"].month == 2


def test_persons_primary_contact(lake):
    lake.run_pipeline(get_spec("pd_persons"))
    core = lake.read("core", "pd_persons")
    rows = {(r["person_id"], r["scope"]): r for r in core.collect()}
    assert rows[(1, "comercial")]["email"] == "pri1@x.com"  # primary=true wins
    assert rows[(3, "comercial")]["email"] == "only3@x.com"  # fallback to first


def test_activities_safe_text(lake):
    lake.run_pipeline(get_spec("pd_activities"))
    core = lake.read("core", "pd_activities")
    rows = {r["activity_id"]: r for r in core.collect()}
    assert rows[0]["due_time"] == "10:00"  # dict unwrapped
    assert rows[1]["due_time"] == "09:00"  # plain string


# ---------------------------------------------------------------------------
# Zendesk (tags DO NOTHING, custom-field DISTINCT ON)
# ---------------------------------------------------------------------------


def test_tickets_children(lake):
    lake.run_pipeline(get_spec("zd_tickets"))
    tags = lake.read("core", "zd_ticket_tags")
    # duplicate 'vip' in the array collapses (J6 seen-set dedupe):
    t1 = tags.filter(F.col("ticket_id") == 1).collect()
    assert sorted(r["tag"] for r in t1) == ["billing", "vip"]
    cf = lake.read("core", "zd_ticket_custom_fields")
    # null/empty values filtered (P9, :780-781):
    assert cf.filter(F.col("field_id") == 2).count() == 0
    assert cf.filter((F.col("ticket_id") == 3) & (F.col("field_id") == 1)).count() == 0
    # DISTINCT ON keep-latest: run2 (version 1) value wins for ticket 0:
    v = cf.filter((F.col("ticket_id") == 0) & (F.col("field_id") == 3)).collect()[0]
    assert v["value"] == "w1"


def test_tickets_latest_wins(lake):
    core = lake.read("core", "zd_tickets")
    assert core.count() == 40
    assert core.filter(F.col("ticket_id") == 0).collect()[0]["updated_at"].month == 2
