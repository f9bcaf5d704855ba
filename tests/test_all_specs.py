"""Every registered entity spec runs end-to-end — no spec ships with an
unexecuted column map. Each of the 17 entities goes bronze→STG→CORE and
must produce rows with a duplicate-free business key; dims then satisfy
the fact FKs (full referential closure of the catalog).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_skyfit_spark.operators.normalize import Lakehouse
from data_lake_skyfit_spark.pipeline import run_daily
from data_lake_skyfit_spark.specs import get_spec, spec_registry

from . import fixtures


@pytest.fixture(scope="module")
def full_lake(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("all_specs_lake"))
    for gen in (
        fixtures.gen_members,
        fixtures.gen_sales,
        fixtures.gen_entries,
        fixtures.gen_prospects,
        fixtures.gen_deals,
        fixtures.gen_persons,
        fixtures.gen_activities,
        fixtures.gen_tickets,
        fixtures.gen_pd_dims,
        fixtures.gen_zd_dims,
    ):
        gen(root)
    lake = Lakehouse(spark, root)
    result = run_daily(lake)
    assert not result.skipped, f"entities without bronze: {result.skipped}"
    assert result.ok, f"audit failures: {result.failed_checks}"
    return lake


@pytest.mark.parametrize("name", sorted(spec_registry()))
def test_spec_end_to_end(full_lake, name):
    spec = get_spec(name)
    core = full_lake.read("core", name)
    n = core.count()
    assert n > 0, f"{name}: CORE empty"
    keys = list(spec.core_key) + (["scope"] if spec.scoped else [])
    assert core.select(*keys).distinct().count() == n, f"{name}: duplicate keys"
    # every declared CORE column materialized:
    expected = set(spec.columns().keys()) | set(keys)
    assert expected <= set(core.columns), (
        f"{name}: missing columns {expected - set(core.columns)}"
    )


def test_dim_fact_closure(full_lake):
    """Facts resolve against the now-present dims (CHECK 7 across the
    whole catalog)."""
    deals = full_lake.read("core", "pd_deals")
    stages = full_lake.read("core", "pd_stages")
    orphan_stage = deals.join(
        stages,
        (deals.stage_id == stages.stage_id) & (deals.scope == stages.scope),
        "left_anti",
    )
    assert orphan_stage.count() == 0

    zd_users = full_lake.read("core", "zd_users")
    zd_orgs = full_lake.read("core", "zd_organizations")
    orphan_org = zd_users.filter(F.col("organization_id").isNotNull()).join(
        zd_orgs, "organization_id", "left_anti"
    )
    assert orphan_org.count() == 0
