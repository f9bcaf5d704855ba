"""Dirty-bronze tolerance (ADR-002: the staging layer absorbs whatever
the API returns): corrupt JSON lines, missing keys, wrong-typed scalars
all flow through load_stg without failing the pipeline — bad rows are
quarantined by the P7 null-key filter, good rows land.
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from data_lake_skyfit_spark.operators.normalize import Lakehouse
from data_lake_skyfit_spark.specs import get_spec


def _write_raw(root: str, lines: list[str]) -> None:
    d = os.path.join(
        root, "bronze/evo/entity=prospects/ingestion_date=2026-08-01/run_id=r1"
    )
    os.makedirs(d, exist_ok=True)
    with gzip.open(os.path.join(d, "part-00000.jsonl.gz"), "wt") as f:
        f.write("\n".join(lines) + "\n")


def test_corrupt_and_dirty_lines_absorbed(spark, tmp_path):
    root = str(tmp_path)
    _write_raw(
        root,
        [
            '{"idProspect": 1, "firstName": "Ok", "idBranch": 1}',
            '{"idProspect": 2, "firstName": "AlsoOk", "idBranch": "2"}',  # str-typed id
            "{this is not json at all",  # corrupt line
            '{"idProspect": null, "firstName": "NoKey"}',  # null business key
            '{"firstName": "MissingKey"}',  # absent business key
            '{"idProspect": 3, "registerDate": "not-a-date", "idBranch": 3}',  # bad ts
        ],
    )
    lake = Lakehouse(spark, root)
    lake.run_pipeline(get_spec("evo_prospects"))
    core = lake.read("core", "evo_prospects")
    rows = {r["prospect_id"]: r for r in core.collect()}
    # good rows land; corrupt/keyless rows are dropped, not fatal:
    assert set(rows) == {1, 2, 3}
    assert rows[2]["branch_id"] == 2  # str "2" coerced (P11 try_cast)
    assert rows[3]["register_date"] is None  # bad timestamp → NULL, not error
