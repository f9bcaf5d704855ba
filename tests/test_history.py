"""SCD2 history build and snapshot CDC diff: change compression,
null-safe attribute comparison, interval cutting, insert/delete/update
classification, and plan shape (one exchange for SCD2, hash join — no
nested loop — for the diff)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_lake_skyfit_spark.operators.history import scd2_history, snapshot_diff


def _ts(s):
    return datetime.fromisoformat(s)


def _scd2_rows(spark):
    return spark.createDataFrame(
        [
            # entity 1: A → A (no-op) → B → B (no-op) → A
            (1, 1, _ts("2024-01-01T10:00:00"), "A"),
            (1, 2, _ts("2024-01-01T11:00:00"), "A"),
            (1, 3, _ts("2024-01-01T12:00:00"), "B"),
            (1, 4, _ts("2024-01-01T13:00:00"), "B"),
            (1, 5, _ts("2024-01-01T14:00:00"), "A"),
            # entity 2: NULL → NULL (no-op, null-safe) → C
            (2, 6, _ts("2024-01-02T09:00:00"), None),
            (2, 7, _ts("2024-01-02T10:00:00"), None),
            (2, 8, _ts("2024-01-02T11:00:00"), "C"),
        ],
        "k long, seq long, ts timestamp, state string",
    )


def test_scd2_compresses_and_cuts_intervals(spark):
    h = scd2_history(
        _scd2_rows(spark), ["k"], "ts", ["state"], tie_breakers=["seq"]
    )
    rows = sorted(h.collect(), key=lambda r: (r["k"], r["version"]))
    e1 = [r for r in rows if r["k"] == 1]
    assert [r["state"] for r in e1] == ["A", "B", "A"]
    assert [r["version"] for r in e1] == [1, 2, 3]
    # valid_to of each version == valid_from of the next; last is open
    assert e1[0]["valid_to"] == e1[1]["valid_from"]
    assert e1[1]["valid_to"] == e1[2]["valid_from"]
    assert e1[2]["valid_to"] is None and e1[2]["is_current"]
    assert not e1[0]["is_current"] and not e1[1]["is_current"]
    # NULL → NULL is unchanged (null-safe); NULL → C is a change
    e2 = [r for r in rows if r["k"] == 2]
    assert [r["state"] for r in e2] == [None, "C"]
    assert e2[0]["valid_from"] == _ts("2024-01-02T09:00:00")


def test_scd2_no_compress_keeps_every_observation(spark):
    h = scd2_history(
        _scd2_rows(spark), ["k"], "ts", ["state"],
        tie_breakers=["seq"], compress=False,
    )
    assert h.count() == 8
    assert h.filter(F.col("is_current")).count() == 2  # one open row per entity


def test_scd2_single_exchange(spark):
    h = scd2_history(
        _scd2_rows(spark), ["k"], "ts", ["state"], tie_breakers=["seq"]
    )
    plan = h._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def _snap_frames(spark):
    old = spark.createDataFrame(
        [
            (1, 10.0, "x"),   # unchanged
            (2, 20.0, "x"),   # price update
            (3, 30.0, "x"),   # deleted
            (4, None, "x"),   # NULL → value update
            (5, 50.0, None),  # attr NULL unchanged (null-safe)
        ],
        "k long, price double, status string",
    )
    new = spark.createDataFrame(
        [
            (1, 10.0, "x"),
            (2, 25.0, "x"),
            (4, 40.0, "x"),
            (5, 50.0, None),
            (6, 60.0, "y"),  # inserted
        ],
        "k long, price double, status string",
    )
    return old, new


def test_snapshot_diff_classification(spark):
    old, new = _snap_frames(spark)
    d = snapshot_diff(old, new, ["k"], ["price", "status"])
    got = {r["k"]: r["change_type"] for r in d.collect()}
    assert got == {2: "update", 3: "delete", 4: "update", 6: "insert"}
    row4 = {r["k"]: r for r in d.collect()}[4]
    assert row4["old_price"] is None and row4["new_price"] == 40.0


def test_snapshot_diff_include_unchanged(spark):
    old, new = _snap_frames(spark)
    d = snapshot_diff(old, new, ["k"], ["price", "status"], include_unchanged=True)
    got = {r["k"]: r["change_type"] for r in d.collect()}
    assert got[1] == "unchanged" and got[5] == "unchanged"
    assert len(got) == 6


def test_snapshot_diff_null_key_pairs_up(spark):
    old = spark.createDataFrame([(None, 1.0)], "k long, price double")
    new = spark.createDataFrame([(None, 2.0)], "k long, price double")
    rows = snapshot_diff(old, new, ["k"], ["price"]).collect()
    # eqNullSafe join key: the NULL-key rows pair into ONE update,
    # not a spurious insert+delete pair.
    assert len(rows) == 1 and rows[0]["change_type"] == "update"


def test_snapshot_diff_plan_is_hash_join(spark):
    old, new = _snap_frames(spark)
    d = snapshot_diff(old, new, ["k"], ["price", "status"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
