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


# ---------------------------------------------------------------------------
# Property tests: SCD2 point-in-time reconstruction, diff patch roundtrip
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_EVENT = st.tuples(
    st.integers(min_value=0, max_value=3),    # entity
    st.integers(min_value=0, max_value=20),   # epoch-second offset (ties likely)
    st.sampled_from(["A", "B", "C", None]),   # state
)
_STREAM = st.lists(_EVENT, min_size=1, max_size=25)


@given(stream=_STREAM, probe=st.integers(min_value=-1, max_value=22))
@_SETTINGS
def test_scd2_point_in_time_matches_latest_event(spark, stream, probe):
    rows = [
        (k, seq, datetime.fromtimestamp(86400 + off, tz=None), state)
        for seq, (k, off, state) in enumerate(stream)
    ]
    df = spark.createDataFrame(rows, "k long, seq long, ts timestamp, state string")
    h = scd2_history(df, ["k"], "ts", ["state"], tie_breakers=["seq"]).collect()
    t = datetime.fromtimestamp(86400 + probe, tz=None)
    for k in {r[0] for r in rows}:
        # expected: state of the latest event at-or-before t (ties: max seq)
        past = [(ts, seq, s) for (kk, seq, ts, s) in rows if kk == k and ts <= t]
        want = max(past)[2] if past else None
        have = [
            r["state"]
            for r in h
            if r["k"] == k
            and r["valid_from"] <= t
            and (r["valid_to"] is None or t < r["valid_to"])
        ]
        if past:
            assert len(have) == 1 and have[0] == want, (k, t, have, want)
        else:
            assert have == []
        # interval chain invariant: versions tile [first_ts, ∞) gaplessly
        ivs = sorted(
            [r for r in h if r["k"] == k], key=lambda r: r["version"]
        )
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
        if ivs:
            assert ivs[-1]["valid_to"] is None


_SNAP_ROW = st.tuples(
    st.integers(min_value=0, max_value=8),
    st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
)


def _dedup(rows):
    return list({k: (k, v) for k, v in rows}.values())


@given(old=st.lists(_SNAP_ROW, max_size=10), new=st.lists(_SNAP_ROW, max_size=10))
@_SETTINGS
def test_snapshot_diff_patch_roundtrip(spark, old, new):
    old, new = _dedup(old), _dedup(new)
    o = spark.createDataFrame(old, "k long, v long") if old else spark.createDataFrame([], "k long, v long")
    n = spark.createDataFrame(new, "k long, v long") if new else spark.createDataFrame([], "k long, v long")
    diff = snapshot_diff(o, n, ["k"], ["v"]).collect()
    # apply the diff to old → must reconstruct new exactly
    state = {k: v for k, v in old}
    for r in diff:
        if r["change_type"] == "delete":
            del state[r["k"]]
        else:
            assert r["change_type"] in ("insert", "update")
            state[r["k"]] = r["new_v"]
    assert state == {k: v for k, v in new}


def test_point_in_time_join_no_future_leakage(spark):
    from data_lake_skyfit_spark.operators.history import (
        point_in_time_join,
        scd2_history,
    )

    stream = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01T10:00:00"), "A"),
            (1, 2, _ts("2024-01-01T12:00:00"), "B"),
        ],
        "k long, seq long, ts timestamp, state string",
    )
    h = scd2_history(stream, ["k"], "ts", ["state"], tie_breakers=["seq"]).select(
        "k", "state", "valid_from", "valid_to"
    )
    facts = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-01T09:00:00")),  # before first change → NULL
            (101, 1, _ts("2024-01-01T10:00:00")),  # boundary: inclusive from
            (102, 1, _ts("2024-01-01T11:59:59")),  # still A
            (103, 1, _ts("2024-01-01T12:00:00")),  # boundary: B from 12:00
            (104, 2, _ts("2024-01-01T12:00:00")),  # unknown key → NULL
        ],
        "fact_id long, k long, ts timestamp",
    )
    out = point_in_time_join(facts, h, ["k"], state_cols=["state"])
    got = {r["fact_id"]: r["state"] for r in out.collect()}
    assert got == {100: None, 101: "A", 102: "A", 103: "B", 104: None}
    assert out.count() == 5  # disjoint intervals: no fact row duplicated


def test_scd2_colliding_timestamps_deterministic_without_tie_breaker(spark):
    """VERDICT r2 #4: with no tie_breakers, colliding timestamps must
    still yield deterministic versions (content-hash default ordering).
    Same rows in shuffled input orders → identical histories."""
    from data_lake_skyfit_spark.operators.history import scd2_history

    rows = [
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 00:00:00", "b"),  # collides with 'a'
        (1, "2024-01-01 00:00:00", "c"),  # and with both
        (1, "2024-01-02 00:00:00", "d"),
        (2, "2024-01-01 00:00:00", "x"),
        (2, "2024-01-01 00:00:00", "y"),
    ]
    schema = "id long, ts string, state string"

    def build(order):
        df = spark.createDataFrame([rows[i] for i in order], schema).withColumn(
            "ts", F.to_timestamp("ts")
        )
        out = scd2_history(df, ["id"], "ts", ["state"])
        return sorted(
            (r["id"], r["state"], r["version"], str(r["valid_from"]), str(r["valid_to"]))
            for r in out.collect()
        )

    a = build(range(6))
    b = build([5, 3, 1, 4, 0, 2])
    c = build([2, 0, 4, 1, 3, 5])
    assert a == b == c
    # versions within an entity are a contiguous 1..n ranking
    per_entity = {}
    for rid, _, v, _, _ in a:
        per_entity.setdefault(rid, []).append(v)
    assert sorted(per_entity[1]) == [1, 2, 3, 4]
    assert sorted(per_entity[2]) == [1, 2]


def test_scd2_default_tiebreaker_tolerates_map_columns(spark):
    """code-review r3: xxhash64 can't hash MapType; the default
    tie-breaker must skip map columns instead of failing analysis."""
    from data_lake_skyfit_spark.operators.history import scd2_history

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "a", {"k": "v"}),
         (1, "2024-01-02 00:00:00", "b", {"k": "w"})],
        "id long, ts string, state string, props map<string,string>",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = scd2_history(df, ["id"], "ts", ["state"]).collect()
    assert sorted(r["version"] for r in out) == [1, 2]
