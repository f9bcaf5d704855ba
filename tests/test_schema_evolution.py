"""Additive schema evolution through the MERGE path — the reference's
`add_missing_columns.sql` story: a source batch with a new column
evolves the target; old rows read NULL; a source batch missing columns
upserts with NULLs for the absent fields.
"""

from __future__ import annotations

from data_lake_skyfit_spark.operators.merge import ParquetTable


def test_merge_adds_new_source_column(spark, tmp_path):
    t = ParquetTable(str(tmp_path / "t"), ["id"])
    t.merge(spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string"))
    # New batch carries an extra column:
    t.merge(
        spark.createDataFrame(
            [(2, "b2", 9.5), (3, "c", 1.0)], "id long, name string, score double"
        )
    )
    rows = {r["id"]: r for r in t.read(spark).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["score"] is None  # old row: evolved column backfills NULL
    assert rows[2]["score"] == 9.5 and rows[2]["name"] == "b2"


def test_merge_tolerates_missing_source_column(spark, tmp_path):
    t = ParquetTable(str(tmp_path / "t2"), ["id"])
    t.merge(
        spark.createDataFrame([(1, "a", 5.0)], "id long, name string, score double")
    )
    # Next batch lacks `score` entirely (API dropped a field — ADR-002):
    t.merge(spark.createDataFrame([(1, "a1"), (4, "d")], "id long, name string"))
    rows = {r["id"]: r for r in t.read(spark).collect()}
    assert rows[1]["name"] == "a1" and rows[1]["score"] is None
    assert rows[4]["score"] is None


def test_events_ts_unit_rejects_non_timestamp_encoding(tmp_path):
    """ADVICE r2: an un-annotated INT64 ts must fail loudly at sniff
    time, not silently cast epoch-nanos as epoch-seconds."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from data_lake_skyfit_spark.tables import events_ts_unit

    pq.write_table(
        pa.table({"ts": pa.array([1, 2], type=pa.int64())}),
        str(tmp_path / "events.parquet"),
    )
    with pytest.raises(TypeError, match="non-timestamp"):
        events_ts_unit(str(tmp_path))


def test_events_ts_unit_current_testdata():
    from data_lake_skyfit_spark.tables import events_ts_unit

    assert events_ts_unit("/root/testdata/sf0.01") in ("s", "ms", "us", "ns")
