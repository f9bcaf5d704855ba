"""Streaming → lakehouse bridge: foreachBatch MERGE sink with
AvailableNow. Pins the exactly-once contract — a finished stream
re-run commits nothing new, and newly arriving files merge
idempotently into the keyed table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lake_skyfit_spark.operators.merge import ParquetTable
from data_lake_skyfit_spark.streaming.windowed import stream_merge_sink

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("ver", T.LongType()),
    ]
)


def _land(src_dir: str, name: str, rows: list[tuple[int, str, int]]) -> None:
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, name), "w") as f:
        for i, v, ver in rows:
            f.write(json.dumps({"id": i, "val": v, "ver": ver}) + "\n")


def test_stream_merge_sink_exactly_once(spark, tmp_path):
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    table = ParquetTable(str(tmp_path / "tbl"), ["id"])
    _land(src, "b1.json", [(1, "a", 1), (2, "b", 1)])

    def run():
        stream = spark.readStream.schema(SCHEMA).json(src)
        stream_merge_sink(stream, table, checkpoint_dir=ckpt, source_order=("ver",))

    run()
    assert {r["id"]: r["val"] for r in table.read(spark).collect()} == {1: "a", 2: "b"}

    # Re-run with no new files: checkpoint offsets mean nothing replays.
    run()
    assert table.read(spark).count() == 2

    # New file updates key 2 and adds key 3; duplicate of key 1 replayed
    # with the same version — the keyed MERGE absorbs it (I3).
    _land(src, "b2.json", [(2, "b2", 2), (3, "c", 1), (1, "a", 1)])
    run()
    got = {r["id"]: (r["val"], r["ver"]) for r in table.read(spark).collect()}
    assert got == {1: ("a", 1), 2: ("b2", 2), 3: ("c", 1)}
