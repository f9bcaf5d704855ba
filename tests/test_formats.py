"""CSV/ORC interchange: lossless round-trips and corrupt-row
quarantine (sources/formats.py)."""

from __future__ import annotations

import datetime
import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_lake_skyfit_spark.sources import formats


@pytest.fixture()
def tmp_root():
    root = tempfile.mkdtemp(prefix="skyfit_fmt_test_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 7, 179575), "a,b\"quoted\"", 0.1 + 0.2),
    (2, datetime.datetime(2024, 1, 2, 23, 59, 59, 999999), None, 6.55),
    (3, None, "", 1e-300),
]
SCHEMA = "id BIGINT, ts TIMESTAMP_NTZ, s STRING, v DOUBLE"


def test_csv_roundtrip_is_lossless(spark, tmp_root):
    df = spark.createDataFrame(ROWS, SCHEMA)
    formats.write_csv(df, f"{tmp_root}/csv")
    back = formats.read_csv(spark, f"{tmp_root}/csv", SCHEMA)
    got = sorted(map(tuple, back.collect()))
    want = sorted(map(tuple, df.collect()))
    # Timestamps microsecond-exact, doubles bit-exact (0.30000000000000004
    # survives), quotes/commas survive quoting. Caveat pinned here: CSV
    # cannot distinguish NULL from empty string under emptyValue="" —
    # the "" row comes back as NULL (use parquet/ORC when that matters).
    want = [(3, None, None, 1e-300) if r[0] == 3 else r for r in want]
    assert got == want


def test_orc_roundtrip_preserves_null_vs_empty(spark, tmp_root):
    df = spark.createDataFrame(ROWS, SCHEMA)
    formats.write_orc(df, f"{tmp_root}/orc")
    back = formats.read_orc(spark, f"{tmp_root}/orc")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert back.schema == df.schema


def _inject_line(csv_dir: str, line: str) -> None:
    """Append a malformed line to one part file, dropping the Hadoop
    local-FS .crc sidecar so the tamper isn't masked by a checksum
    error before the parser even sees the line."""
    [part] = [p for p in glob.glob(f"{csv_dir}/part-*.csv") if os.path.getsize(p)][:1]
    with open(part, "a") as fh:
        fh.write(line)
    crc = os.path.join(os.path.dirname(part), f".{os.path.basename(part)}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_csv_permissive_quarantines_corrupt_rows(spark, tmp_root):
    df = spark.createDataFrame(ROWS, SCHEMA)
    formats.write_csv(df, f"{tmp_root}/csv")
    _inject_line(f"{tmp_root}/csv", "notanint,alsonotatimestamp,x,notadouble\n")
    back = formats.read_csv(
        spark,
        f"{tmp_root}/csv",
        SCHEMA + ", _corrupt STRING",
        mode="PERMISSIVE",
        corrupt_col="_corrupt",
    )
    back = back.cache()
    bad = back.filter(F.col("_corrupt").isNotNull()).collect()
    assert len(bad) == 1 and bad[0]._corrupt.startswith("notanint")
    assert back.filter(F.col("_corrupt").isNull()).count() == len(ROWS)
    back.unpersist()


def test_csv_failfast_raises_on_corrupt_rows(spark, tmp_root):
    df = spark.createDataFrame(ROWS, SCHEMA)
    formats.write_csv(df, f"{tmp_root}/csv")
    _inject_line(f"{tmp_root}/csv", "junk,junk,junk,junk\n")
    with pytest.raises(Exception, match="MALFORMED|FAILED_READ"):
        formats.read_csv(spark, f"{tmp_root}/csv", SCHEMA).collect()


def test_csv_custom_separator_and_headerless(spark, tmp_root):
    df = spark.createDataFrame(ROWS, SCHEMA)
    formats.write_csv(df, f"{tmp_root}/csv", header=False, sep="\t")
    back = formats.read_csv(spark, f"{tmp_root}/csv", SCHEMA, header=False, sep="\t")
    assert back.count() == len(ROWS)
