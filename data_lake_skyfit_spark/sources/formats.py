"""Interchange-format sources/sinks: CSV and ORC round-trips.

The reference ingests REST JSON and lands gzipped JSONL
(`sources/bronze.py`, `sources/rest.py`); real lakes also exchange CSV
(the lowest-common-denominator export format) and ORC (the other
columnar standard next to parquet). Spark reads/writes both natively —
this module pins the LOSSLESS round-trip conventions, because CSV is
where silent corruption happens:

- **Schema is always explicit on read** — inferSchema is a full extra
  pass over the data at 100 TB and can flip types between rounds.
- **Timestamps** are written/parsed with an explicit micros pattern
  (`yyyy-MM-dd HH:mm:ss.SSSSSS`) pinned via BOTH `timestampFormat`
  and `timestampNTZFormat`: parquet TIMESTAMP(isAdjustedToUTC=false)
  loads as TIMESTAMP_NTZ, and the CSV writer silently uses the NTZ
  default pattern (`yyyy-MM-dd'T'HH:mm:ss[.SSS]` — millis!) for those
  columns if only `timestampFormat` is set, truncating micros on the
  way out. UTC session + fixed pattern on both type flavors ⇒
  microsecond-exact round-trip.
- **Doubles survive textually**: Spark writes Java `Double.toString`
  (the shortest representation that parses back to the identical
  bits), so value columns round-trip bit-exactly without any decimal
  staging.
- **Corrupt rows**: PERMISSIVE mode + `columnNameOfCorruptRecord`
  quarantines malformed lines instead of failing the job (pinned in
  tests/test_formats.py); FAILFAST is for gated landing zones.
- ORC round-trips are lossless by type; the writer inherits the
  partitioning of the frame, so a `repartition(n)` before write
  controls file counts exactly like the parquet sinks.

Scale: both formats are splittable as written here (CSV uncompressed
or with a splittable codec; ORC by stripe), so a 1000-executor read
parallelizes by input split — the read path has no driver-side
listing beyond Spark's normal file index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["write_csv", "read_csv", "write_orc", "read_orc", "TS_FMT"]

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str, *, header: bool = True, sep: str = ",") -> None:
    (
        df.write.mode("overwrite")
        .option("header", header)
        .option("sep", sep)
        .option("timestampFormat", TS_FMT)
        .option("timestampNTZFormat", TS_FMT)
        .option("emptyValue", "")
        .csv(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    header: bool = True,
    sep: str = ",",
    mode: str = "FAILFAST",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Schema-enforced CSV read. ``mode='PERMISSIVE'`` with
    ``corrupt_col`` quarantines malformed lines into that column
    (add it to the schema as STRING)."""
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("timestampFormat", TS_FMT)
        .option("timestampNTZFormat", TS_FMT)
        .option("mode", mode)
    )
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.schema(schema).csv(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
