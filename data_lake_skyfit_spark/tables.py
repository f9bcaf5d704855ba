"""Test-data table loading.

The driver provides deterministic TPC-H-ish parquet tables (see
/root/repo/TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
an sf directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a test table, normalizing physical quirks.

    The events table stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
    Spark 4 rejects by default. We read nanos as long (runtime-settable
    legacy conf) and convert to TIMESTAMP_NTZ at microsecond precision
    with *integer* division — epoch-nanos exceed double precision, so a
    float path would corrupt microseconds.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        return df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
