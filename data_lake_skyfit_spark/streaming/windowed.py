"""Structured Streaming operators.

The reference has no true streaming — its incremental story is
watermark/cursor micro-batch extraction (SURVEY.md §2.9). Here the
idiomatic Spark analogs: a file-source stream processed with
Trigger.AvailableNow (the exact semantics of the reference's
"drain everything new, then stop" runs — pipedrive_bronze.py:203-240),
windowed event-time aggregation with a late-data watermark, and a
memory-sink runner that lets batch tests and the driver's collect()
consume the final result.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["events_stream", "hourly_event_counts", "run_stream_to_table"]

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # parquet TIMESTAMP(NANOS) read as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with event-time restored to a
    proper timestamp (see tables.load_table for the nanos rationale)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file-stream source requires a directory: stream the sf dir with
    # a glob pinned to the events table.
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_stream_to_table(stream_df: DataFrame, *, output_mode: str = "complete") -> DataFrame:
    """Drive a streaming aggregation to completion with AvailableNow
    semantics and return the materialized result as a batch DataFrame."""
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)


def hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type.

    The 10-minute watermark bounds state for late data on a live
    stream; with AvailableNow it is semantically a no-op but keeps the
    query deployable unchanged against an unbounded source.
    """
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(15,2)")).cast("decimal(18,2)").alias("total_value"),
        )
    )
    out = run_stream_to_table(agg)
    return out.select(
        F.col("win.start").cast("timestamp_ntz").alias("hour_start"),
        "event_type",
        "n",
        "total_value",
    )
