"""Structured-Streaming ingestion for the tiling engine.

The reference is a pure batch program (SURVEY.md §2.10: no streaming
operators exist), so nothing here is parity-critical. This module exists
for the training-data-pipeline axis: a 10^12-image corpus is appended
continuously, and the tile statistics / dedup state must keep up without
full recomputation.

``streaming_tile_counts``: readStream over a parquet directory of point
events → watermarked event-time window → per-(window, tile) counts.
Late data beyond the watermark is dropped deterministically; the
aggregation state is bounded by (windows in flight × tiles touched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.projection import tile_key_sql

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]
)


def streaming_tile_counts(
    spark: SparkSession,
    src_dir: str,
    zoom: int = 8,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """readStream(parquet) → watermark → window × tile_key counts."""
    events = (
        spark.readStream.schema(EVENT_SCHEMA).parquet(src_dir)
    )
    keyed = events.withColumn("tile_key", F.expr(tile_key_sql("lon", "lat", zoom)))
    return (
        keyed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "tile_key")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "tile_key",
            "n",
        )
    )


def run_to_completion(result: DataFrame, query_name: str) -> DataFrame:
    """Drive the streaming query over all currently-available input
    (availableNow) into an in-memory sink and return the sink table —
    the batch-equivalence harness for tests."""
    q = (
        result.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.sql(f"SELECT * FROM {query_name}")
