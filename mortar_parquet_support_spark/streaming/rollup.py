"""Structured Streaming rollups over the lake / event streams.

The reference's ``to_batches`` (client.py:65-72) is pull-based pagination,
not stream processing (SURVEY.md §2.6) — this module provides the real
thing for the north-star scope: an incremental windowed rollup with
watermarked late-data handling that runs identically over a file stream
(incremental lake ingest) or any other Structured Streaming source.

Scale shape: the streaming aggregation state is keyed on
(key, window) — the same partitioning as the batch rollup — and the
watermark bounds state size; ``availableNow`` drives catch-up batches
through the same plan, so a backfill and live tailing share one code path.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_rollup_stream(
    events, *, ts: str = "ts", key: str = "event_type",
    bucket: str = "15 minutes", watermark: str = "1 hour", value: str = "value",
):
    """Streaming DataFrame -> watermarked windowed aggregate (append-able)."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.window(F.col(ts), bucket).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value).alias("sum_value"),
        )
        .select(key, F.col("w.start").alias("bucket"), "n", "sum_value")
    )


def stream_rollup_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the streaming rollup to completion over the events parquet with
    availableNow + a memory sink; returns the final aggregate as a batch
    DataFrame. (events.ts is ns — the streaming reader gets the same
    nanosAsLong + rebuild treatment as the batch loader.)"""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema  # raw: ts as long
    # the directory holds all tables; restrict to the events file pattern
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # watermarks require TIMESTAMP (not NTZ): rebuild as absolute µs instants
    ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    agg = windowed_rollup_stream(ev)
    name = "mortar_stream_rollup_" + next(tempfile._get_candidate_names())  # unique sink
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    return out.select(
        "event_type",
        "bucket",
        F.col("n").cast("long").alias("n"),
        F.round("sum_value", 2).alias("sum_value"),
    )
