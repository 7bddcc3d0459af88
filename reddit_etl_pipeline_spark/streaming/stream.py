"""Structured Streaming surface.

The reference is daily batch (SURVEY.md §2.9 — streaming is an explicit
future enhancement, reference README.md:108). The engine exposes the same
relations as streams: file-source ``readStream`` over the lake, watermarked
tumbling-window aggregation, and a stateful sessionizer. For local runs the
memory sink + ``processAllAvailable`` drives a bounded file set to
completion synchronously; in production the same plan runs unchanged over
kafka/cloud storage with checkpointing.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (schema pinned from the
    batch read — file streams must declare schemas up front)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file stream sources require a directory; pathGlobFilter scopes the
    # stream to the events table within the sf dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    for f in schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            # TIMESTAMP(NANOS) read as int64 -> truncate to micros (exact DIV)
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
    return stream


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the canonical
    late-data-tolerant streaming aggregate."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_batch(agg: DataFrame, spark: SparkSession) -> DataFrame:
    """Execute a streaming aggregation over the bounded file set and return
    the complete result as a batch DataFrame (memory sink, synchronous)."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # materialize before the in-memory sink table goes away
    out = spark.table(name)
    rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


def streamed_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: stream the events table through a 1-hour tumbling window
    and return the final counts. Equivalent batch semantics:
    GROUP BY date_trunc('hour', ts), event_type — which is exactly what the
    DuckDB oracle checks."""
    return run_stream_to_batch(
        windowed_event_counts(read_events_stream(spark, sf_dir)), spark
    )
