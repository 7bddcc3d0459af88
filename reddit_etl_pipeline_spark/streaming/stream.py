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
    spark.conf.set("spark.sql.session.timeZone", "UTC")
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


def run_stream_to_batch(
    agg: DataFrame,
    spark: SparkSession,
    output_mode: str = "complete",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Execute a streaming query over the bounded file set and return the
    final result as a batch DataFrame (memory sink, synchronous).

    ``state_partitions`` temporarily overrides shuffle partitions for the
    stream: each state-store partition costs commit/checkpoint I/O per
    micro-batch, so partition count should track state size — for bounded
    local runs with small keyed state, 8 beats the batch-tuned 32. On a
    real cluster leave None and size via the session."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            agg.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
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


def streamed_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: first event per (user_id, event_type) via
    ``dropDuplicates`` — keyed state holds seen keys; in production add
    ``dropDuplicatesWithinWatermark`` so state is evicted by event time
    instead of growing forever. Batch-equivalent: min_by over the key."""
    ev = read_events_stream(spark, sf_dir)
    firsts = ev.dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    return run_stream_to_batch(firsts, spark, output_mode="append")


def streamed_purchase_click_join(
    spark: SparkSession, sf_dir: str, window_seconds: int = 3600
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: purchases joined
    to the same user's clicks in the strict hour before each purchase.
    Both sides are watermarked; the join buffers each side's state only
    within the time bound, and rows are emitted once the watermark passes
    their join window.

    For the bounded run, a sentinel event far past max(ts) in a SECOND
    file per side advances the watermark over all real data so every
    matched pair is emitted (production streams drain continuously).
    Matches the batch range-join oracle exactly.
    """
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    ns_ts = any(
        f.name == "ts" and f.dataType.simpleString() == "bigint"
        for f in batch.schema.fields
    )
    max_ts = batch.agg(F.max("ts")).first()[0]
    if ns_ts:
        sentinel_ts = max_ts + (window_seconds + 7200) * 1_000_000_000
    else:
        # real timestamp column: max_ts is a datetime, advance via timedelta
        import datetime

        sentinel_ts = max_ts + datetime.timedelta(seconds=window_seconds + 7200)

    def side_dir(event_type: str) -> str:
        side = batch.filter(F.col("event_type") == event_type)
        sentinel = spark.range(1).select(
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(sentinel_ts).cast(batch.schema["ts"].dataType).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("__sentinel__").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        d = tempfile.mkdtemp(prefix=f"ssj_{event_type}_")
        side.coalesce(1).write.mode("overwrite").parquet(f"{d}/0_data")
        sentinel.coalesce(1).write.mode("overwrite").parquet(f"{d}/1_sentinel")
        import time

        stream_d = tempfile.mkdtemp(prefix=f"ssj_{event_type}_stream_")
        now = time.time()
        for i, sub in enumerate(["0_data", "1_sentinel"]):
            part = next(
                p for p in os.listdir(f"{d}/{sub}") if p.endswith(".parquet")
            )
            # stagger target mtimes so the file source orders data before
            # sentinel (one file per side per micro-batch)
            os.utime(f"{d}/{sub}/{part}", (now + i * 3, now + i * 3))
            os.symlink(f"{d}/{sub}/{part}", f"{stream_d}/{i}.parquet")
        return stream_d

    def read_side(path: str, alias: str) -> DataFrame:
        s = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        if ns_ts:
            s = s.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return s.select(
            F.col("event_id").alias(f"{alias}_id"),
            F.col("user_id").alias(f"{alias}_user"),
            F.col("ts").alias(f"{alias}_ts"),
            F.col("value").alias(f"{alias}_value"),
            F.col("event_type").alias(f"{alias}_type"),
        ).withWatermark(f"{alias}_ts", "1 hour")

    purchases = read_side(side_dir("purchase"), "p")
    clicks = read_side(side_dir("click"), "c")
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_seconds} SECONDS"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("p_type") == "purchase")
        & (F.col("c_type") == "click"),
        "inner",
    ).select(
        F.col("p_id").alias("purchase_id"),
        F.col("c_id").alias("click_id"),
        F.round("c_value", 6).alias("click_value"),
    )
    return run_stream_to_batch(joined, spark, output_mode="append")


# ------------------------------------------------ custom stateful operator


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming sessionizer via applyInPandasWithState.

    Per user_id, state carries the open session (seq, start/end epoch-µs,
    count, value sum); each micro-batch walks that user's events in
    (ts, event_id) order, closing a session whenever the floor-seconds gap
    exceeds ``gap_minutes`` (strict >, matching the batch ``sessionize``
    in plans/star.py). Rows with event_id < 0 are end-of-stream sentinels:
    they flush the open session without joining one — how a bounded run
    drains state (production streams would use event-time timeouts
    instead).

    Output rows are CLOSED sessions only (append mode).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("session_seq", LongType(), False),
            StructField("n_events", LongType(), False),
            StructField("session_start", TimestampType(), False),
            StructField("session_end", TimestampType(), False),
            StructField("session_value", DoubleType(), False),
        ]
    )
    # state survives even when no session is open (has_open=0) so
    # session_seq keeps counting across micro-batches
    state_schema = StructType(
        [
            StructField("last_seq", LongType(), False),
            StructField("has_open", LongType(), False),
            StructField("start_us", LongType(), False),
            StructField("end_us", LongType(), False),
            StructField("n", LongType(), False),
            StructField("val", DoubleType(), False),
        ]
    )
    gap_s = gap_minutes * 60

    def fn(key, pdfs, state: GroupState):
        # vectorized per user-batch: sort once, numpy gap/cumsum for
        # session boundaries, groupby-aggregate per session — no Python
        # per-event loop (the hot path sees every event exactly once)
        import numpy as np
        import pandas as pd

        (user_id,) = key
        last_seq = 0
        open_sess = None  # [start_us, end_us, n, val] of session #last_seq
        if state.exists:
            last_seq, has_open, start_us, end_us, n, val = state.get
            if has_open:
                open_sess = [start_us, end_us, n, val]

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        saw_sentinel = bool((pdf["event_id"] < 0).any())
        pdf = pdf[pdf["event_id"] >= 0]

        closed: list[tuple] = []
        if len(pdf):
            us = pdf["ts"].to_numpy("datetime64[us]").astype("int64")
            sec = us // 1_000_000
            val = pdf["value"].to_numpy("float64")
            prev_sec = np.empty_like(sec)
            prev_sec[1:] = sec[:-1]
            prev_sec[0] = (open_sess[1] // 1_000_000) if open_sess else np.iinfo("int64").min // 2
            brk = (sec - prev_sec) > gap_s
            sid = np.cumsum(brk)  # 0 = continues the open session
            # per-session aggregates in sid order (sid is sorted)
            bounds = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]])
            ends = np.r_[bounds[1:], len(sid)]
            sessions = []  # (sid, start_us, end_us, n, val)
            for b, e in zip(bounds, ends):
                sessions.append((sid[b], us[b], us[e - 1], e - b, float(val[b:e].sum())))
            if sessions and sessions[0][0] == 0:
                # first group extends the carried-over open session
                s = sessions[0]
                open_sess = [open_sess[0], s[2], open_sess[2] + s[3], open_sess[3] + s[4]]
                sessions = sessions[1:]
            for s in sessions:
                if open_sess is not None:
                    closed.append((last_seq, *open_sess))
                last_seq += 1
                open_sess = [s[1], s[2], int(s[3]), float(s[4])]

        if saw_sentinel and open_sess is not None:  # end-of-stream drain
            closed.append((last_seq, *open_sess))
            open_sess = None

        if open_sess is not None:
            state.update((last_seq, 1, int(open_sess[0]), int(open_sess[1]),
                          int(open_sess[2]), float(open_sess[3])))
        elif last_seq > 0:
            state.update((last_seq, 0, 0, 0, 0, 0.0))
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_seq": [c[0] for c in closed],
                    "n_events": [c[3] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "session_value": [round(c[4], 6) for c in closed],
                }
            )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def streamed_sessionize(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """End-to-end stateful-streaming sessionization over the bounded events
    table, equivalent to the batch ``plans.star.sessionize`` (same DuckDB
    oracle).

    The stream source dir holds a symlink to events.parquet plus a
    driver-written sentinel file (one event_id=-1 row per user, stamped
    after every real event); with maxFilesPerTrigger=1 the sentinel lands
    in a LATER micro-batch, so session state genuinely crosses batch
    boundaries before the sentinel drains it.
    """
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    ns_ts = any(
        f.name == "ts" and f.dataType.simpleString() == "bigint"
        for f in batch.schema.fields
    )
    max_ts = batch.agg(F.max("ts")).first()[0]
    sentinel_ts = (
        max_ts + (gap_minutes * 60 + 1) * 1_000_000_000
        if ns_ts
        else F.lit(max_ts)  # unreachable for the driver tables (always ns)
    )
    sentinels = (
        batch.select("user_id")
        .distinct()
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(sentinel_ts).cast("long" if ns_ts else "timestamp").alias("ts"),
            "user_id",
            F.lit("__sentinel__").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )

    stream_dir = tempfile.mkdtemp(prefix="sessionize_stream_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        f"{stream_dir}/0_events.parquet",
    )
    sent_dir = tempfile.mkdtemp(prefix="sessionize_sentinel_")
    sentinels.coalesce(1).write.mode("overwrite").parquet(sent_dir)
    part = next(p for p in os.listdir(sent_dir) if p.endswith(".parquet"))
    os.symlink(f"{sent_dir}/{part}", f"{stream_dir}/1_sentinel.parquet")

    schema = batch.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    if ns_ts:
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    sessions = sessionize_stateful(stream, gap_minutes)
    return run_stream_to_batch(sessions, spark, output_mode="append")
