"""Stateful streaming sessionizer (streaming/stream.py) vs the batch
sessionize — same gap rule, same output."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.plans import star as Q  # noqa: E402
from reddit_etl_pipeline_spark.streaming import stream as ST  # noqa: E402


import pytest

def test_streamed_sessionize_equals_batch(spark, sf_dir):
    got = {
        (r.user_id, r.session_seq): (
            r.n_events,
            r.session_start,
            r.session_end,
            round(r.session_value, 5),
        )
        for r in ST.streamed_sessionize(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.session_seq): (
            r.n_events,
            r.session_start,
            r.session_end,
            round(r.session_value, 5),
        )
        for r in Q.sessionize(spark, sf_dir).collect()
    }
    assert len(got) == len(want)
    assert got == want


def test_streamed_distinct_users_equals_batch(spark, sf_dir):
    got = {
        (r.user_id, r.event_type)
        for r in ST.streamed_distinct_users(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.event_type)
        for r in Q.load(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == want


@pytest.mark.slow
def test_watermark_drops_late_data(spark):
    """Append-mode windowed aggregation with a 2h watermark: a late event
    arriving AFTER its window was finalized (watermark passed in a prior
    batch) is discarded — no duplicate emission, no count change."""
    import datetime as dt
    import glob as g
    import os
    import shutil
    import tempfile
    import time

    d = tempfile.mkdtemp()
    t = lambda h, m=0: dt.datetime(2025, 1, 1, h, m)  # noqa: E731
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    batches = [
        # batch 0: drives the watermark to 08:00 (max 10:00 - 2h)
        [(1, t(0, 30), 1, "click", 1.0, None),
         (2, t(0, 45), 1, "click", 1.0, None),
         (3, t(3, 15), 1, "click", 1.0, None),
         (4, t(10, 0), 1, "click", 1.0, None)],
        # batch 1: windows ending <= 08:00 are finalized+emitted here
        [(6, t(9, 45), 1, "click", 1.0, None)],
        # batch 2: LATE — window [3:00,4:00) already emitted
        [(5, t(3, 20), 1, "click", 1.0, None)],
    ]
    sdir = tempfile.mkdtemp()
    schema_df = None
    for i, rows in enumerate(batches):
        b = spark.createDataFrame(rows, schema)
        schema_df = b
        b.coalesce(1).write.parquet(f"{d}/f{i}")
        part = next(p for p in g.glob(f"{d}/f{i}/*.parquet"))
        shutil.copy(part, f"{sdir}/{i}.parquet")
        os.utime(f"{sdir}/{i}.parquet", (time.time() + i * 3, time.time() + i * 3))

    stream = (
        spark.readStream.schema(schema_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sdir)
    )
    out = ST.run_stream_to_batch(
        ST.windowed_event_counts(stream, window="1 hour", watermark="2 hours"),
        spark,
        output_mode="append",
    )
    rows = out.collect()
    counts = {r.window_start.hour: r.n_events for r in rows}
    assert counts[0] == 2
    assert counts[3] == 1  # the late event did NOT land
    assert len(rows) == 2  # and was not re-emitted as a duplicate window
    assert 10 not in counts  # unclosed window never emitted in append mode


@pytest.mark.slow
def test_stream_join_on_real_timestamp_column(spark, tmp_path):
    """streamed_purchase_click_join's non-nanosecond branch: ts stored as a
    real parquet TIMESTAMP (not nanos-bigint). The sentinel must be computed
    via timedelta, and join results must match the batch range-join."""
    import datetime as dt

    t = lambda h, m=0: dt.datetime(2025, 1, 1, h, m)  # noqa: E731
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    rows = [
        (1, t(1, 0), 7, "click", 1.5, None),
        (2, t(1, 30), 7, "purchase", 9.0, None),   # joins click 1 (30 min before)
        (3, t(3, 0), 7, "purchase", 2.0, None),    # no click within the hour
        (4, t(4, 0), 8, "click", 0.5, None),
        (5, t(4, 59), 8, "purchase", 3.0, None),   # joins click 4
        (6, t(6, 0), 8, "view", 1.0, None),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        (r.purchase_id, r.click_id): r.click_value
        for r in ST.streamed_purchase_click_join(spark, str(tmp_path)).collect()
    }
    assert got == {(2, 1): 1.5, (5, 4): 0.5}


def test_bounded_stream_on_real_timestamp_column(spark, tmp_path):
    """_bounded_events_stream's non-nanosecond branch: a Spark-written
    events source (INT96 ts by default) is merged with the riding
    sentinel through pyarrow — the staged file must keep the micros ts
    type the stream schema expects, for the DATA batch and not just the
    sentinel-only batch (an INT96 source surfaces as timestamp[ns] in
    arrow; writing that back made a TIMESTAMP(NANOS) file the stream
    read rejected under nanosAsLong)."""
    import datetime as dt

    t = lambda h, m=0: dt.datetime(2025, 1, 1, h, m)  # noqa: E731
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    rows = [
        (1, t(1, 10), 7, "click", 1.5, None),
        (2, t(1, 30), 7, "click", 9.0, None),
        (3, t(2, 5), 7, "purchase", 2.0, None),
        (4, t(2, 40), 8, "click", 0.5, None),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        (r.window_start.hour, r.event_type): r.n_events
        for r in ST.streamed_hourly_counts(spark, str(tmp_path)).collect()
    }
    assert got == {(1, "click"): 2, (2, "purchase"): 1, (2, "click"): 1}


def test_merge_latest_out_of_order_batches(spark, tmp_path):
    """The foreachBatch merge must converge regardless of micro-batch
    arrival order: the winning row (latest ts) arrives FIRST, then an
    older row for the same key tries to overwrite it."""
    wh = str(tmp_path / "wh")
    rows_late_first = spark.createDataFrame(
        [(1, "click", 200, 9.0)], "user_id long, event_type string, ts long, value double"
    )
    rows_old_second = spark.createDataFrame(
        [(1, "click", 100, 1.0), (2, "view", 50, 2.0)],
        "user_id long, event_type string, ts long, value double",
    )
    for b in (rows_late_first, rows_old_second):
        ST.merge_latest_into_warehouse(
            b, wh, keys=["user_id", "event_type"], order_cols=["ts"]
        )
    got = {
        (r.user_id, r.event_type): (r.ts, r.value)
        for r in spark.read.parquet(wh).collect()
    }
    assert got == {(1, "click"): (200, 9.0), (2, "view"): (50, 2.0)}


def test_streamed_upsert_equals_batch(spark, sf_dir):
    got = {
        (r.user_id, r.event_type): (r.last_event_id, r.last_ts)
        for r in ST.streamed_upsert_latest(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.event_type): (r.last_event_id, r.last_ts)
        for r in Q.latest_event_per_user_type(spark, sf_dir).collect()
    }
    assert got == want


@pytest.mark.slow
def test_drop_duplicates_within_watermark_evicts_state(spark):
    """dropDuplicatesWithinWatermark — the production streaming-dedup API:
    duplicates arriving while the key is inside the watermark horizon are
    suppressed; once the watermark passes the first occurrence the key's
    state is EVICTED, so a much-later recurrence is treated as new (the
    documented semantics: dedup within the horizon, bounded state)."""
    import datetime as dt
    import glob as g
    import os
    import shutil
    import tempfile
    import time

    import pyspark.sql.functions as F

    t = lambda h, m=0: dt.datetime(2025, 1, 1, h, m)  # noqa: E731
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    batches = [
        # batch 0: key 7 first seen at 01:00
        [(1, t(1, 0), 7, "click", 1.0, None)],
        # batch 1: duplicate inside the 2h horizon -> suppressed;
        # max ts 2:00 keeps watermark at 0:00
        [(2, t(2, 0), 7, "click", 1.0, None)],
        # batch 2: advance the watermark far past 01:00 + 2h
        [(3, t(10, 0), 99, "click", 1.0, None)],
        # batch 3: another unrelated event — eviction runs at batch
        # COMMIT, so key 7's expired state is dropped at the end of the
        # first batch processed under the advanced watermark
        [(4, t(10, 15), 98, "click", 1.0, None)],
        # batch 4: key 7 again at 10:30 — state evicted, counts as new
        [(5, t(10, 30), 7, "click", 1.0, None)],
    ]
    d = tempfile.mkdtemp()
    sdir = tempfile.mkdtemp()
    schema_df = None
    for i, rows in enumerate(batches):
        b = spark.createDataFrame(rows, schema)
        schema_df = b
        b.coalesce(1).write.parquet(f"{d}/f{i}")
        part = next(p for p in g.glob(f"{d}/f{i}/*.parquet"))
        shutil.copy(part, f"{sdir}/{i}.parquet")
        os.utime(f"{sdir}/{i}.parquet", (time.time() + i * 3, time.time() + i * 3))

    stream = (
        spark.readStream.schema(schema_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sdir)
    )
    deduped = (
        stream.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id"])
        .select("event_id", "user_id")
    )
    out = ST.run_stream_to_batch(deduped, spark, output_mode="append")
    got = sorted((r.user_id, r.event_id) for r in out.collect())
    # event 2 suppressed (duplicate in-horizon); event 5 re-admitted
    assert got == [(7, 1), (7, 5), (98, 4), (99, 3)]


def test_merge_recovers_stranded_old_dir(spark, tmp_path):
    """A crash between the atomic-swap moves leaves the warehouse only at
    __old; the next merge must restore it instead of silently starting
    from an empty table."""
    import datetime as dt
    import os

    wh = str(tmp_path / "wh")
    schema = "user_id long, event_type string, event_id long, ts timestamp, value double"
    t = dt.datetime(2025, 1, 1, 12)
    b0 = spark.createDataFrame([(1, "click", 10, t, 1.0)], schema)
    ST.merge_latest_into_warehouse(b0, wh, ["user_id", "event_type"], ["ts", "event_id"])
    # simulate the crash window: table moved aside, new table never landed
    os.replace(wh, f"{wh}__old")
    assert not os.path.exists(wh)
    b1 = spark.createDataFrame(
        [(2, "click", 11, t, 2.0)], schema
    )
    ST.merge_latest_into_warehouse(b1, wh, ["user_id", "event_type"], ["ts", "event_id"])
    rows = {r.user_id: r.event_id for r in spark.read.parquet(wh).collect()}
    # user 1 (pre-crash) survived the recovery; user 2 merged on top
    assert rows == {1: 10, 2: 11}
    assert not os.path.exists(f"{wh}__old")


def test_available_now_with_memory_sink_terminates(spark, sf_dir):
    """available_now must reach the memory sink (complete/update modes)
    too: without the trigger the default-trigger query never terminates
    and awaitTermination() hangs forever. Guarded by an alarm so a
    regression fails instead of wedging the suite."""
    import signal

    def boom(signum, frame):
        raise TimeoutError("memory-sink available_now run did not terminate")

    old = signal.signal(signal.SIGALRM, boom)
    signal.alarm(300)
    try:
        got = ST.run_stream_to_batch(
            ST.windowed_event_counts(
                ST._bounded_events_stream(spark, sf_dir, 4 * 3600)[0]
            ),
            spark,
            output_mode="complete",
            available_now=True,
        )
        assert got.count() > 0
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def test_available_now_trigger_drains_and_stops(spark, sf_dir):
    """Trigger.AvailableNow (the production batch-drain): processes every
    staged file under the rate limit, terminates on its own, and produces
    the same windows as the processAllAvailable harness."""
    got = ST.run_stream_to_batch(
        ST.windowed_event_counts(ST._bounded_events_stream(spark, sf_dir, 4 * 3600)[0]),
        spark,
        output_mode="append",
        available_now=True,
    )
    want = ST.streamed_hourly_counts(spark, sf_dir)
    g = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in got.collect()}
    w = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in want.collect()}
    assert g == w


def test_rocksdb_state_store_parity(spark, sf_dir):
    """The RocksDB state-store backend (the production-scale knob,
    session.py SPARK_GRAFT_STATE_STORE=rocksdb) must produce identical
    results to the default HDFS-backed provider — here on the windowed
    hourly counts, whose tumbling-window aggregation state exercises the
    store across micro-batches."""
    key = "spark.sql.streaming.stateStore.providerClass"
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in ST.streamed_hourly_counts(spark, sf_dir).collect()
    }
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in ST.streamed_hourly_counts(spark, sf_dir).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert got == want



def test_bounded_stream_stages_two_batches_with_riding_sentinel(spark, sf_dir):
    """Round-6 staging shape: the first watermark sentinel rides in the
    data batch (one-row pyarrow append, no Spark write job) and exactly
    one follow-up sentinel batch remains — two staged files, not three.
    The merged file must carry the source's exact arrow ts type and end
    with the sentinel row."""
    import os

    import pyarrow.parquet as pq

    stream, _ = ST._bounded_events_stream(spark, sf_dir, margin_seconds=3600)
    src_dir = None
    # the staged dir is the stream's source path; recover it from the plan
    for line in stream._jdf.queryExecution().logical().toString().splitlines():
        if "events_bounded_" in line:
            import re

            m = re.search(r"(/[^\s,\])]*events_bounded_[^\s,\])]*)", line)
            if m:
                src_dir = m.group(1)
                break
    assert src_dir is not None
    files = sorted(f for f in os.listdir(src_dir) if f.endswith(".parquet"))
    assert files == ["0.parquet", "1.parquet"]
    t0 = pq.read_table(f"{src_dir}/0.parquet")
    t1 = pq.read_table(f"{src_dir}/1.parquet")
    n_src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert t0.num_rows == n_src + 1 and t1.num_rows == 1
    # sentinel is the LAST row of the data batch and the only row of the
    # follow-up, with the same (max) ts in the file's own logical type
    last = t0.slice(t0.num_rows - 1).to_pylist()[0]
    only = t1.to_pylist()[0]
    assert last["event_id"] == -1 and only["event_id"] == -1
    assert last["event_type"] == "__sentinel__"
    assert last["ts"] == only["ts"]
    assert t0.schema.field("ts").type == pq.read_schema(
        f"{sf_dir}/events.parquet"
        if not os.path.isdir(f"{sf_dir}/events.parquet")
        else next(
            f"{sf_dir}/events.parquet/" + p
            for p in sorted(os.listdir(f"{sf_dir}/events.parquet"))
            if p.endswith(".parquet")
        )
    ).field("ts").type


def test_stream_hll_equals_batch_sketch(spark, sf_dir):
    """Register merge across micro-batches must equal the batch sketch
    of the full table — the mergeability property that makes the HLL the
    bounded-state alternative to dropDuplicates' keyed state."""
    from reddit_etl_pipeline_spark.operators import sketches as SK

    got = {
        r.event_type: r.approx_users
        for r in ST.streamed_approx_distinct(spark, sf_dir).collect()
    }
    want = {
        r.event_type: r.approx_users
        for r in SK.approx_distinct_stats(spark, sf_dir).collect()
    }
    assert got == want
