"""Bounded-run harness for Structured Streaming.

Production streams run the plans in stream.py continuously (kafka / cloud
storage sources, checkpointed file sinks). These helpers exist to drive a
FINITE file set to completion synchronously — for tests, the driver
contract, and oracle comparison — and are deliberately separated from the
production operators so nobody copies mtime-staggering or memory sinks
into a real deployment.
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_SCRATCH_ROOT: str | None = None


def resolve_slices(n_slices: int, default: int) -> int:
    """Micro-batch count for a bounded stream twin. An EXPLICIT caller
    value always wins; when the caller left the operator's default, the
    ``SPARK_GRAFT_STREAM_SLICES`` env override applies — the bench's
    decorrelation mode (round-10): the six slowest full-surface entries
    were file-source streams whose wall was the trigger loop, not the
    fold, so the bench runs the twins with fewer, larger slices. Safe
    because every twin's fold law is slice-count-invariant (each pinned
    by its own n_slices=2-vs-4 equality test)."""
    if n_slices != default:
        return n_slices
    env = os.environ.get("SPARK_GRAFT_STREAM_SLICES")
    return max(1, int(env)) if env else n_slices


def scratch_dir(prefix: str) -> str:
    """mkdtemp under ONE process-scoped scratch root that is removed at
    interpreter exit. Streamed queries each stage a source dir, sinks and
    checkpoints; bare mkdtemp leaked those per invocation, so repeated
    bench/sweep runs accumulated orphan /tmp trees. Directories stay
    alive for the whole process (results are often read back lazily from
    file sinks), then one atexit rmtree reclaims everything."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        import atexit
        import shutil

        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="spark_engine_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)


def _iter_arrow_tables(subitem):
    """Yield pyarrow Tables for one merged-batch constituent: a pyarrow
    Table passes through; a parquet file path reads as one table; a
    Spark-written table directory yields one table per part (row-group
    streaming — never the whole directory in memory at once)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if isinstance(subitem, pa.Table):
        yield subitem
        return
    src = os.path.abspath(subitem)
    if os.path.isdir(src):
        for p in sorted(os.listdir(src)):
            if p.endswith(".parquet"):
                yield pq.read_table(f"{src}/{p}")
    else:
        yield pq.read_table(src)


def stage_bounded_stream(
    items: list, prefix: str = "bounded_stream_"
) -> str:
    """Stage a list of DataFrames / parquet part-file paths / pyarrow
    Tables as an ordered micro-batch sequence for a file-source stream.

    File streams order batches by modification time; each item gets an
    mtime 3 s after the previous so ``maxFilesPerTrigger=1`` delivers item
    i in micro-batch i. DataFrames are written to scratch dirs and moved
    in; existing part files are COPIED — never hard/soft-linked, because
    the mtime stagger on a linked file would mutate the shared inode (and
    with it the original file's metadata, which may be read-only
    testdata). A LIST item merges its constituents (paths / pyarrow
    Tables) into ONE staged file = one micro-batch — the cheap way to
    co-deliver a small control row (e.g. a watermark sentinel) with a
    data batch without a Spark write job. Returns the stream source
    directory.
    """
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    stream_dir = scratch_dir(prefix)
    now = time.time()
    for i, item in enumerate(items):
        dst = f"{stream_dir}/{i}.parquet"
        if isinstance(item, (list, tuple)) or isinstance(item, pa.Table):
            subs = item if isinstance(item, (list, tuple)) else [item]
            # A pyarrow-Table constituent is an engine-built control row
            # (e.g. the watermark sentinel) whose schema was pinned to the
            # types the ENGINE reads (ts micros when the stream schema is
            # TIMESTAMP, ns kept when nanosAsLong reads bigint). Raw
            # source files merged into the same item may carry a different
            # physical ts type — an INT96 source surfaces as timestamp[ns]
            # in arrow, and writing that back produces a TIMESTAMP(NANOS)
            # file the stream schema rejects — so a Table constituent's
            # schema is authoritative for the whole merged file and every
            # other constituent casts to it (micros-precision values cast
            # ns->us losslessly; pyarrow's safe cast raises otherwise).
            authority = next(
                (s.schema for s in subs if isinstance(s, pa.Table)), None
            )
            writer = None
            for sub in subs:
                for t in _iter_arrow_tables(sub):
                    if writer is None:
                        writer = pq.ParquetWriter(dst, authority or t.schema)
                    writer.write_table(t.cast(writer.schema))
            if writer is None:
                continue  # all constituents empty
            writer.close()
            os.utime(dst, (now + i * 3, now + i * 3))
            continue
        if isinstance(item, DataFrame):
            d = scratch_dir(f"{prefix}item{i}_")
            item.coalesce(1).write.mode("overwrite").parquet(d)
            src = next(
                f"{d}/{p}" for p in os.listdir(d) if p.endswith(".parquet")
            )
            os.replace(src, dst)
            shutil.rmtree(d, ignore_errors=True)
            os.utime(dst, (now + i * 3, now + i * 3))
            continue
        src = os.path.abspath(item)
        if os.path.isdir(src):
            # a Spark-written table: merge its parts into ONE staged file.
            # Staging parts as separate files would be a correctness bug,
            # not just micro-batch overhead: with maxFilesPerTrigger=1
            # each part is its own batch, parts are NOT time-ordered, and
            # once an early batch advances the watermark past a later
            # part's data, those rows are silently dropped as late. One
            # file = one micro-batch = no intra-item watermark movement.
            # pyarrow row-group append — no Spark job, no decompression
            # blowup in driver memory beyond one part at a time.
            import pyarrow.parquet as pq

            parts = sorted(
                p for p in os.listdir(src) if p.endswith(".parquet")
            )
            writer = None
            for p in parts:
                t = pq.read_table(f"{src}/{p}")
                if writer is None:
                    writer = pq.ParquetWriter(dst, t.schema)
                writer.write_table(t)
            if writer is None:
                continue  # empty table: nothing to stage
            writer.close()
            os.utime(dst, (now + i * 3, now + i * 3))
        else:
            shutil.copy2(src, dst)
            os.utime(dst, (now + i * 3, now + i * 3))
    return stream_dir


def stage_sliced_stream(
    df: DataFrame,
    slice_col,
    n_slices: int,
    prefix: str = "bounded_stream_",
) -> str:
    """Stage ``df`` as ``n_slices`` ordered micro-batches in ONE Spark
    write (round 11, guide §2.4/§1.2): the previous shape evaluated the
    source plan once PER SLICE (``[df.filter(slice == i) for i ...]``
    through :func:`stage_bounded_stream` = n_slices scans + n_slices
    single-task ``coalesce(1)`` write jobs). Here the slice id becomes a
    partition column written in one pass (one scan of the plan), then
    partition directories are merged into per-slice staged files
    driver-side with pyarrow (the same row-group append
    :func:`stage_bounded_stream` uses for directory items — no second
    Spark job). Row order within a micro-batch is as unordered as the
    coalesce(1) shape's task order was; batch MEMBERSHIP, which is what
    every fold law and first-arrival policy keys on, is identical.

    ``slice_col`` must evaluate to an integer in [0, n_slices); a slice
    with no rows still yields an (empty) micro-batch so batch ids line
    up with the caller's expectations regardless of data skew.
    """
    import pyarrow.parquet as pq

    part_dir = scratch_dir(f"{prefix}parts_")
    out = f"{part_dir}/t"
    df.withColumn("__slice", slice_col.cast("int")).write.partitionBy(
        "__slice"
    ).mode("overwrite").parquet(out)
    stream_dir = scratch_dir(prefix)
    now = time.time()
    # schema of the staged files == df.schema (partitionBy drops __slice
    # from the data files); empty slices get a zero-row file of the same
    # schema so every slice is delivered as its own micro-batch
    empty_schema = None
    for i in range(n_slices):
        dst = f"{stream_dir}/{i}.parquet"
        src = f"{out}/__slice={i}"
        writer = None
        if os.path.isdir(src):
            for p in sorted(os.listdir(src)):
                if p.endswith(".parquet"):
                    t = pq.read_table(f"{src}/{p}")
                    if writer is None:
                        writer = pq.ParquetWriter(dst, t.schema)
                    writer.write_table(t)
        if writer is None:
            if empty_schema is None:
                # derive an arrow schema from any written slice, else
                # from a zero-row spark write of the frame's own schema
                sample = None
                for j in range(n_slices):
                    sdir = f"{out}/__slice={j}"
                    if os.path.isdir(sdir):
                        for p in sorted(os.listdir(sdir)):
                            if p.endswith(".parquet"):
                                sample = pq.read_schema(f"{sdir}/{p}")
                                break
                    if sample is not None:
                        break
                if sample is None:
                    raise ValueError(
                        "stage_sliced_stream: no slice produced any file"
                    )
                empty_schema = sample
            writer = pq.ParquetWriter(dst, empty_schema)
            writer.write_table(empty_schema.empty_table())
        writer.close()
        os.utime(dst, (now + i * 3, now + i * 3))
    return stream_dir


def run_stream_to_batch(
    agg: DataFrame,
    spark: SparkSession,
    output_mode: str = "complete",
    state_partitions: int | None = 8,
    debug: bool = False,
    available_now: bool = False,
) -> DataFrame:
    """Execute a streaming query over a bounded source and return the
    final result as a batch DataFrame.

    Sink selection: append mode writes a parquet FILE SINK with a
    checkpoint and reads it back (the production pattern — results never
    collect to the driver); complete/update modes fall back to the memory
    sink, which Spark requires for them (keep such queries to
    dashboard-sized results). ``debug=True`` forces the memory sink.

    ``state_partitions`` temporarily overrides shuffle partitions for the
    stream: each state-store partition costs commit/checkpoint I/O per
    micro-batch, so partition count should track state size — for bounded
    local runs with small keyed state, 8 beats the batch-tuned 32. On a
    real cluster leave None and size via the session.

    ``available_now=True`` drains via ``Trigger.AvailableNow`` — the
    production batch-drain trigger (process everything present, respect
    maxFilesPerTrigger as rate limit, then STOP on its own): the query is
    awaited to termination instead of processAllAvailable+stop. Same
    results; use it for scheduled incremental runs over a growing source.
    """
    use_file_sink = output_mode == "append" and not debug
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        if use_file_sink:
            out_dir = scratch_dir("stream_sink_")
            chk = scratch_dir("stream_chk_")
            w = (
                agg.writeStream.outputMode("append")
                .format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", chk)
            )
            if available_now:
                w = w.trigger(availableNow=True)
            q = w.start()
        else:
            name = f"stream_out_{uuid.uuid4().hex[:8]}"
            w = (
                agg.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(name)
            )
            # availableNow must reach the memory sink too: without it the
            # default trigger never terminates and awaitTermination() below
            # would hang forever on a bounded source.
            if available_now:
                w = w.trigger(availableNow=True)
            q = w.start()
        try:
            if available_now:
                q.awaitTermination()
            else:
                q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    if use_file_sink:
        # schema pinned from the plan: an all-late run can leave zero files
        return spark.read.schema(agg.schema).parquet(out_dir)
    out = spark.table(name)
    rows = out.collect()  # materialize before the in-memory table goes away
    return spark.createDataFrame(rows, out.schema)
