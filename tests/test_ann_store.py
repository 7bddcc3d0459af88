"""Persisted ANN index store (operators/ann_store.py): the frozen-
quantizer / per-batch assignment-partial contract — incremental ingest
must equal a full rebuild bit for bit, appends must be idempotent, and
store-answered queries must match the ivf_topk rebuild twin exactly
(which is what lets store_topk share ann_oracles.ivf_topk_oracle)."""

import pytest
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reddit_etl_pipeline_spark.operators import ann_store as A  # noqa: E402
from reddit_etl_pipeline_spark.operators import similarity as S  # noqa: E402
from reddit_etl_pipeline_spark.streaming.bounded import scratch_dir  # noqa: E402


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow
def test_store_topk_matches_rebuild_twin(spark, embeddings):
    """store_topk over a full build == ivf_topk recomputed from raw —
    the oracle-sharing equality (same quantizer sample, same per-row
    assignment law)."""
    store = scratch_dir("ann_store_")
    A.build_ann_store(embeddings, store)
    queries = embeddings.filter(F.col("vec_id") < 5)
    got = _rows(A.store_topk(spark, store, embeddings, queries, k=5))
    want = _rows(S.ivf_topk(embeddings, queries, k=5))
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_incremental_appends_equal_full_build(spark, embeddings):
    """Appending each synthetic ingest batch separately under the frozen
    quantizer produces the identical store: same assignment rows, same
    query answers."""
    full = scratch_dir("ann_full_")
    inc = scratch_dir("ann_inc_")
    A.build_ann_store(embeddings, full)
    cents = A.init_store(embeddings, inc)
    for b in range(A.N_BATCHES):
        batch = embeddings.filter(F.col("vec_id") % A.N_BATCHES == b)
        A.append_batch(batch, inc, batch_id=b, cents=cents)
    assert _rows(A.store_assignments(spark, full)) == _rows(
        A.store_assignments(spark, inc)
    )
    queries = embeddings.filter(F.col("vec_id") < 5)
    assert _rows(A.store_topk(spark, full, embeddings, queries)) == _rows(
        A.store_topk(spark, inc, embeddings, queries)
    )


def test_append_batch_is_idempotent(spark, embeddings):
    """Re-running one batch's append (the retry/backfill case) replaces
    only that partition — assignment relation unchanged."""
    store = scratch_dir("ann_idem_")
    A.build_ann_store(embeddings, store)
    before = _rows(A.store_assignments(spark, store))
    batch0 = embeddings.filter(F.col("vec_id") % A.N_BATCHES == 0)
    A.append_batch(batch0, store, batch_id=0)
    assert _rows(A.store_assignments(spark, store)) == before


def test_centroids_roundtrip_exact(spark, embeddings):
    """Frozen centroids read back from parquet are the identical
    integer-valued doubles the trainer produced (the unit-grid
    round-trip guarantee the store's cross-host determinism rests on)."""
    store = scratch_dir("ann_cent_")
    cents = A.init_store(embeddings, store)
    loaded = A.load_centroids(spark, store)
    assert loaded.shape == cents.shape
    assert (loaded == cents).all()
    assert (loaded == loaded.round()).all()  # integer-valued grid


@pytest.mark.slow
def test_lsh_store_matches_rebuild_twin(spark, embeddings):
    """store_lsh_topk over a full build == cosine_topk_lsh recomputed
    from raw (same frozen geometry, per-row bucket projection law)."""
    store = scratch_dir("lsh_store_")
    A.build_lsh_store(embeddings, store, dim=64, n_planes=4)
    queries = embeddings.filter(F.col("vec_id") < 5)
    got = _rows(A.store_lsh_topk(spark, store, embeddings, queries, k=5))
    want = _rows(
        S.cosine_topk_lsh(embeddings, queries, dim=64, k=5, n_planes=4)
    )
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_lsh_incremental_appends_equal_full_build(spark, embeddings):
    full = scratch_dir("lsh_full_")
    inc = scratch_dir("lsh_inc_")
    A.build_lsh_store(embeddings, full, dim=64, n_planes=4)
    A.init_lsh_store(spark, inc, dim=64, n_planes=4)
    for b in range(A.N_BATCHES):
        batch = embeddings.filter(F.col("vec_id") % A.N_BATCHES == b)
        A.append_lsh_batch(batch, inc, batch_id=b)
    read = lambda d: _rows(
        spark.read.parquet(f"{d}/lsh_buckets").select(
            "did", "tbl", "bucket", "ext"
        )
    )
    assert read(full) == read(inc)
    queries = embeddings.filter(F.col("vec_id") < 5)
    assert _rows(A.store_lsh_topk(spark, full, embeddings, queries)) == _rows(
        A.store_lsh_topk(spark, inc, embeddings, queries)
    )


def test_lsh_plane_family_checksum_trips(spark, embeddings, monkeypatch):
    """A store written under one plane family must refuse queries under
    another: corrupting the stored crc (standing in for a reseeded
    _table_planes / changed PLANE_SCALE) makes load_lsh_meta raise
    instead of silently probing a different bucket space."""
    import pytest

    store = scratch_dir("lsh_crc_")
    A.build_lsh_store(embeddings, store, dim=64, n_planes=4)
    # sanity: intact store loads
    assert A.load_lsh_meta(spark, store)[0] == 64
    meta = spark.read.parquet(f"{store}/lsh_meta")
    meta.withColumn("plane_crc", F.col("plane_crc") + 1).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{store}/lsh_meta_bad")
    import shutil

    shutil.rmtree(f"{store}/lsh_meta")
    shutil.move(f"{store}/lsh_meta_bad", f"{store}/lsh_meta")
    with pytest.raises(ValueError, match="different plane family"):
        A.load_lsh_meta(spark, store)


@pytest.mark.slow
def test_pq_store_matches_rebuild_twin(spark, embeddings):
    """store_pq_topk over a full build == ivf_pq_topk recomputed from
    raw — the oracle-sharing equality (same frozen centroids AND
    residual codebooks, per-row exact-integer code assignment)."""
    store = scratch_dir("pq_store_")
    A.build_pq_store(embeddings, store)
    queries = embeddings.filter(F.col("vec_id") < 5)
    got = _rows(A.store_pq_topk(spark, store, embeddings, queries, k=5))
    want = _rows(S.ivf_pq_topk(embeddings, queries, k=5))
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_pq_incremental_appends_equal_full_build(spark, embeddings):
    """Appending each ingest batch's code partial separately under the
    frozen model produces the identical store: same (id, cid, codes)
    rows, same query answers."""
    full = scratch_dir("pq_full_")
    inc = scratch_dir("pq_inc_")
    A.build_pq_store(embeddings, full)
    model = A.init_pq_store(embeddings, inc)
    for b in range(A.N_BATCHES):
        batch = embeddings.filter(F.col("vec_id") % A.N_BATCHES == b)
        A.append_pq_batch(batch, inc, batch_id=b, model=model)
    read = lambda d: _rows(
        spark.read.parquet(f"{d}/pq_codes").select("vec_id", "cid", "codes")
    )
    assert read(full) == read(inc)
    queries = embeddings.filter(F.col("vec_id") < 5)
    assert _rows(A.store_pq_topk(spark, full, embeddings, queries)) == _rows(
        A.store_pq_topk(spark, inc, embeddings, queries)
    )


@pytest.mark.slow
def test_pq_append_is_idempotent(spark, embeddings):
    """Re-running one batch's code append replaces only that partition —
    the stored code relation is unchanged."""
    store = scratch_dir("pq_idem_")
    A.build_pq_store(embeddings, store)
    read = lambda: _rows(
        spark.read.parquet(f"{store}/pq_codes").select("vec_id", "cid", "codes")
    )
    before = read()
    batch0 = embeddings.filter(F.col("vec_id") % A.N_BATCHES == 0)
    A.append_pq_batch(batch0, store, batch_id=0)
    assert read() == before


def test_pq_model_roundtrip_exact(spark, embeddings):
    """Frozen centroids + residual codebooks read back from parquet are
    the identical integer-valued doubles the trainers produced."""
    store = scratch_dir("pq_model_")
    cents, books = A.init_pq_store(embeddings, store)
    lc, lb = A.load_pq_model(spark, store)
    assert (lc == cents).all() and (lb == books).all()
    assert (lb == lb.round()).all()  # integer-valued grid
