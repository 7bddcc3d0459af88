"""Persisted MinHash signature store (operators/neardup_store.py): the
frozen-family / per-batch signature-partial contract — incremental
ingest must equal a full signing pass bit for bit, appends must be
idempotent, store-answered near-dup queries must match the
minhash_neardup_pairs rebuild twin exactly (which is what lets
store_pairs share neardup_oracles.minhash_neardup_oracle), and the
streaming ingest twin must fold to the same store."""

import pytest
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reddit_etl_pipeline_spark.operators import dedup as D  # noqa: E402
from reddit_etl_pipeline_spark.operators import neardup_store as NS  # noqa: E402
from reddit_etl_pipeline_spark.streaming.bounded import scratch_dir  # noqa: E402


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_store_pairs_match_rebuild_twin(spark, documents):
    """store_pairs over a full build == minhash_neardup_pairs recomputed
    from text — the oracle-sharing equality (same frozen permutation
    family, per-row signature law)."""
    store = scratch_dir("nd_store_")
    NS.build_store(documents, store)
    got = _rows(NS.store_pairs(spark, store, threshold=0.7))
    want = _rows(D.minhash_neardup_pairs(documents, threshold=0.7))
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_incremental_appends_equal_full_build(spark, documents):
    """Appending each ingest batch's signature partial separately under
    the frozen family produces the identical store: same signatures,
    same pairs."""
    full = scratch_dir("nd_full_")
    inc = scratch_dir("nd_inc_")
    NS.build_store(documents, full)
    NS.init_store(spark, inc)
    for b in range(NS.N_BATCHES):
        batch = documents.filter(F.col("doc_id") % NS.N_BATCHES == b)
        NS.append_batch(batch, inc, batch_id=b)
    sig = lambda d: _rows(
        NS.store_signatures(spark, d).select(
            "doc_id", F.col("signature").cast("array<long>")
        )
    )
    assert sig(full) == sig(inc)
    assert _rows(NS.store_pairs(spark, full, threshold=0.7)) == _rows(
        NS.store_pairs(spark, inc, threshold=0.7)
    )


def test_append_is_idempotent(spark, documents):
    """Re-running one batch's append (the retry/backfill case) replaces
    only that partition — the signature relation is unchanged."""
    store = scratch_dir("nd_idem_")
    NS.build_store(documents, store)
    read = lambda: _rows(
        NS.store_signatures(spark, store).select(
            "doc_id", F.col("signature").cast("array<long>")
        )
    )
    before = read()
    batch0 = documents.filter(F.col("doc_id") % NS.N_BATCHES == 0)
    NS.append_batch(batch0, store, batch_id=0)
    assert read() == before


def test_perm_family_checksum_trips(spark, documents):
    """A store signed under one permutation family must refuse queries
    under another: corrupting the stored crc (standing in for a
    reseeded _perm_consts) makes load_meta raise instead of silently
    banding a different signature space."""
    import shutil

    import pytest

    store = scratch_dir("nd_crc_")
    NS.build_store(documents, store)
    assert NS.load_meta(spark, store)[0] == 64  # intact store loads
    meta = spark.read.parquet(f"{store}/minhash_meta")
    meta.withColumn("perm_crc", F.col("perm_crc") + 1).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{store}/minhash_meta_bad")
    shutil.rmtree(f"{store}/minhash_meta")
    shutil.move(f"{store}/minhash_meta_bad", f"{store}/minhash_meta")
    with pytest.raises(ValueError, match="different permutation family"):
        NS.load_meta(spark, store)


@pytest.mark.slow
def test_streamed_store_equals_batch(spark, sf_dir, documents):
    """The foreachBatch ingest twin folds to the same pairs as the
    batch store and the inline rebuild (stream == batch-store ==
    rebuild), and is micro-batch-slicing invariant."""
    from reddit_etl_pipeline_spark.streaming import stream as ST

    want = _rows(D.minhash_neardup_pairs(documents, threshold=0.7))
    a = _rows(ST.streamed_minhash_store(spark, sf_dir, n_slices=2))
    b = _rows(ST.streamed_minhash_store(spark, sf_dir, n_slices=4))
    assert a == want and b == want
