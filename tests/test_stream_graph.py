"""Streaming graph twin (streaming/stream.streamed_part_components):
the per-micro-batch star-state fold must equal the one-shot batch
connected components exactly — the family's merge-law pin, like the
sketch twins' register-MAX/counter-SUM equality tests."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.streaming import stream as ST  # noqa: E402


import pytest

def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_components_equal_batch(spark, sf_dir):
    import __spark_entry__ as E

    got = _rows(ST.streamed_part_components(spark, sf_dir))
    want = _rows(E.queries()["part_components"](spark, sf_dir))
    assert len(got) > 0
    assert got == want


@pytest.mark.slow
def test_streamed_components_multi_slice_invariant(spark, sf_dir):
    """The answer must not depend on how the edge stream is sliced into
    micro-batches (2 vs 4 slices) — the star-fold law is
    batch-boundary-free."""
    a = _rows(ST.streamed_part_components(spark, sf_dir, n_slices=2))
    b = _rows(ST.streamed_part_components(spark, sf_dir, n_slices=4))
    assert a == b


def test_streamed_graph_store_equals_batch(spark, sf_dir):
    """Streaming ledger-append graph-store ingest == the batch
    part_components answer (merged owned partials are the distinct
    edge set of the union of slices — the graph_store ledger law under
    streaming delivery)."""
    import __spark_entry__ as E

    got = _rows(ST.streamed_graph_store(spark, sf_dir))
    want = _rows(E.queries()["part_components"](spark, sf_dir))
    assert len(got) > 0
    assert got == want


@pytest.mark.slow
def test_streamed_graph_store_slice_invariant(spark, sf_dir):
    """Edge-set membership off the streamed store must not depend on
    micro-batch slicing (ownership may move; membership may not)."""
    a = _rows(ST.streamed_graph_store(spark, sf_dir, n_slices=2))
    b = _rows(ST.streamed_graph_store(spark, sf_dir, n_slices=4))
    assert a == b
