"""Streaming ANN-store ingest twin (streaming/stream.streamed_ann_store):
stream == batch-store == rebuild — per-row cell assignment under the
frozen quantizer makes per-micro-batch partials union to the full scan,
the equality that lets the streamed store share ivf_topk's oracle."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reddit_etl_pipeline_spark.operators import similarity as S  # noqa: E402
from reddit_etl_pipeline_spark.streaming import stream as ST  # noqa: E402


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_ann_store_equals_rebuild(spark, sf_dir, embeddings):
    got = _rows(ST.streamed_ann_store(spark, sf_dir))
    want = _rows(
        S.ivf_topk(embeddings, embeddings.filter(F.col("vec_id") < 5), k=5)
    )
    assert len(got) > 0
    assert got == want


def test_streamed_ann_store_slice_invariant(spark, sf_dir):
    """Micro-batch slicing must not change the stored index or the
    answers (assignment is per-row under frozen centroids)."""
    a = _rows(ST.streamed_ann_store(spark, sf_dir, n_slices=2))
    b = _rows(ST.streamed_ann_store(spark, sf_dir, n_slices=4))
    assert a == b
