"""Multimodal binary-column plumbing (operators/multimodal.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reddit_etl_pipeline_spark.operators import multimodal as MM  # noqa: E402


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(0, "hello"), (1, "wörld"), (2, "0123456789"), (3, "")],
        "doc_id long, text string",
    )
    return MM.attach_fake_media(docs)


def test_attach_fake_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "media_type", "content", "n_bytes", "source_uri",
    ]
    rows = {r.media_id: r for r in media.collect()}
    assert rows[0].media_type == "image"
    assert rows[1].media_type == "audio"
    assert rows[2].media_type == "video"
    assert bytes(rows[0].content) == b"hello"
    # utf-8 multibyte: ö is 2 bytes
    assert rows[1].n_bytes == 6 and len(bytes(rows[1].content)) == 6


def test_decode_media_stub_raises_without_fake(media):
    with pytest.raises(NotImplementedError):
        MM.decode_media(media)


def test_decode_media_fake_roundtrip(media):
    out = {r.media_id: r for r in MM.decode_media(media, fake=True).collect()}
    assert bytes(out[2].payload) == b"0123456789"


def test_media_byte_stats(media):
    out = {r.media_id: r for r in MM.media_byte_stats(media).collect()}
    assert out[0].n_bytes == 5
    assert out[0].byte_checksum == sum(b"hello")
    assert out[3].n_bytes == 0 and out[3].byte_checksum == 0


def test_extract_features_histogram(media):
    out = {r.media_id: r for r in MM.extract_features(media, dim=4).collect()}
    feats = out[2].features  # "0123456789" bytes 48..57
    assert len(feats) == 4
    assert abs(sum(feats) - 1.0) < 1e-9
    # bytes 48..57 mod 4 -> buckets 0:[48,52,56]=3, 1:[49,53,57]=3, 2:[50,54]=2, 3:[51,55]=2
    assert feats == [0.3, 0.3, 0.2, 0.2]


def test_sample_frames_video_explosion(media):
    out = MM.sample_frames(media, n_frames=4)
    counts = {
        r.media_id: r.n
        for r in out.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts[2] == 4  # video, 10 bytes -> 4 frames
    assert counts[0] == 1  # image passthrough
    frames = sorted(
        (r.frame_idx, bytes(r.frame))
        for r in out.filter(F.col("media_id") == 2).collect()
    )
    # 10 bytes / 4 frames -> step 2: [0:2],[2:4],[4:6],[6:8]
    assert frames == [(0, b"01"), (1, b"23"), (2, b"45"), (3, b"67")]


def test_resize_images_downsamples_only_images(media):
    out = {r.media_id: r for r in MM.resize_images(media, factor=2).collect()}
    # media 0 is an image: "hello" -> every 2nd byte "hlo"
    assert bytes(out[0].content) == b"hlo" and out[0].n_bytes == 3
    # media 2 is video: untouched
    assert bytes(out[2].content) == b"0123456789" and out[2].n_bytes == 10
