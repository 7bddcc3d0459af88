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


def test_decode_media_rejects_non_container_blobs(media):
    # text bytes are not a recognized container: the real-decode path
    # must fail loudly inside the task, never silently pass garbage
    from pyspark.errors import PythonException

    with pytest.raises(PythonException, match="unsupported media container"):
        MM.decode_media(media).collect()


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


# ----------------------------------------------------------- real codecs


def test_wav_roundtrip_against_stdlib():
    """synth_wav's container must be readable by the stdlib wave module
    with the exact sawtooth samples the id arithmetic prescribes."""
    import struct

    for mid in (1, 7, 63, 101):
        meta, payload = MM.decode_wav(MM.synth_wav(mid))
        n = 64 + mid % 64
        assert meta == {
            "channels": 1,
            "sample_rate": 8000 + (mid % 4) * 4000,
            "n_frames": n,
            "sample_width": 2,
        }
        got = struct.unpack(f"<{n}h", payload)
        want = tuple(((i * 31 + mid) % 65536) - 32768 for i in range(n))
        assert got == want


def _spec_bmp(width, height, rgb_rows_topdown, top_down=False):
    """Build a 24-bit BMP straight from the spec (independent of
    synth_bmp): file header, 40-byte info header, BGR rows padded to 4
    bytes, bottom-up unless top_down (negative height)."""
    import struct

    pad = (-(width * 3)) % 4
    rows = rgb_rows_topdown if top_down else rgb_rows_topdown[::-1]
    pixel_data = b"".join(
        b"".join(bytes((b, g, r)) for (r, g, b) in row) + b"\x00" * pad
        for row in rows
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width,
        -height if top_down else height,
        1, 24, 0, len(pixel_data), 0, 0, 0, 0,
    )
    return struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54) + info + pixel_data


def test_bmp_decoder_on_spec_fixture_bottom_up_and_top_down():
    rows = [
        [(255, 0, 0), (0, 255, 0)],        # top row
        [(0, 0, 255), (255, 255, 255)],    # bottom row
    ]
    want_payload = bytes(
        c for row in rows for (r, g, b) in row for c in (r, g, b)
    )
    for td in (False, True):
        meta, payload = MM.decode_bmp(_spec_bmp(2, 2, rows, top_down=td))
        assert meta == {"width": 2, "height": 2, "channels": 3}
        assert payload == want_payload, ("top_down", td)


def test_bmp_synth_decodes_to_generator_arithmetic():
    for mid in (0, 2, 8, 46):
        w, h = 4 + mid % 5, 3 + mid % 4
        meta, payload = MM.decode_bmp(MM.synth_bmp(mid))
        assert meta == {"width": w, "height": h, "channels": 3}
        px = list(payload)
        for y in range(h):
            for x in range(w):
                base = 3 * (y * w + x)
                assert px[base] == (x * 7 + y * 13 + mid) % 256
                assert px[base + 1] == (x * 3 + y * 5 + 2 * mid) % 256
                assert px[base + 2] == (x * 11 + y * 17 + 3 * mid) % 256


def test_bmp_decoder_rejects_unsupported():
    import struct

    with pytest.raises(ValueError, match="BM magic"):
        MM.decode_bmp(b"NOPE")
    # 8-bit palette BMP: refuse, don't misparse
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 0, 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    with pytest.raises(NotImplementedError, match="24-bit"):
        MM.decode_bmp(hdr + info)


def test_decode_media_real_path(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    )
    out = {
        r.media_id: r
        for r in MM.decode_media(MM.attach_codec_media(docs)).collect()
    }
    assert out[1].format == "wav" and out[1].sample_rate == 12000
    assert out[1].channels == 1 and out[1].width is None
    assert out[0].format == "bmp" and out[0].width == 4 and out[0].height == 3
    assert len(bytes(out[0].payload)) == 4 * 3 * 3  # w*h*RGB, padding stripped
    assert out[2].format == "png" and out[2].width == 6 and out[2].height == 5
    assert len(bytes(out[2].payload)) == 6 * 5 * 3
    assert out[5].format == "png" and out[5].width == 9 and out[5].height == 3


def test_media_decode_stats_small_by_hand(spark):
    docs = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    out = {
        r.media_id: r
        for r in MM.media_decode_stats(MM.attach_codec_media(docs)).collect()
    }
    # wav id=1: n=65, samples ((31i+1)%65536)-32768
    samples = [((i * 31 + 1) % 65536) - 32768 for i in range(65)]
    assert out[1].format == "wav" and out[1].n_units == 65
    assert out[1].rate_or_width == 12000
    assert out[1].checksum == sum((i + 1) * s for i, s in enumerate(samples))
    # png id=2: w=4+2%6=6, h=3+2%5=5, red=(7x+13y+2)%256
    reds = [(x * 7 + y * 13 + 2) % 256 for y in range(5) for x in range(6)]
    assert out[2].format == "png" and out[2].n_units == 30
    assert out[2].rate_or_width == 6
    assert out[2].checksum == sum((i + 1) * r for i, r in enumerate(reds))
    assert abs(out[2].mean_val - round(sum(reds) / 30, 6)) < 1e-9
    # bmp id=3: w=4+3%5=7, h=3+3%4=6, red=(7x+13y+3)%256
    reds3 = [(x * 7 + y * 13 + 3) % 256 for y in range(6) for x in range(7)]
    assert out[3].format == "bmp" and out[3].n_units == 42
    assert out[3].rate_or_width == 7
    assert out[3].checksum == sum((i + 1) * r for i, r in enumerate(reds3))


def test_png_synth_decodes_to_generator_arithmetic():
    """Round-trip across ids 2..21 — (y+id)%5 cycles every scanline
    filter type (None/Sub/Up/Average/Paeth) through the un-filter."""
    filter_types = set()
    for mid in range(2, 22):
        blob = MM.synth_png(mid)
        meta, payload = MM.decode_png(blob)
        w, h = 4 + mid % 6, 3 + mid % 5
        assert (meta["width"], meta["height"]) == (w, h)
        px = list(payload)
        for y in range(h):
            for x in range(w):
                base = (y * w + x) * 3
                assert px[base] == (x * 7 + y * 13 + mid) % 256
                assert px[base + 1] == (x * 3 + y * 5 + 2 * mid) % 256
                assert px[base + 2] == (x * 11 + y * 17 + 3 * mid) % 256
        filter_types |= {(y + mid) % 5 for y in range(h)}
    assert filter_types == {0, 1, 2, 3, 4}


def test_png_decoder_rejects_corrupt_and_unsupported():
    import struct
    import zlib

    import pytest

    with pytest.raises(ValueError, match="signature"):
        MM.decode_png(b"NOPE")
    blob = bytearray(MM.synth_png(2))
    blob[40] ^= 0xFF  # corrupt one IDAT byte -> chunk CRC must fail
    with pytest.raises(ValueError, match="CRC"):
        MM.decode_png(bytes(blob))

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    # grayscale (color type 0) is honestly unsupported
    gray = (
        MM._PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x00\x03\x04"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="truecolor"):
        MM.decode_png(gray)
