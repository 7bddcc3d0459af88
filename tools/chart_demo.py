#!/usr/bin/env python
"""The reference's warehouse->pandas->chart edge, Spark-first.

Mirrors ``airflow/extraction/query-test.py:60-79``: hour-of-day average
score pulled from the warehouse into pandas and rendered as a bar chart
(``score_by_hour.png``). The engine's equivalent edge is
``DataFrame.toPandas()`` (Arrow-batched, see session.py) — the ONLY
driver-side collection in the repo, and it is post-aggregation: 24 rows
cross the boundary no matter how large the warehouse is.

matplotlib is optional (not in the engine's runtime deps); without it the
demo still writes a real ``score_by_hour.png`` through a pure-stdlib
rasterizer (numpy pixel buffer + zlib/struct PNG encoder + a 5x7 bitmap
font — title, axes, dashed y-grid, per-hour bars, the same elements
query-test.py draws) and prints an ASCII chart for terminals.

Usage: python tools/chart_demo.py [warehouse_parquet_path]
With no argument, a FakeRedditSource batch stands in for the warehouse.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def hourly_avg_score(df):
    """EXTRACT(HOUR FROM created_utc), AVG(score) — query-test.py:61-67."""
    return (
        df.groupBy(F.hour("created_utc").alias("hour_of_day"))
        .agg(F.round(F.avg("score"), 6).alias("avg_score"))
        .orderBy("hour_of_day")
    )


# 5x7 bitmap font (public-domain classic LCD glyph shapes), 5-bit rows
# MSB-left — enough for chart titles/tick labels without any font deps.
_FONT = {
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    "A": (0x0E, 0x11, 0x11, 0x11, 0x1F, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1C, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1C),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x11, 0x19, 0x15, 0x13, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x15, 0x0A),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x11, 0x0A, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    " ": (0, 0, 0, 0, 0, 0, 0),
    ".": (0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C),
}


def _blit_text(img, x, y, text, color=(40, 40, 40), scale=1):
    """Stamp 5x7 glyphs into the RGB pixel buffer at (x, y) top-left."""
    import numpy as np

    col = np.array(color, dtype="uint8")
    for ch in text.upper():
        rows = _FONT.get(ch, _FONT[" "])
        for ry, bits in enumerate(rows):
            for rx in range(5):
                if bits & (1 << (4 - rx)):
                    y0, x0 = y + ry * scale, x + rx * scale
                    img[y0 : y0 + scale, x0 : x0 + scale] = col
        x += 6 * scale
    return x


def write_png(path: str, img) -> None:
    """Encode an (h, w, 3) uint8 array as a PNG with zlib/struct only —
    no imaging library. One filter-0 scanline per row; standard IHDR
    (8-bit truecolor) / IDAT / IEND chunks with CRCs."""
    import struct
    import zlib

    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[yy].tobytes() for yy in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw, 9)))
        f.write(chunk(b"IEND", b""))


def render_png_stdlib(pdf, out_path: str) -> None:
    """query-test.py:72-79's bar chart without matplotlib: white canvas,
    titled axes, dashed y-gridlines, one bar per hour, numeric ticks."""
    import numpy as np

    W, H = 1000, 600
    ml, mr, mt, mb = 80, 25, 60, 55  # margins
    img = np.full((H, W, 3), 255, dtype="uint8")

    hours = pdf["hour_of_day"].astype(int).tolist()
    vals = pdf["avg_score"].astype(float).tolist()
    vmax = max(max(vals, default=0.0), 1e-9) * 1.05

    # dashed y-grid + tick labels at 5 divisions (grid alpha~=0.7 gray)
    for i in range(6):
        v = vmax * i / 5
        y = int(H - mb - (H - mt - mb) * (v / vmax))
        for x in range(ml, W - mr, 12):  # dash pattern
            img[y, x : x + 6] = (200, 200, 200)
        label = f"{v:.2f}"
        _blit_text(img, ml - 8 - 6 * len(label), y - 3, label)

    # axes
    img[H - mb, ml : W - mr] = (40, 40, 40)
    img[mt : H - mb + 1, ml] = (40, 40, 40)

    # bars + x ticks 0..23 (xticks(range(0,24)))
    slot = (W - ml - mr) / 24.0
    bar_w = max(int(slot * 0.8), 1)
    for hr, v in zip(hours, vals):
        x0 = int(ml + hr * slot + (slot - bar_w) / 2)
        y0 = int(H - mb - (H - mt - mb) * (v / vmax))
        img[y0 : H - mb, x0 : x0 + bar_w] = (31, 119, 180)  # mpl C0 blue
    for hr in range(24):
        xc = int(ml + hr * slot + slot / 2)
        img[H - mb : H - mb + 4, xc] = (40, 40, 40)
        label = str(hr)
        _blit_text(img, xc - 3 * len(label), H - mb + 7, label)

    _blit_text(img, ml, H - 18, "HOUR OF DAY")
    # y-axis label (horizontal, above the axis — no rotation in 5x7 land)
    _blit_text(img, 8, mt - 20, "AVG SCORE")
    title = "AVERAGE POST SCORE BY HOUR OF DAY"
    _blit_text(img, (W - len(title) * 12) // 2, 20, title, scale=2)

    write_png(out_path, img)


def render(pdf, out_path: str = "score_by_hour.png") -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        width = 50
        top = max(pdf["avg_score"].max(), 1e-9)
        print("\nAverage Post Score by Hour of Day")
        for _, r in pdf.iterrows():
            bar = "#" * int(round(width * r["avg_score"] / top))
            print(f"{int(r['hour_of_day']):2d} | {bar} {r['avg_score']:.2f}")
        render_png_stdlib(pdf, out_path)
        print(
            f"\nAnalysis complete! Check '{out_path}' for visualization "
            "(stdlib PNG rasterizer; matplotlib not installed)."
        )
        return
    plt.figure(figsize=(10, 6))
    plt.bar(pdf["hour_of_day"], pdf["avg_score"])
    plt.title("Average Post Score by Hour of Day")
    plt.xlabel("Hour of Day")
    plt.ylabel("Average Score")
    plt.xticks(range(0, 24))
    plt.grid(axis="y", linestyle="--", alpha=0.7)
    plt.savefig(out_path)
    print(f"Analysis complete! Check '{out_path}' for visualization.")


def main() -> None:
    from reddit_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="chart_demo", shuffle_partitions=8)
    if len(sys.argv) > 1:
        df = spark.read.parquet(sys.argv[1])
    else:
        from reddit_etl_pipeline_spark.functions.transforms import (
            epoch_to_timestamp,
        )
        from reddit_etl_pipeline_spark.sources import (
            FakeRedditSource,
            fetch_posts_df,
        )

        df = epoch_to_timestamp(
            fetch_posts_df(spark, FakeRedditSource(n=500)), "created_utc"
        )
    render(hourly_avg_score(df).toPandas())


if __name__ == "__main__":
    main()
