"""Z-order layout (sources/lake.py write_zordered/zorder_value) — the
properties tests/test_sketches.py doesn't cover: curve locality of the
key itself, the BALANCE win over a single-column sorted layout (worst-
dimension footer span bounds pruning for the unlucky column), and
null/constant-column robustness."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from reddit_etl_pipeline_spark.sources import lake  # noqa: E402


def test_zorder_value_locality(spark):
    # nearby (x, y) points must land nearer on the curve than far ones,
    # and an 8x8 grid at bits=3 must cover 0..63 exactly (bijective)
    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x long, y long"
    )
    stats = {"min_a": 0, "max_a": 7, "min_b": 0, "max_b": 7}
    keys = {
        (r.x, r.y): r.k
        for r in df.select(
            "x", "y",
            lake.zorder_value(F.col("x"), F.col("y"), stats, bits=3).alias("k"),
        ).collect()
    }
    assert sorted(keys.values()) == list(range(64))
    assert abs(keys[(3, 3)] - keys[(3, 4)]) < abs(keys[(0, 0)] - keys[(7, 7)])


def _spans(path, col):
    spans = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(f"{path}/{f}").metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idx = names.index(col)
        lo = min(
            md.row_group(i).column(idx).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(idx).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append(hi - lo)
    return spans


def test_zorder_beats_sorted_layout_on_worst_dimension(spark, tmp_path):
    n = 40_000
    df = spark.range(n).select(
        (F.col("id") * 48_271 % 10_000).alias("a"),
        (F.col("id") * 69_621 % 10_000).alias("b"),
        F.col("id").alias("payload"),
    )
    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "sorted_a")
    lake.write_zordered(df, z_path, "a", "b", n_files=16)
    lake.write_sorted(df, s_path, ["a"], n_files=16)

    # content preserved exactly
    got = spark.read.parquet(z_path)
    assert got.count() == n
    assert got.orderBy("payload").collect() == df.orderBy("payload").collect()

    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    za, zb = _spans(z_path, "a"), _spans(z_path, "b")
    sa, sb = _spans(s_path, "a"), _spans(s_path, "b")
    full = 10_000
    # sorted layout: tight on a, full-range on b
    assert mean(sa) < 0.2 * full
    assert mean(sb) > 0.8 * full
    # z-order covers the same total area but BALANCED: the worst
    # dimension (what bounds pruning when the filter hits the unlucky
    # column) must be far tighter, and a 50/50 point-query mix on a or b
    # reads fewer files overall
    assert max(mean(za), mean(zb)) < 0.5 * max(mean(sa), mean(sb))
    assert (mean(za) + mean(zb)) / 2 < 0.7 * (mean(sa) + mean(sb)) / 2


def test_zorder_handles_nulls_and_constant_columns(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, 5, 0), (3, 5, 1), (9, 5, 2)], "a int, b int, payload int"
    )
    p = str(tmp_path / "z")
    lake.write_zordered(df, p, "a", "b", n_files=2)
    back = spark.read.parquet(p)
    assert back.count() == 3
    assert {r.payload for r in back.collect()} == {0, 1, 2}
