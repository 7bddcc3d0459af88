"""The DuckDB SQL replay of Spark's ``xxhash64`` (xxh64_sql.py) must be
bit-exact against the real Spark expression — it underpins the
minhash_neardup / simhash_neardup oracle lifts. Covers every tail-length
class of the byte walk (empty, <8, 8..31, >=32 stripes, 4-byte and
byte-tail remainders), multibyte UTF-8, full-range longs, multi-argument
chains, and array inputs (banding's xxhash64-over-slice shape)."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from reddit_etl_pipeline_spark import xxh64_sql as X


def _u(v: int) -> int:
    return v % (1 << 64)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_string_hash_matches_spark(spark, con):
    random.seed(11)
    toks = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "abcdefghi", "abcdefghijk", "café", "你好世界", "naïve test",
        "x" * 31, "x" * 32, "x" * 33, "x" * 39, "x" * 40, "x" * 63,
        "x" * 64, "x" * 65, "y" * 100,
    ]
    for _ in range(150):
        n = random.randint(0, 80)
        toks.append(
            "".join(random.choice("abc XYZ012 é中ש.") for _ in range(n))
        )
    toks = list(dict.fromkeys(toks))

    sdf = spark.createDataFrame([(t,) for t in toks], "tok string").select(
        "tok", F.xxhash64("tok").alias("h")
    )
    expected = {r.tok: _u(r.h) for r in sdf.collect()}

    con.execute("CREATE OR REPLACE TABLE xt(tok VARCHAR)")
    con.executemany("INSERT INTO xt VALUES (?)", [(t,) for t in toks])
    sql = X.render_select(
        X.str_hash_cols("tok", "th"), ["th"], "xt", passthrough=["tok"]
    )
    got = dict(con.execute(sql).fetchall())
    assert got == expected


def test_long_chain_and_array_match_spark(spark, con):
    random.seed(12)
    rows = [
        (0, 0, 0, 0),
        (-1, 1, -(1 << 62), (1 << 62)),
        *[
            tuple(
                random.getrandbits(64) - (1 << 63) for _ in range(4)
            )
            for _ in range(60)
        ],
    ]
    sdf = spark.createDataFrame(rows, "a long, b long, c long, d long")
    exp3 = {
        (r.a, r.b, r.c): _u(r.h)
        for r in sdf.select(
            "a", "b", "c", F.xxhash64("a", "b", "c").alias("h")
        ).collect()
    }
    # array input hashes as the same element chain (banding shape)
    exp4 = {
        (r.a, r.b, r.c, r.d): _u(r.h)
        for r in sdf.select(
            "a", "b", "c", "d",
            F.xxhash64(F.array("a", "b", "c", "d")).alias("h"),
        ).collect()
    }

    con.execute("CREATE OR REPLACE TABLE xc(a UBIGINT, b UBIGINT, c UBIGINT, d UBIGINT)")
    con.executemany(
        "INSERT INTO xc VALUES (?,?,?,?)",
        [tuple(_u(v) for v in r) for r in rows],
    )
    got3 = {
        (r[0], r[1], r[2]): r[3]
        for r in con.execute(
            X.render_select(
                X.chain_cols("ch", ["a", "b", "c"]), ["ch"], "xc",
                passthrough=["a", "b", "c"],
            )
        ).fetchall()
    }
    got4 = {
        (r[0], r[1], r[2], r[3]): r[4]
        for r in con.execute(
            X.render_select(
                X.chain_cols("ch", ["a", "b", "c", "d"]), ["ch"], "xc",
                passthrough=["a", "b", "c", "d"],
            )
        ).fetchall()
    }
    for (a, b, c), h in exp3.items():
        assert got3[(_u(a), _u(b), _u(c))] == h
    for (a, b, c, d), h in exp4.items():
        assert got4[(_u(a), _u(b), _u(c), _u(d))] == h


def test_signed_and_pmod31_match_spark(spark, con):
    random.seed(13)
    vals = [0, 1, -1, (1 << 63) - 1, -(1 << 63)] + [
        random.getrandbits(64) - (1 << 63) for _ in range(50)
    ]
    sdf = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v", F.pmod("v", F.lit((1 << 31) - 1)).alias("p")
    )
    expected = {r.v: r.p for r in sdf.collect()}
    con.execute("CREATE OR REPLACE TABLE xp(u UBIGINT)")
    con.executemany("INSERT INTO xp VALUES (?)", [(_u(v),) for v in vals])
    got = dict(
        con.execute(
            f"SELECT {X.signed('u')} AS s, {X.pmod31('u')} AS p FROM xp"
        ).fetchall()
    )
    for v in vals:
        assert got[v] == expected[v]
