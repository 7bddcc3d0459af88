"""Tolerant JSONL source (sources/jsonl.py) — same coercion contract as
the CSV source, plus unparseable-JSON rejection."""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from reddit_etl_pipeline_spark.sources.csv_tolerant import CORRUPT_COL  # noqa: E402
from reddit_etl_pipeline_spark.sources.jsonl import (  # noqa: E402
    read_tolerant_jsonl,
    write_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("score", T.LongType()),
        T.StructField("created_utc", T.TimestampType()),
        T.StructField("title", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def jsonl_path():
    d = tempfile.mkdtemp()
    p = f"{d}/posts.jsonl"
    with open(p, "w") as f:
        f.write('{"id": "a", "score": "10", "created_utc": "2025-03-18 09:00:00", "title": "ok"}\n')
        f.write('{"id": "b", "score": "NOT_A_NUMBER", "created_utc": "2025-03-18 09:00:00", "title": "bad score"}\n')
        f.write('{"id": "c", "score": "3", "created_utc": "whenever", "title": "bad ts"}\n')
        f.write('this is not json at all\n')
        f.write('{"id": "d", "score": "", "created_utc": null, "title": "  "}\n')
    return p


def test_jsonl_tolerance(spark, jsonl_path):
    df = read_tolerant_jsonl(spark, jsonl_path, SCHEMA)
    rows = {r.id: r for r in df.collect()}
    # clean row
    assert rows["a"].score == 10 and not rows["a"][CORRUPT_COL]
    # numeric cast failure -> rejected (MAXERROR semantics)
    assert rows["b"][CORRUPT_COL]
    # bad timestamp -> NULL, row accepted (ACCEPTANYDATE)
    assert rows["c"].created_utc is None and not rows["c"][CORRUPT_COL]
    # unparseable JSON -> rejected row with null id
    assert None in rows and rows[None][CORRUPT_COL]
    # blanks -> null
    assert rows["d"].score is None and rows["d"].title is None
    assert not rows["d"][CORRUPT_COL]
    # count() equals materialized rows
    assert df.count() == 5
    assert df.filter(~F.col(CORRUPT_COL)).count() == 3


def test_jsonl_roundtrip(spark, jsonl_path):
    d = tempfile.mkdtemp()
    df = read_tolerant_jsonl(spark, jsonl_path, SCHEMA)
    clean = df.filter(~F.col(CORRUPT_COL)).drop(CORRUPT_COL)
    write_jsonl(clean, f"{d}/out")
    back = read_tolerant_jsonl(spark, f"{d}/out", SCHEMA)
    assert back.count() == 3
    assert back.filter(F.col(CORRUPT_COL)).count() == 0
