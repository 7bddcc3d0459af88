"""Oracle parity on empty / whitespace-only documents.

tokens() maps empty text to an empty array (count 0); the DuckDB oracle's
_TOKENS macro must agree (bare string_split_regex('') yields ['']).
Testdata has no empty docs, so this builds a tiny corpus that does and
runs the token-sensitive queries() entries against their oracle_sql().
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_correctness import normalize

TOKEN_QUERIES = [
    "text_stats",
    "lang_source_rollup",
    "token_length_histogram",
    "corpus_mix",
]


@pytest.fixture(scope="module")
def empty_doc_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("emptydocs")
    rows = [
        (0, "the quick brown fox", "en", "src0", 19),
        (1, "", "en", "src0", 0),
        (2, "   ", "en", "src1", 3),
        (3, "\t\n ", "de", "src1", 3),
        (4, "der und das ist", "de", "src2", 15),
        (5, "one", "en", "src2", 3),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    return str(out)


@pytest.mark.parametrize("name", TOKEN_QUERIES)
def test_token_queries_match_oracle_on_empty_docs(spark, empty_doc_sf_dir, name):
    qfn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = qfn(spark, empty_doc_sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{empty_doc_sf_dir}/documents.parquet/*.parquet')"
    )
    odf = con.execute(sql).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert normalize(sdf) == normalize(odf)
