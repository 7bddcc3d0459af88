"""BM25 full-text retrieval: score a query set against the document
corpus and return the top-k hits per query.

The training-data-pipeline use case is retrieval-shaped curation:
benchmark decontamination by lexical match, quality-by-example ("find
corpus documents like these curated seeds"), and near-duplicate triage
beyond shingle overlap. The reference pipeline (pandas/Redshift) has no
retrieval surface; this extends the corpus-analysis family (TF-IDF, PMI,
LM perplexity) with ranked retrieval.

Exactness design (the oracle hash-matches DuckDB bit-for-bit):

- idf is fixed-point BIGINT micro-nats — ``round(ln(...) * 1e6)`` — the
  nb_train / lm.py convention: a 1-ulp libm difference between engines
  dies in the rounding, and all downstream arithmetic is pure integer.
- The Robertson tf normalization ``tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
  with k1 = 6/5 and b = 3/4 is cleared to integers by multiplying
  numerator and denominator by 1e7:

      num = 22_000_000 * tf
      den = 10_000_000 * tf + 3_000_000 + 9 * r_micro

  where ``r_micro = (dl * 1e12) div avgdl_micro`` is dl/avgdl in micro
  units and ``avgdl_micro = (total_tokens * 1e6) div n_docs`` is an exact
  integer computed once (driver-side Python here, plain SQL subqueries in
  the oracle — both exact). Every division is integer ``div``, identical
  in Spark and DuckDB (CLAUDE.md house rule).
- Per-term score = ``(idf_micro * num) div den`` — BIGINT; per-(query,
  doc) score = SUM of BIGINTs, so aggregation order cannot matter (the
  reason a raw double BM25 sum could never hash-match).
- Overflow headroom (pinned in tests/test_retrieval.py): idf_micro <=
  ~2.2e7 for any corpus below 1e9 docs; tf is capped at TF_CAP = 10_000
  on BOTH sides (saturation: the Robertson weight at tf=1e4 is within
  0.03% of its k1+1 asymptote, so the cap is semantically free), giving
  idf_micro * 22e6 * tf <= 4.8e18 < 2^63. r_micro's ``dl * 1e12``
  requires dl < 9.2e6 tokens per document — far past any real document;
  enforced with a loud error, not silent wraparound.

Scale design:

- Query terms are DISTINCT per query (Lucene practice for short
  queries; query-side tf saturation adds nothing at qtf=1) and the
  query relation is explicitly broadcast — the corpus-side posting
  table never shuffles for the join.
- Stop-term pruning: terms with df > n/2 are dropped from the posting
  table before the join (``2*df > n``, integer compare, both sides).
  This is the piece that matters at 100 TB — a stop term's posting list
  is the corpus, and BM25's idf already scores it near zero; pruning it
  bounds the per-query candidate set by the selective terms' posting
  lists only.
- The per-query top-k is a row_number window partitioned by query_id —
  bounded by the candidate set, which the pruning keeps proportional to
  the selective posting lists, not the corpus.
- Totally ordered output: ranking key (score_micro DESC, doc_id ASC)
  over integers — no float ties, deterministic on any engine.

No counterpart in the reference (pandas/psycopg2 pipeline,
reddit_etl/: no retrieval surface); part of the LLM-curation extension
family alongside operators/dedup.py and functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens

MICRO = 1_000_000  # fixed-point scale: micro-nats per unit idf
TF_CAP = 10_000  # Robertson weight is saturated here; keeps products < 2^63
DL_MAX = 9_200_000  # dl * 1e12 must stay under 2^63
# k1 = 6/5, b = 3/4 cleared to integers (numerator/denominator x 1e7)
NUM_SCALE = 22_000_000  # (k1 + 1) * 1e7
DEN_TF = 10_000_000  # 1e7
DEN_CONST = 3_000_000  # k1 * (1 - b) * 1e7
DEN_R = 9  # k1 * b * 1e7 / 1e6  (applied to r_micro)


def _terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok, tf) — lowercased whitespace tokens, '' filtered, exactly
    the tfidf_topk / _TOKENS tokenization so every text oracle stays in
    lockstep."""
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("raw"))
        .select(id_col, F.lower("raw").alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    query_docs: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    prune_stop_terms: bool = True,
) -> DataFrame:
    """Top-``k`` corpus documents per query by integer-exact BM25.

    Returns (query_id, doc_id, score_micro, rank) — all BIGINT;
    ``score_micro`` is the BM25 score in micro-units (divide by 1e6 for
    the conventional value). Queries whose terms are all pruned or
    absent return no rows.

    ``prune_stop_terms`` (default on — the production setting) drops
    terms with df > n/2 before the query join; the +1-smoothed idf keeps
    them positive-scored, so corpora with degenerate vocabularies (every
    term ubiquitous — e.g. tiny synthetic tables) can disable pruning and
    still rank meaningfully.
    """
    n_docs = docs.count()
    if n_docs == 0:
        return docs.sparkSession.createDataFrame(
            [],
            f"{query_id_col} long, {id_col} long, score_micro long, rank long",
        )
    # ONE tokenize+aggregate corpus pass, materialized: tf feeds the dl
    # aggregate, the dfreq/idf aggregate, the weights join AND the
    # driver-side totals action — four independent consumers, and Spark
    # does no cross-branch subtree reuse (the triangle_counts deg
    # lesson), so uncheckpointed the dominant scan would run ~4x.
    tf = _terms(docs, id_col, text_col).localCheckpoint(eager=True)
    return bm25_score_tf(
        tf,
        n_docs,
        query_docs,
        k=k,
        text_col=text_col,
        id_col=id_col,
        query_id_col=query_id_col,
        prune_stop_terms=prune_stop_terms,
    )


def bm25_score_tf(
    tf: DataFrame,
    n_docs: int,
    query_docs: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    prune_stop_terms: bool = True,
) -> DataFrame:
    """Score queries against a PREPARED posting table ``tf`` — the
    (id, tok, tf) frame ``_terms`` produces, already materialized — with
    ``n_docs`` the full corpus cardinality INCLUDING zero-token docs
    (they have no posting rows but count in idf's n and avgdl's
    denominator). Split out of ``bm25_topk`` so the streaming
    posting-index build (streaming/stream.streamed_bm25_doc_search) can
    run the IDENTICAL scorer over its accumulated store: per-batch tf
    partials over disjoint doc ranges union into exactly the batch tf
    table, so the twin shares ``bm25_oracle_sql`` by construction."""
    from pyspark.sql import Window

    spark = tf.sparkSession
    # dl from the tf table; docs with zero tokens simply have no posting
    # rows — they still count in n_docs and contribute 0 to total,
    # exactly like the oracle.
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    totals = dl.agg(
        F.sum("dl").alias("total"), F.max("dl").alias("max_dl")
    ).first()
    total = totals["total"] or 0
    if total == 0:
        return spark.createDataFrame(
            [],
            f"{query_id_col} long, {id_col} long, score_micro long, rank long",
        )
    if totals["max_dl"] > DL_MAX:
        raise ValueError(
            f"bm25_topk: a document has {totals['max_dl']} tokens; the "
            f"integer-exact r_micro computation is bounded at {DL_MAX} "
            "(dl * 1e12 must stay under 2^63). Split pathological "
            "documents upstream (operators/packing.py chunker)."
        )
    avgdl_micro = (total * MICRO) // n_docs
    if avgdl_micro == 0:
        # n_docs > total*1e6 (a corpus of almost entirely empty docs):
        # Spark's `div 0` would yield NULL and SILENTLY drop every term
        # weight while the oracle's `// 0` errors — fail loudly instead
        # (the DL_MAX convention).
        raise ValueError(
            f"bm25_topk: average document length below 1e-6 tokens "
            f"({total} tokens over {n_docs} docs) — the integer-exact "
            "dl/avgdl ratio degenerates. Filter empty documents first."
        )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("dfreq"))
    if prune_stop_terms:
        # stop-term pruning: 2*df > n drops terms idf already scores ~0;
        # bounds every posting list the query join can touch
        dfreq = dfreq.filter(2 * F.col("dfreq") <= F.lit(n_docs))
    idf = dfreq.select(
        "tok",
        F.round(
            F.log(
                (F.lit(float(n_docs)) - F.col("dfreq") + 0.5)
                / (F.col("dfreq") + 0.5)
                + 1.0
            )
            * MICRO
        )
        .cast("long")
        .alias("idf_micro"),
    )
    weights = (
        tf.join(dl, id_col)
        .join(idf, "tok")  # pruned terms drop out here (inner join)
        .select(
            id_col,
            "tok",
            F.expr(
                f"(idf_micro * {NUM_SCALE} * least(tf, {TF_CAP})) div "
                f"({DEN_TF} * least(tf, {TF_CAP}) + {DEN_CONST} + "
                f"{DEN_R} * ((dl * 1000000000000) div {avgdl_micro}))"
            ).alias("w_micro"),
        )
    )
    qterms = (
        query_docs.select(
            F.col(query_id_col), F.explode(tokens(text_col)).alias("raw")
        )
        .select(query_id_col, F.lower("raw").alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    scores = (
        weights.join(F.broadcast(qterms), "tok")
        .groupBy(query_id_col, id_col)
        .agg(F.sum("w_micro").alias("score_micro"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score_micro", "rank")
    )


def rrf_fuse(
    lex: DataFrame,
    sem: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked candidate lists — the
    standard hybrid-search combiner (Cormack et al. 2009), integer-exact:
    each (query_id, doc_id, rank) row contributes
    ``1_000_000 div (rrf_k + rank)`` micro-points (integer div, so both
    engines agree bit-for-bit where a float 1/(k+r) could differ in the
    last ulp), points SUM per candidate, final rank by
    (rrf_micro DESC, doc_id). Candidates present in only one list simply
    get that list's term — the rank-gap-tolerant property that makes RRF
    robust to score-scale mismatch between BM25 and cosine."""
    from pyspark.sql import Window

    pts = F.expr(f"1000000 div ({rrf_k} + rank)").alias("pts")
    both = lex.select("query_id", "doc_id", pts).unionByName(
        sem.select("query_id", "doc_id", pts)
    )
    fused = both.groupBy("query_id", "doc_id").agg(
        F.sum("pts").alias("rrf_micro")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf_micro", "rank")
    )


def rrf_oracle_sql(
    lex_sql: str,
    sem_sql: str,
    sem_id_col: str = "neighbor_id",
    k: int = 10,
    rrf_k: int = 60,
) -> str:
    """DuckDB replay of ``rrf_fuse``: wrap the two systems' ranked-list
    statements (each may carry its own WITH chain — DuckDB allows CTEs
    inside a parenthesized subquery) and fuse with the same integer-div
    micro-points and (rrf_micro DESC, doc_id) total order."""
    return f"""
WITH lex AS MATERIALIZED ({lex_sql}),
sem AS MATERIALIZED ({sem_sql}),
pts AS MATERIALIZED (
  SELECT query_id, doc_id, 1000000 // ({rrf_k} + rank) AS pts FROM lex
  UNION ALL
  SELECT query_id, {sem_id_col} AS doc_id,
         1000000 // ({rrf_k} + rank) AS pts
  FROM sem
),
fused AS MATERIALIZED (
  SELECT query_id, doc_id, CAST(sum(pts) AS BIGINT) AS rrf_micro
  FROM pts GROUP BY query_id, doc_id
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(doc_id AS BIGINT) AS doc_id,
       rrf_micro,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id) AS rank
  FROM fused
) WHERE rank <= {k}
"""


def bm25_oracle_sql(
    query_mod: int = 50,
    k: int = 10,
    tokens_expr: str | None = None,
    prune_stop_terms: bool = True,
    query_where: str | None = None,
) -> str:
    """DuckDB replay of the entry's ``bm25_doc_search``: queries are the
    documents with doc_id % query_mod == 0 (or a custom ``query_where``
    predicate), scored against the whole corpus. Scalars (n, total,
    avgdl_micro) come from plain subqueries — exact integers, same
    values the Spark side computes driver-side."""
    qw = query_where or f"doc_id % {query_mod} = 0"
    toks = tokens_expr or (
        "(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) "
        "ELSE string_split_regex(trim(lower(text)), '\\s+') END)"
    )
    return f"""
WITH occ AS MATERIALIZED (
  SELECT doc_id, t.tok FROM documents, UNNEST({toks}) AS t(tok)
  WHERE t.tok <> ''
),
tf AS MATERIALIZED (
  SELECT doc_id, tok, count(*) AS tf FROM occ GROUP BY doc_id, tok
),
dl AS MATERIALIZED (
  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
),
scal AS MATERIALIZED (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT coalesce(sum(dl), 0) FROM dl) AS total
),
scal2 AS MATERIALIZED (
  SELECT n, (total * {MICRO}) // n AS avgdl_micro FROM scal
),
idf AS MATERIALIZED (
  SELECT tok,
         CAST(round(ln((s.n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
                    * {MICRO}) AS BIGINT) AS idf_micro
  FROM (SELECT tok, count(*) AS dfreq FROM tf GROUP BY tok), scal2 s
  {"WHERE 2 * dfreq <= s.n" if prune_stop_terms else ""}
),
weights AS MATERIALIZED (
  SELECT t.doc_id, t.tok,
         (i.idf_micro * {NUM_SCALE} * least(t.tf, {TF_CAP})) //
         ({DEN_TF} * least(t.tf, {TF_CAP}) + {DEN_CONST} +
          {DEN_R} * ((d.dl * 1000000000000) // s.avgdl_micro)) AS w_micro
  FROM tf t JOIN dl d USING (doc_id) JOIN idf i USING (tok), scal2 s
),
qterms AS MATERIALIZED (
  SELECT DISTINCT doc_id AS query_id, t.tok
  FROM documents, UNNEST({toks}) AS t(tok)
  WHERE ({qw}) AND t.tok <> ''
),
scores AS MATERIALIZED (
  SELECT q.query_id, w.doc_id,
         CAST(sum(w.w_micro) AS BIGINT) AS score_micro
  FROM weights w JOIN qterms q USING (tok)
  GROUP BY q.query_id, w.doc_id
)
SELECT query_id, doc_id, score_micro, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS rank
  FROM scores
) WHERE rank <= {k}
"""
