"""Deduplication operators for training-data pipelines.

Four families, each with a distinct scale profile:

- exact: hash-groupBy on a normalized-content fingerprint. One shuffle on
  the 64-bit hash; at 100 TB this is the cheapest full-corpus op there is.
- n-gram Jaccard: token/shingle explode -> self-join on shingle ->
  intersection counts. Exact pairwise similarity, SQL-expressible (DuckDB
  oracle). Cost is bounded by shingle document frequency — the hot-shingle
  filter caps the join fan-out (a shingle appearing in k docs contributes
  k^2 pairs; dropping ubiquitous shingles is both a skew guard and an
  accuracy no-op for near-dup detection).
- MinHash + LSH: signature matrix via per-permutation min over shingle
  hashes, banded into buckets; only intra-bucket pairs are candidates.
  Turns O(n^2) into O(n * bands + candidate pairs). The scale path.
- SimHash: 64-bit near-dup fingerprint via sign-aggregated token hashes;
  hamming-close fingerprints ~ similar docs. One projection + groupBy.

Embedding-cosine near-dup lives in ``similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint

ROUND_DP = 6


# ------------------------------------------------------------------- exact


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on normalized content: keep the lowest id per duplicate
    group. min_by aggregate -> map-side partial combine, single shuffle on
    the fingerprint."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "n_copies")
    )


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups with >1 member (the audit view of dedup_exact)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.sort_array(F.collect_list(id_col)).alias("ids"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------- n-gram Jaccard


def _distinct_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        df.select(F.col(id_col).alias("did"), F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_token_df: int | None = None,
) -> DataFrame:
    """Exact token-set Jaccard similarity for all candidate pairs.

    Plan: explode to (doc, token) distinct -> self-join on token
    (doc1 < doc2) -> count intersections -> join token-set sizes ->
    jaccard = inter / (|a| + |b| - inter). Every step is a hash
    shuffle/aggregate; no UDFs.

    ``max_token_df`` drops tokens appearing in more than that many docs
    before the self-join — the skew guard that keeps the pair fan-out
    linear-ish at scale (ubiquitous tokens generate k^2 pairs and carry no
    near-dup signal). Leave None for exact parity with the SQL oracle.
    """
    toks = _distinct_tokens(df, text_col, id_col)
    if max_token_df is not None:
        keep = (
            toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_token_df)
            .select("tok")
        )
        toks = toks.join(keep, "tok")
    sizes = toks.groupBy("did").agg(F.count(F.lit(1)).alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.did") < F.col("b.did")))
        .groupBy(F.col("a.did").alias("doc_a"), F.col("b.did").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("did").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("did").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                ROUND_DP,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ------------------------------------------------------------ MinHash + LSH


def shingles(col, n: int = 3):
    """Word n-gram shingles of normalized text as an array column."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), " ")
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


# Deterministic permutation constants (odd multipliers, fixed seed set) for
# the universal-hash family h_i(x) = (a_i * x + b_i) mod 2^31-1. The 31-bit
# Mersenne prime keeps a*h + b < 2^62 — no int64 overflow in the JVM.
_MERSENNE = (1 << 31) - 1


def _perm_consts(num_perm: int) -> list[tuple[int, int]]:
    consts = []
    state = 0x9E3779B9
    for _ in range(num_perm):
        state = (state * 1103515245 + 12345) % (1 << 31)
        a = (state % (_MERSENNE - 1)) + 1
        state = (state * 1103515245 + 12345) % (1 << 31)
        b = state % _MERSENNE
        consts.append((a, b))
    return consts


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    h_i(xxhash64(shingle)). Computed as a single projection over the
    shingle array (F.transform / array_min) — no explode, no shuffle."""
    sh = shingles(text_col, shingle_n)
    hashed = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))

    def _perm_fn(a: int, b: int):
        # closure factory: PySpark counts lambda default-args as HOF params
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE))

    sig_cols = []
    for i, (a, b) in enumerate(_perm_consts(num_perm)):
        sig_cols.append(
            F.array_min(F.transform(hashed, _perm_fn(a, b))).alias(f"h{i}")
        )
    return df.select(F.col(id_col), F.array(*sig_cols).alias("signature"))


def minhash_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket; docs
    sharing any (band, bucket) are candidate pairs. Pair generation is a
    self-join per bucket — bounded by bucket occupancy, not corpus size."""
    banded = signatures.select(
        F.col(id_col).alias("did"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(F.col("a.did").alias("doc_a"), F.col("b.did").alias("doc_b"))
        .distinct()
    )


def minhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_n: int = 3,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup: candidates via banding, then estimated
    Jaccard = fraction of matching signature components, thresholded.
    The candidate join prunes the O(n^2) space; the estimate pass touches
    only candidate pairs."""
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n).cache()
    cands = minhash_candidate_pairs(sigs, id_col, bands, num_perm // bands)
    sa = sigs.select(F.col(id_col).alias("doc_a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("doc_b"), F.col("signature").alias("sig_b"))
    est = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "est_jaccard",
            F.round(
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda m: m,
                    )
                )
                / F.lit(num_perm),
                ROUND_DP,
            ),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    return est.select("doc_a", "doc_b", "est_jaccard")


# ----------------------------------------------------------------- SimHash


def simhash(col, bits: int = 64):
    """SimHash fingerprint: per token, xxhash64 -> 64 bits; each bit
    position accumulates +1/-1; fingerprint bit = sign. One projection
    using bit arithmetic over the token array — no explode."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(
        F.filter(F.split(F.trim(F.lower(c)), r"\s+"), lambda t: t != "")
    )
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def _vote_fn(i: int):
        # closure factory: PySpark counts lambda default-args as HOF params
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_exprs = []
    for i in range(bits):
        votes = F.aggregate(hashes, F.lit(0), _vote_fn(i))
        bit_exprs.append(
            F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    fp = F.lit(0).cast("long")
    for i, bit in enumerate(bit_exprs):
        fp = fp + F.shiftleft(bit, i)
    return fp


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    return df.select(F.col(id_col), simhash(text_col, bits).alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 64,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming, using the
    pigeonhole block trick: split fingerprints into (max_hamming+1) blocks;
    any pair within distance must share >= 1 exact block -> equi-join on
    (block_idx, block_value) instead of an O(n^2) cross join."""
    nblocks = max_hamming + 1
    width = bits // nblocks
    fps = simhash_fingerprints(df, text_col, id_col, bits)
    mask = (1 << width) - 1
    blocks = fps.select(
        F.col(id_col).alias("did"),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", i * width).bitwiseAND(F.lit(mask))
                    for i in range(nblocks)
                ]
            )
        ).alias("block_idx", "block_val"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(
            F.col("a.did").alias("doc_a"),
            F.col("b.did").alias("doc_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
