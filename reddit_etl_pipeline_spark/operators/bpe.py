"""Distributed BPE vocabulary learning — fit byte-pair-encoding merges
on a corpus and segment documents with them (Sennrich et al. 2016, the
standard subword-tokenizer fit of a training-data pipeline).

Scale shape — the key insight every production tokenizer trainer
(subword-nmt, SentencePiece, HF tokenizers) uses: BPE statistics are a
function of the WORD HISTOGRAM, not the corpus. So the corpus is scanned
exactly ONCE (codegen explode → map-side-combined word counts), the
histogram is capped to the top-``max_vocab`` words by (count, word)
total order — a bounded, deterministic driver collection like the
k-means centroid table (operators/clustering.py) — and the merge loop
runs driver-side over that histogram. A 100 TB corpus and a 100 GB
corpus with the same top-100k word histogram learn the same merges at
the same driver cost; only the one histogram scan is data-proportional.

Segmentation (``apply_bpe`` / ``bpe_segment_stats``) is map-only: the
learned merge ranks broadcast to Arrow-batched workers that greedily
merge the lowest-rank adjacent pair per word (the standard BPE encode),
memoizing per unique word within each batch. No shuffle touches text
beyond the final per-language rollup of integer counts.

Determinism: ties in pair frequency break to the lexicographically
smallest pair, so the merge sequence is a pure function of the
histogram — partition-order independent, replayable, and unit-testable
by hand (tests/test_bpe.py). Non-SQL-expressible (argmax-per-iteration
loop), so the driver query is rows-only, like k-means and the reference
implementations it mirrors.

Reference parity: extends functions/text.bpe_tokens (the fixed BPE-ish
PRE-tokenizer, SURVEY §2.3) with the actual vocabulary FIT step; no
reference counterpart (extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

END = "</w>"  # word-terminal symbol (Sennrich convention)


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) counts of lowercased whitespace words — the ONE
    data-proportional scan of a BPE fit."""
    return (
        docs.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_counts(hist: list[tuple[tuple[str, ...], int]]) -> dict:
    counts: dict[tuple[str, str], int] = {}
    for syms, n in hist:
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + n
    return counts


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_vocab: int = 50_000,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Fit up to ``n_merges`` BPE merges. One corpus scan builds the word
    histogram; the top-``max_vocab`` rows (by count desc, word asc — a
    total order) come back as the bounded driver model; the classic merge
    loop runs on it. Stops early when the best pair's frequency drops
    below ``min_count`` (merging noise pairs degrades vocabularies)."""
    top = (
        word_histogram(docs, text_col)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_vocab)
        .collect()
    )
    hist: list[tuple[tuple[str, ...], int]] = [
        (tuple(r["word"]) + (END,), r["n"]) for r in top
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(hist)
        if not counts:
            break
        # max count, ties -> lexicographically smallest pair (determinism)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_count:
            break
        merges.append(best)
        hist = [(_merge_word(s, best), n) for s, n in hist]
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with the learned merges: (id, subwords)
    where subwords is the document's full subword stream in order
    (word-terminal ``</w>`` markers kept, so word boundaries are
    recoverable — the tensorized-training input a packer consumes).

    Same map-only Arrow shape as ``bpe_segment_stats`` (ranks ride the
    closure, per-unique-word memoization per batch); emits the token
    stream instead of its counts."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def seg(batches):
        import re

        import pandas as pd

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        ascii_ws = " \t\n\x0b\f\r"
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, subs = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                stripped = (text or "").lower().strip(ascii_ws)
                words = ws.split(stripped) if stripped else []
                out: list[str] = []
                for w in words:
                    if w not in cache:
                        cache[w] = _encode_word(w, ranks)
                    out.extend(cache[w])
                ids.append(did)
                subs.append(out)
            yield pd.DataFrame({id_col: ids, "subwords": subs})

    return docs.select(id_col, text_col).mapInPandas(
        seg, f"{id_col} long, subwords array<string>"
    )


def bpe_segment_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Segment every document with the learned merges and roll up
    (``group_col``, n_docs, n_words, n_subwords) — the tokenizer-fit
    audit (subwords/word is the compression the vocabulary achieves;
    integers only, so the rollup is engine-exact).

    Map-only Arrow pass: merge ranks ride the closure to each batch,
    per-word encodings memoize within a batch; only integer counts
    shuffle."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    fields = docs.select(group_col, text_col).schema.fieldNames()

    def seg(batches):
        import re

        import pandas as pd

        # tokenize EXACTLY like functions/text.tokens() (Java \s = ASCII
        # whitespace only): Python str.split()/\s would also split on
        # U+00A0/U+2028 etc. and silently disagree with the histogram the
        # merges were learned from
        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        ascii_ws = " \t\n\x0b\f\r"

        cache: dict[str, int] = {}
        for pdf in batches:
            groups, n_words, n_subs = [], [], []
            for g, text in zip(pdf[fields[0]], pdf[fields[1]]):
                stripped = (text or "").lower().strip(ascii_ws)
                words = ws.split(stripped) if stripped else []
                total = 0
                for w in words:
                    if w not in cache:
                        cache[w] = len(_encode_word(w, ranks))
                    total += cache[w]
                groups.append(g)
                n_words.append(len(words))
                n_subs.append(total)
            yield pd.DataFrame(
                {"g": groups, "n_words": n_words, "n_subwords": n_subs}
            )

    per_doc = docs.select(group_col, text_col).mapInPandas(
        seg, "g string, n_words long, n_subwords long"
    )
    return per_doc.groupBy(F.col("g").alias(group_col)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_subwords").alias("n_subwords"),
    )
