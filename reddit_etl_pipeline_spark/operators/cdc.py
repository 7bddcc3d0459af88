"""Content-defined chunking (CDC) via a Gear-style rolling hash.

The storage-dedup classic applied to training corpora: instead of
whole-document fingerprints (``dedup.dedup_exact``) or line splits
(``dedup.line_dedup_stats``), chunk boundaries are chosen by the CONTENT
itself — a rolling hash over the last ``window`` characters, boundary
wherever the hash's low ``mask_bits`` bits are zero — so an insertion or
deletion only perturbs the chunks it touches and identical passages
re-align at the next content boundary regardless of their offset. That
is what makes chunk-level dedup catch boilerplate shared across
documents at DIFFERENT positions, where line dedup needs exact line
framing and ExactSubstr needs a fixed window stride.

Hash design (everything exactly replayable in the DuckDB oracle,
neardup_oracles.cdc_chunk_stats_oracle):

- per-character gear value g(c) = Spark ``xxhash64(c)`` as uint64 — the
  engine's own hash, already bit-exact in SQL via ``xxh64_sql``;
- rolling state after character i:
  H_i = sum_{j=max(1, i-window+1)}^{i} g(c_j) * 2^(i-j)  (mod 2^64)
  — the classic Gear shift-and-add, expanded to its closed form so it
  vectorizes as one uint64 sliding-window dot product per document (the
  2^64 wrap is numpy's native unsigned overflow; characters older than
  ``window`` have shifted out of the 64-bit state, which is what bounds
  the formula to a window at all);
- boundary AFTER position i wherever H_i % 2^mask_bits == 0 (expected
  chunk length 2^mask_bits characters), no min/max clamps — clamped CDC
  makes boundary eligibility depend on the previous boundary, which is
  sequential; the pure form is position-independent and oracle-friendly;
- a boundary on the final character is ignored (no empty tail chunk).

Spark shape (100 TB): the gear table is an ALPHABET-bounded Spark job
(distinct characters of the corpus — thousands at worst) collected to a
closure dict; chunking is one map-only Arrow pass over (id, text); chunk
hashing stays JVM-side (``F.xxhash64``); the dedup rollup shuffles only
(lang, chunk_hash, len) rows — document text never shuffles.

No counterpart in the reference (its dedup story is Redshift staging
upserts — airflow/extraction/s3_to_redshift.py); this is part of the
training-data extension surface next to MinHash/SimHash/ExactSubstr.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gear_table", "cdc_chunks", "cdc_chunk_stats"]

TWO64 = 1 << 64


def gear_table(
    df: DataFrame, text_col: str = "text", max_alphabet: int = 1 << 18
) -> dict[str, int]:
    """{character: uint64 gear value} over the corpus alphabet.

    One tiny distributed job: explode to characters, DISTINCT (the
    shuffle carries one row per distinct character — alphabet-bounded,
    not corpus-bounded), hash JVM-side. The driver holds only the
    alphabet.

    ``max_alphabet`` bounds the driver collect (limit(max+1), the
    bounded-collect pattern): text corpora sit at 10^2–10^4 distinct
    characters, but a binary-garbage corpus could push toward the full
    Unicode range (~1.1 M codepoints). 2^18 covers every natural-language
    corpus including full CJK with 2x headroom; exceeding it means the
    input is not text — fail loudly instead of hoarding driver memory."""
    rows = (
        df.select(F.explode(F.split(F.col(text_col), "")).alias("c"))
        .filter(F.col("c") != "")
        .distinct()
        .select("c", F.xxhash64("c").alias("g"))
        .limit(max_alphabet + 1)
        .collect()
    )
    if len(rows) > max_alphabet:
        raise ValueError(
            f"gear_table: corpus alphabet exceeds max_alphabet="
            f"{max_alphabet} distinct characters — this input looks like "
            "binary data, not text; decode/filter it first or raise "
            "max_alphabet explicitly"
        )
    return {r["c"]: r["g"] % TWO64 for r in rows}


def cdc_chunks(
    df: DataFrame,
    gear: dict[str, int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    mask_bits: int = 6,
    rolling_block: int = 1 << 16,
) -> DataFrame:
    """(id, chunk_idx, start, chunk) rows — ``start`` 1-based in
    characters, chunks concatenate back to the document. NULL and empty
    texts yield no rows. Map-only Arrow; one uint64 sliding-window dot
    product per document (documents longer than ``rolling_block``
    compute it in overlapping blocks — identical values, bounded
    transient memory)."""
    import numpy as np
    import pandas as pd

    if gear is None:
        gear = gear_table(df, text_col)
    mask = (1 << mask_bits) - 1
    w = window
    # shift of window slot k (0-based, oldest first) is w-1-k
    pow2 = (np.uint64(1) << np.arange(w - 1, -1, -1, dtype="uint64")).astype(
        "uint64"
    )
    zpad = np.zeros(w - 1, dtype="uint64")
    # vectorized char -> gear lookup: sorted codepoint table + searchsorted
    # (a per-character Python dict loop dominated executor CPU at 100x)
    _cps = np.array(sorted(ord(c) for c in gear), dtype="uint32")
    _vals = np.array(
        [gear[chr(cp)] for cp in _cps.tolist()], dtype="uint64"
    )
    # the windowed product materializes a (block x w) uint64 matrix; a
    # very long document would otherwise allocate len(text) x w x 8 B at
    # once (1.3 GB for a 10 MB doc at w=16), so the rolling state is
    # computed in fixed blocks with w-1 characters of overlap — values
    # identical, transient memory bounded at rolling_block x w x 8 B
    block = max(rolling_block, w)

    def _rolling(g):
        from numpy.lib.stride_tricks import sliding_window_view

        gp = np.concatenate([zpad, g])
        if len(g) <= block:
            return (sliding_window_view(gp, w) * pow2).sum(
                axis=1, dtype="uint64"
            )
        out = np.empty(len(g), dtype="uint64")
        for st in range(0, len(g), block):
            en = min(st + block, len(g))
            # gp[st : en + w - 1] covers windows ending at st..en-1
            seg = sliding_window_view(gp[st : en + w - 1], w)
            out[st:en] = (seg * pow2).sum(axis=1, dtype="uint64")
        return out

    def run(batches):
        for pdf in batches:
            out_id, out_idx, out_start, out_chunk = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or len(text) == 0:
                    continue
                arr = np.frombuffer(
                    text.encode("utf-32-le"), dtype="<u4"
                ).astype("uint32", copy=False)
                idx = np.searchsorted(_cps, arr)
                idx_c = np.minimum(idx, max(len(_cps) - 1, 0))
                miss = (
                    np.ones(len(arr), dtype=bool)
                    if len(_cps) == 0
                    else (idx >= len(_cps)) | (_cps[idx_c] != arr)
                )
                if miss.any():
                    ch = chr(int(arr[int(np.argmax(miss))]))
                    raise ValueError(
                        f"cdc_chunks: character {ch!r} (doc {did}) is "
                        f"missing from the supplied gear table; derive it "
                        f"from a superset corpus via gear_table(), or pass "
                        f"gear=None to derive it from this DataFrame"
                    )
                g = _vals[idx_c]
                h = _rolling(g)  # uint64 wrap == mod 2^64
                bnd = np.flatnonzero((h & np.uint64(mask)) == 0)
                starts = [0] + [int(b) + 1 for b in bnd if b + 1 < len(text)]
                for ci, st in enumerate(starts):
                    en = starts[ci + 1] if ci + 1 < len(starts) else len(text)
                    out_id.append(did)
                    out_idx.append(ci)
                    out_start.append(st + 1)
                    out_chunk.append(text[st:en])
            yield pd.DataFrame(
                {
                    id_col: pd.Series(out_id, dtype="int64"),
                    "chunk_idx": pd.Series(out_idx, dtype="int64"),
                    "start": pd.Series(out_start, dtype="int64"),
                    "chunk": pd.Series(out_chunk, dtype="object"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, chunk_idx long, start long, chunk string"
    )


def cdc_chunk_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    window: int = 16,
    mask_bits: int = 6,
) -> DataFrame:
    """Chunk-level dedup audit per ``group_col``: how much of the corpus
    is duplicated PASSAGES (same chunk content appearing more than once,
    across documents or within one) rather than duplicated documents.

    Output: (group, n_chunks, n_unique_chunks, chars_total, chars_unique,
    dup_char_frac) — ``dup_char_frac`` is the fraction of characters a
    chunk-store would not have to keep twice; identical chunk hash =>
    identical length, so the per-hash rollup reads the length off any
    member. Two codegen aggregations over (group, hash, len) rows; the
    only shuffled payload is hashes and lengths."""
    chunks = cdc_chunks(
        df, text_col=text_col, id_col=id_col, window=window, mask_bits=mask_bits
    )
    # hash + measure BEFORE the group join so the join shuffle carries
    # (id, hash, len) — never chunk text (Catalyst prunes columns but
    # does not push expression evaluation below a join, so hashing after
    # the join would ship every chunk string through the exchange)
    hashed = chunks.select(
        id_col,
        F.xxhash64("chunk").alias("h"),
        F.length("chunk").alias("clen"),
    )
    tagged = hashed.join(df.select(id_col, group_col), id_col).select(
        F.col(group_col).alias("grp"), "h", "clen"
    )
    per_hash = tagged.groupBy("grp", "h").agg(
        F.count(F.lit(1)).alias("dups"),
        F.max("clen").alias("clen"),
    )
    return (
        per_hash.groupBy("grp")
        .agg(
            F.sum("dups").alias("n_chunks"),
            F.count(F.lit(1)).alias("n_unique_chunks"),
            F.sum(F.col("dups") * F.col("clen")).alias("chars_total"),
            F.sum("clen").alias("chars_unique"),
            F.round(
                F.lit(1.0)
                - F.sum("clen").cast("double")
                / F.sum(F.col("dups") * F.col("clen")).cast("double"),
                6,
            ).alias("dup_char_frac"),
        )
        .withColumnRenamed("grp", group_col)
        .orderBy(group_col)
    )
