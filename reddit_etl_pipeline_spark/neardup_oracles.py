"""DuckDB oracle SQL for the hash-based dedup/fingerprint queries:
MinHash-LSH and SimHash near-dup pairs, the streaming greedy corpus
builds (recursive LFMIS walk), content-defined chunking (Gear rolling
hash), and winnowing passage overlap.

These replay the engine's pipelines EXACTLY — Spark ``xxhash64`` (via
``xxh64_sql``'s bit-exact SQL replay), the same tokenization, the same
permutation family, banding, pigeonhole blocks, and thresholds — so the
driver's value-hash compare can check the approximate near-dup operators
the same way it checks the exact ones. Before round 5 these were
declared rows-only ("engine-specific hashing"); the hashing is in fact
deterministic, so the right fix was to make the oracle speak it.

Layout notes: every variable-length hash or fixed chain renders through
``xxh64_sql.render_select`` (one nested subquery per step — see that
module for why lateral aliases would blow up the binder), the per-bit /
per-slot unrolls mirror the engine's own unrolled codegen columns
(dedup.simhash_fingerprints / minhash_signatures), and every CTE is
``AS MATERIALIZED`` — DuckDB 1.0 inlines plain CTEs at each reference,
which turns multi-reference chains exponential (see the round-5
materialization commit).
"""

from __future__ import annotations

from .operators.dedup import _MERSENNE, _perm_consts
from . import xxh64_sql as X


def simhash_neardup_oracle(max_hamming: int = 3, bits: int = 64) -> str:
    """Replay of ``dedup.simhash_neardup_pairs`` (operators/dedup.py):
    distinct lowercase whitespace tokens -> xxhash64 per token -> per-bit
    +-1 votes -> sign fingerprint -> pigeonhole 16-bit blocks ->
    hamming <= max_hamming. Token-less and NULL-text docs keep
    fingerprint 0 (the engine's explode_outer branch)."""
    nblocks = max_hamming + 1
    width = bits // nblocks
    mask = (1 << width) - 1
    tok_hash = X.render_select(
        X.str_hash_cols("tok", "th"), ["th"], "toks", passthrough=["tok"]
    )
    votes = ", ".join(
        f"sum(CASE WHEN ((th >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS UBIGINT) "
        f"ELSE CAST(0 AS UBIGINT) END)"
        for i in range(bits)
    )
    return f"""
WITH dtoks AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_filter(
    string_split_regex(trim(lower(text)), '\\s+'), t -> t != ''))) AS tok
  FROM documents WHERE text IS NOT NULL
),
toks AS MATERIALIZED (SELECT DISTINCT tok FROM dtoks),
tokh AS MATERIALIZED ({tok_hash}),
votes AS MATERIALIZED (
  SELECT d.doc_id, {votes}
  FROM dtoks d JOIN tokh USING (tok) GROUP BY d.doc_id
),
fps AS MATERIALIZED (
  SELECT doc_id, {fp} AS fp FROM votes
  UNION ALL
  SELECT doc_id, CAST(0 AS UBIGINT) AS fp FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM votes)
),
blocks AS MATERIALIZED (
  SELECT doc_id, i AS block_idx, (fp >> ({width} * i)) & {mask} AS block_val
  FROM fps, (SELECT unnest(range({nblocks})) AS i)
),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a JOIN blocks b
    ON a.block_idx = b.block_idx AND a.block_val = b.block_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(fa.fp, fb.fp)) AS BIGINT) AS hamming
FROM cand c
JOIN fps fa ON fa.doc_id = c.doc_a
JOIN fps fb ON fb.doc_id = c.doc_b
WHERE bit_count(xor(fa.fp, fb.fp)) <= {max_hamming}
"""


def _minhash_pair_ctes(num_perm: int, shingle_n: int, bands: int) -> tuple[str, str]:
    """The shared signature/banding replay: returns (cte_body, agree_expr)
    where ``cte_body`` defines CTEs through ``cand`` (distinct band-bucket
    collision pairs, doc_a < doc_b) plus ``sig_arr`` for verification, and
    ``agree_expr`` is the unrolled slot-agreement sum over aliases
    ``sa``/``sb``. Used by both the batch pair oracle and the streaming
    greedy-walk oracle so the two stay replay-identical by construction."""
    assert shingle_n == 3, "oracle replays the engine default shingle_n=3"
    rows_per_band = num_perm // bands
    tok_hash = X.render_select(
        X.str_hash_cols("tok", "th"), ["th"], "toks", passthrough=["tok"]
    )
    shingle = X.render_select(
        X.chain_cols("ch", ["th0", "th1c", "th2c"]),
        ["ch"],
        "kept",
        passthrough=["doc_id"],
    )
    mins = ", ".join(
        f"min((h * {a} + {b}) % {_MERSENNE}) AS h{i}"
        for i, (a, b) in enumerate(_perm_consts(num_perm))
    )
    sig_list = "[" + ", ".join(f"h{i}" for i in range(num_perm)) + "]"
    band_chain = X.render_select(
        X.chain_cols(
            "bucket",
            [
                f"CAST(sig[{rows_per_band} * b + {j + 1}] AS UBIGINT)"
                for j in range(rows_per_band)
            ],
        ),
        ["bucket"],
        "(SELECT doc_id, sig, b FROM sig_arr, (SELECT unnest(range({n})) AS b))".format(
            n=bands
        ),
        passthrough=["doc_id", "b"],
    )
    agree = " + ".join(
        f"(CASE WHEN sa.sig[{i + 1}] = sb.sig[{i + 1}] THEN 1 ELSE 0 END)"
        for i in range(num_perm)
    )
    body = f"""tokpos AS MATERIALIZED (
  SELECT doc_id, u.pos, u.tok
  FROM (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS l
    FROM documents WHERE text IS NOT NULL
  ) t, LATERAL (
    SELECT generate_subscripts(l, 1) AS pos, unnest(l) AS tok
  ) u
),
toks AS MATERIALIZED (SELECT DISTINCT tok FROM tokpos),
tokh AS MATERIALIZED ({tok_hash}),
ex AS MATERIALIZED (SELECT doc_id, pos, th FROM tokpos JOIN tokh USING (tok)),
leads AS MATERIALIZED (
  SELECT doc_id, pos, th AS th0,
         lead(th, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS th1,
         lead(th, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS th2
  FROM ex
),
kept AS MATERIALIZED (
  SELECT doc_id, th0,
         coalesce(th1, CAST(0 AS UBIGINT)) AS th1c,
         coalesce(th2, CAST(0 AS UBIGINT)) AS th2c
  FROM leads WHERE th2 IS NOT NULL OR pos = 1
),
comb AS MATERIALIZED ({shingle}),
base AS MATERIALIZED (SELECT DISTINCT doc_id, {X.pmod31('ch')} AS h FROM comb),
sigs AS MATERIALIZED (SELECT doc_id, {mins} FROM base GROUP BY doc_id),
sig_arr AS MATERIALIZED (SELECT doc_id, {sig_list} AS sig FROM sigs),
bands AS MATERIALIZED ({band_chain}),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, bb.doc_id AS doc_b
  FROM bands a JOIN bands bb
    ON a.b = bb.b AND a.bucket = bb.bucket AND a.doc_id < bb.doc_id
)"""
    return body, agree


def minhash_neardup_oracle(
    num_perm: int = 64,
    shingle_n: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
) -> str:
    """Replay of ``dedup.minhash_neardup_pairs`` (operators/dedup.py):
    positional whitespace tokens -> xxhash64 per token -> shingle combine
    (3-long xxhash64 chain over lead()ed token hashes, zero-padded tail,
    pos==0 fallback for short docs) -> pmod 2^31-1 -> distinct shingle
    set -> per-permutation mins -> per-band bucket = xxhash64 over the
    band's signature slice -> band-bucket candidate join -> slot
    agreement / num_perm >= threshold."""
    body, agree = _minhash_pair_ctes(num_perm, shingle_n, bands)
    return f"""
WITH {body}
SELECT doc_a, doc_b, round(({agree}) / {float(num_perm)}, 6) AS est_jaccard
FROM cand c
JOIN sig_arr sa ON sa.doc_id = c.doc_a
JOIN sig_arr sb ON sb.doc_id = c.doc_b
WHERE round(({agree}) / {float(num_perm)}, 6) >= {threshold}
"""


# functions/text.quality_score replayed in SQL — THE single copy, shared
# by every oracle that scores documents (dq_report, lang-id rollup, both
# canonical oracles). If the Spark-side formula changes, change it here
# and nowhere else.
QUALITY_EXPR_SQL = """round(0.4 * least(CAST(length(text) AS DOUBLE) / 1000.0, 1.0)
      + 0.5 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1))
      + 0.1 * (1 - least(5.0 * CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1), 1.0)), 6)"""

# NULL-text variant: unscored docs take -1 so they never win a cluster
QUALITY_SQL = f"""coalesce(
  {QUALITY_EXPR_SQL},
  -1.0)"""


def leakage_safe_split_oracle(
    val_pct: int = 5,
    test_pct: int = 5,
    num_perm: int = 64,
    shingle_n: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
) -> str:
    """Replay of ``packing.leakage_safe_split`` — the dedup-aware
    train/val/test split: the banded MinHash pair graph
    (``_minhash_pair_ctes``), connected components via the star rounds
    (``cc_star_member_ctes``), then the Knuth-band split rule
    (``packing.scramble_sql``) applied to the cluster REPRESENTATIVE's
    id — so the oracle fails if near-dup clusters ever straddle splits
    or the rep labeling drifts from the engine's min-label CC."""
    from .operators.packing import scramble_sql

    body, agree = _minhash_pair_ctes(num_perm, shingle_n, bands)
    band = f"{scramble_sql('rep_id')} % 100"
    return f"""
WITH {body},
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b
  FROM cand c
  JOIN sig_arr sa ON sa.doc_id = c.doc_a
  JOIN sig_arr sb ON sb.doc_id = c.doc_b
  WHERE round(({agree}) / {float(num_perm)}, 6) >= {threshold}
),
{cc_star_member_ctes()},
memb AS MATERIALIZED (
  SELECT d.doc_id, coalesce(c.rep_id, d.doc_id) AS rep_id
  FROM documents d
  LEFT JOIN rep c ON c.doc_id = d.doc_id
)
SELECT doc_id, rep_id,
       CASE WHEN {band} < {test_pct} THEN 'test'
            WHEN {band} < {test_pct + val_pct} THEN 'val'
            ELSE 'train' END AS split
FROM memb"""


def minhash_canonical_oracle(
    num_perm: int = 64,
    shingle_n: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
) -> str:
    """Replay of ``dedup.neardup_canonical(method='minhash')`` — the
    100 TB keep-best path, end to end: the banded MinHash pair graph
    (``_minhash_pair_ctes``, identical by construction to the
    ``minhash_neardup`` oracle), connected components via the star
    rounds (``cc_star_member_ctes``), then the per-cluster
    (quality DESC, doc_id) argmax that mirrors the engine's
    ``max(struct(quality, -id))``. Before round 6 this composition was
    exercised only by the curate-CLI e2e test; a regression anywhere in
    band-join -> CC -> canonical now fails the driver's hash gate."""
    body, agree = _minhash_pair_ctes(num_perm, shingle_n, bands)
    return f"""
WITH {body},
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b
  FROM cand c
  JOIN sig_arr sa ON sa.doc_id = c.doc_a
  JOIN sig_arr sb ON sb.doc_id = c.doc_b
  WHERE round(({agree}) / {float(num_perm)}, 6) >= {threshold}
),
{cc_star_member_ctes()},
memb AS MATERIALIZED (
  SELECT d.doc_id, coalesce(c.rep_id, d.doc_id) AS rep_id,
         {QUALITY_SQL} AS quality
  FROM documents d
  LEFT JOIN rep c ON c.doc_id = d.doc_id
),
best AS MATERIALIZED (
  SELECT rep_id, doc_id AS canonical_id FROM (
    SELECT rep_id, doc_id,
           row_number() OVER (PARTITION BY rep_id
                              ORDER BY quality DESC, doc_id) AS rn
    FROM memb) WHERE rn = 1
)
SELECT m.doc_id, b.canonical_id, m.quality
FROM memb m JOIN best b USING (rep_id)
"""


def lfmis_walk_sql(out_col: str) -> str:
    """Level-synchronous replay of ``dedup.greedy_accept_order`` with the
    even-id docs pre-accepted (the streaming builds' seed corpus): CTE
    text from ``dir_edges`` (expected: verified undirected pairs
    ``edges(id_a, id_b)`` with id_a < id_b, over node set ``nodes(id)``)
    through the final SELECT of accepted ODD ids as ``out_col``.

    Greedy first-arrival over a growing accepted index equals the
    lexicographically-first maximal independent set with seeds fixed
    'accepted' (induction on processing order: a doc is decided once all
    its earlier neighbors are decided, and the level-synchronous schedule
    decides exactly those). The recursion carries one row per undecided
    or accepted node; a round decides every node whose predecessors are
    all decided ('ready'), accepting it iff no predecessor was accepted
    ('ok'); rejected nodes drop out; termination when no 'u' rows remain.
    Window lists stand in for the (disallowed) aggregates over the
    recursive relation — the recursive term references ``walk`` once.

    Predecessor orientation: evens (seed) precede every odd regardless of
    id; odd-odd pairs orient low -> high (batches arrive in id order,
    greedy within batch is id-ascending). Even-even pairs are dropped —
    the seed corpus is accepted unconditionally."""
    return """
dir_edges AS MATERIALIZED (
  SELECT CASE WHEN id_a % 2 = 1 AND id_b % 2 = 0 THEN id_a ELSE id_b END AS v,
         CASE WHEN id_a % 2 = 1 AND id_b % 2 = 0 THEN id_b ELSE id_a END AS u
  FROM edges
  WHERE id_a % 2 = 1 OR id_b % 2 = 1
),
preds AS MATERIALIZED (SELECT v AS id, list(u) AS ps FROM dir_edges GROUP BY v),
walk AS (
  SELECT 0 AS rnd, n.id, coalesce(p.ps, []) AS ps,
         CASE WHEN n.id % 2 = 0 THEN 'a' ELSE 'u' END AS st
  FROM nodes n LEFT JOIN preds p ON p.id = n.id
  UNION ALL
  SELECT rnd + 1, id, ps,
         CASE WHEN st = 'a' THEN 'a'
              WHEN ready AND ok THEN 'a'
              ELSE 'u' END AS st
  FROM (
    SELECT rnd, id, ps, st,
           NOT list_has_any(ps, list(CASE WHEN st = 'u' THEN id END) OVER ()) AS ready,
           NOT list_has_any(ps, list(CASE WHEN st = 'a' THEN id END) OVER ()) AS ok,
           count(CASE WHEN st = 'u' THEN 1 END) OVER () AS n_u
    FROM walk
  )
  WHERE n_u > 0 AND (st = 'a' OR NOT ready OR ok)
)
SELECT id AS {out} FROM walk
WHERE rnd = (SELECT max(rnd) FROM walk) AND st = 'a' AND id % 2 = 1
""".replace("{out}", out_col)


def _cdc_chunk_ctes(window: int = 16, mask_bits: int = 6) -> str:
    """Shared replay of ``operators/cdc.cdc_chunks`` over the documents
    table: per-character gear values are Spark xxhash64 (bit-exact via
    xxh64_sql), the rolling state is the closed-form windowed sum
    H_i = sum_j g(c_j) * 2^(i-j) mod 2^64 (HUGEINT products — the shift
    is at most window-1 bits so every term fits in 2^79 and the window
    sum in 2^83), boundaries where the low ``mask_bits`` bits are zero,
    final-character boundaries dropped, chunk hashes replayed over the
    DISTINCT chunk strings. Ends with ``ctext(doc_id, lang, tok, clen)``
    and ``chashed(tok, ch)``."""
    mod = 1 << mask_bits
    tok_hash = X.render_select(
        X.str_hash_cols("tok", "th"), ["th"], "alpha", passthrough=["tok"]
    )
    chunk_hash = X.render_select(
        X.str_hash_cols("tok", "ch"), ["ch"], "cdist", passthrough=["tok"]
    )
    return f"""d AS MATERIALIZED (
  SELECT doc_id, lang, text FROM documents
  WHERE text IS NOT NULL AND length(text) > 0
),
chars AS MATERIALIZED (
  SELECT doc_id, u.i AS pos, substring(text, u.i, 1) AS tok
  FROM d, LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) u
),
alpha AS MATERIALIZED (SELECT DISTINCT tok FROM chars),
gearh AS MATERIALIZED ({tok_hash}),
gc AS MATERIALIZED (SELECT doc_id, pos, th FROM chars JOIN gearh USING (tok)),
hh AS MATERIALIZED (
  SELECT a.doc_id, a.pos,
         CAST(sum(CAST(b.th AS HUGEINT)
                  * CAST(CAST(1 AS BIGINT) << (a.pos - b.pos) AS HUGEINT))
              % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT) AS h
  FROM gc a JOIN gc b
    ON b.doc_id = a.doc_id AND b.pos BETWEEN a.pos - {window - 1} AND a.pos
  GROUP BY a.doc_id, a.pos
),
starts AS MATERIALIZED (
  SELECT doc_id, 1 AS st FROM d
  UNION ALL
  SELECT h.doc_id, h.pos + 1 AS st
  FROM hh h JOIN d USING (doc_id)
  WHERE h.h % {mod} = 0 AND h.pos < length(d.text)
),
chunks AS MATERIALIZED (
  SELECT doc_id, st,
         coalesce(lead(st) OVER (PARTITION BY doc_id ORDER BY st),
                  len + 1) - st AS clen
  FROM (SELECT s.doc_id, s.st, length(d.text) AS len
        FROM starts s JOIN d USING (doc_id))
),
ctext AS MATERIALIZED (
  SELECT c.doc_id, d.lang, substring(d.text, c.st, c.clen) AS tok, c.clen
  FROM chunks c JOIN d USING (doc_id)
),
cdist AS MATERIALIZED (SELECT DISTINCT tok FROM ctext),
chashed AS MATERIALIZED ({chunk_hash})"""


def cc_star_member_ctes(rounds: int = 34, pairs_cte: str = "pairs") -> str:
    """Connected components as unrolled alternating large-star /
    small-star rounds (Kiveris et al., "Connected Components in
    MapReduce and Beyond") — CTE text from ``e0`` through ``rep``
    (doc_id, rep_id = component minimum), expecting ``pairs_cte`` to
    provide (doc_a, doc_b) with doc_a < doc_b.

    This replaces the recursive transitive-closure walk the CC oracles
    used before: the closure materializes every reachable (n, m) pair —
    quadratic in duplicate-clique membership, unusable at sf0.1's 964 k
    near-dup pairs — while each star round rewrites the edge set in
    O(E) and converges to per-component stars centered at the minimum
    in ~1.4·log2(n) alternating rounds (measured on shuffled-path
    worst cases; the published bound is O(log² n)). ``rounds`` unrolls
    with headroom (34 ≳ 2·log2(8192) + 8) and converged rounds are
    no-ops. Insurance against a pathological input exceeding the
    unroll: ``nonstar`` counts the two non-fixpoint shapes — edges whose
    larger endpoint still centers edges of its own (chains), and nodes
    attached to more than one center (shared leaves). Zero of both ⇒
    disjoint stars, which IS the fixpoint (star ops leave a star
    unchanged) and has one star per component (the ops preserve
    connectivity), centered at the component minimum. If either
    remains, every rep_id is poisoned to −1 (an impossible doc id, NOT
    NULL — callers coalesce NULL away for isolated docs) so the
    driver's hash compare fails LOUDLY instead of accepting a
    partially-converged labeling."""
    parts = [
        f"""e0 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM {pairs_cte})"""
    ]
    cur = "e0"
    for i in range(rounds):
        if i % 2 == 0:  # large-star: larger neighbors attach to the min
            parts.append(f""",
nb{i} AS MATERIALIZED (SELECT u AS c, v AS x FROM {cur}
          UNION ALL SELECT v, u FROM {cur}),
mn{i} AS MATERIALIZED (SELECT c, least(c, min(x)) AS m FROM nb{i} GROUP BY c),
e{i + 1} AS MATERIALIZED (
  SELECT DISTINCT least(n.x, s.m) AS u, greatest(n.x, s.m) AS v
  FROM nb{i} n JOIN mn{i} s USING (c)
  WHERE n.x > n.c AND n.x <> s.m)""")
        else:  # small-star: smaller neighbors (and the center) attach
            parts.append(f""",
nb{i} AS MATERIALIZED (SELECT u AS c, v AS x FROM {cur}
          UNION ALL SELECT v, u FROM {cur}),
mn{i} AS MATERIALIZED (SELECT c, least(c, min(x)) AS m FROM nb{i} GROUP BY c),
e{i + 1} AS MATERIALIZED (
  SELECT DISTINCT least(t.x, t.m) AS u, greatest(t.x, t.m) AS v
  FROM (SELECT n.c, n.x, s.m FROM nb{i} n JOIN mn{i} s USING (c)
        WHERE n.x < n.c
        UNION ALL SELECT c, c, m FROM mn{i}) t
  WHERE t.x <> t.m)""")
        cur = f"e{i + 1}"
    parts.append(f""",
nonstar AS MATERIALIZED (
  SELECT (SELECT count(*) FROM {cur} a JOIN {cur} b ON a.v = b.u)
       + (SELECT count(*) FROM (SELECT v FROM {cur}
                                GROUP BY v HAVING count(DISTINCT u) > 1)) AS n),
rep AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN (SELECT n FROM nonstar) > 0 THEN -1
              ELSE min(rep_id) END AS rep_id
  FROM (SELECT v AS doc_id, u AS rep_id FROM {cur}
        UNION ALL SELECT u, u FROM {cur})
  GROUP BY doc_id)""")
    return "".join(parts)


def winnow_overlap_oracle(
    k: int = 5,
    w: int = 4,
    min_shared: int = 3,
    max_df: int = 100,
    topn: int = 100,
) -> str:
    """Replay of ``dedup.winnow_overlap``: positional tokens -> xxhash64
    -> k-long gram chain over lead()ed token hashes (zero-padded tail,
    pos==1 fallback for short docs — the minhash shingle rules
    generalized to k) -> per-doc window MIN over w consecutive gram
    positions (SIGNED comparison: Spark's min runs on signed longs, so
    the UBIGINT chain value converts via xxh64_sql.signed before the
    min) -> distinct fingerprints -> document-frequency cap -> pair join
    -> totally-ordered top-n."""
    tok_hash = X.render_select(
        X.str_hash_cols("tok", "th"), ["th"], "toks", passthrough=["tok"]
    )
    gram = X.render_select(
        X.chain_cols("gh", ["th0"] + [f"th{i}c" for i in range(1, k)]),
        ["gh"],
        "kept",
        passthrough=["doc_id", "pos"],
    )
    lead_cols = ", ".join(
        f"lead(th, {i}) OVER (PARTITION BY doc_id ORDER BY pos) AS th{i}"
        for i in range(1, k)
    )
    pad_cols = ", ".join(
        f"coalesce(th{i}, CAST(0 AS UBIGINT)) AS th{i}c" for i in range(1, k)
    )
    return f"""
WITH tokpos AS MATERIALIZED (
  SELECT doc_id, u.pos, u.tok
  FROM (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS l
    FROM documents WHERE text IS NOT NULL
  ) t, LATERAL (
    SELECT generate_subscripts(l, 1) AS pos, unnest(l) AS tok
  ) u
),
toks AS MATERIALIZED (SELECT DISTINCT tok FROM tokpos),
tokh AS MATERIALIZED ({tok_hash}),
ex AS MATERIALIZED (SELECT doc_id, pos, th FROM tokpos JOIN tokh USING (tok)),
leads AS MATERIALIZED (
  SELECT doc_id, pos, th AS th0, {lead_cols}
  FROM ex
),
kept AS MATERIALIZED (
  SELECT doc_id, pos, th0, {pad_cols}
  FROM leads WHERE th{k - 1} IS NOT NULL OR pos = 1
),
grams AS MATERIALIZED ({gram}),
winfp AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         min({X.signed('gh')}) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
  FROM grams
),
ok AS MATERIALIZED (
  SELECT fp FROM winfp GROUP BY fp
  HAVING count(*) BETWEEN 2 AND {max_df}
),
f2 AS MATERIALIZED (SELECT doc_id, fp FROM winfp JOIN ok USING (fp)),
pairs AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS shared_fps
  FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= {min_shared}
)
SELECT doc_a, doc_b, shared_fps FROM pairs
ORDER BY shared_fps DESC, doc_a ASC, doc_b ASC
LIMIT {topn}
"""


def cdc_chunk_stats_oracle(window: int = 16, mask_bits: int = 6) -> str:
    """Replay of ``operators/cdc.cdc_chunk_stats``: the shared chunk CTEs
    plus the engine's two-phase (lang, hash) rollup."""
    return f"""
WITH {_cdc_chunk_ctes(window, mask_bits)},
per_hash AS MATERIALIZED (
  SELECT t.lang, h.ch, count(*) AS dups, max(t.clen) AS clen
  FROM ctext t JOIN chashed h USING (tok)
  GROUP BY t.lang, h.ch
)
SELECT lang,
       CAST(sum(dups) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_unique_chunks,
       CAST(sum(dups * clen) AS BIGINT) AS chars_total,
       CAST(sum(clen) AS BIGINT) AS chars_unique,
       round(1.0 - CAST(sum(clen) AS DOUBLE)
                   / CAST(sum(dups * clen) AS DOUBLE), 6) AS dup_char_frac
FROM per_hash GROUP BY lang
"""


def stream_cdc_chunk_store_oracle(
    window: int = 16, mask_bits: int = 6, n_slices: int = 3
) -> str:
    """Replay of ``streaming.stream.streamed_cdc_chunk_store``: the same
    chunk replay, batches assigned by the stream's fixed id-range rule
    (even docs = seed batch −1; odd docs in ``n_slices`` contiguous
    ranges of width (max_odd_id + n_slices) // n_slices + 1). A chunk is
    NEW in the batch holding its hash's first occurrence — the
    stored-chunk set is batch-order-independent, so no recursive walk is
    needed, just a min(batch) per hash. Batches that produced no chunks
    write no ledger row (engine skips the stats partition)."""
    return f"""
WITH {_cdc_chunk_ctes(window, mask_bits)},
par AS MATERIALIZED (
  SELECT CAST((max(doc_id) + {n_slices}) // {n_slices} + 1 AS BIGINT) AS csz
  FROM documents WHERE doc_id % 2 = 1
),
brows AS MATERIALIZED (
  SELECT CASE WHEN t.doc_id % 2 = 0 THEN CAST(-1 AS BIGINT)
              ELSE CAST(t.doc_id // par.csz AS BIGINT) END AS batch_id,
         h.ch AS h, t.clen
  FROM ctext t JOIN chashed h USING (tok) CROSS JOIN par
),
firsts AS MATERIALIZED (SELECT h, min(batch_id) AS batch_id, max(clen) AS clen
           FROM brows GROUP BY h),
per_batch AS MATERIALIZED (
  SELECT batch_id, count(*) AS n_chunks, sum(clen) AS chars_total
  FROM brows GROUP BY batch_id
),
news AS MATERIALIZED (
  SELECT batch_id, count(*) AS n_new_chunks, sum(clen) AS chars_new
  FROM firsts GROUP BY batch_id
)
SELECT p.batch_id,
       CAST(p.n_chunks AS BIGINT) AS n_chunks,
       CAST(coalesce(n.n_new_chunks, 0) AS BIGINT) AS n_new_chunks,
       CAST(p.chars_total AS BIGINT) AS chars_total,
       CAST(coalesce(n.chars_new, 0) AS BIGINT) AS chars_new
FROM per_batch p LEFT JOIN news n USING (batch_id)
"""


def incremental_neardup_oracle(
    num_perm: int = 64,
    shingle_n: int = 3,
    bands: int = 16,
    threshold: float = 0.5,
) -> str:
    """Replay of ``streaming.stream.streamed_incremental_neardup``: the
    even-id docs seed the accepted MinHash index, odd-id docs stream in
    id order and are rejected iff slot agreement / num_perm >= threshold
    against an already-accepted doc (band-bucket candidates only).
    Equals greedy_accept_order over the verified pair graph with evens
    pre-accepted — the equivalence tests/test_stream_dedup.py pins on
    the engine side, replayed here as the recursive LFMIS walk. NULL-text
    docs have no signature (posexplode drops them) and are neither
    accepted nor blockers, matching the WHERE in tokpos."""
    body, agree = _minhash_pair_ctes(num_perm, shingle_n, bands)
    return f"""
WITH RECURSIVE {body},
edges AS MATERIALIZED (
  SELECT doc_a AS id_a, doc_b AS id_b
  FROM cand c
  JOIN sig_arr sa ON sa.doc_id = c.doc_a
  JOIN sig_arr sb ON sb.doc_id = c.doc_b
  WHERE ({agree}) / {float(num_perm)} >= {threshold}
),
nodes AS MATERIALIZED (SELECT doc_id AS id FROM sig_arr),
{lfmis_walk_sql("doc_id")}
"""
