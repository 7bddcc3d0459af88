"""DuckDB-SQL replay of Spark's ``xxhash64`` expression, for oracle
parity of the MinHash / SimHash near-dup queries.

Spark's ``xxhash64`` is XXH64 with seed 42 (sql/catalyst XXH64: 32-byte
stripes, 8-byte words, one 4-byte word, byte tail, avalanche finish;
multi-argument calls chain each argument's hash as the next seed, and an
array argument hashes as the same chain over its elements). Everything
here generates plain single-statement DuckDB SQL:

- 64-bit wrap arithmetic runs in UBIGINT/HUGEINT (DuckDB has no wrapping
  multiply, so products split at 32 bits and reduce mod 2**64 in
  HUGEINT);
- variable-length string input walks the UTF-8 bytes of ``encode(tok)``
  via ``hex()`` + fixed-width ``substr`` parses (little-endian words are
  eight 2-char hex slices concatenated in reverse), with ``list_reduce``
  folding the variable-count word/byte loops;
- fixed-length chains (shingle combine, band buckets) unroll into
  lateral-alias column sequences — DuckDB resolves ``SELECT a AS x,
  f(x) AS y`` left to right, which keeps the generated SQL linear in
  the number of hash steps instead of exponentially nested.

The generated SQL is validated slot-for-slot against Spark's xxhash64 in
tests/test_xxh64_sql.py (random strings incl. multibyte UTF-8 and every
tail-length class, longs, chains, and array inputs).
"""

from __future__ import annotations

TWO64 = 1 << 64
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
SEED = 42


def _lit(v: int) -> str:
    return f"CAST({v % TWO64} AS UBIGINT)"


def uadd(a: str, b: str) -> str:
    """(a + b) mod 2**64 — HUGEINT intermediate, back to UBIGINT."""
    return (
        f"CAST((CAST({a} AS HUGEINT) + CAST({b} AS HUGEINT)) % "
        f"CAST({TWO64} AS HUGEINT) AS UBIGINT)"
    )


def umul(a: str, b: str) -> str:
    """(a * b) mod 2**64. Full 128-bit products overflow HUGEINT, so
    split ``a`` at 32 bits: a*b = a_lo*b + (a_hi*(b mod 2**32) mod 2**32)
    * 2**32 (higher partials vanish mod 2**64); every intermediate stays
    under 2**97."""
    return (
        f"CAST(((CAST(({a}) % 4294967296 AS HUGEINT) * CAST({b} AS HUGEINT)) + "
        f"CAST(((({a}) // 4294967296) * (({b}) % 4294967296)) % 4294967296 AS HUGEINT)"
        f" * CAST(4294967296 AS HUGEINT)) % CAST({TWO64} AS HUGEINT) AS UBIGINT)"
    )


def rotl(x: str, r: int) -> str:
    """64-bit rotate left: low 64-r bits shifted up never overflow."""
    return f"((({x}) % {_lit(1 << (64 - r))}) * {_lit(1 << r)} + (({x}) >> {64 - r}))"


def xor(a: str, b: str) -> str:
    return f"xor({a}, {b})"


def shr(x: str, r: int) -> str:
    return f"(({x}) >> {r})"


def fmix_cols(prefix: str, h: str) -> list[tuple[str, str]]:
    """Avalanche finish as lateral-alias steps; final column {prefix}."""
    return [
        (f"{prefix}_f1", xor(h, shr(h, 33))),
        (f"{prefix}_f2", umul(f"{prefix}_f1", _lit(P2))),
        (f"{prefix}_f3", xor(f"{prefix}_f2", shr(f"{prefix}_f2", 29))),
        (f"{prefix}_f4", umul(f"{prefix}_f3", _lit(P3))),
        (prefix, xor(f"{prefix}_f4", shr(f"{prefix}_f4", 32))),
    ]


def hash_long_cols(prefix: str, v: str, seed: str) -> list[tuple[str, str]]:
    """XXH64.hashLong(v, seed) as lateral-alias steps; final col {prefix}.
    ``v`` and ``seed`` are UBIGINT-domain SQL expressions."""
    cols = [
        (f"{prefix}_a", uadd(seed, _lit(P5 + 8))),
        (f"{prefix}_k", umul(rotl(umul(v, _lit(P2)), 31), _lit(P1))),
        (
            f"{prefix}_b",
            uadd(
                umul(rotl(xor(f"{prefix}_a", f"{prefix}_k"), 27), _lit(P1)),
                _lit(P4),
            ),
        ),
    ]
    cols += fmix_cols(prefix, f"{prefix}_b")
    return cols


def chain_cols(prefix: str, values: list[str], seed: int = SEED) -> list[tuple[str, str]]:
    """Spark xxhash64(v0, v1, ...) over long inputs: each value hashes
    with the previous hash as seed. Final column {prefix}."""
    cols: list[tuple[str, str]] = []
    cur = _lit(seed)
    for i, v in enumerate(values):
        p = prefix if i == len(values) - 1 else f"{prefix}_c{i}"
        cols += hash_long_cols(p, v, cur)
        cur = p
    return cols


def _word8_le(hexs: str, p: str) -> str:
    """Little-endian 8-byte word at 0-based byte offset ``p`` of the hex
    dump ``hexs``: eight 2-char slices concatenated MSB-first."""
    parts = " || ".join(
        f"substr({hexs}, 2*({p})+{15 - 2 * j}, 2)" for j in range(8)
    )
    return f"CAST('0x' || {parts} AS UBIGINT)"


def _word4_le(hexs: str, p: str) -> str:
    parts = " || ".join(
        f"substr({hexs}, 2*({p})+{7 - 2 * j}, 2)" for j in range(4)
    )
    return f"CAST('0x' || {parts} AS UBIGINT)"


def _byte(hexs: str, p: str) -> str:
    return f"CAST('0x' || substr({hexs}, 2*({p})+1, 2) AS UBIGINT)"


def str_hash_cols(tok: str = "tok", prefix: str = "th", seed: int = SEED) -> list[tuple[str, str]]:
    """XXH64.hashUnsafeBytes(utf8(tok), seed) as lateral-alias steps;
    final column {prefix} (UBIGINT). Mirrors Spark's byte walk exactly:
    32-byte stripes (4 accumulators), remaining 8-byte words, one 4-byte
    word, byte tail, avalanche."""
    hx, ln = f"{prefix}_hx", f"{prefix}_len"
    stripe_rnd = lambda acc, x: umul(rotl(uadd(acc, umul(x, _lit(P2))), 31), _lit(P1))  # noqa: E731
    proc8 = lambda acc, x: uadd(  # noqa: E731
        umul(
            rotl(xor(acc, umul(rotl(umul(x, _lit(P2)), 31), _lit(P1))), 27),
            _lit(P1),
        ),
        _lit(P4),
    )
    procb = lambda acc, x: umul(rotl(xor(acc, umul(x, _lit(P5))), 11), _lit(P1))  # noqa: E731

    def reduce_over(init: str, items: str, step) -> str:
        return (
            f"list_reduce(list_prepend({init}, {items}), (acc, x) -> {step('acc', 'x')})"
        )

    inits = [(seed + P1 + P2) % TWO64, (seed + P2) % TWO64, seed % TWO64, (seed - P1) % TWO64]
    cols: list[tuple[str, str]] = [
        (ln, f"octet_length(encode({tok}))"),
        (hx, f"hex(encode({tok}))"),
        (f"{prefix}_n32", f"({ln} // 32)"),
    ]
    for k in range(4):
        items = (
            f"list_transform(range({prefix}_n32), "
            f"i -> {_word8_le(hx, f'32*i + {8 * k}')})"
        )
        cols.append((f"{prefix}_v{k + 1}", reduce_over(_lit(inits[k]), items, stripe_rnd)))
    merged = uadd(
        uadd(rotl(f"{prefix}_v1", 1), rotl(f"{prefix}_v2", 7)),
        uadd(rotl(f"{prefix}_v3", 12), rotl(f"{prefix}_v4", 18)),
    )
    cols.append((f"{prefix}_m0", merged))
    cur = f"{prefix}_m0"
    for k in range(4):
        mixed = xor(cur, umul(rotl(umul(f"{prefix}_v{k + 1}", _lit(P2)), 31), _lit(P1)))
        cols.append((f"{prefix}_m{k + 1}", uadd(umul(mixed, _lit(P1)), _lit(P4))))
        cur = f"{prefix}_m{k + 1}"
    cols += [
        (
            f"{prefix}_s0",
            f"CASE WHEN {ln} >= 32 THEN {cur} ELSE {_lit((seed + P5) % TWO64)} END",
        ),
        (f"{prefix}_s1", uadd(f"{prefix}_s0", f"CAST({ln} AS UBIGINT)")),
        (f"{prefix}_w0", f"(32 * {prefix}_n32)"),
        (f"{prefix}_n8", f"(({ln} - {prefix}_w0) // 8)"),
        (
            f"{prefix}_s2",
            reduce_over(
                f"{prefix}_s1",
                f"list_transform(range({prefix}_n8), "
                f"i -> {_word8_le(hx, f'{prefix}_w0 + 8*i')})",
                proc8,
            ),
        ),
        (f"{prefix}_o4", f"({prefix}_w0 + 8 * {prefix}_n8)"),
        (f"{prefix}_has4", f"({prefix}_o4 + 4 <= {ln})"),
        (
            f"{prefix}_s3",
            f"CASE WHEN {prefix}_has4 THEN "
            + uadd(
                umul(
                    rotl(
                        xor(
                            f"{prefix}_s2",
                            umul(_word4_le(hx, f"{prefix}_o4"), _lit(P1)),
                        ),
                        23,
                    ),
                    _lit(P2),
                ),
                _lit(P3),
            )
            + f" ELSE {prefix}_s2 END",
        ),
        (f"{prefix}_ob", f"({prefix}_o4 + CASE WHEN {prefix}_has4 THEN 4 ELSE 0 END)"),
        (
            f"{prefix}_s4",
            reduce_over(
                f"{prefix}_s3",
                f"list_transform(range({ln} - {prefix}_ob), "
                f"i -> {_byte(hx, f'{prefix}_ob + i')})",
                procb,
            ),
        ),
    ]
    cols += fmix_cols(prefix, f"{prefix}_s4")
    return cols


def render_select(
    cols: list[tuple[str, str]],
    keep: list[str],
    from_sql: str,
    passthrough: list[str] = (),
) -> str:
    """Materialize each step as its own nested-subquery level and project
    ``keep`` (+ ``passthrough`` input columns) at the top.

    One level per step matters: DuckDB's lateral column aliases are
    macro-expanded at bind time, so a chain like fmix (where every step
    references the previous one twice) makes the bound expression tree
    EXPONENTIAL in chain length — a 30-step hash chain never finishes
    binding. A subquery boundary forces each step to bind as a plain
    column reference, keeping the tree linear."""
    q = from_sql
    for name, expr in cols:
        q = f"(SELECT *, {expr} AS {name} FROM {q})"
    outer = ", ".join([*passthrough, *keep])
    return f"SELECT {outer} FROM {q}"


def signed(u: str) -> str:
    """Reinterpret a UBIGINT bit pattern as Spark's signed BIGINT."""
    return (
        f"CAST(CASE WHEN {u} >= CAST(9223372036854775808 AS UBIGINT) "
        f"THEN CAST({u} AS HUGEINT) - CAST({TWO64} AS HUGEINT) "
        f"ELSE CAST({u} AS HUGEINT) END AS BIGINT)"
    )


def unsigned(col: str) -> str:
    """Reinterpret a signed BIGINT's two's-complement bit pattern as
    UBIGINT — the inverse of ``signed``; the single source for feeding
    signed Spark longs (which may be negative) into the integer-keyed
    hash replays (HLL/CMS users, DOULION edge sampling)."""
    return (
        f"CAST(CASE WHEN {col} >= 0 THEN CAST({col} AS HUGEINT) "
        f"ELSE CAST({col} AS HUGEINT) + CAST({TWO64} AS HUGEINT) "
        f"END AS UBIGINT)"
    )


def pmod31(u: str) -> str:
    """Spark pmod(signed(u), 2**31-1) — result BIGINT in [0, 2**31-1)."""
    m = (1 << 31) - 1
    sx = (
        f"(CASE WHEN {u} >= CAST(9223372036854775808 AS UBIGINT) "
        f"THEN CAST({u} AS HUGEINT) - CAST({TWO64} AS HUGEINT) "
        f"ELSE CAST({u} AS HUGEINT) END)"
    )
    return f"CAST((({sx} % {m}) + {m}) % {m} AS BIGINT)"
