"""Replayable single-pass sketch aggregates: a hand-rolled HyperLogLog
distinct-count sketch and a fixed-grid histogram quantile, both built
from pure integer arithmetic so the DuckDB oracle can hash-match them
bit for bit.

Why not Spark's builtins: ``approx_count_distinct`` (HLL++) and
``approx_percentile`` carry engine-private state (bias tables, centroid
merge order) that no other engine can replay — the query was the last
``rows-only`` cell on the driver's correctness board every round since
r1. This module keeps the *scale shape* of those builtins (single pass,
map-side partial aggregation, bounded state: m registers / distinct
value bins per group) but defines the sketch itself:

- **HLL**: hash = Spark ``xxhash64`` (replayed by ``xxh64_sql``);
  register = low ``B`` hash bits; rho = leading-zero count of the
  remaining ``64-B`` bits + 1, computed as ``RMAX - length(bin(w))`` —
  ``bin()`` renders minimal-width binary in BOTH engines, so bit-length
  is a string length, no float log anywhere. Per-register max(rho)
  folds under partial aggregation exactly like the builtin.
- **Estimator**: classic Flajolet HLL with linear-counting fallback,
  integerized. The harmonic sum runs over integers
  ``Z = sum(2^(RMAX - rho_max))`` (DECIMAL / HUGEINT — each term a
  power of two, no float summation-order hazard), alpha_m is the exact
  rational ``7213·m·1000 / (10000·(1000·m + 1079))``, and the estimate
  is one integer floor-division. The linear-counting branch
  ``round(m·ln(m/V))`` is a shared 1024-entry integer table generated
  ONCE in Python (`_lc_table`) and embedded as a literal on both sides
  — determinism comes from both engines reading the same constants,
  not from agreeing about ``ln``.
- **Quantile**: fixed-grid histogram — bin = ``floor(value·SCALE)``
  (one IEEE multiply, identical in both engines), p50 = first bin whose
  cumulative count reaches ``(n+1) div 2``, reported as
  ``bin / SCALE``. Mergeable (bin counts add), single-pass, and the
  grid resolution bounds the error instead of a sketch's rank bound.

At 100 TB both aggregates keep the builtin's cost model: one scan, full
map-side combine, per-group state capped at ``m`` registers /
``max_value·SCALE`` bins, tiny final shuffle. The Spark-native
HLL++/quantile-sketch twin stays available as
``plans.star.approx_distinct_stats_native`` (use it when oracle parity
is not required and you want rsd control); accuracy of THIS sketch is
bounded against the exact companion in tests/test_sketches.py.

Reference parity: the reference has no sketches at all (951 LoC of
pandas + Redshift SQL); this is part of the beyond-reference
large-scale family, same as the ANN/near-dup operators.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import xxh64_sql as X

# sketch geometry — shared by the Spark query and the DuckDB oracle.
B = 10  # register index bits
M = 1 << B  # 1024 registers; rsd ~ 1.04/sqrt(m) = 3.25%
RMAX = 64 - B + 1  # max rho (all 54 remaining bits zero)
# alpha_m = 0.7213/(1 + 1.079/m) as an exact rational
A_NUM = 7213 * M * 1000
A_DEN = 10000 * (1000 * M + 1079)
# E_raw = (A_NUM * m^2 * 2^RMAX) div (A_DEN * Z); numerator ~2.8e32
_EST_NUM = A_NUM * M * M * (1 << RMAX)
_LC_CUTOFF = (5 * M) // 2  # linear counting below 2.5m, the classic rule
P50_SCALE = 1000  # histogram grid: 1/1000 of a value unit


def _lc_table() -> list[int]:
    """Linear-counting estimates round(m*ln(m/V)) for V=1..m, as shared
    integer constants (index V-1). Generated once; both engines read
    these literals, so libm-vs-Math.log ulp differences can't split."""
    return [round(M * math.log(M / v)) for v in range(1, M + 1)]


def hll_registers(rows: DataFrame, group, hash_col) -> DataFrame:
    """Per-(group, register) max(rho) — the HLL sketch STATE. This
    relation is the mergeable object: max is idempotent and
    commutative, so register tables from partitions, days, or streaming
    micro-batches union+max into the sketch of the union of inputs.
    ``group`` may be one column name or a list (composite keys, e.g. the
    per-``batch_date`` partials of the persisted sketch store)."""
    gcols = [group] if isinstance(group, str) else list(group)
    return (
        rows.select(
            *[F.col(g) for g in gcols],
            hash_col.alias("uh"),
        )
        # low B bits: non-negative for any signed input; remaining 54
        # bits via logical shift (>= 0, so bin()'s minimal width is the
        # bit length and rho = RMAX - bitlen, pure integer)
        .withColumn("reg", F.expr(f"uh & {M - 1}"))
        .withColumn("w", F.expr(f"shiftrightunsigned(uh, {B})"))
        .withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(RMAX)).otherwise(
                F.lit(RMAX) - F.length(F.bin("w"))
            ),
        )
        .groupBy(*gcols, "reg")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate(regs: DataFrame, group) -> DataFrame:
    """Estimator over a register table (from ``hll_registers`` or a
    merge of several): integer harmonic sum, exact-rational alpha,
    shared linear-counting table — the replayable half. ``group`` may
    be one column name or a list (composite keys, e.g. the pair-union
    sketches of ``hll_user_overlap``)."""
    gcols = [group] if isinstance(group, str) else list(group)
    sketch = regs.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), {RMAX} - rho_max) AS DECIMAL(17,0))")
        ).alias("z_present"),
    )
    import pandas as pd

    # pandas/Arrow local relation: the tuple form re-evaluates through a
    # Python-RDD worker round trip at every action that broadcasts it
    # (round 10); the Arrow batch deserializes JVM-side. Same table.
    _lc = _lc_table()
    lc = F.broadcast(
        regs.sparkSession.createDataFrame(
            pd.DataFrame(
                {"v": [v + 1 for v in range(len(_lc))], "lc_est": _lc}
            ),
            "v INT, lc_est BIGINT",
        )
    )
    est = (
        sketch.withColumn("v_zero", F.lit(M) - F.col("n_regs"))
        .withColumn(
            "z",
            F.expr(
                f"CAST(z_present AS DECIMAL(21,0))"
                f" + CAST(v_zero AS DECIMAL(21,0)) * CAST({1 << RMAX} AS DECIMAL(17,0))"
            ),
        )
        .withColumn(
            "e_raw",
            F.expr(
                f"CAST({_EST_NUM} AS DECIMAL(33,0)) div "
                f"(CAST({A_DEN} AS DECIMAL(11,0)) * z)"
            ),
        )
        .join(lc, F.col("v_zero") == F.col("v"), "left")
        .withColumn(
            "approx_users",
            F.when(
                (F.col("e_raw") <= _LC_CUTOFF) & (F.col("v_zero") > 0),
                F.col("lc_est"),
            ).otherwise(F.col("e_raw")),
        )
    )
    return est.select(*gcols, "approx_users")


def _p50_agg(rows: DataFrame, group: str, value: str) -> DataFrame:
    """Per-``group`` histogram-quantile p50 of ``value`` — one-quantile
    view of the shared grid sketch (``value_grid_bins`` +
    ``grid_quantile_stats``; rank (total+1) div 2 == ceil(total/2))."""
    return grid_quantile_stats(
        value_grid_bins(rows, group, value), group, quants=(("p50", 1, 2),)
    )


def hll_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL SET ALGEBRA over the per-event-type user sketches: for every
    type pair (a < b), the distinct-user estimates of a, of b, of their
    UNION (register-wise max — the sketch merge law), and the
    inclusion-exclusion intersection estimate
    ``greatest(0, users_a + users_b − union)``.

    The 100 TB story: audience-overlap questions ("how many users do
    type a and type b share?") without ever shuffling user ids — ONE
    register build over the events scan (m registers per type), then
    pure sketch arithmetic; pair unions merge 2m-row register slices,
    never data. Everything integer end to end (the replayable-HLL
    contract), so the DuckDB oracle hash-matches the whole frame
    including the union estimates."""
    from ..plans.star import load

    ev = load(spark, sf_dir, "events")
    regs = hll_registers(
        ev, "event_type", F.xxhash64("user_id")
    ).localCheckpoint(eager=True)
    singles = hll_estimate(regs, "event_type")
    types = regs.select("event_type").distinct()
    # |types|²-bounded inequality cross (never data) — checkpoint so the
    # tiny pair table materializes ONCE for its two register joins
    # instead of re-running the cross per branch
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
        .localCheckpoint(eager=True)
    )
    m_a = pairs.join(
        regs.withColumnRenamed("event_type", "type_a"), "type_a"
    ).select("type_a", "type_b", "reg", "rho_max")
    m_b = pairs.join(
        regs.withColumnRenamed("event_type", "type_b"), "type_b"
    ).select("type_a", "type_b", "reg", "rho_max")
    u_regs = (
        m_a.unionByName(m_b)
        .groupBy("type_a", "type_b", "reg")
        .agg(F.max("rho_max").alias("rho_max"))
    )
    u_est = hll_estimate(u_regs, ["type_a", "type_b"]).withColumnRenamed(
        "approx_users", "approx_union"
    )
    s_a = singles.select(
        F.col("event_type").alias("type_a"),
        F.col("approx_users").alias("users_a"),
    )
    s_b = singles.select(
        F.col("event_type").alias("type_b"),
        F.col("approx_users").alias("users_b"),
    )
    return (
        u_est.join(s_a, "type_a")
        .join(s_b, "type_b")
        .select(
            "type_a",
            "type_b",
            "users_a",
            "users_b",
            "approx_union",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("users_a") + F.col("users_b") - F.col("approx_union"),
            ).alias("approx_overlap"),
        )
    )


def _hll_est_chain(groups: str, regs: str, prefix: str) -> str:
    """sketch→est→users CTE chain over register table ``regs`` grouped
    by ``groups`` (comma-joined column list); requires the shared
    ``lc(v, lc_est)`` CTE in scope. Emits ``{prefix}users(groups...,
    approx_users)`` — the generic replay of ``hll_estimate``."""
    return f"""{prefix}sketch AS MATERIALIZED (
  SELECT {groups},
         count(*) AS n_regs,
         sum(CAST(1 AS BIGINT) << ({RMAX} - rho_max)) AS z_present
  FROM {regs} GROUP BY {groups}
),
{prefix}est AS MATERIALIZED (
  SELECT {groups},
         ({M} - n_regs) AS v_zero,
         CAST({_EST_NUM} AS HUGEINT)
           // (CAST({A_DEN} AS HUGEINT)
               * (CAST(z_present AS HUGEINT)
                  + CAST(({M} - n_regs) AS HUGEINT)
                    * CAST({1 << RMAX} AS HUGEINT)))
           AS e_raw
  FROM {prefix}sketch
),
{prefix}users AS MATERIALIZED (
  SELECT {groups},
         CAST(CASE WHEN e_raw <= {_LC_CUTOFF} AND v_zero > 0
                   THEN lc.lc_est ELSE e_raw END AS BIGINT) AS approx_users
  FROM {prefix}est LEFT JOIN lc ON lc.v = {prefix}est.v_zero
)"""


def hll_overlap_oracle_sql() -> str:
    """DuckDB replay of ``hll_user_overlap``: the shared hashes/regs
    build (``_hll_regs_ctes`` — same text as the users replay), the
    generic estimator chain once over single types and once over
    pair-union register merges, then inclusion-exclusion in plain
    BIGINT arithmetic."""
    return f"""
WITH {_hll_regs_ctes()},
{_hll_est_chain("event_type", "regs", "s_")},
pairs AS MATERIALIZED (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM regs) a,
       (SELECT DISTINCT event_type FROM regs) b
  WHERE a.event_type < b.event_type
),
uregs AS MATERIALIZED (
  SELECT p.type_a, p.type_b, r.reg, max(r.rho_max) AS rho_max
  FROM pairs p
  JOIN regs r ON r.event_type = p.type_a OR r.event_type = p.type_b
  GROUP BY p.type_a, p.type_b, r.reg
),
{_hll_est_chain("type_a, type_b", "uregs", "u_")}
SELECT u.type_a, u.type_b,
       sa.approx_users AS users_a,
       sb.approx_users AS users_b,
       u.approx_users AS approx_union,
       greatest(CAST(0 AS BIGINT),
                sa.approx_users + sb.approx_users - u.approx_users)
         AS approx_overlap
FROM u_users u
JOIN s_users sa ON sa.event_type = u.type_a
JOIN s_users sb ON sb.event_type = u.type_b
"""


#: quantiles the grid sketch reports: (name, numerator, denominator)
QUANTS = (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10))


def value_grid_bins(rows: DataFrame, group, value: str) -> DataFrame:
    """Per-``group`` fixed-grid histogram of ``value``: (group, bin, n)
    with bin = floor(value·P50_SCALE). THE mergeable quantile state —
    bin counts add (the CMS SUM law), so per-partition, per-day or
    per-micro-batch grids merge into exactly the grid of the union;
    state is bounded by grid resolution × value range, never row count.
    NULL values are dropped on both engines (NULL bin ordering differs
    between Spark and DuckDB window sorts). ``group`` may be one column
    name or a list (per-``batch_date`` sketch-store partials)."""
    gcols = [group] if isinstance(group, str) else list(group)
    return (
        rows.filter(F.col(value).isNotNull())
        .withColumn(
            "bin", F.expr(f"CAST(floor({value} * {P50_SCALE}) AS BIGINT)")
        )
        .groupBy(*gcols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def grid_quantile_stats(
    bins: DataFrame, group: str, quants=QUANTS
) -> DataFrame:
    """Quantile walk over a FINISHED grid (``value_grid_bins`` output or
    any merged union of such grids): one window cumsum bounded by
    distinct bins, then a single aggregate takes every quantile as the
    first bin whose cumulative count reaches rank ceil(total·q) =
    (total·num + den − 1) div den — integer ranks, so engine and oracle
    agree exactly; the reported value is bin/SCALE rounded to 6 dp."""
    w = Window.partitionBy(group).orderBy("bin")
    c = bins.withColumn(
        "cum", F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn(
        "total",
        F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )
    aggs = [
        F.min(
            F.when(
                F.col("cum")
                >= F.expr(f"(total * {num} + {den - 1}) div {den}"),
                F.col("bin"),
            )
        ).alias(f"bin_{nm}")
        for nm, num, den in quants
    ]
    hit = c.groupBy(group).agg(*aggs)
    return hit.select(
        group,
        *[
            F.round(F.col(f"bin_{nm}") / F.lit(float(P50_SCALE)), 6).alias(
                f"approx_{nm}"
            )
            for nm, _, _ in quants
        ],
    )


def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type grid-sketch quantiles (p25/p50/p75/p90) over
    events.value — the mergeable companion to the exact percentiles in
    plans/star.py: ONE map-side-combinable grid aggregate + a walk
    bounded by distinct bins. The streaming twin
    (stream.streamed_value_quantiles) shares this oracle because bin
    counts SUM across micro-batches into the grid of the union."""
    from ..plans.star import load

    ev = load(spark, sf_dir, "events")
    return grid_quantile_stats(
        value_grid_bins(ev, "event_type", "value"), "event_type"
    )


def value_drift_by_type(
    spark: SparkSession, sf_dir: str, split_mod: int = 2
) -> DataFrame:
    """Distribution-drift detector: per event_type, the TOTAL-VARIATION
    distance between the value distributions of two event populations
    (here: even vs odd event_id — a deterministic stand-in for
    yesterday-vs-today windows), measured over the shared 1/1000 value
    grid.

    TV = ½ Σ_bins |p_a(bin) − p_b(bin)| is computed EXACTLY in integers:
    with o = per-bin count in A (total Na) and b = per-bin count in B
    (total Nb), Σ |o·Nb − b·Na| is a BIGINT sum of BIGINT terms — no
    float summation anywhere — and TV = that sum / (2·Na·Nb) is ONE
    correctly-rounded 6-dp divide (the clustering-coeff convention), so
    the oracle hash-matches. This is the drift statistic a chi-square
    can't give exactly (per-bin denominators defeat a common integer
    scale); TV is also bounded [0,1] and threshold-friendly.

    Scale: one grid aggregate per side (map-side combinable, state =
    grid cells), a full-outer join bounded by distinct bins, one
    map-side-combinable |diff| sum. Returns (event_type, n_a, n_b,
    tv_distance)."""
    from ..plans.star import load

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    a = ev.filter(F.col("event_id") % split_mod == 0)
    b = ev.filter(F.col("event_id") % split_mod != 0)
    ga = value_grid_bins(a, "event_type", "value").withColumnRenamed("n", "o")
    gb = value_grid_bins(b, "event_type", "value").withColumnRenamed("n", "b")
    na = a.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_b"))
    joined = (
        ga.join(gb, ["event_type", "bin"], "full_outer")
        .na.fill({"o": 0, "b": 0})
        .join(na, "event_type")
        .join(nb, "event_type")
    )
    num = joined.groupBy("event_type", "n_a", "n_b").agg(
        F.sum(F.abs(F.col("o") * F.col("n_b") - F.col("b") * F.col("n_a"))).alias(
            "num"
        )
    )
    return num.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(
            F.col("num") / (F.lit(2.0) * F.col("n_a") * F.col("n_b")), 6
        ).alias("tv_distance"),
    )


def drift_from_side_grid(grid: DataFrame) -> DataFrame:
    """TV-distance frame from a FINISHED two-sided grid
    (event_type, side ∈ {0,1}, bin, n) — the batch tail shared by
    ``value_drift_by_type``'s streaming twin: per-side totals, the
    full-outer bin alignment expressed as conditional sums over the one
    grid, exact BIGINT numerator, one 6-dp divide."""
    pivoted = grid.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("side") == 0, F.col("n")).otherwise(F.lit(0))).alias("o"),
        F.sum(F.when(F.col("side") == 1, F.col("n")).otherwise(F.lit(0))).alias("b"),
    )
    tot = grid.groupBy("event_type").agg(
        F.sum(F.when(F.col("side") == 0, F.col("n")).otherwise(F.lit(0))).alias("n_a"),
        F.sum(F.when(F.col("side") == 1, F.col("n")).otherwise(F.lit(0))).alias("n_b"),
    )
    num = (
        pivoted.join(tot, "event_type")
        .groupBy("event_type", "n_a", "n_b")
        .agg(
            F.sum(
                F.abs(F.col("o") * F.col("n_b") - F.col("b") * F.col("n_a"))
            ).alias("num")
        )
    )
    # one-sided types (all events on one parity) are ABSENT, matching
    # the batch twin's inner na/nb joins and the shared oracle — without
    # this, Spark's x/0.0 NULL (non-ANSI) would emit a NULL-tv row the
    # oracle doesn't have
    return (
        num.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.round(
                F.col("num") / (F.lit(2.0) * F.col("n_a") * F.col("n_b")), 6
            ).alias("tv_distance"),
        )
    )


def value_drift_oracle_sql(split_mod: int = 2) -> str:
    """DuckDB replay of ``value_drift_by_type``: same grid, same exact
    integer numerator, same single 6-dp divide."""
    return f"""
WITH ev AS MATERIALIZED (
  SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
),
ga AS MATERIALIZED (
  SELECT event_type, CAST(floor(value * {P50_SCALE}) AS BIGINT) AS bin,
         count(*) AS o
  FROM ev WHERE event_id % {split_mod} = 0 GROUP BY event_type, bin
),
gb AS MATERIALIZED (
  SELECT event_type, CAST(floor(value * {P50_SCALE}) AS BIGINT) AS bin,
         count(*) AS b
  FROM ev WHERE event_id % {split_mod} <> 0 GROUP BY event_type, bin
),
na AS MATERIALIZED (
  SELECT event_type, count(*) AS n_a FROM ev
  WHERE event_id % {split_mod} = 0 GROUP BY event_type
),
nb AS MATERIALIZED (
  SELECT event_type, count(*) AS n_b FROM ev
  WHERE event_id % {split_mod} <> 0 GROUP BY event_type
),
j AS MATERIALIZED (
  SELECT coalesce(ga.event_type, gb.event_type) AS event_type,
         coalesce(o, 0) AS o, coalesce(b, 0) AS b
  FROM ga FULL OUTER JOIN gb
    ON ga.event_type = gb.event_type AND ga.bin = gb.bin
),
num AS MATERIALIZED (
  SELECT j.event_type, na.n_a, nb.n_b,
         sum(abs(o * nb.n_b - b * na.n_a)) AS num
  FROM j JOIN na ON na.event_type = j.event_type
         JOIN nb ON nb.event_type = j.event_type
  GROUP BY j.event_type, na.n_a, nb.n_b
)
SELECT event_type, n_a, n_b,
       round(CAST(num AS DOUBLE) / (2.0 * n_a * n_b), 6) AS tv_distance
FROM num
"""


def grid_quantiles_oracle_sql(
    group: str = "event_type",
    value: str = "value",
    table: str = "events",
    quants=QUANTS,
) -> str:
    """DuckDB replay of ``value_quantiles`` / the streaming twin: same
    grid, same integer ranks, same 6-dp rounding. The cumulative window
    is RANGE-framed by default but bins are DISTINCT per group, so it
    equals the engine's ROWS frame."""
    qcols = ",\n  ".join(
        f"round(min(CASE WHEN cum >= (total * {num} + {den - 1}) // {den} "
        f"THEN bin END) / {P50_SCALE}.0, 6) AS approx_{nm}"
        for nm, num, den in quants
    )
    return f"""
WITH bins AS MATERIALIZED (
  SELECT {group}, CAST(floor({value} * {P50_SCALE}) AS BIGINT) AS bin,
         count(*) AS n
  FROM {table} WHERE {value} IS NOT NULL
  GROUP BY {group}, bin
),
c AS MATERIALIZED (
  SELECT {group}, bin, n,
         sum(n) OVER (PARTITION BY {group} ORDER BY bin) AS cum,
         sum(n) OVER (PARTITION BY {group}) AS total
  FROM bins
)
SELECT {group},
  {qcols}
FROM c GROUP BY {group}
"""


def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates over events — per event_type approximate
    distinct users (replayable HLL, m=1024) and approximate median value
    (1/1000-grid histogram quantile). Same single-pass/mergeable scale
    shape as approx_count_distinct + approx_percentile, but hash-checked
    against the DuckDB oracle instead of rows-only."""
    from ..plans.star import load

    ev = load(spark, sf_dir, "events")
    users = hll_estimate(
        hll_registers(ev, "event_type", F.xxhash64("user_id")), "event_type"
    )
    p50 = _p50_agg(ev, "event_type", "value")
    return users.join(p50, "event_type").select(
        "event_type", "approx_users", "approx_p50"
    )


# -------------------------------------------------------------- Bloom filter
# semi-join pruning — the runtime-filter pattern: instead of shuffling a
# 100 TB probe side into an anti/semi join against a banned-key list,
# build a fixed-size bit array over the banned keys once, broadcast it,
# and pre-filter map-side; only bloom-POSITIVE rows continue to the
# exact verify. Bits are 32-bit words (bit 31 max — no sign-bit
# divergence between Spark's signed BIGINT and DuckDB), positions from
# the same Kirsch-Mitzenmacher double hashing as the CMS.
BLOOM_M = 1 << 10  # 1024 bits — sized to show real false positives at sf0.1
BLOOM_K = 3
_NORM = "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"


def bloom_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, source, h1, h2, fph) for non-NULL-text documents — the
    normalized-text xxhash64 split shared by the bloom build, the probe,
    and the streaming twin."""
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "source",
        F.expr(f"xxhash64({_NORM}) & 4294967295").alias("h1"),
        F.expr(f"shiftrightunsigned(xxhash64({_NORM}), 32)").alias("h2"),
        F.expr(f"xxhash64({_NORM})").alias("fph"),
    )


def bloom_positions(df: DataFrame) -> DataFrame:
    """Explode each (h1, h2) row into its BLOOM_K (word, mask) bit
    positions (32-bit words, bit 31 max — the BIGINT sign bit is never
    touched)."""
    return df.select(
        *df.columns,
        F.explode(
            F.array(
                *[
                    F.expr(f"(h1 + {j} * h2) & {BLOOM_M - 1}").alias("p")
                    for j in range(BLOOM_K)
                ]
            )
        ).alias("pos"),
    ).select(
        *df.columns,
        F.expr("pos >> 5").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), pos & 31)").alias("mask"),
    )


def bloom_build(fp: DataFrame) -> DataFrame:
    """(word, bits) bloom table from a fingerprint frame — map-side
    combinable bit_or down to m/32 = 32 words."""
    return (
        bloom_positions(fp.select("h1", "h2"))
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_probe_stats(
    spark: SparkSession, sf_dir: str, bloom: DataFrame, banned_mod: int = 17
) -> DataFrame:
    """Probe the corpus against a (word, bits) bloom table and roll up
    per-source accounting (n_docs, n_flagged, n_banned, n_false_pos) —
    the validation side shared by the batch and STREAMING bloom builds
    (bit_or is idempotent and commutative, so per-micro-batch partial
    blooms OR into exactly the bloom of the union)."""
    from ..plans.star import load

    docs = load(spark, sf_dir, "documents")
    fp = bloom_fingerprints(docs)
    banned = fp.filter(F.col("doc_id") % banned_mod == 0)
    probed = (
        bloom_positions(fp)
        .join(F.broadcast(bloom), "word", "left")
        .withColumn(
            "hit",
            F.when(
                F.coalesce(F.expr("bits & mask"), F.lit(0)) != 0, 1
            ).otherwise(0),
        )
        .groupBy("doc_id", "source", "fph")
        .agg(F.min("hit").alias("flagged"))
    )
    exact = banned.select(F.col("fph").alias("bfp")).distinct()
    scored = probed.join(
        F.broadcast(exact), probed.fph == exact.bfp, "left"
    ).select(
        "source",
        "flagged",
        F.when(F.col("bfp").isNotNull(), 1).otherwise(0).alias("banned"),
    )
    # NULL-text docs never probe (no fingerprint) but still count
    null_docs = (
        docs.filter(F.col("text").isNull())
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_null"))
    )
    per_src = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("flagged").alias("n_flagged"),
        F.sum("banned").alias("n_banned"),
        F.sum(F.expr("flagged - banned")).alias("n_false_pos"),
    )
    return (
        per_src.join(null_docs, "source", "left")
        .select(
            "source",
            (F.col("n_probed") + F.coalesce("n_null", F.lit(0))).alias("n_docs"),
            "n_flagged",
            "n_banned",
            "n_false_pos",
        )
    )


def bloom_contamination_stats(
    spark: SparkSession, sf_dir: str, banned_mod: int = 17
) -> DataFrame:
    """Per-source contamination-prune accounting through a Bloom
    pre-filter: documents whose normalized text fingerprint hits the
    banned-set bloom are 'flagged' (would continue to exact verification
    at scale); the exact semi-join gives ground truth, and
    n_false_pos = flagged − exact measures the filter. Banned set =
    docs with doc_id % banned_mod == 0 (deterministic stand-in for a
    benchmark-contamination list).

    Scale shape: the bloom build aggregates to m/32 = 32 words
    (map-side combinable bit_or), broadcasts; the probe is map-only over
    the corpus. All-integer → DuckDB replays the filter bit for bit.
    The streaming twin (stream.streamed_bloom_contamination) builds the
    SAME bloom as a continuous bit_or aggregate and shares this probe
    and oracle."""
    from ..plans.star import load

    fp = bloom_fingerprints(load(spark, sf_dir, "documents"))
    bloom = bloom_build(fp.filter(F.col("doc_id") % banned_mod == 0))
    return bloom_probe_stats(spark, sf_dir, bloom, banned_mod=banned_mod)


def bloom_oracle_sql(banned_mod: int = 17) -> str:
    """DuckDB replay of ``bloom_contamination_stats``: xxhash64 of the
    normalized text via xxh64_sql (distinct norms only), identical
    double-hashed positions, 32-bit-word bit_or build, same probe and
    per-source rollup."""
    norm_hash = X.render_select(
        X.str_hash_cols("tok", "th"), ["th"], "norms", passthrough=["tok"]
    )
    return f"""
WITH nd AS MATERIALIZED (
  SELECT doc_id, source,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS tok
  FROM documents WHERE text IS NOT NULL
),
norms AS MATERIALIZED (SELECT DISTINCT tok FROM nd),
th AS MATERIALIZED ({norm_hash}),
fp AS MATERIALIZED (
  SELECT d.doc_id, d.source, {X.signed('h.th')} AS fph,
         h.th % 4294967296 AS h1, h.th // 4294967296 AS h2
  FROM nd d JOIN th h USING (tok)
),
ppos AS MATERIALIZED (
  SELECT doc_id, source, fph,
         CAST(((h1 + j * h2) % {BLOOM_M}) // 32 AS BIGINT) AS word,
         (CAST(1 AS BIGINT)
          << CAST(((h1 + j * h2) % {BLOOM_M}) % 32 AS INT)) AS mask
  FROM fp, (SELECT unnest(range({BLOOM_K})) AS j)
),
bloom AS MATERIALIZED (
  SELECT word, bit_or(mask) AS bits FROM ppos
  WHERE doc_id % {banned_mod} = 0 GROUP BY word
),
probe AS MATERIALIZED (
  SELECT doc_id, source, fph,
         min(CASE WHEN coalesce(b.bits & p.mask, 0) <> 0
                  THEN 1 ELSE 0 END) AS flagged
  FROM ppos p LEFT JOIN bloom b USING (word)
  GROUP BY doc_id, source, fph
),
banned_fps AS MATERIALIZED (
  SELECT DISTINCT fph FROM fp WHERE doc_id % {banned_mod} = 0
),
scored AS MATERIALIZED (
  SELECT p.source, p.flagged,
         CASE WHEN b.fph IS NOT NULL THEN 1 ELSE 0 END AS banned
  FROM probe p LEFT JOIN banned_fps b ON b.fph = p.fph
),
nulls AS MATERIALIZED (
  SELECT source, count(*) AS n_null FROM documents
  WHERE text IS NULL GROUP BY source
)
SELECT s.source,
       CAST(count(*) + coalesce(any_value(n.n_null), 0) AS BIGINT) AS n_docs,
       CAST(sum(s.flagged) AS BIGINT) AS n_flagged,
       CAST(sum(s.banned) AS BIGINT) AS n_banned,
       CAST(sum(s.flagged - s.banned) AS BIGINT) AS n_false_pos
FROM scored s LEFT JOIN nulls n USING (source)
GROUP BY s.source
"""


# ---------------------------------------------------------------- Count-Min
# sketch: the mergeable fixed-size frequency estimator (Cormode &
# Muthukrishnan). d rows x w counters; per occurrence, row j increments
# counter idx_j(token); a point estimate is min_j counter[j][idx_j] and
# NEVER undercounts. Row hashes come from ONE xxhash64 per token via
# Kirsch-Mitzenmacher double hashing (idx_j = (h_lo32 + j*h_hi32) mod w
# — the published two-hash construction), so the DuckDB oracle replays
# the whole sketch from the existing string-hash machinery.
CMS_D = 4
CMS_W = 1024


def _cms_idx_exprs_spark(d: int = CMS_D, w: int = CMS_W):
    """j -> Spark Column computing idx_j from columns h1/h2 (the low and
    high 32 bits of the signed xxhash64). Pure integer: h1 + j*h2 is at
    most 2^34, no overflow anywhere."""
    return {j: F.expr(f"(h1 + {j} * h2) & {w - 1}") for j in range(d)}


def cms_user_positions(rows: DataFrame, key: str = "user_id", extra=()) -> DataFrame:
    """One CMS (j, idx) increment row per occurrence of integer column
    ``key`` — the shared position explode behind the batch probe, the
    streaming counter aggregate, and the sketch store's per-day
    partials. ``extra`` columns (e.g. batch_date) ride along as partial
    group keys."""
    idx = _cms_idx_exprs_spark()
    hashed = rows.select(
        *[F.col(c) for c in extra],
        F.expr(f"xxhash64({key}) & 4294967295").alias("h1"),
        F.expr(f"shiftrightunsigned(xxhash64({key}), 32)").alias("h2"),
    )
    return hashed.select(
        *[F.col(c) for c in extra],
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), idx[j].alias("idx"))
                    for j in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select(*extra, "p.j", "p.idx")


def cms_heavy_hitters(
    spark: SparkSession, sf_dir: str, top_n: int = 50
) -> DataFrame:
    """Heavy-hitter tokens over the documents corpus with Count-Min
    estimates next to exact counts.

    Two aggregations over one token explode:

    - the SKETCH: per (row j, counter idx) occurrence counts — at most
      d*w = 4096 rows whatever the corpus size, full map-side combine
      (this is the piece that scales to 100 TB: fixed memory, mergeable
      across partitions/days, no token shuffle);
    - the EXACT top-n (count DESC, token) — the validation side, which a
      production pipeline would drop once the sketch is trusted.

    The probe explodes each candidate token into its d counter positions
    and takes min(counter) — the CMS point estimate, guaranteed
    >= exact. Output: token, exact_n, cms_est, overcount (all BIGINT).
    Top-n MEMBERSHIP is totally ordered ((exact_n DESC, token) before
    the limit); row order of the returned frame is not guaranteed —
    the driver's compare sorts, and display consumers should orderBy."""
    from ..functions.text import tokens
    from ..plans.star import load

    docs = load(spark, sf_dir, "documents")
    # lowercase BEFORE tokenizing — the oracle splits trim(lower(text)),
    # and the rest of the text family (retrieval._terms, bloom _NORM)
    # lowercases on both sides; without this the engine and the replay
    # hash different tokens on any mixed-case corpus (round-7 ADVICE).
    toks = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    hashed = toks.select(
        "tok",
        F.expr("xxhash64(tok) & 4294967295").alias("h1"),
        F.expr("shiftrightunsigned(xxhash64(tok), 32)").alias("h2"),
    )
    idx = _cms_idx_exprs_spark()
    # one occurrence -> d (j, idx) increments, then the bounded aggregate
    positions = hashed.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), idx[j].alias("idx"))
                    for j in range(CMS_D)
                ]
            )
        ).alias("p")
    ).select("p.j", "p.idx")
    sketch = positions.groupBy("j", "idx").agg(F.count(F.lit(1)).alias("counter"))

    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    # TakeOrderedAndProject, not a global row_number window: the top-n
    # cut runs as per-partition heaps + one driver merge, bounded by n
    cands = exact.orderBy(F.col("exact_n").desc(), "tok").limit(top_n)
    probe = (
        cands.withColumn("h1", F.expr("xxhash64(tok) & 4294967295"))
        .withColumn("h2", F.expr("shiftrightunsigned(xxhash64(tok), 32)"))
        .select(
            "tok",
            "exact_n",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("j"), idx[j].alias("idx"))
                        for j in range(CMS_D)
                    ]
                )
            ).alias("p"),
        )
        .select("tok", "exact_n", "p.j", "p.idx")
    )
    est = (
        probe.join(F.broadcast(sketch), ["j", "idx"])
        .groupBy("tok", "exact_n")
        .agg(F.min("counter").alias("cms_est"))
    )
    return est.select(
        "tok",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
    )


def cms_probe_users(
    spark: SparkSession, sf_dir: str, sketch: DataFrame, top_n: int = 20
) -> DataFrame:
    """Probe a (j, idx, counter) Count-Min sketch over event user_ids with
    the exact top-``top_n`` users — the validation side shared by the
    batch and STREAMING sketch builds (counter sums are linear, so
    per-micro-batch partial counts sum to exactly the sketch of the
    union; same merge argument as the HLL register max, additive instead
    of idempotent). Output (user_id, exact_n, cms_est, overcount), all
    BIGINT, top-n membership totally ordered on (exact_n DESC, user_id)."""
    from ..plans.star import load

    events = load(spark, sf_dir, "events")
    exact = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(top_n)
    )
    idx = _cms_idx_exprs_spark()
    probe = (
        exact.withColumn("h1", F.expr("xxhash64(user_id) & 4294967295"))
        .withColumn("h2", F.expr("shiftrightunsigned(xxhash64(user_id), 32)"))
        .select(
            "user_id",
            "exact_n",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("j"), idx[j].alias("idx"))
                        for j in range(CMS_D)
                    ]
                )
            ).alias("p"),
        )
        .select("user_id", "exact_n", "p.j", "p.idx")
    )
    est = (
        probe.join(F.broadcast(sketch), ["j", "idx"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("counter").alias("cms_est"))
    )
    return est.select(
        "user_id",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
    )


def _u64_sql(col: str) -> str:
    """Signed BIGINT -> UBIGINT bit-pattern reinterpret (two's
    complement) for the integer-keyed xxhash64 replays (HLL users, CMS
    users) — delegates to the shared ``xxh64_sql.unsigned``."""
    return X.unsigned(col)


def _cms_tail_sql(key: str, rel: str, top_n: int) -> str:
    """The CMS CTE chain shared by the token and user oracles, from the
    position explode through the probe — parameterized by the sketched
    key column and the occurrence relation; expects a CTE ``hh(key, h1,
    h2)`` in scope. One copy so a hash/width change can never
    desynchronize the two replays."""
    return f"""pos AS MATERIALIZED (
  SELECT o.{key}, j, CAST((h.h1 + j * h.h2) % {CMS_W} AS BIGINT) AS idx
  FROM {rel} o JOIN hh h USING ({key}), (SELECT unnest(range({CMS_D})) AS j)
),
sketch AS MATERIALIZED (
  SELECT j, idx, count(*) AS counter FROM pos GROUP BY j, idx
),
exact AS MATERIALIZED (
  SELECT {key}, count(*) AS exact_n FROM {rel} GROUP BY {key}
  ORDER BY exact_n DESC, {key} LIMIT {top_n}
),
probe AS MATERIALIZED (
  SELECT o.{key}, o.exact_n, j,
         CAST((h.h1 + j * h.h2) % {CMS_W} AS BIGINT) AS idx
  FROM exact o JOIN hh h USING ({key}), (SELECT unnest(range({CMS_D})) AS j)
)
SELECT p.{key}, CAST(p.exact_n AS BIGINT) AS exact_n,
       CAST(min(s.counter) AS BIGINT) AS cms_est,
       CAST(min(s.counter) - p.exact_n AS BIGINT) AS overcount
FROM probe p JOIN sketch s USING (j, idx)
GROUP BY p.{key}, p.exact_n"""


def cms_users_oracle_sql(top_n: int = 20) -> str:
    """DuckDB replay of the STREAMING CMS user sketch: the stream's
    running (j, idx) counts equal the batch sketch of the union, so one
    batch replay serves — xxhash64 of the user_id's two's-complement
    bits via xxh64_sql.hash_long_cols (each DISTINCT user hashed once),
    then the shared ``_cms_tail_sql`` chain."""
    hash_sql = X.render_select(
        X.hash_long_cols("uh", _u64_sql("user_id"), X._lit(X.SEED)),
        ["uh"],
        "(SELECT DISTINCT user_id FROM events)",
        passthrough=["user_id"],
    )
    return f"""
WITH uhash AS MATERIALIZED ({hash_sql}),
hh AS MATERIALIZED (
  SELECT user_id, uh % 4294967296 AS h1, uh // 4294967296 AS h2 FROM uhash
),
{_cms_tail_sql("user_id", "events", top_n)}
"""


def cms_oracle_sql(top_n: int = 50) -> str:
    """DuckDB replay of ``cms_heavy_hitters``: same tokenization as the
    other text oracles, xxhash64 per DISTINCT token via xxh64_sql, then
    the shared ``_cms_tail_sql`` chain."""
    tok_hash = X.render_select(
        X.str_hash_cols("tok", "th"), ["th"], "dtoks", passthrough=["tok"]
    )
    toks_expr = (
        "(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) "
        "ELSE string_split_regex(trim(lower(text)), '\\s+') END)"
    )
    return f"""
WITH occ AS MATERIALIZED (
  SELECT unnest({toks_expr}) AS tok FROM documents WHERE text IS NOT NULL
),
dtoks AS MATERIALIZED (SELECT DISTINCT tok FROM occ),
th AS MATERIALIZED ({tok_hash}),
hh AS MATERIALIZED (
  SELECT tok, th % 4294967296 AS h1, th // 4294967296 AS h2 FROM th
),
{_cms_tail_sql("tok", "occ", top_n)}
"""


def _hll_regs_ctes() -> str:
    """``hashes`` + ``regs`` + ``lc`` CTEs — the xxhash-register build
    and shared linear-counting table, single-sourced for the users
    replay AND the set-algebra replay (a change to the M/RMAX split or
    the lc rendering in one copy but not the other would break the HLL
    family's shared-replay contract)."""
    # signed BIGINT -> UBIGINT bit pattern (user ids are non-negative in
    # the data, but replay the general reinterpret anyway)
    hash_sql = X.render_select(
        X.hash_long_cols("uh", _u64_sql("user_id"), X._lit(X.SEED)),
        ["uh"],
        "(SELECT DISTINCT event_type, user_id FROM events)",
        passthrough=["event_type"],
    )
    lc_rows = ", ".join(
        f"({v + 1}, {e})" for v, e in enumerate(_lc_table())
    )
    return f"""hashes AS MATERIALIZED ({hash_sql}),
regs AS MATERIALIZED (
  SELECT event_type,
         uh % {M} AS reg,
         max(CASE WHEN uh // {M} = 0 THEN {RMAX}
                  ELSE {RMAX} - length(bin(CAST(uh // {M} AS BIGINT))) END)
           AS rho_max
  FROM hashes GROUP BY event_type, reg
),
lc(v, lc_est) AS MATERIALIZED (SELECT * FROM (VALUES {lc_rows}))"""


def _hll_users_ctes() -> str:
    """CTE chain from ``hashes`` through ``users(event_type,
    approx_users)`` — the register build + estimator replay shared by
    the batch oracle and the streaming twin's oracle (the stream merges
    per-micro-batch registers by max, which equals building them over
    the union — so one replay serves both)."""
    return (
        _hll_regs_ctes() + ",\n" + _hll_est_chain("event_type", "regs", "")
    )


def hll_users_oracle_sql() -> str:
    """Users-only replay — the oracle of the STREAMING sketch build
    (register merge across micro-batches == registers of the union)."""
    return f"""
WITH {_hll_users_ctes()}
SELECT event_type, approx_users FROM users
"""


def hll_oracle_sql() -> str:
    """DuckDB replay of ``approx_distinct_stats``: same xxhash64 (via
    xxh64_sql.hash_long_cols over the two's-complement user_id bits),
    same register/rho split (bin() is minimal-width in DuckDB too), the
    harmonic sum in HUGEINT, the same shared linear-counting table, and
    the same histogram-quantile walk."""
    return f"""
WITH {_hll_users_ctes()},
bins AS MATERIALIZED (
  SELECT event_type, CAST(floor(value * {P50_SCALE}) AS BIGINT) AS bin,
         count(*) AS n
  FROM events WHERE value IS NOT NULL GROUP BY event_type, bin
),
hit AS MATERIALIZED (
  SELECT event_type, min(bin) AS p50_bin
  FROM (
    SELECT event_type, bin,
           sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
           sum(n) OVER (PARTITION BY event_type) AS total
    FROM bins
  ) WHERE cum >= (total + 1) // 2
  GROUP BY event_type
)
SELECT u.event_type AS event_type,
       u.approx_users AS approx_users,
       round(CAST(h.p50_bin AS DOUBLE) / {P50_SCALE}, 6) AS approx_p50
FROM users u JOIN hit h USING (event_type)
"""


# ------------------------------------------------------------------ KMV
# (k-minimum-values / bottom-k, Bar-Yossef et al. 2002): keep the k
# smallest distinct hash values per group. The MIN-SET merge law —
# bottom-k of a union == bottom-k of the merged bottom-k sets — is
# idempotent and commutative like the HLL register max, but the state
# doubles as a UNIFORM SAMPLE of the group's distinct keys (hashes are
# exchangeable), which no other sketch in the family provides. The
# estimator (k−1)·2^64 / h_(k) is integer end to end: unsigned order is
# emulated on Spark's signed xxhash64 by flipping the sign bit (XOR
# with −2^63 — bit pattern order == unsigned order), the kth value
# re-biases to unsigned in DECIMAL(38,0)/HUGEINT, one integer division.
KMV_K = 256  # rsd ~ 1/sqrt(k-2) = 6.3%
_SIGN_FLIP = -(1 << 63)


def kmv_bottomk(
    rows: DataFrame, group: str, hash_col, k: int = KMV_K
) -> DataFrame:
    """Per-``group`` bottom-k sketch STATE: (group, flipped) — the k
    smallest distinct hashes in sign-flipped (= unsigned) order. This
    relation is the mergeable object; re-applying ``kmv_bottomk`` to a
    union of states merges them."""
    from pyspark.sql import Window

    distinct = rows.select(
        F.col(group), F.expr(f"{hash_col} ^ {_SIGN_FLIP}").alias("flipped")
    ).distinct()
    w = Window.partitionBy(group).orderBy("flipped")
    return (
        distinct.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(group, "flipped")
    )


def kmv_estimate(state: DataFrame, group: str, k: int = KMV_K) -> DataFrame:
    """(group, n_kept, kmv_est) from a bottom-k state: fewer than k
    distinct values means the state IS the exact distinct set
    (est = n_kept); otherwise (k−1)·2^64 div u_(k) with u_(k) the kth
    smallest unsigned hash (guarded ≥ 1 — an exactly-zero 64-bit hash)."""
    agg = state.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("flipped").alias("kth_flipped"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("long")).otherwise(
        F.expr(
            f"CAST(CAST({(k - 1) * (1 << 64)} AS DECIMAL(38,0)) div "
            f"greatest(CAST(kth_flipped AS DECIMAL(38,0)) "
            f"+ CAST({1 << 63} AS DECIMAL(38,0)), CAST(1 AS DECIMAL(38,0))) "
            f"AS BIGINT)"
        )
    )
    return agg.select(group, "n_kept", est.alias("kmv_est"))


def kmv_distinct_users(spark: SparkSession, sf_dir: str, k: int = KMV_K) -> DataFrame:
    """Per-event-type distinct-user estimate AND uniform distinct sample
    via one bottom-k sketch — the KMV companion to the HLL: same
    one-scan build, state = k hashes per group (which double as a
    sample for drill-down, e.g. joining back for exemplar users).
    Returns (event_type, n_kept, kmv_est)."""
    from ..plans.star import load

    ev = load(spark, sf_dir, "events")
    state = kmv_bottomk(ev, "event_type", "xxhash64(user_id)", k=k)
    return kmv_estimate(state, "event_type", k=k)


def kmv_oracle_sql(k: int = KMV_K) -> str:
    """DuckDB replay: xxhash64 of the two's-complement user bits via
    xxh64_sql (unsigned th — ordered natively, no flip needed), per-type
    distinct bottom-k, the same guarded integer division."""
    hash_sql = X.render_select(
        X.hash_long_cols("uh", _u64_sql("user_id"), X._lit(X.SEED)),
        ["uh"],
        "(SELECT DISTINCT event_type, user_id FROM events)",
        passthrough=["event_type"],
    )
    return f"""
WITH hashes AS MATERIALIZED ({hash_sql}),
dist AS MATERIALIZED (SELECT DISTINCT event_type, uh FROM hashes),
ranked AS MATERIALIZED (
  SELECT event_type, uh,
         row_number() OVER (PARTITION BY event_type ORDER BY uh) AS rn
  FROM dist
),
state AS MATERIALIZED (
  SELECT event_type, uh FROM ranked WHERE rn <= {k}
),
agg AS MATERIALIZED (
  SELECT event_type, count(*) AS n_kept, max(uh) AS kth
  FROM state GROUP BY event_type
)
SELECT event_type, CAST(n_kept AS BIGINT) AS n_kept,
       CAST(CASE WHEN n_kept < {k} THEN n_kept
                 ELSE CAST({(k - 1) * (1 << 64)} AS HUGEINT)
                      // greatest(CAST(kth AS HUGEINT), 1)
            END AS BIGINT) AS kmv_est
FROM agg
"""


def kmv_user_jaccard(
    spark: SparkSession, sf_dir: str, k: int = KMV_K
) -> DataFrame:
    """KMV SET ALGEBRA: estimated Jaccard similarity of the distinct
    USER sets of every event-type pair — the bottom-k counterpart of
    ``hll_user_overlap``. For a pair (a, b), the union's bottom-k is the
    bottom-k of the two merged states (the MIN-SET law); each of those
    hashes is a uniform sample of A ∪ B, so the fraction present in
    BOTH states estimates |A∩B|/|A∪B| (Broder's classic min-wise
    argument, here with one shared hash instead of k permutations —
    the bottom-k variant). Everything is integer until one final 6-dp
    divide: membership flags are exact, the union cut is a row_number
    over flipped (= unsigned) order.

    ONE state build feeds all pairs; pair work merges ≤ 2k-row slices —
    never user ids (the hll_user_overlap scale story). Returns
    (type_a, type_b, n_union_kept, n_both, jaccard_est)."""
    from pyspark.sql import Window

    from ..plans.star import load

    ev = load(spark, sf_dir, "events")
    state = kmv_bottomk(
        ev, "event_type", "xxhash64(user_id)", k=k
    ).localCheckpoint(eager=True)
    types = state.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
        .localCheckpoint(eager=True)
    )
    sa = pairs.join(
        state.withColumnRenamed("event_type", "type_a"), "type_a"
    ).select("type_a", "type_b", "flipped", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    sb = pairs.join(
        state.withColumnRenamed("event_type", "type_b"), "type_b"
    ).select("type_a", "type_b", "flipped", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        sa.unionByName(sb)
        .groupBy("type_a", "type_b", "flipped")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("type_a", "type_b").orderBy("flipped")
    cut = merged.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return cut.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_union_kept"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
        F.round(
            F.sum(F.col("in_a") * F.col("in_b"))
            / F.count(F.lit(1)),
            6,
        ).alias("jaccard_est"),
    )


def kmv_jaccard_oracle_sql(k: int = KMV_K) -> str:
    """DuckDB replay of ``kmv_user_jaccard``: same per-type bottom-k
    states (native unsigned order), same pair merge / union cut /
    membership counts, one 6-dp divide."""
    hash_sql = X.render_select(
        X.hash_long_cols("uh", _u64_sql("user_id"), X._lit(X.SEED)),
        ["uh"],
        "(SELECT DISTINCT event_type, user_id FROM events)",
        passthrough=["event_type"],
    )
    return f"""
WITH hashes AS MATERIALIZED ({hash_sql}),
dist AS MATERIALIZED (SELECT DISTINCT event_type, uh FROM hashes),
state AS MATERIALIZED (
  SELECT event_type, uh FROM (
    SELECT event_type, uh,
           row_number() OVER (PARTITION BY event_type ORDER BY uh) AS rn
    FROM dist
  ) WHERE rn <= {k}
),
pairs AS MATERIALIZED (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM state) a,
       (SELECT DISTINCT event_type FROM state) b
  WHERE a.event_type < b.event_type
),
merged AS MATERIALIZED (
  SELECT type_a, type_b, uh, max(in_a) AS in_a, max(in_b) AS in_b
  FROM (
    SELECT p.type_a, p.type_b, s.uh, 1 AS in_a, 0 AS in_b
    FROM pairs p JOIN state s ON s.event_type = p.type_a
    UNION ALL
    SELECT p.type_a, p.type_b, s.uh, 0 AS in_a, 1 AS in_b
    FROM pairs p JOIN state s ON s.event_type = p.type_b
  ) GROUP BY 1, 2, 3
),
cut AS MATERIALIZED (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY type_a, type_b
                                 ORDER BY uh) AS rn
    FROM merged
  ) WHERE rn <= {k}
)
SELECT type_a, type_b,
       CAST(count(*) AS BIGINT) AS n_union_kept,
       CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
       round(CAST(sum(in_a * in_b) AS DOUBLE) / count(*), 6) AS jaccard_est
FROM cut GROUP BY 1, 2
"""


def kmv_sample_users(
    spark: SparkSession, sf_dir: str, n: int = 5
) -> DataFrame:
    """The KMV state's SAMPLE face, made concrete: per event_type the
    ``n`` smallest-hash users — a deterministic uniform sample of the
    type's DISTINCT users (hashes are exchangeable) — joined back to
    their event counts for drill-down. This is what the bottom-k sketch
    buys over HLL: the same state that estimates distinct cardinality
    names exemplar members. Join-back is one equi join on the computed
    hash (never a scan of anything but the events table it came from).
    Returns (event_type, user_id, n_events)."""
    from ..plans.star import load

    ev = load(spark, sf_dir, "events")
    state = kmv_bottomk(ev, "event_type", "xxhash64(user_id)", k=n)
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    keyed = counts.withColumn(
        "flipped", F.expr(f"xxhash64(user_id) ^ {_SIGN_FLIP}")
    )
    return state.join(keyed, ["event_type", "flipped"]).select(
        "event_type", "user_id", "n_events"
    )


def kmv_sample_oracle_sql(n: int = 5) -> str:
    """DuckDB replay of ``kmv_sample_users``: the same distinct-hash
    bottom-n per type (native unsigned order), joined back through the
    per-user hash to event counts."""
    hash_sql = X.render_select(
        X.hash_long_cols("uh", _u64_sql("user_id"), X._lit(X.SEED)),
        ["uh"],
        "(SELECT DISTINCT user_id FROM events)",
        passthrough=["user_id"],
    )
    return f"""
WITH uhash AS MATERIALIZED ({hash_sql}),
tu AS MATERIALIZED (
  SELECT e.event_type, e.user_id, count(*) AS n_events
  FROM events e GROUP BY 1, 2
),
dist AS MATERIALIZED (
  SELECT DISTINCT t.event_type, h.uh
  FROM tu t JOIN uhash h USING (user_id)
),
state AS MATERIALIZED (
  SELECT event_type, uh FROM (
    SELECT event_type, uh,
           row_number() OVER (PARTITION BY event_type ORDER BY uh) AS rn
    FROM dist
  ) WHERE rn <= {n}
)
SELECT t.event_type, t.user_id, CAST(t.n_events AS BIGINT) AS n_events
FROM state s
JOIN uhash h ON h.uh = s.uh
JOIN tu t ON t.user_id = h.user_id AND t.event_type = s.event_type
"""


def kmv_value_quantiles(
    spark: SparkSession,
    sf_dir: str,
    k: int = 256,
    pcts: tuple = (25, 50, 75, 90),
) -> DataFrame:
    """Sampled-rank quantiles with a PROVEN rank-error bound — the
    unbounded-range complement of the fixed-grid quantile sketch: the
    grid's error is VALUE-resolution (bin width, unbounded tails
    saturate), while a bottom-k-by-hash uniform row sample gives
    RANK-error ε = O(1/sqrt(k)) at any value range (classic sampling
    bound: the sample q-quantile's true rank deviates from q·N with
    s.d. sqrt(q(1-q)/k); tests pin 4σ at k=64). Per event_type: keep
    the k rows with the smallest xxhash64(event_id) (exchangeable ⇒
    uniform over rows, deterministic ⇒ hash-replayable), then pick the
    sample's deterministic-rank quantiles
    ``vrn == ((n-1)·pct) div 100 + 1`` over the (value, hash) total
    order — the same integer rank formula as rfm/exact percentiles,
    never an engine-dependent interpolation. n ≤ k means the sample IS
    the population and the answer is exact.

    Scale: the bottom-k window is rank-limit-pushed (Spark's
    WindowGroupLimit inserts per-map-partition top-k before the
    shuffle, so state is k rows per task, never a type's full rows);
    everything after runs on ≤ |types|·k rows. NULL event_id/value rows
    are excluded on both engines (a null hash has no sample position;
    a null value has no rank). Returns
    (event_type, pct, q_value, sample_n), totally ordered.
    """
    from ..plans.star import load

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull() & F.col("value").isNotNull()
    )
    rows = ev.select(
        "event_type",
        "value",
        F.expr(f"xxhash64(event_id) ^ {_SIGN_FLIP}").alias("flipped"),
    )
    w = Window.partitionBy("event_type").orderBy("flipped")
    sample = (
        rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    wv = Window.partitionBy("event_type").orderBy("value", "flipped")
    wn = Window.partitionBy("event_type")
    ranked = sample.select(
        "event_type",
        "value",
        F.row_number().over(wv).alias("vrn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        ranked.withColumn(
            "pct", F.explode(F.array(*[F.lit(int(p)) for p in pcts]))
        )
        .filter(F.expr("vrn = ((n - 1) * pct) div 100 + 1"))
        .select(
            "event_type",
            F.col("pct").cast("long").alias("pct"),
            F.round("value", 6).alias("q_value"),
            F.col("n").alias("sample_n"),
        )
        .orderBy("event_type", "pct")
    )


def kmv_value_quantiles_oracle_sql(
    k: int = 256, pcts: tuple = (25, 50, 75, 90)
) -> str:
    """DuckDB replay of :func:`kmv_value_quantiles`: xxh64 of event_id
    (unsigned — natively ordered like the engine's sign-flipped
    BIGINT), per-type bottom-k rows, the same (value, hash) rank order
    and integer pick formula."""
    hash_sql = X.render_select(
        X.hash_long_cols("eh", _u64_sql("event_id"), X._lit(X.SEED)),
        ["eh"],
        "(SELECT event_id, event_type, value FROM events"
        " WHERE event_id IS NOT NULL AND value IS NOT NULL)",
        passthrough=["event_type", "value"],
    )
    pct_rows = ", ".join(f"({int(p)})" for p in pcts)
    return f"""
WITH ehash AS MATERIALIZED ({hash_sql}),
samp AS MATERIALIZED (
  SELECT event_type, value, eh FROM (
    SELECT event_type, value, eh,
           row_number() OVER (PARTITION BY event_type ORDER BY eh) AS rn
    FROM ehash
  ) WHERE rn <= {k}
),
ranked AS MATERIALIZED (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, eh) AS vrn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM samp
)
SELECT r.event_type,
       CAST(p.pct AS BIGINT) AS pct,
       round(r.value, 6) AS q_value,
       CAST(r.n AS BIGINT) AS sample_n
FROM ranked r
JOIN (VALUES {pct_rows}) AS p(pct)
  ON r.vrn = ((r.n - 1) * p.pct) // 100 + 1
ORDER BY r.event_type, p.pct
"""
