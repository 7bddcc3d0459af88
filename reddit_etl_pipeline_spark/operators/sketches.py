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


def _hll_agg(rows: DataFrame, group: str, hash_col) -> DataFrame:
    """Per-``group`` HLL distinct estimate of ``hash_col`` (an xxhash64
    signed-long column expression). Two hash aggregates, both with full
    map-side combine: (group, register)->max(rho), then group->estimate."""
    regs = (
        rows.select(
            F.col(group),
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
        .groupBy(group, "reg")
        .agg(F.max("rho").alias("rho_max"))
    )
    sketch = regs.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), {RMAX} - rho_max) AS DECIMAL(17,0))")
        ).alias("z_present"),
    )
    lc = F.broadcast(
        rows.sparkSession.createDataFrame(
            [(v + 1, e) for v, e in enumerate(_lc_table())], "v INT, lc_est BIGINT"
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
    return est.select(group, "approx_users")


def _p50_agg(rows: DataFrame, group: str, value: str) -> DataFrame:
    """Per-``group`` histogram-quantile p50 of ``value``: fixed-grid bin
    counts (one hash aggregate, map-side combinable), then a window
    cumsum over the per-group bins (bounded by distinct bins, not rows)
    picks the first bin reaching rank ceil(n/2)."""
    bins = (
        rows.withColumn(
            "bin", F.expr(f"CAST(floor({value} * {P50_SCALE}) AS BIGINT)")
        )
        .groupBy(group, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(group).orderBy("bin")
    hit = (
        bins.withColumn(
            "cum", F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("total", F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(F.col("cum") >= F.expr("(total + 1) div 2"))
        .groupBy(group)
        .agg(F.min("bin").alias("p50_bin"))
    )
    return hit.select(
        group,
        F.round(F.col("p50_bin") / F.lit(float(P50_SCALE)), 6).alias("approx_p50"),
    )


def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates over events — per event_type approximate
    distinct users (replayable HLL, m=1024) and approximate median value
    (1/1000-grid histogram quantile). Same single-pass/mergeable scale
    shape as approx_count_distinct + approx_percentile, but hash-checked
    against the DuckDB oracle instead of rows-only."""
    from ..plans.star import load

    ev = load(spark, sf_dir, "events")
    users = _hll_agg(ev, "event_type", F.xxhash64("user_id"))
    p50 = _p50_agg(ev, "event_type", "value")
    return users.join(p50, "event_type").select(
        "event_type", "approx_users", "approx_p50"
    )


def hll_oracle_sql() -> str:
    """DuckDB replay of ``approx_distinct_stats``: same xxhash64 (via
    xxh64_sql.hash_long_cols over the two's-complement user_id bits),
    same register/rho split (bin() is minimal-width in DuckDB too), the
    harmonic sum in HUGEINT, the same shared linear-counting table, and
    the same histogram-quantile walk."""
    # signed BIGINT -> UBIGINT bit pattern (user ids are non-negative in
    # the data, but replay the general reinterpret anyway)
    u64 = (
        "CAST(CASE WHEN user_id >= 0 THEN CAST(user_id AS HUGEINT) "
        f"ELSE CAST(user_id AS HUGEINT) + CAST({1 << 64} AS HUGEINT) END AS UBIGINT)"
    )
    hash_sql = X.render_select(
        X.hash_long_cols("uh", u64, X._lit(X.SEED)),
        ["uh"],
        "(SELECT DISTINCT event_type, user_id FROM events)",
        passthrough=["event_type"],
    )
    lc_rows = ", ".join(
        f"({v + 1}, {e})" for v, e in enumerate(_lc_table())
    )
    return f"""
WITH hashes AS MATERIALIZED ({hash_sql}),
regs AS MATERIALIZED (
  SELECT event_type,
         uh % {M} AS reg,
         max(CASE WHEN uh // {M} = 0 THEN {RMAX}
                  ELSE {RMAX} - length(bin(CAST(uh // {M} AS BIGINT))) END)
           AS rho_max
  FROM hashes GROUP BY event_type, reg
),
sketch AS MATERIALIZED (
  SELECT event_type,
         count(*) AS n_regs,
         sum(CAST(1 AS BIGINT) << ({RMAX} - rho_max)) AS z_present
  FROM regs GROUP BY event_type
),
lc(v, lc_est) AS MATERIALIZED (SELECT * FROM (VALUES {lc_rows})),
est AS MATERIALIZED (
  SELECT event_type,
         ({M} - n_regs) AS v_zero,
         CAST({_EST_NUM} AS HUGEINT)
           // (CAST({A_DEN} AS HUGEINT)
               * (CAST(z_present AS HUGEINT)
                  + CAST(({M} - n_regs) AS HUGEINT)
                    * CAST({1 << RMAX} AS HUGEINT)))
           AS e_raw
  FROM sketch
),
users AS MATERIALIZED (
  SELECT event_type,
         CAST(CASE WHEN e_raw <= {_LC_CUTOFF} AND v_zero > 0
                   THEN lc.lc_est ELSE e_raw END AS BIGINT) AS approx_users
  FROM est LEFT JOIN lc ON lc.v = est.v_zero
),
bins AS MATERIALIZED (
  SELECT event_type, CAST(floor(value * {P50_SCALE}) AS BIGINT) AS bin,
         count(*) AS n
  FROM events GROUP BY event_type, bin
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
