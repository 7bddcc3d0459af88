"""Behavioral / experiment analytics over the events and orders tables:
Markov event-transition matrix, survival (churn-hazard) curve, an
exact-integer 2x2 chi-square A/B test, and RFM customer segmentation.

The reference pipeline's analytics stop at per-subreddit aggregates
(reference ``query-test.py:34-71``); these are the next questions a
product team asks of the same event stream ("what do users do NEXT?",
"when do they leave?", "did the experiment move conversion?", "which
customers matter?"), each expressed as one or two codegen'd shuffles.

Exactness contract (CLAUDE.md invariants): every emitted statistic is
either an exact BIGINT count or a fixed-point micro-unit produced by ONE
integer division over DECIMAL(38)/HUGEINT operands, so the DuckDB
oracles replay bit-identically. No float ever enters a multi-term sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000

# chi-square(df=1) upper 5% critical value 3.841458821..., rounded to
# micro-units — the significance threshold compared EXACTLY in integers.
CHISQ_95_MICRO = 3_841_459


# ---------------------------------------------------------------------------
# 1. Markov event-transition matrix
# ---------------------------------------------------------------------------

def event_transitions(events: DataFrame) -> DataFrame:
    """Per-user next-event transition matrix: for each ordered pair of
    consecutive events of one user (by ``ts, event_id`` — deterministic
    under timestamp ties), count (prev_type -> next_type) and the row-
    normalized transition probability in exact micro-units
    ``n * 1e6 div row_total`` (both BIGINT; n <= 2^43 rows before the
    numerator could overflow, far beyond any event volume).

    Scale: ONE ``partitionBy(user_id)`` shuffle for the lag; the pair
    counts are map-side-combinable and the result is bounded by
    |event_types|^2 regardless of row count, so the per-prev row totals
    join is a broadcast over a tiny frame. Returns
    (prev_type, next_type, n_transitions, prob_micro), totally ordered.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = pairs.groupBy("prev_type").agg(
        F.sum("n_transitions").alias("row_total")
    )
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n_transitions",
            F.expr(
                f"(n_transitions * CAST({MICRO} AS BIGINT)) div row_total"
            ).alias("prob_micro"),
        )
        .orderBy("prev_type", "next_type")
    )


def event_transitions_oracle_sql() -> str:
    """DuckDB replay of :func:`event_transitions`."""
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
), counted AS MATERIALIZED (
  SELECT prev_type, next_type, count(*) AS n_transitions
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type,
       CAST(n_transitions AS BIGINT) AS n_transitions,
       CAST((n_transitions * {MICRO})
            // sum(n_transitions) OVER (PARTITION BY prev_type)
            AS BIGINT) AS prob_micro
FROM counted
ORDER BY prev_type, next_type
"""


# ---------------------------------------------------------------------------
# 2. Churn-hazard (survival) curve
# ---------------------------------------------------------------------------

def churn_hazard(events: DataFrame) -> DataFrame:
    """Discrete-time survival analysis of user activity: a user's
    observed tenure is ``(last_active_day - first_active_day) div 7``
    weeks (exact non-negative integer epoch-day arithmetic, so ``div``
    == floor on both engines); treating end-of-observed-activity as
    churn, the hazard at week w is

        hazard(w) = churned(w) / at_risk(w),
        at_risk(w) = #users with tenure >= w

    computed as exact BIGINT counts (the at-risk curve is one
    descending cumulative sum over the tiny per-week frame) and ONE
    integer division to micro-units. The standard "when do users
    leave?" curve behind retention planning.

    Scale: one user_id groupBy over events (map-combinable min/max),
    then windows over at most #distinct-weeks rows. Returns
    (tenure_weeks, churned, at_risk, hazard_micro) ordered by week.
    """
    per_user = events.groupBy("user_id").agg(
        (
            (
                F.datediff(F.max(F.col("ts").cast("date")),
                           F.min(F.col("ts").cast("date")))
            ).cast("long")
        ).alias("tenure_days")
    )
    weekly = (
        per_user.select(F.expr("tenure_days div 7").alias("tenure_weeks"))
        .groupBy("tenure_weeks")
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    w_desc = (
        Window.orderBy(F.desc("tenure_weeks"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        weekly.withColumn("at_risk", F.sum("churned").over(w_desc))
        .select(
            "tenure_weeks",
            "churned",
            "at_risk",
            F.expr(f"(churned * CAST({MICRO} AS BIGINT)) div at_risk").alias(
                "hazard_micro"
            ),
        )
        .orderBy("tenure_weeks")
    )


def churn_hazard_oracle_sql() -> str:
    """DuckDB replay of :func:`churn_hazard`."""
    return f"""
WITH per_user AS MATERIALIZED (
  SELECT user_id,
         date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
           AS tenure_days
  FROM events GROUP BY user_id
), weekly AS MATERIALIZED (
  SELECT tenure_days // 7 AS tenure_weeks, count(*) AS churned
  FROM per_user GROUP BY 1
)
SELECT CAST(tenure_weeks AS BIGINT) AS tenure_weeks,
       CAST(churned AS BIGINT) AS churned,
       CAST(sum(churned) OVER (ORDER BY tenure_weeks DESC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS at_risk,
       CAST((churned * {MICRO})
            // sum(churned) OVER (ORDER BY tenure_weeks DESC
                                  ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS hazard_micro
FROM weekly
ORDER BY tenure_weeks
"""


def churn_hazard_censored(
    events: DataFrame, censor_days: int = 7
) -> DataFrame:
    """RIGHT-CENSORED churn hazard — the bias fix for
    :func:`churn_hazard`'s documented tail problem: treating
    end-of-observed-activity as churn over-counts users who are simply
    still active when the data ends. Here a user whose LAST activity
    falls inside the final ``censor_days`` of the observation window
    (``datediff(horizon, last_day) < censor_days`` with horizon = the
    dataset's max active day) is CENSORED: they remain in the at-risk
    denominator through their observed tenure but never enter the
    churned numerator — the standard discrete-time survival treatment
    (Kaplan–Meier's censoring rule on a weekly grid).

        hazard(w) = churned(w) / at_risk(w)
        at_risk(w) = #users (churned OR censored) with tenure >= w

    All exact integers: tenure in epoch-day arithmetic, counts BIGINT,
    one integer division to micro-units. Returns (tenure_weeks,
    churned, n_censored, at_risk, hazard_micro) ordered by week; the
    uncensored twin stays available as the upper-bound read.

    Scale: one user_id groupBy (map-combinable min/max), the horizon as
    a ONE-ROW bounded driver scalar (``max(cast(ts as date))`` over
    events — a map-combinable fold, equal to ``max(last_day)`` over
    per_user) folded into the censoring predicate as a date literal.
    A constant-key join would constant-fold ``1 = 1`` into a
    BroadcastNestedLoop cross, and an unpartitioned window would drag
    the whole user frame to one task; the scalar avoids both AND the
    second derivation of per_user the join formulation paid. Then
    windows over the tiny per-week frame."""
    per_user = events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.max(F.col("ts").cast("date")).alias("last_day"),
    )
    horizon_day = events.agg(
        F.max(F.col("ts").cast("date")).alias("horizon")
    ).collect()[0]["horizon"]
    pu = per_user.select(
        F.expr(
            "CAST(datediff(last_day, first_day) AS BIGINT) div 7"
        ).alias("tenure_weeks"),
        (
            F.datediff(F.lit(horizon_day), F.col("last_day"))
            < F.lit(censor_days)
        ).alias("is_censored"),
    )
    weekly = pu.groupBy("tenure_weeks").agg(
        F.sum(F.when(~F.col("is_censored"), 1).otherwise(0))
        .cast("long")
        .alias("churned"),
        F.sum(F.when(F.col("is_censored"), 1).otherwise(0))
        .cast("long")
        .alias("n_censored"),
    )
    w_desc = (
        Window.orderBy(F.desc("tenure_weeks"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        weekly.withColumn(
            "at_risk",
            F.sum(F.col("churned") + F.col("n_censored")).over(w_desc),
        )
        .select(
            "tenure_weeks",
            "churned",
            "n_censored",
            "at_risk",
            F.expr(f"(churned * CAST({MICRO} AS BIGINT)) div at_risk").alias(
                "hazard_micro"
            ),
        )
        .orderBy("tenure_weeks")
    )


def churn_hazard_censored_oracle_sql(censor_days: int = 7) -> str:
    """DuckDB replay of :func:`churn_hazard_censored`."""
    return f"""
WITH per_user AS MATERIALIZED (
  SELECT user_id,
         min(CAST(ts AS DATE)) AS first_day,
         max(CAST(ts AS DATE)) AS last_day
  FROM events GROUP BY user_id
), horizon AS MATERIALIZED (
  SELECT max(last_day) AS horizon FROM per_user
), pu AS MATERIALIZED (
  SELECT date_diff('day', first_day, last_day) // 7 AS tenure_weeks,
         date_diff('day', last_day, horizon) < {censor_days} AS is_censored
  FROM per_user, horizon
), weekly AS MATERIALIZED (
  SELECT tenure_weeks,
         sum(CASE WHEN NOT is_censored THEN 1 ELSE 0 END) AS churned,
         sum(CASE WHEN is_censored THEN 1 ELSE 0 END) AS n_censored
  FROM pu GROUP BY 1
)
SELECT CAST(tenure_weeks AS BIGINT) AS tenure_weeks,
       CAST(churned AS BIGINT) AS churned,
       CAST(n_censored AS BIGINT) AS n_censored,
       CAST(sum(churned + n_censored) OVER (ORDER BY tenure_weeks DESC
                                            ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS at_risk,
       CAST((churned * {MICRO})
            // sum(churned + n_censored) OVER (ORDER BY tenure_weeks DESC
                                               ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS hazard_micro
FROM weekly
ORDER BY tenure_weeks
"""


# ---------------------------------------------------------------------------
# 3. Exact-integer 2x2 chi-square A/B test
# ---------------------------------------------------------------------------

def ab_conversion_chisq(
    events: DataFrame, min_purchases: int = 14
) -> DataFrame:
    """2x2 chi-square test of independence between a deterministic
    50/50 user split (``user_id % 2``) and a conversion predicate
    (>= ``min_purchases`` purchase events), entirely in exact integers:

        chi2 = N * (a*d - b*c)^2 / ((a+b)(c+d)(a+c)(b+d))

    with the single division performed once in DECIMAL(38)/HUGEINT and
    scaled to micro-units, and significance decided by an EXACT integer
    comparison against the 95% critical value :data:`CHISQ_95_MICRO`.
    Any zero margin (degenerate table) yields chi2 = 0, not a crash.

    Overflow headroom: the numerator N*(ad-bc)^2*1e6 <= N^5 * 1e6 needs
    N <= ~2.5e6 users for DECIMAL(38); a curation-scale experiment
    aggregates per-user flags first, so N is the USER count, not the
    event count (tests pin the headroom).

    Scale: one user_id groupBy (map-combinable conditional counts) then
    a single-row fold — the entire test is two codegen'd aggregates.
    Returns one row (n_users, variant0_users, variant1_users,
    variant0_converted, variant1_converted, chi2_micro, significant).
    """
    per_user = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("purchases")
    )
    flags = per_user.select(
        (F.col("user_id") % 2).alias("variant"),
        F.when(F.col("purchases") >= min_purchases, 1)
        .otherwise(0)
        .alias("converted"),
    )
    cells = flags.agg(
        F.sum(
            F.when((F.col("variant") == 0) & (F.col("converted") == 1), 1)
            .otherwise(0)
        ).alias("a"),
        F.sum(
            F.when((F.col("variant") == 0) & (F.col("converted") == 0), 1)
            .otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("variant") == 1) & (F.col("converted") == 1), 1)
            .otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("variant") == 1) & (F.col("converted") == 0), 1)
            .otherwise(0)
        ).alias("d"),
    )
    num = (
        "CAST(a + b + c + d AS DECIMAL(38,0))"
        " * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)"
        " * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)"
        f" * {MICRO}"
    )
    den = (
        "(CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d))"
    )
    return cells.select(
        F.expr("a + b + c + d").alias("n_users"),
        F.expr("a + b").alias("variant0_users"),
        F.expr("c + d").alias("variant1_users"),
        F.col("a").alias("variant0_converted"),
        F.col("c").alias("variant1_converted"),
        F.expr(
            f"CASE WHEN {den} = 0 THEN CAST(0 AS BIGINT)"
            f" ELSE CAST(({num}) div {den} AS BIGINT) END"
        ).alias("chi2_micro"),
    ).withColumn(
        "significant",
        F.when(F.col("chi2_micro") >= CHISQ_95_MICRO, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long"),
    )


def ab_conversion_chisq_oracle_sql(min_purchases: int = 14) -> str:
    """DuckDB replay of :func:`ab_conversion_chisq`."""
    return f"""
WITH per_user AS MATERIALIZED (
  SELECT user_id,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS purchases
  FROM events GROUP BY user_id
), flags AS MATERIALIZED (
  SELECT user_id % 2 AS variant,
         CASE WHEN purchases >= {min_purchases} THEN 1 ELSE 0 END
           AS converted
  FROM per_user
), cells AS MATERIALIZED (
  SELECT
    sum(CASE WHEN variant = 0 AND converted = 1 THEN 1 ELSE 0 END) AS a,
    sum(CASE WHEN variant = 0 AND converted = 0 THEN 1 ELSE 0 END) AS b,
    sum(CASE WHEN variant = 1 AND converted = 1 THEN 1 ELSE 0 END) AS c,
    sum(CASE WHEN variant = 1 AND converted = 0 THEN 1 ELSE 0 END) AS d
  FROM flags
)
SELECT CAST(a + b + c + d AS BIGINT) AS n_users,
       CAST(a + b AS BIGINT) AS variant0_users,
       CAST(c + d AS BIGINT) AS variant1_users,
       CAST(a AS BIGINT) AS variant0_converted,
       CAST(c AS BIGINT) AS variant1_converted,
       CASE WHEN (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)) = 0
            THEN CAST(0 AS BIGINT)
            ELSE CAST(
              (CAST(a + b + c + d AS HUGEINT)
               * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
               * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
               * {MICRO})
              // (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d))
              AS BIGINT) END AS chi2_micro,
       CASE WHEN (
         CASE WHEN (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)) = 0
              THEN 0
              ELSE (CAST(a + b + c + d AS HUGEINT)
                    * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                    * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                    * {MICRO})
                   // (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d))
         END) >= {CHISQ_95_MICRO}
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
         AS significant
FROM cells
"""


# ---------------------------------------------------------------------------
# 4. RFM customer segmentation
# ---------------------------------------------------------------------------

# bucket expressions for the two-phase rank: each is a MONOTONE
# NON-DECREASING integer function of its axis's sort order (ascending
# bucket id == ascending rank), so offset-of-earlier-buckets + in-bucket
# row_number == the exact global row_number and the DuckDB oracle (a
# plain global row_number) is replayed bit-identically.
_RFM_BUCKETS = {
    # recency asc: 8-day cells — #buckets = observed-day-span/8
    "r_q": "recency_days div 8",
    # frequency desc: one bucket per distinct order count (bounded by
    # max orders per customer, not by customers)
    "f_q": "-frequency",
    # monetary desc: octave x top-5-bits grid (<= 32*64 cells over the
    # full BIGINT range) — monotone because bit length rises with value
    # and the top-5-bit slice is order-preserving within an octave.
    # Assumes non-negative cents (o_totalprice > 0).
    "m_q": (
        "-(CAST(length(bin(monetary_cents)) AS BIGINT) * 32"
        " + shiftrightunsigned(monetary_cents,"
        "     greatest(CAST(length(bin(monetary_cents)) AS INT) - 5, 0)))"
    ),
}

_RFM_SORT = {
    "r_q": lambda: [F.col("recency_days").asc(), F.col("o_custkey").asc()],
    "f_q": lambda: [F.col("frequency").desc(), F.col("o_custkey").asc()],
    "m_q": lambda: [
        F.col("monetary_cents").desc(),
        F.col("o_custkey").asc(),
    ],
}


def rfm_segments(orders: DataFrame) -> DataFrame:
    """Classic RFM (recency / frequency / monetary) segmentation of the
    customer base, quartile-scored with the DETERMINISTIC rank formula
    ``q = ((rn - 1) * 4) div n + 1`` over a totally-ordered row_number
    (never ntile, whose tie/remainder semantics would be an
    engine-dependence hazard), then rolled up per (r_q, f_q, m_q) cell.

    Quartile 1 is best on every axis: most recent (smallest recency),
    most frequent, highest spend. Monetary is summed in exact integer
    CENTS (one double product + round per order — identical on both
    engines — then order-independent BIGINT sums). Recency is measured
    against the dataset's max order date, in whole days.

    Scale — two-phase bucketed rank, NEVER a whole-customer-dim global
    window (the ``packing.py`` cumsum pattern): the per-customer frame
    is aggregated once and localCheckpointed (one orders scan shared by
    every downstream action), the as-of date and customer count come
    back as driver scalars off that checkpoint, and each axis's global
    row_number is offset-of-earlier-buckets + an in-bucket row_number
    whose window partitions by the bucket. Bucket histograms for all
    three axes collect in ONE stacked driver job, bounded by bucket
    GEOMETRY (day-span/8 + distinct frequencies + a <=2k-cell monetary
    grid), never by customer count; offsets broadcast back as tiny
    literal frames. The three axis frames re-join on o_custkey — keyed
    customer-grain shuffles that scale horizontally, where the previous
    shape moved the whole dimension through one task three times.
    Returns (r_q, f_q, m_q, n_customers, total_orders,
    total_monetary_cents).
    """
    spark = orders.sparkSession
    base = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("_last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
            "monetary_cents"
        ),
    ).localCheckpoint()
    # driver scalars off the customer-grain checkpoint (the repo's
    # scalar-literal idiom — no empty-partitionBy count window, no
    # second orders scan for the as-of date)
    asof_day, n_cust = base.agg(
        F.max("_last_day"), F.count(F.lit(1))
    ).collect()[0]
    per_cust = base.select(
        "o_custkey",
        F.datediff(F.lit(asof_day), F.col("_last_day"))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    # one stacked job: per-(axis, bucket) counts for all three axes
    hist = (
        per_cust.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(axis).alias("axis"),
                            F.expr(bkt).cast("long").alias("bkt"),
                        )
                        for axis, bkt in _RFM_BUCKETS.items()
                    ]
                )
            ).alias("x")
        )
        .groupBy("x.axis", "x.bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_axis: dict[str, list] = {a: [] for a in _RFM_BUCKETS}
    for row in hist:
        per_axis[row["axis"]].append((row["bkt"], row["n"]))
    axes = {}
    for axis, bkt_expr in _RFM_BUCKETS.items():
        off, offsets = 0, []
        for bkt, cnt in sorted(per_axis[axis]):
            offsets.append((bkt, off))
            off += cnt
        # pandas/Arrow local relation (the tuple form pays a Python-RDD
        # worker round trip per evaluation — round 10); same integers
        import pandas as pd

        off_df = spark.createDataFrame(
            pd.DataFrame(offsets, columns=["_bkt", "_off"]),
            "_bkt bigint, _off bigint",
        )
        w = Window.partitionBy("_bkt").orderBy(*_RFM_SORT[axis]())
        axes[axis] = (
            per_cust.withColumn("_bkt", F.expr(bkt_expr).cast("long"))
            .join(F.broadcast(off_df), "_bkt")
            .withColumn("_rn", F.row_number().over(w))
            .select(
                "o_custkey",
                F.expr(f"((_off + _rn - 1) * 4) div {max(n_cust, 1)} + 1")
                .alias(axis),
            )
        )
    return (
        per_cust.select("o_custkey", "frequency", "monetary_cents")
        .join(axes["r_q"], "o_custkey")
        .join(axes["f_q"], "o_custkey")
        .join(axes["m_q"], "o_custkey")
        .groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("frequency").alias("total_orders"),
            F.sum("monetary_cents").alias("total_monetary_cents"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


def rfm_segments_oracle_sql() -> str:
    """DuckDB replay of :func:`rfm_segments`."""
    return """
WITH asof_d AS MATERIALIZED (
  SELECT max(CAST(o_orderdate AS DATE)) AS asof_day FROM orders
), per_cust AS MATERIALIZED (
  SELECT o_custkey,
         date_diff('day', max(CAST(o_orderdate AS DATE)),
                   (SELECT asof_day FROM asof_d)) AS recency_days,
         count(*) AS frequency,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_cents
  FROM orders GROUP BY o_custkey
), scored AS MATERIALIZED (
  SELECT frequency, monetary_cents,
         row_number() OVER (ORDER BY recency_days, o_custkey) AS r_rn,
         row_number() OVER (ORDER BY frequency DESC, o_custkey) AS f_rn,
         row_number() OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_rn,
         count(*) OVER () AS n_cust
  FROM per_cust
)
SELECT CAST(((r_rn - 1) * 4) // n_cust + 1 AS BIGINT) AS r_q,
       CAST(((f_rn - 1) * 4) // n_cust + 1 AS BIGINT) AS f_q,
       CAST(((m_rn - 1) * 4) // n_cust + 1 AS BIGINT) AS m_q,
       count(*) AS n_customers,
       CAST(sum(frequency) AS BIGINT) AS total_orders,
       CAST(sum(monetary_cents) AS BIGINT) AS total_monetary_cents
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# 5. Inter-purchase interval histogram
# ---------------------------------------------------------------------------

def interpurchase_intervals(events: DataFrame) -> DataFrame:
    """Distribution of the time BETWEEN a user's consecutive purchases,
    as a log2-bucket histogram — the repeat-purchase-cadence read behind
    replenishment / re-engagement timing, and the behavioral complement
    of :func:`churn_hazard` (within-life rhythm vs end-of-life).

    Gaps are exact integer seconds (the session-chain convention:
    Spark's ``ts.cast(long)`` difference == DuckDB's
    ``date_diff('second', ...)`` for the same ordered pair); the bucket
    is the bit length of gap+1 (``length(bin(g+1))`` — the exact
    integer log2 trick shared with part_degree_hist/HLL rho, identical
    in both engines; +1 keeps the zero-gap bucket well-defined).

    Scale: one user_id lag shuffle over the purchase subset (filter
    pushed to the scan), then a map-combinable bucket aggregate —
    output is <= 64 rows. Returns
    (gap_bucket, n_gaps, min_gap_s, max_gap_s) ordered by bucket.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            (
                F.col("ts").cast("long")
                - F.lag(F.col("ts").cast("long")).over(w)
            ).alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
    )
    return (
        gaps.groupBy(
            F.length(F.bin(F.col("gap_s") + 1)).cast("long").alias(
                "gap_bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
        .orderBy("gap_bucket")
    )


def interpurchase_intervals_oracle_sql() -> str:
    """DuckDB replay of :func:`interpurchase_intervals`."""
    return """
WITH p AS MATERIALIZED (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
), gaps AS MATERIALIZED (
  SELECT date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id), ts) AS gap_s
  FROM p
)
SELECT CAST(length(bin(gap_s + 1)) AS BIGINT) AS gap_bucket,
       count(*) AS n_gaps,
       CAST(min(gap_s) AS BIGINT) AS min_gap_s,
       CAST(max(gap_s) AS BIGINT) AS max_gap_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# 6. User growth curve
# ---------------------------------------------------------------------------

def user_growth_curve(events: DataFrame) -> DataFrame:
    """Daily active / new / cumulative users — the product-growth
    triple: per epoch day (exact integer, identical both engines), the
    distinct active users, the users whose FIRST-ever event lands that
    day, and the running total of users acquired so far.

    All exact BIGINTs: DAU is a per-day distinct count, new-users come
    off the per-user min-day aggregate, and the cumulative curve is one
    window sum over the tiny per-day frame. Days with activity but no
    new users report new_users = 0 (left join). Returns
    (day, dau, new_users, cum_users) ordered by day.

    Scale: one (day, user) distinct + one user groupBy, both
    map-combinable; windows over #days rows.
    """
    day = (
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day")
    )
    du = events.select(day, "user_id").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    first = du.groupBy("user_id").agg(F.min("day").alias("day"))
    new = first.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    joined = dau.join(new, "day", "left").select(
        "day",
        "dau",
        F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        joined.withColumn("cum_users", F.sum("new_users").over(w))
        .orderBy("day")
    )


def user_growth_oracle_sql() -> str:
    """DuckDB replay of :func:`user_growth_curve`."""
    return """
WITH du AS MATERIALIZED (
  SELECT DISTINCT
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         user_id
  FROM events
), dau AS MATERIALIZED (
  SELECT day, count(*) AS dau FROM du GROUP BY day
), firsts AS MATERIALIZED (
  SELECT user_id, min(day) AS day FROM du GROUP BY user_id
), newu AS MATERIALIZED (
  SELECT day, count(*) AS new_users FROM firsts GROUP BY day
)
SELECT CAST(dau.day AS BIGINT) AS day,
       CAST(dau.dau AS BIGINT) AS dau,
       CAST(coalesce(newu.new_users, 0) AS BIGINT) AS new_users,
       CAST(sum(coalesce(newu.new_users, 0))
            OVER (ORDER BY dau.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM dau LEFT JOIN newu ON newu.day = dau.day
ORDER BY day
"""
