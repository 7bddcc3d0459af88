"""As-of (point-in-time) join — an operator the DataFrame API lacks.

``asof_join(left, right)``: for every left row, attach the latest right
row with the same key whose timestamp is <= the left timestamp. The
canonical time-series primitive (trades⋈quotes, orders⋈telemetry,
feature stores).

Implementation is the union + carry-forward window, not a range join:

1. tag both sides and union on (key, ts) — no pairwise comparison blowup;
2. one window per key ordered by (ts, side) with right rows sorting
   before left rows at equal ts ("at or before" semantics);
3. ``last(value, ignorenulls=True)`` carries the most recent right value
   forward onto each left row;
4. filter back to left rows.

Cost: ONE shuffle of |left|+|right| rows on the key — same asymptotics
as a regular equi-join, vs the quadratic candidate space of an interval
join. Skewed keys can be salted upstream (operators.skew) because the
carry is per-key independent.

Citation for semantics parity: DuckDB's native ASOF JOIN
(``ON l.key = r.key AND l.ts >= r.ts``) — the driver oracle runs exactly
that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: all left columns + ``suffix+c`` for each value
    column of ``right`` (NULL when no right row matches).

    ``direction="backward"`` (default) attaches the LATEST right row
    at-or-before the left timestamp (carry-forward);
    ``direction="forward"`` attaches the EARLIEST right row at-or-after
    it (carry-backward) — same single-shuffle union+window plan, with
    the window frame and tie order mirrored.

    ``right`` should be unique per (by, right_ts); pre-dedupe if not —
    ties at identical timestamps are otherwise engine-dependent.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    # right values are carried inside a single struct: last(ignorenulls)
    # then distinguishes "no right row yet" (struct NULL) from a matched
    # row whose value column is legitimately NULL (struct non-null,
    # field NULL) — plain per-column carry would skip NULL values and
    # resurrect an older row, diverging from ASOF semantics
    rstruct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    l_tag = left.select(
        F.col(by).alias("__k"),
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None)
        .cast(right.select(rstruct.alias("s")).schema["s"].dataType)
        .alias("__vrow"),
    )
    r_tag = right.select(
        F.col(by).alias("__k"),
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        rstruct.alias("__vrow"),
    )
    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right rows sort first at equal ts -> "at or before" includes ties
        w = (
            Window.partitionBy("__k")
            .orderBy("__t", "__is_left")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("__vrow", ignorenulls=True).over(w)
    else:
        # mirrored: right rows sort AFTER left at equal ts so the
        # [current, following] frame sees an equal-ts right row
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__t").asc(), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("__vrow", ignorenulls=True).over(w)
    carried = unioned.select(
        "__is_left",
        "__lrow",
        carry.alias("__cv"),
    )
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__cv.{c}").alias(f"{suffix}{c}") for c in value_cols]
    return carried.filter(F.col("__is_left") == 1).select(*out_cols)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
) -> DataFrame:
    """Interval join: pairs (l, r) with same ``by`` key and
    ``l.ts + lower <= r.ts < l.ts + upper`` — via time-bucket equi-join.

    A naive non-equi join plans as BroadcastNestedLoop/cartesian (O(n*m)
    per key). Bucketing time into ``width = upper-lower`` wide buckets
    and exploding the LEFT row into the 2 buckets its window can touch
    turns the candidate space into an equi-join on (key, bucket) — each
    true pair appears exactly once after the exact range filter (a right
    row's bucket is deterministic; the left duplicates cover both
    possible buckets, and the filter kills the miss).

    Returns left columns + right columns (inner semantics); aggregate
    downstream as needed.
    """
    # microsecond arithmetic throughout: casting a timestamp to long
    # floors to SECONDS, which would widen the window by up to 1s at each
    # boundary vs full-precision comparison
    width_us = int(upper_seconds - lower_seconds) * 1_000_000
    lower_us = int(lower_seconds) * 1_000_000
    upper_us = int(upper_seconds) * 1_000_000
    if width_us <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")
    l_lo = F.unix_micros(F.col(left_ts).cast("timestamp")) + F.lit(lower_us)
    l = left.withColumn(
        "__lb",
        F.explode(
            F.array(
                F.floor(l_lo / width_us).cast("long"),
                (F.floor(l_lo / width_us) + 1).cast("long"),
            )
        ),
    )
    # prefix right columns to keep the joined relation unambiguous
    r = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    ).withColumn(
        "__rb",
        F.floor(
            F.unix_micros(F.col(f"r_{right_ts}").cast("timestamp")) / width_us
        ).cast("long"),
    )
    lus = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rus = F.unix_micros(F.col(f"r_{right_ts}").cast("timestamp"))
    cond = (
        (F.col(by) == F.col(f"r_{by}"))
        & (F.col("__lb") == F.col("__rb"))
        & (rus >= lus + lower_us)
        & (rus < lus + upper_us)
    )
    return l.join(r, cond).drop("__lb", "__rb", f"r_{by}")
