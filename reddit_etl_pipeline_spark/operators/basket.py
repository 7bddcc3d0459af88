"""Market-basket association rules: pairwise support / confidence /
lift over order baskets.

The reference's analytics surface is grouped aggregates over one table;
association rules are the classic co-occurrence extension (and the
corpus-curation cousin of PMI in functions/text.py — PMI scores token
bigrams, this scores basket item pairs with the standard retail
measures). Spark-first shape:

- Baskets are (basket_id, item) DISTINCT pairs; pair candidates come
  from the same self-join the co-purchase graph uses — volume is
  Σ C(basket_size, 2), bounded by basket size, never all-pairs across
  the catalog. At 100 TB the one guard that matters is a basket-size
  cap (a single degenerate 1e5-item basket is 5e9 pairs): ``max_basket``
  drops oversized baskets loudly-countably rather than exploding.
- Support counts are map-side-combinable groupBys; the rule table joins
  item supports back by item key (two hash joins).
- confidence = supp_ab / supp_a and lift = n·supp_ab / (supp_a·supp_b)
  are each ONE correctly-rounded double divide of exact BIGINTs
  (numerators/denominators multiplied in integer space first), rounded
  to 6 dp on both engines — the part_clustering_coeff convention, so
  the DuckDB oracle hash-matches.
- Output is top-``n`` by (support_ab DESC, item_a, item_b) — totally
  ordered, TakeOrdered-able.

No counterpart in the reference (reddit_etl/: pandas groupbys only);
part of the beyond-reference analytics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Σ C(k,2) per basket; a degenerate mega-basket would dominate the
#: pair volume — baskets past this size are excluded from pair
#: generation (standard practice; raise consciously for wide baskets).
MAX_BASKET = 10_000


def basket_rules(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_support: int = 2,
    top_n: int = 100,
    max_basket: int = MAX_BASKET,
) -> DataFrame:
    """Top-``top_n`` item-pair association rules by support.

    Returns (item_a, item_b, support_ab, support_a, support_b,
    conf_a_to_b, conf_b_to_a, lift) with item_a < item_b; supports are
    basket counts (BIGINT), confidences and lift 6-dp DOUBLEs. Pairs
    below ``min_support`` are dropped before the rule joins."""
    # the distinct scan feeds four branches (sizes, item_supp, ok, and
    # both sides of the pair self-join) — materialize it once instead of
    # recomputing the dominant scan per branch (the shared-subtree
    # lesson from triangle_counts/bm25_topk)
    b = (
        baskets.select(
            F.col(basket_col).alias("bid"), F.col(item_col).alias("item")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # basket-size guard: drop oversized baskets from PAIR generation
    # (their single-item supports still count — a mega-basket says
    # nothing about pairwise affinity but everything about item reach)
    sizes = b.groupBy("bid").agg(F.count(F.lit(1)).alias("sz")).localCheckpoint(
        eager=True
    )
    n_baskets = sizes.count()
    if n_baskets == 0:
        return baskets.sparkSession.createDataFrame(
            [],
            "item_a long, item_b long, support_ab long, support_a long, "
            "support_b long, conf_a_to_b double, conf_b_to_a double, "
            "lift double",
        )
    item_supp = b.groupBy("item").agg(F.count(F.lit(1)).alias("supp"))
    ok = b.join(
        sizes.filter(F.col("sz") <= max_basket).select("bid"), "bid"
    )
    x, y = ok.alias("x"), ok.alias("y")
    pair_supp = (
        x.join(
            y,
            (F.col("x.bid") == F.col("y.bid"))
            & (F.col("x.item") < F.col("y.item")),
        )
        .groupBy(
            F.col("x.item").alias("item_a"), F.col("y.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("support_ab"))
        .filter(F.col("support_ab") >= min_support)
    )
    sa = item_supp.select(
        F.col("item").alias("item_a"), F.col("supp").alias("support_a")
    )
    sb = item_supp.select(
        F.col("item").alias("item_b"), F.col("supp").alias("support_b")
    )
    rules = (
        pair_supp.join(sa, "item_a")
        .join(sb, "item_b")
        .select(
            "item_a",
            "item_b",
            "support_ab",
            "support_a",
            "support_b",
            F.round(F.col("support_ab") / F.col("support_a"), 6).alias(
                "conf_a_to_b"
            ),
            F.round(F.col("support_ab") / F.col("support_b"), 6).alias(
                "conf_b_to_a"
            ),
            # integer products first, ONE double divide, 6 dp
            F.round(
                (F.lit(n_baskets) * F.col("support_ab"))
                / (F.col("support_a") * F.col("support_b")),
                6,
            ).alias("lift"),
        )
    )
    return rules.orderBy(
        F.col("support_ab").desc(), "item_a", "item_b"
    ).limit(top_n)


def basket_rules_oracle_sql(
    min_support: int = 2, top_n: int = 100, max_basket: int = MAX_BASKET
) -> str:
    """DuckDB replay of the entry's ``basket_rules_parts``: baskets are
    orders, items are parts (DISTINCT (l_orderkey, l_partkey)); same
    integer supports, same single-divide 6-dp measures, same total
    order + limit."""
    return f"""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS bid, l_partkey AS item FROM lineitem
),
sizes AS MATERIALIZED (
  SELECT bid, count(*) AS sz FROM b GROUP BY bid
),
item_supp AS MATERIALIZED (
  SELECT item, count(*) AS supp FROM b GROUP BY item
),
ok AS MATERIALIZED (
  SELECT b.bid, b.item FROM b
  JOIN sizes s ON s.bid = b.bid AND s.sz <= {max_basket}
),
pair_supp AS MATERIALIZED (
  SELECT x.item AS item_a, y.item AS item_b, count(*) AS support_ab
  FROM ok x JOIN ok y ON x.bid = y.bid AND x.item < y.item
  GROUP BY x.item, y.item
  HAVING count(*) >= {min_support}
),
n AS MATERIALIZED (SELECT count(*) AS n_baskets FROM sizes)
SELECT CAST(item_a AS BIGINT) AS item_a,
       CAST(item_b AS BIGINT) AS item_b,
       support_ab,
       sa.supp AS support_a,
       sb.supp AS support_b,
       round(CAST(support_ab AS DOUBLE) / sa.supp, 6) AS conf_a_to_b,
       round(CAST(support_ab AS DOUBLE) / sb.supp, 6) AS conf_b_to_a,
       round(CAST(n.n_baskets * support_ab AS DOUBLE)
             / (sa.supp * sb.supp), 6) AS lift
FROM pair_supp
JOIN item_supp sa ON sa.item = item_a
JOIN item_supp sb ON sb.item = item_b, n
ORDER BY support_ab DESC, item_a, item_b
LIMIT {top_n}
"""
