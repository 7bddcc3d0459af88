"""Market-basket association rules (operators/basket.py): measures vs
hand computation, guard behavior, determinism of the top-n cut."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.operators.basket import (  # noqa: E402
    basket_rules,
)


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket_id long, item long")


def test_measures_match_hand_computation(spark):
    # 4 baskets; {1,2} together in 3, item 1 in 4, item 2 in 3;
    # {1,3} together in 2; duplicates within a basket must not double
    rows = [
        (10, 1), (10, 2), (10, 3),
        (11, 1), (11, 2), (11, 2),  # dup (11,2)
        (12, 1), (12, 2),
        (13, 1), (13, 3),
    ]
    got = {
        (r.item_a, r.item_b): r
        for r in basket_rules(_baskets(spark, rows), min_support=2).collect()
    }
    r12 = got[(1, 2)]
    assert (r12.support_ab, r12.support_a, r12.support_b) == (3, 4, 3)
    assert r12.conf_a_to_b == 0.75 and r12.conf_b_to_a == 1.0
    assert r12.lift == round(4 * 3 / (4 * 3), 6) == 1.0
    r13 = got[(1, 3)]
    assert (r13.support_ab, r13.support_a, r13.support_b) == (2, 4, 2)
    assert r13.lift == round(4 * 2 / (4 * 2), 6) == 1.0
    assert (2, 3) not in got  # support 1 < min_support


def test_mega_basket_excluded_from_pairs(spark):
    """A basket past max_basket contributes item supports (reach) but no
    pairs — the Σ C(k,2) blowup guard."""
    rows = [(1, i) for i in range(20)] + [(2, 1), (2, 2), (3, 1), (3, 2)]
    got = {
        (r.item_a, r.item_b): r
        for r in basket_rules(
            _baskets(spark, rows), min_support=1, max_basket=5
        ).collect()
    }
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    # pair support counts baskets 2,3 only; item supports include basket 1
    assert (r.support_ab, r.support_a, r.support_b) == (2, 3, 3)


def test_empty_input(spark):
    out = basket_rules(_baskets(spark, []))
    assert out.count() == 0
    assert out.columns == [
        "item_a", "item_b", "support_ab", "support_a", "support_b",
        "conf_a_to_b", "conf_b_to_a", "lift",
    ]
