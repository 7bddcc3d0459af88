"""Behavioral / experiment analytics (operators/behavior.py):
transition matrix, churn hazard, chi-square A/B, RFM segmentation."""

import datetime as dt

import pytest

from reddit_etl_pipeline_spark.operators import behavior as BH


def _ev(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    return spark.createDataFrame(
        [(i, t, u, e, float(v), None) for (i, t, u, e, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _at(days=0, secs=0):
    return T0 + dt.timedelta(days=days, seconds=secs)


class TestEventTransitions:
    def test_hand_computed_matrix(self, spark):
        ev = _ev(
            spark,
            [
                # user 1: A -> B -> A
                (1, _at(secs=0), 1, "A", 0),
                (2, _at(secs=10), 1, "B", 0),
                (3, _at(secs=20), 1, "A", 0),
                # user 2: B -> A
                (4, _at(secs=0), 2, "B", 0),
                (5, _at(secs=10), 2, "A", 0),
                # user 3: A -> C
                (6, _at(secs=0), 3, "A", 0),
                (7, _at(secs=10), 3, "C", 0),
            ],
        )
        got = {
            (r.prev_type, r.next_type): (r.n_transitions, r.prob_micro)
            for r in BH.event_transitions(ev).collect()
        }
        assert got == {
            ("A", "B"): (1, 500_000),
            ("A", "C"): (1, 500_000),
            ("B", "A"): (2, 1_000_000),
        }

    def test_single_event_users_emit_nothing(self, spark):
        ev = _ev(spark, [(1, _at(), 1, "A", 0), (2, _at(), 2, "B", 0)])
        assert BH.event_transitions(ev).count() == 0

    def test_row_probabilities_sum_to_one_minus_floor_loss(self, spark):
        ev = _ev(
            spark,
            [
                (i, _at(secs=i), 1, t, 0)
                for i, t in enumerate(["A", "B", "C", "A", "C", "B", "A"])
            ],
        )
        rows = BH.event_transitions(ev).collect()
        by_prev = {}
        for r in rows:
            by_prev.setdefault(r.prev_type, []).append(r.prob_micro)
        for prev, probs in by_prev.items():
            # floor division loses < 1 micro per cell
            assert 1_000_000 - len(probs) < sum(probs) <= 1_000_000


class TestChurnHazard:
    def test_hand_computed_curve(self, spark):
        # tenures in weeks: u1=0, u2=0, u3=1, u4=3
        ev = _ev(
            spark,
            [
                (1, _at(0), 1, "A", 0),
                (2, _at(3), 1, "A", 0),  # 3 days -> week 0
                (3, _at(0), 2, "A", 0),  # single day -> week 0
                (4, _at(0), 3, "A", 0),
                (5, _at(9), 3, "A", 0),  # 9 days -> week 1
                (6, _at(0), 4, "A", 0),
                (7, _at(22), 4, "A", 0),  # 22 days -> week 3
            ],
        )
        rows = BH.churn_hazard(ev).collect()
        got = {
            r.tenure_weeks: (r.churned, r.at_risk, r.hazard_micro)
            for r in rows
        }
        assert got == {
            0: (2, 4, 500_000),
            1: (1, 2, 500_000),
            3: (1, 1, 1_000_000),
        }
        # at_risk non-increasing in week order, last hazard is 1.0
        weeks = [r.tenure_weeks for r in rows]
        assert weeks == sorted(weeks)
        ar = [r.at_risk for r in rows]
        assert ar == sorted(ar, reverse=True)
        assert rows[-1].hazard_micro == 1_000_000


class TestChurnHazardCensored:
    def test_tail_divergence_hand_computed(self, spark):
        """The biased and censored curves diverge exactly where the
        censoring rule says: users last active within 7 days of the
        horizon leave the churned numerator but stay at risk."""
        ev = _ev(
            spark,
            [
                (1, _at(0), 1, "A", 0),
                (2, _at(3), 1, "A", 0),   # tenure wk 0, last=3  -> churned
                (3, _at(0), 2, "A", 0),   # tenure wk 0, last=0  -> churned
                (4, _at(0), 3, "A", 0),
                (5, _at(9), 3, "A", 0),   # tenure wk 1, last=9  -> churned
                (6, _at(0), 4, "A", 0),
                (7, _at(22), 4, "A", 0),  # tenure wk 3, last=22 = horizon -> CENSORED
                (8, _at(0), 5, "A", 0),
                (9, _at(17), 5, "A", 0),  # tenure wk 2, last=17, 5 d from horizon -> CENSORED
            ],
        )
        rows = BH.churn_hazard_censored(ev, censor_days=7).collect()
        got = {
            r.tenure_weeks: (r.churned, r.n_censored, r.at_risk, r.hazard_micro)
            for r in rows
        }
        assert got == {
            0: (2, 0, 5, 400_000),
            1: (1, 0, 3, 333_333),
            2: (0, 1, 2, 0),
            3: (0, 1, 1, 0),
        }
        # the uncensored twin reads the same tail as certain churn —
        # the exact bias the censored variant removes
        biased = {
            r.tenure_weeks: r.hazard_micro
            for r in BH.churn_hazard(ev).collect()
        }
        assert biased[3] == 1_000_000 and got[3][3] == 0
        assert biased[2] == 500_000 and got[2][3] == 0

    def test_no_censoring_when_window_zero(self, spark):
        """censor_days=0 censors nobody — the censored curve collapses
        to the uncensored twin (plus an all-zero n_censored column)."""
        ev = _ev(
            spark,
            [
                (1, _at(0), 1, "A", 0),
                (2, _at(3), 1, "A", 0),
                (3, _at(0), 2, "A", 0),
                (4, _at(9), 2, "A", 0),
            ],
        )
        cen = BH.churn_hazard_censored(ev, censor_days=0).collect()
        unc = BH.churn_hazard(ev).collect()
        assert [(r.tenure_weeks, r.churned, r.at_risk, r.hazard_micro) for r in cen] == [
            (r.tenure_weeks, r.churned, r.at_risk, r.hazard_micro) for r in unc
        ]
        assert all(r.n_censored == 0 for r in cen)


def _purchase_users(spark, converted_ids, unconverted_ids):
    rows = []
    eid = 0
    for u in converted_ids:
        for k in range(14):
            eid += 1
            rows.append((eid, _at(secs=k), u, "purchase", 1))
    for u in unconverted_ids:
        eid += 1
        rows.append((eid, _at(), u, "purchase", 1))
    return _ev(spark, rows)


class TestAbChisq:
    def test_perfect_separation_significant(self, spark):
        # variant 0 (even ids) all convert, variant 1 (odd) none
        ev = _purchase_users(spark, [2, 4, 6, 8, 10], [1, 3, 5, 7, 9])
        r = BH.ab_conversion_chisq(ev).collect()[0]
        assert (r.n_users, r.variant0_users, r.variant1_users) == (10, 5, 5)
        assert (r.variant0_converted, r.variant1_converted) == (5, 0)
        # chi2 = 10*(5*5-0)^2/(5*5*5*5) = 10 exactly
        assert r.chi2_micro == 10_000_000
        assert r.significant == 1

    def test_balanced_split_is_zero(self, spark):
        ev = _purchase_users(spark, [2, 4, 1, 3], [6, 8, 5, 7])
        r = BH.ab_conversion_chisq(ev).collect()[0]
        assert r.chi2_micro == 0
        assert r.significant == 0

    def test_hand_computed_value(self, spark):
        # a=3 (even conv), b=1 (even not), c=1 (odd conv), d=3 (odd not)
        # chi2 = 8*(9-1)^2/(4*4*4*4) = 8*64/256 = 2.0
        ev = _purchase_users(spark, [2, 4, 6, 1], [8, 3, 5, 7])
        r = BH.ab_conversion_chisq(ev).collect()[0]
        assert r.chi2_micro == 2_000_000
        assert r.significant == 0

    def test_degenerate_margin_is_zero_not_crash(self, spark):
        # everyone converts -> (b+d) margin is 0
        ev = _purchase_users(spark, [1, 2, 3, 4], [])
        r = BH.ab_conversion_chisq(ev).collect()[0]
        assert r.chi2_micro == 0
        assert r.significant == 0


class TestRfmSegments:
    def _orders(self, spark, rows):
        """rows: (orderkey, custkey, totalprice, orderdate)"""
        return spark.createDataFrame(
            [
                (ok, ck, "O", float(tp), od, "1-URGENT")
                for (ok, ck, tp, od) in rows
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        )

    def test_quartile_formula_and_conservation(self, spark):
        # 8 customers, aligned axes: cust k has recency rank k,
        # frequency rank k, monetary rank k  ->  diagonal segments
        rows = []
        ok = 0
        for k in range(8):  # custkey 10+k
            n_orders = 8 - k  # frequency: cust 10 highest
            for j in range(n_orders):
                ok += 1
                rows.append(
                    (
                        ok,
                        10 + k,
                        1000.0 - 100 * k,  # monetary per order
                        _at(days=30 - k * 3 + j if j else 30 - k * 3),
                    )
                )
        orders = self._orders(spark, rows)
        res = BH.rfm_segments(orders).collect()
        assert sum(r.n_customers for r in res) == 8
        assert sum(r.total_orders for r in res) == ok
        # exact cents conservation
        total_cents = sum(r.total_monetary_cents for r in res)
        expect = sum(int(round(tp * 100)) for (_, _, tp, _) in rows)
        assert total_cents == expect
        # quartile labels all in 1..4
        for r in res:
            assert 1 <= r.r_q <= 4 and 1 <= r.f_q <= 4 and 1 <= r.m_q <= 4

    def test_best_and_worst_cells(self, spark):
        # cust 1: recent, frequent, big spender; cust 4: stale, rare, small
        rows = [
            (1, 1, 900.0, _at(days=30)),
            (2, 1, 900.0, _at(days=29)),
            (3, 1, 900.0, _at(days=28)),
            (4, 2, 500.0, _at(days=20)),
            (5, 2, 500.0, _at(days=19)),
            (6, 3, 300.0, _at(days=10)),
            (7, 3, 300.0, _at(days=9)),
            (8, 4, 100.0, _at(days=0)),
        ]
        orders = self._orders(spark, rows)
        res = {
            (r.r_q, r.f_q, r.m_q): r.n_customers
            for r in BH.rfm_segments(orders).collect()
        }
        assert res[(1, 1, 1)] == 1  # cust 1
        assert res[(4, 4, 4)] == 1  # cust 4

    def test_deterministic(self, spark):
        rows = [(i, 1 + i % 3, 100.0 * (1 + i % 5), _at(days=i % 17)) for i in range(1, 40)]
        orders = self._orders(spark, rows)
        a = [tuple(r) for r in BH.rfm_segments(orders).collect()]
        b = [tuple(r) for r in BH.rfm_segments(orders).collect()]
        assert a == b


class TestInterpurchaseIntervals:
    def test_hand_computed_buckets(self, spark):
        # user 1 purchases at t=0, 1s, 10s -> gaps 1, 9
        # user 2 purchases at t=0, 300s   -> gap 300
        # buckets: bin(2)=2, bin(10)=4, bin(301)=9
        ev = _ev(
            spark,
            [
                (1, _at(secs=0), 1, "purchase", 0),
                (2, _at(secs=1), 1, "purchase", 0),
                (3, _at(secs=10), 1, "purchase", 0),
                (4, _at(secs=0), 2, "purchase", 0),
                (5, _at(secs=300), 2, "purchase", 0),
                (6, _at(secs=5), 1, "click", 0),  # ignored
            ],
        )
        got = {
            r.gap_bucket: (r.n_gaps, r.min_gap_s, r.max_gap_s)
            for r in BH.interpurchase_intervals(ev).collect()
        }
        assert got == {2: (1, 1, 1), 4: (1, 9, 9), 9: (1, 300, 300)}

    def test_zero_gap_bucket_defined(self, spark):
        # two purchases in the same second -> gap 0 -> bin(1) length 1
        ev = _ev(
            spark,
            [
                (1, _at(secs=0), 1, "purchase", 0),
                (2, _at(secs=0), 1, "purchase", 0),
            ],
        )
        rows = BH.interpurchase_intervals(ev).collect()
        assert len(rows) == 1 and rows[0].gap_bucket == 1
        assert rows[0].min_gap_s == 0

    def test_single_purchase_users_emit_nothing(self, spark):
        ev = _ev(spark, [(1, _at(), 1, "purchase", 0), (2, _at(), 2, "purchase", 0)])
        assert BH.interpurchase_intervals(ev).count() == 0


class TestUserGrowthCurve:
    def test_hand_computed(self, spark):
        ev = _ev(
            spark,
            [
                (1, _at(days=0), 1, "A", 0),
                (2, _at(days=0), 2, "A", 0),
                (3, _at(days=1), 1, "A", 0),   # active, not new
                (4, _at(days=1), 3, "A", 0),   # new on day 1
                (5, _at(days=3), 1, "A", 0),   # day 2 empty, day 3: only u1
            ],
        )
        rows = BH.user_growth_curve(ev).collect()
        day0 = rows[0].day
        got = {r.day - day0: (r.dau, r.new_users, r.cum_users) for r in rows}
        assert got == {0: (2, 2, 2), 1: (2, 1, 3), 3: (1, 0, 3)}

    def test_cum_users_equals_total_distinct(self, spark):
        ev = _ev(
            spark,
            [(i, _at(days=i % 4, secs=i), i % 5, "A", 0) for i in range(25)],
        )
        rows = BH.user_growth_curve(ev).collect()
        assert rows[-1].cum_users == 5
        assert sum(r.new_users for r in rows) == 5
