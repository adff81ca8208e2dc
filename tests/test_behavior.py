"""Funnel and cohort-retention operators (operators/behavior.py)."""

from __future__ import annotations

import pytest

from actyxos_data_flow_spark.operators import behavior as B
from tests.conftest import rows


def _events(spark):
    # user 1: full ordered funnel inside the window
    # user 2: view then click, purchase BEFORE the click (out of order)
    # user 3: view only; later click lands past the window
    # user 4: click+purchase but never a view (never enters)
    # user 5: two views; chain must anchor at the FIRST view, whose
    #         window excludes the purchase that user 5's second view
    #         would have admitted
    data = [
        (1, 100, "view"), (1, 150, "click"), (1, 180, "purchase"),
        (2, 100, "view"), (2, 160, "click"), (2, 120, "purchase"),
        (3, 100, "view"), (3, 400, "click"),
        (4, 100, "click"), (4, 150, "purchase"),
        (5, 100, "view"), (5, 300, "view"), (5, 310, "click"), (5, 350, "purchase"),
    ]
    return spark.createDataFrame(data, "user_id long, ts_micros long, event_type string")


def test_funnel_report_counts_and_lags(spark):
    got = rows(
        B.funnel_report(_events(spark), ("view", "click", "purchase"), window_us=200),
        "step_idx", "step", "users", "sum_lag_micros",
    )
    # step1: users 1,2,3,5 (4 users). step2: user 1 (t2=150), user 2
    # (t2=160), user 5 (click 310 > 100+200 -> out). step3: user 1 only
    # (purchase 180 >= 150, <= 300); user 2's purchase precedes the click.
    assert got == [
        (1, "view", 4, 0),
        (2, "click", 2, (150 - 100) + (160 - 100)),
        (3, "purchase", 1, 180 - 100),
    ]


def test_funnel_greedy_earliest_is_order_sensitive(spark):
    # purchase before click never counts, even though both exist
    ev = spark.createDataFrame(
        [(7, 10, "view"), (7, 30, "purchase"), (7, 50, "click")],
        "user_id long, ts_micros long, event_type string",
    )
    got = rows(B.funnel_report(ev, ("view", "click", "purchase"), 1000), "step_idx", "step", "users", "sum_lag_micros")
    assert [(r[0], r[2]) for r in got] == [(1, 1), (2, 1), (3, 0)]


def test_funnel_tie_semantics_default_vs_strict(spark):
    # click logged at the SAME microsecond as the view: the documented
    # default (>=) admits it; strict=True requires ts strictly after
    ev = spark.createDataFrame(
        [(9, 10, "view"), (9, 10, "click")],
        "user_id long, ts_micros long, event_type string",
    )
    lax = B.funnel_user_steps(ev, ("view", "click"), 100)
    assert rows(lax[1], "user_id", "t1", "t2") == [(9, 10, 10)]
    strict = B.funnel_user_steps(ev, ("view", "click"), 100, strict=True)
    assert rows(strict[1], "user_id", "t1", "t2") == []


def test_funnel_empty_step_yields_zero_rows_not_missing(spark):
    ev = spark.createDataFrame(
        [(1, 10, "view")], "user_id long, ts_micros long, event_type string"
    )
    got = rows(B.funnel_report(ev, ("view", "click"), 100), "step_idx", "step", "users", "sum_lag_micros")
    assert got == [(1, "view", 1, 0), (2, "click", 0, 0)]


def test_funnel_rejects_empty_steps(spark):
    with pytest.raises(ValueError, match="at least one"):
        B.funnel_user_steps(_events(spark), (), 10)


def test_cohort_retention_matrix(spark):
    # period = 100: user 1 first in period 0, active 0 and 2;
    # user 2 first in period 1, active 1; user 3 first in period 0,
    # active 0,1 (two events in period 1 count once)
    ev = spark.createDataFrame(
        [(1, 10), (1, 250), (2, 150), (3, 20), (3, 110), (3, 190)],
        "user_id long, ts_micros long",
    )
    got = rows(B.cohort_retention(ev, period_us=100), "cohort_period", "period_offset", "users")
    assert got == [(0, 0, 2), (0, 1, 1), (0, 2, 1), (1, 0, 1)]


def test_cohort_partitioning_invariance(spark):
    ev = _events(spark).select("user_id", "ts_micros")
    a = rows(B.cohort_retention(ev.coalesce(1), period_us=150), "cohort_period", "period_offset", "users")
    b = rows(B.cohort_retention(ev.repartition(7), period_us=150), "cohort_period", "period_offset", "users")
    assert a == b
