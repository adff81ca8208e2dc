"""RL/preference-data operators (operators/rlpref.py): exactness of the
integer discount weights, determinism of the pair mining under ties,
and the depth recurrence against a straight Python replay."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from actyxos_data_flow_spark.operators import rlpref as R


def _ev(spark, rows):
    # rows: (event_id, ts_seconds, user_id, event_type, value)
    data = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, t, v, None)
        for (i, s, u, t, v) in rows
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    # events read as LONG epoch-nanos in the engine (sources/tables)
    return df.withColumn("ts", F.unix_micros("ts") * F.lit(1000))


def test_return_weights_are_exact_gamma_powers():
    w = R._return_weights(R.RL_HORIZON)
    assert len(w) == R.RL_HORIZON + 1
    for k, wk in enumerate(w):
        assert wk == R.RL_GAMMA_NUM**k * R.RL_GAMMA_DEN ** (R.RL_HORIZON - k)
    # fp scale: k=0 weight is exactly gamma_den^H
    assert w[0] == R.RL_GAMMA_DEN**R.RL_HORIZON


def test_episode_returns_match_python_replay(spark):
    rows = [(i, i * 10, 1, "click", float(i + 1)) for i in range(12)]
    out = {
        r["event_id"]: r["g_fp8"]
        for r in R.episode_returns(_ev(spark, rows)).collect()
    }
    cents = [int(v * 100 + 0.5) for v in (float(i + 1) for i in range(12))]
    w = R._return_weights(R.RL_HORIZON)
    for t in range(12):
        expect = sum(
            cents[t + k] * w[k] for k in range(R.RL_HORIZON + 1) if t + k < 12
        )
        assert out[t] == expect, t


def test_advantage_baseline_is_truncating_mean(spark):
    rows = [(i, i, 7, "view", float(v)) for i, v in enumerate([1.0, 2.0, 2.0])]
    res = R.advantage_baseline(R.episode_returns(_ev(spark, rows))).collect()
    gs = [r["g_fp8"] for r in res]
    b = sum(gs) // len(gs)
    for r in res:
        assert r["baseline_fp8"] == b
        assert r["adv_fp8"] == r["g_fp8"] - b


def test_preference_pairs_tie_break_and_filters(spark):
    rows = [
        # group (1, click): tie at the top value -> smallest id chosen
        (1, 1, 1, "click", 5.0),
        (2, 2, 1, "click", 5.0),
        (3, 3, 1, "click", 1.0),
        # group (2, view): single row -> dropped
        (4, 4, 2, "view", 9.0),
        # group (3, view): zero margin -> dropped
        (5, 5, 3, "view", 2.0),
        (6, 6, 3, "view", 2.0),
    ]
    got = {tuple(r[:2]): r for r in R.preference_pairs(_ev(spark, rows)).collect()}
    assert set(got) == {(1, "click")}
    r = got[(1, "click")]
    assert r["chosen_id"] == 1 and r["rejected_id"] == 3
    assert r["margin_cents"] == 400


def test_call_depth_stats_recurrence(spark):
    seq = ["click", "click", "purchase", "click", "purchase", "purchase", "purchase"]
    rows = [(i, i, 9, t, 0.0) for i, t in enumerate(seq)]
    r = R.call_depth_stats(_ev(spark, rows)).collect()[0]
    depth, mx = 0, 0
    for t in seq:
        depth += 1 if t == R.TRACE_PUSH else (-1 if t == R.TRACE_POP else 0)
        mx = max(mx, depth)
    assert r["max_depth"] == mx and r["end_balance"] == depth
    assert r["n_push"] == 3 and r["n_pop"] == 4


def test_agreement_matrix_latest_wins(spark):
    def evp(i, s, u, v, k):
        return (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, "view", v, '{"k": %d}' % k)

    data = [
        evp(1, 1, 1, 200.0, 5),   # u1 item5: lab 1
        evp(2, 2, 2, 10.0, 5),    # u2 item5: lab 0 ...
        evp(3, 3, 2, 300.0, 5),   # ... overridden later -> lab 1 (agree)
        evp(4, 4, 1, 10.0, 6),    # u1 item6: lab 0
        evp(5, 5, 2, 400.0, 6),   # u2 item6: lab 1 (disagree)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.unix_micros("ts") * F.lit(1000))
    r = R.agreement_matrix(df).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["user_a"], row["user_b"]) == (1, 2)
    assert row["n_items"] == 2 and row["n_agree"] == 1
    assert row["agree_fp6"] == 500000
    assert row["n_items_capped"] == 0  # nothing near the cap here


def _agree_events(spark, triples):
    """triples: (user, item, lab) -> one event per (u, item) with value
    clearing the threshold iff lab."""
    data = [
        (
            i,
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
            u,
            "view",
            500.0 if lab else 1.0,
            '{"k": %d}' % k,
        )
        for i, (u, k, lab) in enumerate(triples)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    return df.withColumn("ts", F.unix_micros("ts") * F.lit(1000))


def test_agreement_matrix_cap_bounds_viral_item(spark):
    """A viral item (raters >> cap) must contribute at most cap-choose-2
    pairs, flagged via n_items_capped; an uncapped item is untouched;
    and the subsample is deterministic (two runs identical)."""
    cap = 4
    viral = [(u, 100, 1) for u in range(1, 21)]  # 20 raters, all agree
    small = [(u, 200, u % 2) for u in (1, 2, 3)]  # 3 raters, under cap
    df = _agree_events(spark, viral + small)
    out = R.agreement_matrix(df, max_raters=cap).collect()
    out2 = R.agreement_matrix(df, max_raters=cap).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))  # deterministic
    via_viral = [r for r in out if r["n_items_capped"] > 0]
    # exactly cap raters survive the subsample -> C(cap,2) viral pairs
    assert len(via_viral) <= cap * (cap - 1) // 2
    viral_users = {r["user_a"] for r in via_viral} | {r["user_b"] for r in via_viral}
    assert len(viral_users) <= cap
    # item 200 (3 raters < cap) pairs all 3 users, uncapped
    small_pairs = [
        r for r in out
        if {r["user_a"], r["user_b"]} <= {1, 2, 3} and r["n_items_capped"] == 0
    ]
    assert any(r["n_items"] >= 1 for r in small_pairs) or all(
        u in viral_users for u in (1, 2, 3)
    )
    # uncapped run for contrast: the viral item alone fans out 20*19/2
    full = R.agreement_matrix(df, max_raters=None).collect()
    assert len(full) >= 20 * 19 // 2


def test_agreement_report_floor_and_topn(spark):
    """The report keeps only pairs at/above the co-item floor, at most
    top_peers rows per user, ranked (n_items DESC, agree_fp6 DESC,
    peer ASC) — verified against a Python replay of the matrix."""
    triples = []
    # users 1..4 all rate items 10..13 (4 shared items); user 5 rates
    # only item 10 (1 co-item with everyone -> below a floor of 2)
    for k in (10, 11, 12, 13):
        for u in (1, 2, 3, 4):
            triples.append((u, k, (u + k) % 2))
    triples.append((5, 10, 1))
    df = _agree_events(spark, triples)
    mat = R.agreement_matrix(df, max_raters=None)
    rep = R.agreement_report(mat, min_co_items=2, top_peers=2).collect()
    mrows = mat.collect()
    # replay: symmetrize, floor, rank
    sym = []
    for r in mrows:
        sym.append((r["user_a"], r["user_b"], r["n_items"], r["agree_fp6"]))
        sym.append((r["user_b"], r["user_a"], r["n_items"], r["agree_fp6"]))
    expect = {}
    for u in {s[0] for s in sym}:
        mine = sorted(
            [s for s in sym if s[0] == u and s[2] >= 2],
            key=lambda s: (-s[2], -s[3], s[1]),
        )[:2]
        if mine:
            expect[u] = [(s[1], i + 1) for i, s in enumerate(mine)]
    got = {}
    for r in sorted(rep, key=lambda r: (r["user_id"], r["rank"])):
        got.setdefault(r["user_id"], []).append((r["peer_id"], r["rank"]))
        assert r["n_items"] >= 2
    assert got == expect
    # user 5 has no pair with >= 2 co-items -> absent
    assert 5 not in got
    assert all(len(v) <= 2 for v in got.values())


def test_agreement_kappa_matches_hand_computation(spark):
    """kappa_fp6 against the textbook formula on a hand-checkable case,
    including a NEGATIVE kappa (truncation toward zero on both engines)
    and the dropped den=0 (p_e = 1) pair."""
    triples = []
    # pair (1,2): labels a=[1,1,0,0], b=[1,0,0,1] over items 10..13
    for k, (la, lb) in zip((10, 11, 12, 13), [(1, 1), (1, 0), (0, 0), (0, 1)]):
        triples.append((1, k, la))
        triples.append((2, k, lb))
    # pair (3,4): both constant-1 on 2 items -> p_e = 1 -> dropped
    for k in (20, 21):
        triples.append((3, k, 1))
        triples.append((4, k, 1))
    # pair (5,6): perfect disagreement, balanced marginals -> kappa = -1
    for k, (la, lb) in zip((30, 31), [(1, 0), (0, 1)]):
        triples.append((5, k, la))
        triples.append((6, k, lb))
    df = _agree_events(spark, triples)
    out = {(r["user_a"], r["user_b"]): r for r in R.agreement_kappa(df).collect()}
    # (1,2): n=4, agree=2, a1=2, b1=2 -> chance=8, num=0, den=8 -> 0
    r = out[(1, 2)]
    assert (r["n_items"], r["n_agree"], r["a_pos"], r["b_pos"]) == (4, 2, 2, 2)
    assert r["kappa_fp6"] == 0
    # (3,4): den = 0 -> dropped
    assert (3, 4) not in out
    # (5,6): n=2, agree=0, a1=1, b1=1 -> chance=2, num=-2, den=2 -> -1.0
    assert out[(5, 6)]["kappa_fp6"] == -1_000_000
    # python replay for every emitted pair: int(Fraction) truncates
    # toward zero — the semantics both engines' integer division share
    from fractions import Fraction

    for (ua, ub), r in out.items():
        n, ag, a1, b1 = r["n_items"], r["n_agree"], r["a_pos"], r["b_pos"]
        ch = a1 * b1 + (n - a1) * (n - b1)
        num, den = ag * n - ch, n * n - ch
        assert r["kappa_fp6"] == int(Fraction(num * 1_000_000, den)), (ua, ub)


def test_merge_session_state_is_arrival_order_independent(spark):
    """Folding arrival batches in ANY order must converge to the same
    session state (the stream_latebound_sessionize contract)."""
    import itertools
    import random

    from pyspark.sql import functions as F

    from actyxos_data_flow_spark.streaming.windows import merge_session_state

    gap = 100
    rng = random.Random(5)
    # 2 users, event times with gaps straddling the threshold
    times = {1: [0, 50, 149, 300, 401, 500], 2: [10, 111, 211, 600]}
    rows = [(u, t) for u, ts in times.items() for t in ts]

    def mini(batch):
        df = spark.createDataFrame(batch, "user_id long, tsu long")
        return df.groupBy("user_id", "tsu").agg(F.count(F.lit(1)).alias("n_events")).select(
            "user_id", F.col("tsu").alias("s_us"), F.col("tsu").alias("last_us"), "n_events"
        )

    def fold(order, batches):
        state = None
        for i in order:
            state = merge_session_state(state, mini(batches[i]), gap)
        return sorted(tuple(r) for r in state.collect())

    batches = [rows[i::3] for i in range(3)]
    base = fold([0, 1, 2], batches)
    for order in itertools.permutations(range(3)):
        assert fold(list(order), batches) == base, order
    # backfill-size guard: above the cap the broadcast HINT is dropped
    # (Catalyst/AQE then picks the strategy from actual sizes — it may
    # still broadcast a genuinely tiny set, which is correct); the
    # result must be identical either way
    def fold_capped(order, cap):
        state = None
        for i in order:
            state = merge_session_state(
                state, mini(batches[i]), gap, max_broadcast_users=cap
            )
        return state

    shuf = fold_capped([0, 1, 2], 0)
    assert sorted(tuple(r) for r in shuf.collect()) == base
    assert "ResolvedHint" not in shuf._jdf.queryExecution().analyzed().toString()
    hinted = fold_capped([0, 1, 2], 10**9)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    # sanity: sessions split exactly at >= gap
    u1 = [r for r in base if r[0] == 1]
    # 149->300 (151) and 300->401 (101) both break at >= 100; 401->500 (99) joins
    assert [(r[1], r[2], r[3]) for r in u1] == [(0, 149, 3), (300, 300, 1), (401, 500, 2)]
