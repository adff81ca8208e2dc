"""RL / preference-data operators over event streams — the
post-training data plane (reward traces, advantage baselines,
preference-pair mining, annotator agreement, tool-trace depth).

A modern training-data pipeline doesn't stop at pretraining text: RLHF
and agentic fine-tuning consume EVENT data — reward rollouts, ranked
completions, tool-call traces. These operators re-express those
workloads on the engine's event table, with the same exact-integer
numeric posture as the text plane (see functions/scalar.py): every
hashed value is a BIGINT by construction, rewards enter as exact cents
(:func:`..functions.scalar.cents`), discounts are integer-weighted
window sums, baselines are truncating integer means — zero libm, zero
DOUBLE in any output.

Design lineage: the grouped/windowed shapes reuse the reference's
grouped-processing semantics (reference src/flow.rs GroupedFlow — the
group key owns its ordered substream) re-expressed as Spark window
functions; nothing here translates reference code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import cents, ns_micros

# Discount gamma = 9/10 over a fixed horizon: the truncated discounted
# return in fp units of 10^-HORIZON is an EXACT integer
#   G_t = sum_{k=0..H} r_{t+k} * 9^k * 10^(H-k)   (= 10^H * sum r gamma^k)
# missing leads contribute 0. With H = 8 and rewards <= ~10^7 cents the
# largest term is r * 10^8 <= 10^15 and the 9-term sum stays far inside
# BIGINT.
RL_GAMMA_NUM, RL_GAMMA_DEN = 9, 10
RL_HORIZON = 8


def _return_weights(horizon: int = RL_HORIZON) -> list[int]:
    """w_k = gamma_num^k * gamma_den^(horizon-k): integer weights whose
    fp scale is gamma_den^horizon."""
    return [RL_GAMMA_NUM**k * RL_GAMMA_DEN ** (horizon - k) for k in range(horizon + 1)]


def episode_returns(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    horizon: int = RL_HORIZON,
) -> DataFrame:
    """Per-step truncated discounted return over each user's event
    stream (the episode), ordered by (ts, event_id): reward r_t is the
    event value in exact cents, and

        g_fp = Σ_{k=0..H} r_{t+k} · 9^k · 10^(H−k)

    — i.e. 10^H · Σ r·γ^k with γ = 0.9, an exact BIGINT on any build
    (the discount is applied as integer WEIGHTS, never as a pow()).

    Output: (event_id, user_id, ts_micros, r_cents, g_fp8).

    Scale shape: ONE shuffle on the episode key, one sort per
    partition, H+1 lead() reads inside a single window spec — Spark
    collapses them into one WindowExec pass; no self-join, no Python.
    Horizon-truncation is what makes the return a bounded-frame window
    at all: the full infinite-horizon recurrence would be a sequential
    per-episode scan (γ^H = 0.43 at H=8 — the tail the truncation
    drops — is the standard n-step-return tradeoff)."""
    w = Window.partitionBy(user_col).orderBy(F.col("_tsu").asc(), F.col(id_col).asc())
    base = df.select(
        id_col,
        user_col,
        ns_micros(ts_col).alias("_tsu"),
        cents(value_col).alias("r_cents"),
    )
    weights = _return_weights(horizon)
    g = F.lit(0).cast("long")
    for k, wk in enumerate(weights):
        term = F.col("r_cents") if k == 0 else F.lead("r_cents", k).over(w)
        g = g + F.coalesce(term, F.lit(0)) * F.lit(wk)
    return base.select(
        id_col,
        user_col,
        F.col("_tsu").alias("ts_micros"),
        "r_cents",
        g.cast("long").alias("g_fp8"),
    )


def advantage_baseline(
    returns_df: DataFrame,
    user_col: str = "user_id",
) -> DataFrame:
    """Advantage vs a per-episode mean baseline: adv_t = G_t − b where
    b = ⌊Σ G / n⌋ per user — REINFORCE-with-baseline's variance
    reduction as a grouped integer fold. The truncating integer mean is
    the cross-engine convention (Spark DIV ≡ DuckDB //); the baseline
    is also emitted so the quantization is auditable.

    Scale shape: one aggregate window over the same episode
    partitioning the returns already have — no second shuffle when
    composed with :func:`episode_returns` (AQE reuses the exchange)."""
    b = F.expr(
        f"(sum(g_fp8) OVER (PARTITION BY {user_col})) DIV "
        f"(count(*) OVER (PARTITION BY {user_col}))"
    )
    return returns_df.select(
        "event_id",
        user_col,
        "ts_micros",
        "g_fp8",
        b.cast("long").alias("baseline_fp8"),
        (F.col("g_fp8") - b).cast("long").alias("adv_fp8"),
    )


def preference_pairs(
    df: DataFrame,
    prompt_cols: tuple[str, ...] = ("user_id", "event_type"),
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Preference-pair mining: within each prompt group (here: a user's
    events of one type — the stand-in for 'completions of one prompt'),
    pair the highest-scored row as CHOSEN against the lowest-scored as
    REJECTED — the DPO/RLHF dataset construction. Groups with a single
    row (no contrast) and pairs with zero margin (no signal) are
    dropped; ties break on the smallest event_id on both extremes, so
    the pair is a deterministic function of the data.

    Output: (prompt cols…, chosen_id, rejected_id, chosen_cents,
    rejected_cents, margin_cents).

    Scale shape: ONE aggregate per group (max_by/min_by over a
    lexicographic (score, −id) struct — map-side combined), no window
    sort, no self-join: the classic two-extremes mine is an O(1)-state
    fold however many completions a prompt has."""
    c = cents(value_col)
    # lexicographic argmax via struct compare: (cents asc, id desc) so
    # MAX picks highest cents, then SMALLEST id among ties; MIN the
    # lowest cents with smallest id (id negated on the max side only).
    hi = F.max(F.struct(c.alias("c"), (-F.col(id_col)).alias("negid")))
    lo = F.min(F.struct(c.alias("c"), F.col(id_col).alias("id")))
    g = df.groupBy(*prompt_cols).agg(
        hi.alias("_hi"), lo.alias("_lo"), F.count(F.lit(1)).alias("_n")
    )
    return (
        g.filter(F.col("_n") >= 2)
        .select(
            *prompt_cols,
            (-F.col("_hi.negid")).cast("long").alias("chosen_id"),
            F.col("_lo.id").cast("long").alias("rejected_id"),
            F.col("_hi.c").alias("chosen_cents"),
            F.col("_lo.c").alias("rejected_cents"),
            (F.col("_hi.c") - F.col("_lo.c")).alias("margin_cents"),
        )
        .filter(F.col("margin_cents") > 0)
    )


# agreement labeling: an event is a THUMBS-UP when its value clears
# this many cents — the deterministic stand-in for an annotator's
# binary verdict on an item
AGREE_THRESHOLD_CENTS = 10_000

# rater cap per item before the pair self-join (the max_bucket guard
# from operators/dedup.py applied to the agreement blocking key): a
# viral item rated by millions contributes at most cap^2/2 pairs —
# computed over a DETERMINISTIC salted-md5 subsample of its raters, so
# the capped matrix is still a pure function of the data on any engine
AGREE_MAX_RATERS = 64
AGREE_SAMPLE_SALT = "agree:v1"

# bounded-report defaults: a pair must co-rate at least this many items
# to be reportable (1-co-item pairs are the Θ(users²) long tail with no
# statistical signal), and each user reports at most this many peers
AGREE_MIN_CO_ITEMS = 2
AGREE_TOP_PEERS = 5


def agreement_matrix(
    df: DataFrame,
    item_expr=None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    max_raters: int | None = AGREE_MAX_RATERS,
) -> DataFrame:
    """Inter-annotator agreement matrix: each user's LATEST event on an
    item (props.k — last verdict wins, the SCD posture) is a binary
    label (value ≥ threshold); every user pair that labeled ≥1 common
    item gets (n_items, n_agree, agree_fp6, n_items_capped). The fp6
    rate is truncating integer division — exact on any build.

    Scale shape: the latest-verdict dedup is one max_by aggregate per
    (item, user); the pair join is an equi-join on item whose fanout is
    raters-per-item², NOT corpus² — items are the blocking key exactly
    like LSH bands. ``max_raters`` is the max_bucket skew guard
    (operators/dedup.py lsh_candidate_pairs): an item with more raters
    than the cap pairs only a deterministic salted-md5 subsample of
    ``max_raters`` of them (rank by 60-bit md5 of (salt, item, user) —
    an engine-portable uniform draw, never an RNG), so a viral item
    contributes O(cap²) pairs instead of Θ(raters²) while still being
    REPRESENTED in the matrix. Each output pair carries
    ``n_items_capped`` = how many of its co-rated items were
    subsampled, so downstream consumers can weigh (or drop) estimates
    built on capped evidence. The count and the rank share one
    Exchange on item — the same single-shuffle posture as the LSH cap."""
    latest = _capped_latest_labels(
        df, item_expr, user_col, ts_col, id_col, value_col, max_raters
    )
    a, b = latest.alias("a"), latest.alias("b")
    pairs = a.join(b, (F.col("a.item") == F.col("b.item")) & (F.col("a.u") < F.col("b.u")))
    return (
        pairs.groupBy(F.col("a.u").alias("user_a"), F.col("b.u").alias("user_b"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum((F.col("a.lab") == F.col("b.lab")).cast("long")).alias("n_agree"),
            F.sum(F.col("a.capped")).alias("n_items_capped"),
        )
        .select(
            "user_a",
            "user_b",
            "n_items",
            "n_agree",
            F.expr("(n_agree * 1000000) DIV n_items").alias("agree_fp6"),
            "n_items_capped",
        )
    )


def _capped_latest_labels(
    df: DataFrame,
    item_expr,
    user_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    max_raters: int | None,
) -> DataFrame:
    """(item, u, lab, capped): each user's LATEST binary verdict per
    item, rater-capped per item by the deterministic salted-md5 rank —
    the shared blocking frame under the matrix, the report and the
    kappa rows (one spec, three consumers)."""
    if item_expr is None:
        # BIGINT, not INT: from_json silently NULLs on overflow, and the
        # DuckDB oracle's TRY_CAST(... AS BIGINT) must drop the exact
        # same malformed/out-of-range rows (ADVICE r10)
        item_expr = F.from_json(F.col("props"), "k BIGINT").getField("k")
    lab = F.when(cents(value_col) >= AGREE_THRESHOLD_CENTS, F.lit(1)).otherwise(F.lit(0))
    base = df.select(
        item_expr.cast("long").alias("item"),
        F.col(user_col).alias("u"),
        ns_micros(ts_col).alias("_tsu"),
        F.col(id_col).alias("_id"),
        lab.alias("_lab"),
    ).filter(F.col("item").isNotNull())
    # latest verdict per (item, user): max_by over (ts, id) — ties on
    # identical (ts, id) are impossible (event_id unique)
    latest = base.groupBy("item", "u").agg(
        F.max(F.struct(F.col("_tsu"), F.col("_id"), F.col("_lab"))).alias("_last")
    ).select("item", "u", F.col("_last._lab").alias("lab"))
    if max_raters is None:
        return latest.withColumn("capped", F.lit(0).cast("long"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(AGREE_SAMPLE_SALT),
                    F.col("item").cast("string"),
                    F.col("u").cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w_item = Window.partitionBy("item")
    w_rank = Window.partitionBy("item").orderBy(h.asc(), F.col("u").asc())
    return (
        latest.withColumn("_nr", F.count(F.lit(1)).over(w_item))
        .withColumn("_rk", F.row_number().over(w_rank))
        .filter(F.col("_rk") <= max_raters)
        .select(
            "item",
            "u",
            "lab",
            (F.col("_nr") > max_raters).cast("long").alias("capped"),
        )
    )


def agreement_kappa(
    df: DataFrame,
    item_expr=None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    max_raters: int | None = AGREE_MAX_RATERS,
) -> DataFrame:
    """Cohen's kappa per co-rating user pair — the chance-corrected
    agreement statistic (raw agree rate rewards raters who mark
    everything positive; kappa subtracts the agreement their marginal
    label rates would produce by chance). Over each pair's co-rated
    (capped) items with counts n, agree, a1 = Σ lab_a, b1 = Σ lab_b:

        num = agree·n − a1·b1 − (n−a1)·(n−b1)      (= n²·(p_o − p_e))
        den = n²      − a1·b1 − (n−a1)·(n−b1)      (= n²·(1 − p_e))
        kappa_fp6 = (num · 10⁶) DIV den

    — pure BIGINT arithmetic (products ≤ n²·10⁶; safe to n = 10⁶
    co-items), and num may be NEGATIVE: both engines' integer division
    truncates toward zero (Spark ``-7 DIV 2`` = DuckDB ``-7 // 2`` =
    −3, verified), so the fp6 value is bit-identical on any build.
    Pairs with den = 0 (p_e = 1: both raters constant with identical
    marginals — kappa undefined) are dropped, a deterministic spec on
    both sides.

    Scale shape: identical to the matrix — the capped latest-labels
    frame, one item equi-join, one map-side-combined aggregate; the
    kappa algebra is a projection on the aggregate's four counts."""
    latest = _capped_latest_labels(
        df, item_expr, user_col, ts_col, id_col, value_col, max_raters
    )
    a, b = latest.alias("a"), latest.alias("b")
    pairs = a.join(b, (F.col("a.item") == F.col("b.item")) & (F.col("a.u") < F.col("b.u")))
    g = pairs.groupBy(F.col("a.u").alias("user_a"), F.col("b.u").alias("user_b")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum((F.col("a.lab") == F.col("b.lab")).cast("long")).alias("n_agree"),
        F.sum(F.col("a.lab")).alias("a_pos"),
        F.sum(F.col("b.lab")).alias("b_pos"),
        F.sum(F.col("a.capped")).alias("n_items_capped"),
    )
    chance = "(a_pos * b_pos + (n_items - a_pos) * (n_items - b_pos))"
    return (
        g.withColumn("_num", F.expr(f"n_agree * n_items - {chance}"))
        .withColumn("_den", F.expr(f"n_items * n_items - {chance}"))
        .filter(F.col("_den") != 0)
        .select(
            "user_a",
            "user_b",
            "n_items",
            "n_agree",
            "a_pos",
            "b_pos",
            F.expr("(_num * 1000000) DIV _den").alias("kappa_fp6"),
            "n_items_capped",
        )
    )


def agreement_report(
    matrix: DataFrame,
    min_co_items: int = AGREE_MIN_CO_ITEMS,
    top_peers: int = AGREE_TOP_PEERS,
) -> DataFrame:
    """The 100 TB-shaped agreement REPORT on top of the (capped)
    matrix: symmetrize the unordered pairs so every user sees all its
    co-raters, drop pairs below the ``min_co_items`` evidence floor
    (the Θ(users²) tail of 1-co-item pairs carries no signal), and keep
    each user's ``top_peers`` strongest peers by
    (n_items DESC, agree_fp6 DESC, peer ASC) — a deterministic total
    order, so the report is a pure function of the matrix.

    Output: (user_id, peer_id, rank, n_items, n_agree, agree_fp6,
    n_items_capped) — at most ``top_peers`` rows per user regardless of
    corpus size: bounded OUTPUT on top of the matrix's bounded COMPUTE.

    Scale shape: the matrix is pinned (persisted) before symmetrization
    — the union references it on both sides, and without the pin each
    branch re-executes the whole latest-verdict + pair-join DAG
    (measured: 4 event scans, zero ReusedExchange); one rank window
    partitioned by user on top — the window input is already
    floor-filtered, so the sort is over surviving pairs only."""
    from .. import cache

    matrix = cache.pin(matrix)
    fwd = matrix.select(
        F.col("user_a").alias("user_id"),
        F.col("user_b").alias("peer_id"),
        "n_items",
        "n_agree",
        "agree_fp6",
        "n_items_capped",
    )
    rev = matrix.select(
        F.col("user_b").alias("user_id"),
        F.col("user_a").alias("peer_id"),
        "n_items",
        "n_agree",
        "agree_fp6",
        "n_items_capped",
    )
    both = fwd.unionByName(rev).filter(F.col("n_items") >= min_co_items)
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_items").desc(), F.col("agree_fp6").desc(), F.col("peer_id").asc()
    )
    return (
        both.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_peers)
        .select(
            "user_id", "peer_id", "rank", "n_items", "n_agree", "agree_fp6",
            "n_items_capped",
        )
    )


# tool-trace depth: which event types push/pop the call stack
TRACE_PUSH, TRACE_POP = "click", "purchase"


def call_depth_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Tool-trace nesting reconstruction: reading each user's stream as
    a call trace (PUSH opens a tool call, POP returns), the running
    ±1 prefix sum IS the stack depth at every step. Emits per trace:
    max observed depth, final imbalance (≠0 ⇒ truncated/corrupt
    trace), and the push/pop totals — the agentic-data health check
    run before traces are converted to training turns.

    Scale shape: one window cumsum per trace partition + one aggregate
    — same single-shuffle shape as sessionization; no Python, no
    iteration, trace length unbounded."""
    delta = (
        F.when(F.col(type_col) == TRACE_PUSH, F.lit(1))
        .when(F.col(type_col) == TRACE_POP, F.lit(-1))
        .otherwise(F.lit(0))
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col("_tsu").asc(), F.col("_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        user_col,
        ns_micros(ts_col).alias("_tsu"),
        F.col(id_col).alias("_id"),
        delta.alias("_d"),
    ).withColumn("_depth", F.sum("_d").over(w).cast("long"))
    return base.groupBy(user_col).agg(
        F.max("_depth").alias("max_depth"),
        F.sum("_d").cast("long").alias("end_balance"),
        F.sum(F.when(F.col("_d") == 1, 1).otherwise(0)).cast("long").alias("n_push"),
        F.sum(F.when(F.col("_d") == -1, 1).otherwise(0)).cast("long").alias("n_pop"),
    )
