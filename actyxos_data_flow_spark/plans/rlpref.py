"""RL / preference-data queries over ``events`` (operators/rlpref.py)
— the post-training data plane: reward traces, advantage baselines,
preference-pair mining, annotator agreement, tool-trace health.

Every oracle shares its constants (discount weights, thresholds,
push/pop types) with the Spark operators via the module symbols, so
the two sides cannot drift; every hashed column is an exact BIGINT
(cents, integer-weighted window sums, truncating DIV)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import rlpref as R
from ..sources import load_table
from . import register

_CENTS = "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"

# -- truncated discounted returns -------------------------------------------

_W = R._return_weights(R.RL_HORIZON)
_G_TERMS = " + ".join(
    (f"r_cents * {_W[0]}" if k == 0 else f"coalesce(lead(r_cents, {k}) OVER w, 0) * {_W[k]}")
    for k in range(R.RL_HORIZON + 1)
)

RETURNS_ORACLE = f"""
WITH rb AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_micros, {_CENTS} AS r_cents
  FROM events
)
SELECT event_id, user_id, ts_micros, r_cents,
       CAST({_G_TERMS} AS BIGINT) AS g_fp8
FROM rb
WINDOW w AS (PARTITION BY user_id ORDER BY ts_micros ASC, event_id ASC)
"""


@register("rl_episode_returns", oracle=RETURNS_ORACLE, bench=True)
def rl_episode_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-step truncated discounted return (γ=0.9, H=8) over each
    user's event stream — the reward-trace materialization every RL
    fine-tune consumes. The discount is integer WEIGHTS inside one
    window pass (never pow()), so g_fp8 is the same BIGINT on any
    build."""
    return R.episode_returns(load_table(spark, sf_dir, "events"))


ADVANTAGE_ORACLE = f"""
WITH rb AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_micros, {_CENTS} AS r_cents
  FROM events
),
rg AS (
  SELECT event_id, user_id, ts_micros,
         CAST({_G_TERMS} AS BIGINT) AS g_fp8
  FROM rb
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_micros ASC, event_id ASC)
)
SELECT event_id, user_id, ts_micros, g_fp8,
       CAST((sum(g_fp8) OVER pu) // (count(*) OVER pu) AS BIGINT) AS baseline_fp8,
       CAST(g_fp8 - (sum(g_fp8) OVER pu) // (count(*) OVER pu) AS BIGINT) AS adv_fp8
FROM rg
WINDOW pu AS (PARTITION BY user_id)
"""


@register("rl_advantage_baseline", oracle=ADVANTAGE_ORACLE)
def rl_advantage_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Advantage vs the per-episode truncating-mean baseline
    (REINFORCE-with-baseline), composed on the returns operator — the
    baseline aggregate reuses the returns' episode partitioning, so
    the composition adds no extra shuffle."""
    return R.advantage_baseline(R.episode_returns(load_table(spark, sf_dir, "events")))


# -- preference pairs --------------------------------------------------------

PREF_PAIRS_ORACLE = f"""
WITH pp AS (
  SELECT user_id, event_type, event_id, {_CENTS} AS c FROM events
),
pr AS (
  SELECT user_id, event_type, event_id, c,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY c DESC, event_id ASC) AS rhi,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY c ASC, event_id ASC) AS rlo,
         count(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM pp
),
phi AS (SELECT user_id, event_type, event_id AS chosen_id, c AS chosen_cents
        FROM pr WHERE rhi = 1 AND n >= 2),
plo AS (SELECT user_id, event_type, event_id AS rejected_id, c AS rejected_cents
        FROM pr WHERE rlo = 1 AND n >= 2)
SELECT user_id, event_type, chosen_id, rejected_id, chosen_cents, rejected_cents,
       chosen_cents - rejected_cents AS margin_cents
FROM phi JOIN plo USING (user_id, event_type)
WHERE chosen_cents - rejected_cents > 0
"""


@register("pref_pair_mining", oracle=PREF_PAIRS_ORACLE)
def pref_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO-style preference pairs: per prompt group the top-scored row
    is CHOSEN, the bottom-scored REJECTED (deterministic ties, zero
    margins dropped). The engine mines both extremes with ONE
    max_by/min_by aggregate — no window sort, no self-join; the oracle
    says the same thing with two rank windows."""
    return R.preference_pairs(load_table(spark, sf_dir, "events"))


# the capped-matrix CTE chain is shared by the matrix row and the
# bounded report row (the report must equal a report OVER the matrix,
# so both hanging off one oracle text is the spec, not a shortcut).
# TRY_CAST mirrors Spark's from_json('k BIGINT') NULL-on-malformed
# posture (ADVICE r10); the rater subsample ranks by the same salted
# 60-bit md5 as the engine.
_AGREE_H = (
    f"('0x' || substr(md5('{R.AGREE_SAMPLE_SALT}:' || CAST(item AS VARCHAR) "
    f"|| ':' || CAST(u AS VARCHAR)), 1, 15))::BIGINT"
)
_AGREE_MATRIX_CTES = f"""
WITH ab AS (
  SELECT TRY_CAST(props->>'$.k' AS BIGINT) AS item, user_id AS u,
         epoch_us(ts) AS tsu, event_id AS id,
         CASE WHEN {_CENTS} >= {R.AGREE_THRESHOLD_CENTS} THEN 1 ELSE 0 END AS lab
  FROM events
  WHERE TRY_CAST(props->>'$.k' AS BIGINT) IS NOT NULL
),
alast AS (
  SELECT item, u, lab FROM (
    SELECT item, u, lab,
           row_number() OVER (PARTITION BY item, u ORDER BY tsu DESC, id DESC) AS rn
    FROM ab
  ) WHERE rn = 1
),
ar AS (
  SELECT item, u, lab,
         count(*) OVER (PARTITION BY item) AS nr,
         row_number() OVER (PARTITION BY item ORDER BY {_AGREE_H} ASC, u ASC) AS rk
  FROM alast
),
asel AS (
  SELECT item, u, lab,
         CAST(nr > {R.AGREE_MAX_RATERS} AS BIGINT) AS capped
  FROM ar WHERE rk <= {R.AGREE_MAX_RATERS}
),
amat AS (
  SELECT a.u AS user_a, b.u AS user_b,
         count(*) AS n_items,
         CAST(sum((a.lab = b.lab)::INT) AS BIGINT) AS n_agree,
         (CAST(sum((a.lab = b.lab)::INT) AS BIGINT) * 1000000) // count(*) AS agree_fp6,
         CAST(sum(a.capped) AS BIGINT) AS n_items_capped
  FROM asel a JOIN asel b ON a.item = b.item AND a.u < b.u
  GROUP BY 1, 2
)
"""

AGREEMENT_ORACLE = f"""
{_AGREE_MATRIX_CTES}
SELECT user_a, user_b, n_items, n_agree, agree_fp6, n_items_capped FROM amat
"""


@register("pref_agreement_matrix", oracle=AGREEMENT_ORACLE)
def pref_agreement_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement over items (props.k): latest verdict
    per (item, user) wins, labels are the cents threshold, and every
    co-rating user pair reports (n_items, n_agree, agree_fp6,
    n_items_capped). The item is the blocking key (fanout =
    raters-per-item², never corpus²) AND carries the max_bucket cap:
    items with more than {R.AGREE_MAX_RATERS} raters pair only a
    deterministic salted-md5 subsample, so one viral item is O(cap²)
    instead of Θ(raters²) — the same skew guard as the LSH band join."""
    return R.agreement_matrix(load_table(spark, sf_dir, "events"))


AGREEMENT_REPORT_ORACLE = f"""
{_AGREE_MATRIX_CTES},
sym AS (
  SELECT user_a AS user_id, user_b AS peer_id,
         n_items, n_agree, agree_fp6, n_items_capped FROM amat
  UNION ALL
  SELECT user_b AS user_id, user_a AS peer_id,
         n_items, n_agree, agree_fp6, n_items_capped FROM amat
),
rnk AS (
  SELECT user_id, peer_id, n_items, n_agree, agree_fp6, n_items_capped,
         CAST(row_number() OVER (
           PARTITION BY user_id
           ORDER BY n_items DESC, agree_fp6 DESC, peer_id ASC) AS BIGINT) AS rank
  FROM sym WHERE n_items >= {R.AGREE_MIN_CO_ITEMS}
)
SELECT user_id, peer_id, rank, n_items, n_agree, agree_fp6, n_items_capped
FROM rnk WHERE rank <= {R.AGREE_TOP_PEERS}
"""


@register("pref_agreement_report", oracle=AGREEMENT_REPORT_ORACLE)
def pref_agreement_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded agreement REPORT (the 100 TB-shaped row beside the exact
    matrix): symmetrized pairs, an evidence floor of
    ≥{R.AGREE_MIN_CO_ITEMS} co-rated items, and each user's top
    {R.AGREE_TOP_PEERS} peers by (n_items, agree_fp6, peer) — at most
    {R.AGREE_TOP_PEERS} rows per user however large the corpus: bounded
    OUTPUT on the capped matrix's bounded COMPUTE."""
    return R.agreement_report(
        R.agreement_matrix(load_table(spark, sf_dir, "events"))
    )


AGREEMENT_KAPPA_ORACLE = f"""
{_AGREE_MATRIX_CTES},
kag AS (
  SELECT a.u AS user_a, b.u AS user_b,
         count(*) AS n_items,
         CAST(sum((a.lab = b.lab)::INT) AS BIGINT) AS n_agree,
         CAST(sum(a.lab) AS BIGINT) AS a_pos,
         CAST(sum(b.lab) AS BIGINT) AS b_pos,
         CAST(sum(a.capped) AS BIGINT) AS n_items_capped
  FROM asel a JOIN asel b ON a.item = b.item AND a.u < b.u
  GROUP BY 1, 2
),
kv AS (
  SELECT *,
         n_agree * n_items - (a_pos * b_pos + (n_items - a_pos) * (n_items - b_pos)) AS num,
         n_items * n_items - (a_pos * b_pos + (n_items - a_pos) * (n_items - b_pos)) AS den
  FROM kag
)
SELECT user_a, user_b, n_items, n_agree, a_pos, b_pos,
       CAST((num * 1000000) // den AS BIGINT) AS kappa_fp6,
       n_items_capped
FROM kv WHERE den <> 0
"""


@register("pref_agreement_kappa", oracle=AGREEMENT_KAPPA_ORACLE)
def pref_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa per co-rating pair — chance-corrected agreement
    over the same capped latest-verdict frame as the matrix:
    kappa_fp6 = (n²(p_o − p_e)·10⁶) DIV (n²(1 − p_e)) in pure BIGINT
    (both engines truncate integer division toward zero, so negative
    kappas are bit-identical too); p_e = 1 pairs are dropped
    (undefined). The standard IAA statistic a labeling pipeline
    actually reads before trusting a rater pool."""
    return R.agreement_kappa(load_table(spark, sf_dir, "events"))


# -- tool-trace health -------------------------------------------------------

TRACE_DEPTH_ORACLE = f"""
WITH td AS (
  SELECT user_id, epoch_us(ts) AS tsu, event_id,
         CASE event_type WHEN '{R.TRACE_PUSH}' THEN 1
                         WHEN '{R.TRACE_POP}' THEN -1 ELSE 0 END AS d
  FROM events
),
tc AS (
  SELECT user_id, d,
         sum(d) OVER (PARTITION BY user_id ORDER BY tsu ASC, event_id ASC
                      ROWS UNBOUNDED PRECEDING) AS depth
  FROM td
)
SELECT user_id,
       CAST(max(depth) AS BIGINT) AS max_depth,
       CAST(sum(d) AS BIGINT) AS end_balance,
       CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_push,
       CAST(sum(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pop
FROM tc GROUP BY user_id
"""


@register("trace_call_depth", oracle=TRACE_DEPTH_ORACLE)
def trace_call_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool-trace nesting health: running ±1 prefix sum per trace =
    stack depth; emits max depth, final imbalance, push/pop counts —
    the agentic-data audit run before traces become training turns."""
    return R.call_depth_stats(load_table(spark, sf_dir, "events"))
