"""HyperLogLog query: per-language distinct-token estimates vs exact
counts, with the DuckDB oracle replaying the sketch register-for-
register (the accuracy contract — estimate within 3 standard errors of
exact — is IN the hashed output, same posture as cms_heavy_hitters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import hll as H
from ..operators.retrieval import _tokens
from ..sources import load_table
from . import register

# 3 sigma at m=64: 3 * 1.04 / sqrt(64) = 0.39 relative error
_BOUND = 3 * 1.04 / 8.0

_ITEMS_SQL = """
  SELECT lang AS g, t AS item FROM (
    SELECT lang, unnest(string_split(lower(coalesce(text, '')), ' ')) AS t
    FROM documents
  ) WHERE t <> ''
"""

HLL_ORACLE = f"""
WITH {H.hll_oracle_cte(_ITEMS_SQL)},
hexact AS (SELECT g, count(DISTINCT item) AS exact_distinct FROM hitems GROUP BY 1)
SELECT x.g AS lang, x.exact_distinct, e.hll_est,
       round(abs(e.hll_est - x.exact_distinct), 6) AS abs_err,
       abs(e.hll_est - x.exact_distinct) <= {_BOUND!r} * x.exact_distinct AS within_3se
FROM hexact x JOIN hest e USING (g)
"""


_NDV_COLS = ["l_returnflag", "l_linestatus", "l_suppkey", "l_partkey", "l_orderkey"]

_NDV_ITEMS_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS g, CAST({c} AS VARCHAR) AS item FROM lineitem WHERE {c} IS NOT NULL"
    for c in _NDV_COLS
)

NDV_ORACLE = f"""
WITH {H.hll_oracle_cte(_NDV_ITEMS_SQL)},
nexact AS (SELECT g, count(DISTINCT item) AS exact_ndv FROM hitems GROUP BY 1)
SELECT x.g AS column_name, x.exact_ndv, e.hll_est AS ndv_est,
       abs(e.hll_est - x.exact_ndv) <= {_BOUND!r} * x.exact_ndv AS within_3se
FROM nexact x JOIN hest e USING (g)
"""


@register("table_stats_ndv", oracle=NDV_ORACLE)
def table_stats_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column distinct-value counts (NDV) for five lineitem
    columns — the statistic every cost-based optimizer prices joins
    and aggregations with — estimated from one job: the columns
    unpivot to (column_name, value) rows and the HLL build aggregates
    them all at once (64 registers per column cross the shuffle,
    nothing else). The union plans as one column-pruned scan PER
    column (audit: every scan pushes its single-column ReadSchema),
    so total I/O equals one wide scan of exactly the probed columns. Only string/integer columns participate:
    integer-to-VARCHAR rendering is identical on both engines, while
    double rendering (scientific-notation thresholds) is not — a
    double column would need an explicit decimal rendering first.
    Paired with
    cms_join_cardinality this is the sketch-backed statistics surface
    a 100 TB catalog would maintain."""
    li = load_table(spark, sf_dir, "lineitem")
    stacked = None
    for c in _NDV_COLS:
        part = li.filter(F.col(c).isNotNull()).select(
            F.lit(c).alias("lang"), F.col(c).cast("string").alias("item")
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    regs = H.hll_registers(stacked, "item", "lang")
    est = H.hll_estimate(regs, "lang")
    exact = stacked.groupBy("lang").agg(F.countDistinct("item").alias("exact_ndv"))
    err = F.abs(F.col("hll_est") - F.col("exact_ndv"))
    return exact.join(est, "lang").select(
        F.col("lang").alias("column_name"),
        "exact_ndv",
        F.col("hll_est").alias("ndv_est"),
        (err <= F.lit(_BOUND) * F.col("exact_ndv")).alias("within_3se"),
    )


@register("sketch_hll_cardinality", oracle=HLL_ORACLE)
def sketch_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog (m=64 — a 512-byte model per group) distinct-token
    estimate per language, checked against the exact answer. The
    sketch build is a narrow projection + map-side-combined max — at
    most 64 register rows per language cross the shuffle per task; the
    vocabulary-sized count(DISTINCT) appears only as ground truth
    (exactly the CMS posture). within_3se gates the accuracy contract
    into the value hash; linear-counting small-range correction is
    exercised by low-cardinality languages when present."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select("lang", F.explode(_tokens("text")).alias("item"))
    regs = H.hll_registers(tokens, "item", "lang")
    est = H.hll_estimate(regs, "lang")
    exact = tokens.groupBy("lang").agg(
        F.countDistinct("item").alias("exact_distinct")
    )
    err = F.abs(F.col("hll_est") - F.col("exact_distinct"))
    return exact.join(est, "lang").select(
        "lang",
        "exact_distinct",
        "hll_est",
        F.round(err, 6).alias("abs_err"),
        (err <= F.lit(_BOUND) * F.col("exact_distinct")).alias("within_3se"),
    )


# -- KMV sketch set algebra -------------------------------------------------

from ..operators import kmv as K  # noqa: E402

_KK = K.KMV_K
_KNUM = (_KK - 1) * (1 << 60)
_KH = f"('0x' || substr(md5('{K.KMV_SALT}:' || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT"
_SET_A = "1-URGENT"
_SET_B = "2-HIGH"

KMV_ORACLE = f"""
WITH acs AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '{_SET_A}'),
bcs AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '{_SET_B}'),
ha AS (SELECT DISTINCT {_KH} AS h FROM acs),
hb AS (SELECT DISTINCT {_KH} AS h FROM bcs),
ska AS MATERIALIZED (SELECT h FROM ha ORDER BY h LIMIT {_KK}),
skb AS MATERIALIZED (SELECT h FROM hb ORDER BY h LIMIT {_KK}),
sku AS MATERIALIZED (
  SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb) ORDER BY h LIMIT {_KK}
),
ea AS (SELECT count(*) AS n, max(h) AS th FROM ska),
eb AS (SELECT count(*) AS n, max(h) AS th FROM skb),
eu AS (SELECT count(*) AS n, max(h) AS th FROM sku),
sh AS (
  SELECT count(*) AS shared FROM sku
  WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)
),
x AS (
  SELECT (SELECT count(*) FROM acs) AS exact_a,
         (SELECT count(*) FROM bcs) AS exact_b,
         (SELECT count(DISTINCT o_custkey) FROM
            (SELECT o_custkey FROM acs UNION ALL SELECT o_custkey FROM bcs)) AS exact_union,
         (SELECT count(*) FROM acs WHERE o_custkey IN (SELECT o_custkey FROM bcs)) AS exact_intersect
),
est AS (
  SELECT
    CAST(CASE WHEN ea.n < {_KK} THEN ea.n ELSE {_KNUM}::HUGEINT // ea.th END AS BIGINT) AS est_a,
    CAST(CASE WHEN eb.n < {_KK} THEN eb.n ELSE {_KNUM}::HUGEINT // eb.th END AS BIGINT) AS est_b,
    CAST(CASE WHEN eu.n < {_KK} THEN eu.n ELSE {_KNUM}::HUGEINT // eu.th END AS BIGINT) AS est_union,
    eu.n AS n_u, sh.shared AS shared
  FROM ea, eb, eu, sh
)
SELECT CAST({_KK} AS BIGINT) AS k,
       est_a, CAST(x.exact_a AS BIGINT) AS exact_a,
       est_b, CAST(x.exact_b AS BIGINT) AS exact_b,
       est_union, CAST(x.exact_union AS BIGINT) AS exact_union,
       CAST((est.shared * est_union) // est.n_u AS BIGINT) AS est_intersect,
       CAST(x.exact_intersect AS BIGINT) AS exact_intersect,
       CAST((est.shared * 1000000) // est.n_u AS BIGINT) AS jaccard_est_fp6,
       (est_a - x.exact_a) * (est_a - x.exact_a) * ({_KK} - 2) <= 9 * x.exact_a * x.exact_a AS within_3se_a,
       (est_b - x.exact_b) * (est_b - x.exact_b) * ({_KK} - 2) <= 9 * x.exact_b * x.exact_b AS within_3se_b,
       (est_union - x.exact_union) * (est_union - x.exact_union) * ({_KK} - 2) <= 9 * x.exact_union * x.exact_union AS within_3se_union,
       abs((est.shared * est_union) // est.n_u - x.exact_intersect) <= (3 * est_union) // 16 AS within_bound_intersect
FROM est, x
"""


@register("sketch_kmv_setops", oracle=KMV_ORACLE, bench=True)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketches with SET ALGEBRA: the urgent-order and
    high-priority-order customer sets, each summarized as its k=256
    smallest distinct hashes, then |A|, |B|, |A∪B|, |A∩B| and Jaccard
    estimated purely from the two k-row models and checked against the
    exact answers — the synopsis operation HLL cannot do (intersection)
    without inclusion-exclusion blowup. All-integer estimators
    ((k−1)·2^60 DIV θ; shared·est_union DIV k), 3σ contracts as
    cross-multiplied integer comparisons (√(k−2) squared away), and the
    whole report is one row assembled from model-sized aggregates.
    Scale shape (r12, guide §2.2/§5): ONE orders scan. The old form
    re-derived A, B, their union, and their intersection as EIGHT
    separate corpus subtrees (~10 orders scans, 30 Spark jobs for a
    1-row report); every quantity is a function of the distinct
    customer set tagged with (in_a, in_b) membership flags, so one
    groupBy(o_custkey) aggregate + pin feeds the four exact counts
    (one 1-row aggregate), both hash projections, the three k-row
    sketches, and the shared-hash probe. Set memberships, hashes, and
    counts are value-identical to the per-set formulation by
    construction (max-of-membership over a customer's order rows =
    'customer has an order with that priority')."""
    orders = load_table(spark, sf_dir, "orders")
    from .. import cache

    dc = (
        orders.filter(F.col("o_orderpriority").isin(_SET_A, _SET_B))
        .groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderpriority") == _SET_A).alias("in_a"),
            F.max(F.col("o_orderpriority") == _SET_B).alias("in_b"),
        )
        .select(
            K.kmv_hash(F.col("o_custkey")).alias("h"), "in_a", "in_b"
        )
    )
    # hashes of distinct custkeys; a final distinct() keeps the exact
    # oracle semantics (DISTINCT h) even under 60-bit hash collisions.
    # HYBRID (r13 A/B): ha/hb are INDEPENDENT raw-scan projections —
    # their two column-pruned scans schedule concurrently instead of
    # serializing behind the tagged aggregate's single wide stage.
    def _hashes(p):
        return (
            orders.filter(F.col("o_orderpriority") == p)
            .select(K.kmv_hash(F.col("o_custkey")).alias("h"))
            .distinct()
        )

    ha = _hashes(_SET_A)
    hb = _hashes(_SET_B)
    ska = cache.pin(ha.orderBy(F.col("h").asc()).limit(_KK))
    skb = cache.pin(hb.orderBy(F.col("h").asc()).limit(_KK))
    sku = cache.pin(
        ska.union(skb).distinct().orderBy(F.col("h").asc()).limit(_KK)
    )
    ea = K.kmv_estimate(ska).select(
        F.col("est").alias("est_a")
    )
    eb = K.kmv_estimate(skb).select(F.col("est").alias("est_b"))
    eu = K.kmv_estimate(sku).select(
        F.col("est").alias("est_union"), F.col("n_sk").alias("n_u")
    )
    shared = (
        sku.join(ha, "h", "left_semi")
        .join(hb, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    # all four exact set cardinalities in ONE aggregate over the pinned
    # distinct-customer table (rows are already distinct custkeys)
    exact = dc.agg(
        F.sum(F.col("in_a").cast("long")).alias("exact_a"),
        F.sum(F.col("in_b").cast("long")).alias("exact_b"),
        F.count(F.lit(1)).alias("exact_union"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).alias("exact_intersect"),
    )
    row = (
        ea.crossJoin(eb).crossJoin(eu).crossJoin(shared).crossJoin(exact)
    )
    se2 = _KK - 2
    return row.select(
        F.lit(_KK).cast("long").alias("k"),
        "est_a",
        F.col("exact_a").cast("long").alias("exact_a"),
        "est_b",
        F.col("exact_b").cast("long").alias("exact_b"),
        "est_union",
        F.col("exact_union").cast("long").alias("exact_union"),
        F.expr("CAST((shared * est_union) DIV n_u AS BIGINT)").alias("est_intersect"),
        F.col("exact_intersect").cast("long").alias("exact_intersect"),
        F.expr("CAST((shared * 1000000) DIV n_u AS BIGINT)").alias("jaccard_est_fp6"),
        F.expr(f"(est_a - exact_a) * (est_a - exact_a) * {se2} <= 9 * exact_a * exact_a").alias("within_3se_a"),
        F.expr(f"(est_b - exact_b) * (est_b - exact_b) * {se2} <= 9 * exact_b * exact_b").alias("within_3se_b"),
        F.expr(f"(est_union - exact_union) * (est_union - exact_union) * {se2} <= 9 * exact_union * exact_union").alias("within_3se_union"),
        F.expr("abs((shared * est_union) DIV n_u - exact_intersect) <= (3 * est_union) DIV 16").alias("within_bound_intersect"),
    )


# -- priority sampling: one sample, any subset sum ---------------------------

_PK = K.PRI_K
_PRI_H = (
    f"('0x' || substr(md5('{K.PRI_SALT}:' || l_orderkey || ':' || l_linenumber"
    f" || ':' || l_partkey || ':' || l_suppkey || ':' || w), 1, 15))::BIGINT"
)

PRIORITY_ORACLE = f"""
WITH wtab AS (
  SELECT l_returnflag AS g, CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS w,
         l_orderkey, l_linenumber, l_partkey, l_suppkey
  FROM lineitem
),
ptab AS (
  SELECT g, w, {_PRI_H} AS h,
         (w * {1 << 30}) // (({_PRI_H} >> 30) + 1) AS pri
  FROM wtab
),
top AS MATERIALIZED (
  SELECT * FROM ptab ORDER BY pri DESC, h ASC, w ASC, g ASC LIMIT {_PK + 1}
),
tau AS (SELECT CASE WHEN count(*) <= {_PK} THEN 0 ELSE min(pri) END AS tau FROM top),
sample AS (SELECT * FROM top ORDER BY pri DESC, h ASC, w ASC, g ASC LIMIT {_PK}),
est AS (
  SELECT g,
         CAST(sum(CASE WHEN w > (SELECT tau FROM tau) THEN w ELSE (SELECT tau FROM tau) END) AS BIGINT) AS est_w,
         count(*) AS n_in_sample
  FROM sample GROUP BY g
),
exact AS (SELECT g, sum(w) AS exact_w FROM wtab GROUP BY g),
tot AS (SELECT sum(w) AS tot_w FROM wtab)
SELECT exact.g,
       CAST(exact.exact_w AS BIGINT) AS exact_cents,
       CAST(coalesce(est.est_w, 0) AS BIGINT) AS est_cents,
       CAST(coalesce(est.n_in_sample, 0) AS BIGINT) AS n_in_sample,
       CAST({_PK} AS BIGINT) AS k,
       (abs(coalesce(est.est_w, 0) - exact.exact_w)::HUGEINT
          * abs(coalesce(est.est_w, 0) - exact.exact_w) * {_PK - 1})
         <= (9::HUGEINT * exact.exact_w * tot.tot_w) AS within_3se
FROM exact LEFT JOIN est USING (g), tot
"""


@register("sketch_priority_sample", oracle=PRIORITY_ORACLE, bench=True)
def sketch_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling: ONE derandomized 257-row weighted sample of
    lineitem answers revenue-by-returnflag (and any other subset sum)
    within the Szegedy variance bound — the synopsis for 'estimate any
    slice of a 100 TB fact table from one tiny stored sample'. The
    sample, threshold τ and estimates are exact integer arithmetic on
    salted md5 uniforms, replayed verbatim by the oracle; the 3σ
    contract is a cross-multiplied integer comparison IN the hashed
    output."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "w_cents", F.expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
    )
    return K.priority_sample_estimates(
        li,
        "l_returnflag",
        F.col("w_cents"),
        ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "w_cents"],
    )
