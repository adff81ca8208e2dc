"""Operator-inventory queries: one named query per SURVEY.md §2 operator
family not already covered by the example workloads (reference.py).

Each query exercises the Flow/Grouped surface end-to-end against the
synthetic tables and carries a DuckDB oracle. Where an operator is a
plan-shape no-op in Spark (ungroup, regroup, inspect, probe) it is
covered by pytest instead of an oracle query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..delta import snapshot_diff
from ..flow import Flow
from ..functions import scalar as X
from ..sources import load_table
from . import register

# -- F1/F3: filter + map (native exprs; predicate pushed to parquet) -------

F1_ORACLE = """
SELECT l_orderkey, l_partkey,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       * (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)) AS net_price_fp4,
       upper(l_returnflag) AS flag
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_quantity < 10
"""


@register("f1_filter_map", oracle=F1_ORACLE)
def f1_filter_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 filter + F3 map as native expressions (scan-level pushdown)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        Flow.source(li)
        .filter((F.col("l_shipdate") >= "1995-01-01") & (F.col("l_quantity") < 10))
        .map(
            "l_orderkey",
            "l_partkey",
            # exact x10^4 integer net price (cents x discount-complement):
            # the DECIMAL(18,2)x(1-DECIMAL(18,2)) product sits AT result
            # precision 38, where engine builds split (round 8)
            (X.cents("l_extendedprice") * (F.lit(100) - X.cents("l_discount")))
            .alias("net_price_fp4"),
            F.upper("l_returnflag").alias("flag"),
        )
        .df
    )


# -- F6: flat_map via explode ---------------------------------------------

F6_ORACLE = """
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
WHERE lang = 'en'
"""


@register("f6_flat_map_tokens", oracle=F6_ORACLE)
def f6_flat_map_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 flat_map — 1:many via explode(split); the tokenizer primitive
    reused by the text-analysis and dedup pipelines."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        Flow.source(docs)
        .filter(F.col("lang") == "en")
        .flat_map(F.split("text", " "), alias="token", keep=["doc_id"])
        .df
    )


# -- U1/U2: concat (multiset union) ---------------------------------------

U1_ORACLE = """
SELECT event_id, user_id, event_type FROM events WHERE event_type = 'signup'
UNION ALL
SELECT event_id, user_id, event_type FROM events WHERE event_type = 'error'
UNION ALL
SELECT event_id, user_id, event_type FROM events WHERE value > 150
"""


@register("u1_concat", oracle=U1_ORACLE)
def u1_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2 concat_many — multiset union (overlap rows appear twice,
    multiplicities add)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    a = Flow.source(ev).filter(F.col("event_type") == "signup")
    b = Flow.source(ev).filter(F.col("event_type") == "error")
    c = Flow.source(ev).filter(F.col("value") > 150)
    return a.concat_many(b, c).map("event_id", "user_id", "event_type").df


# -- U3: distinct ----------------------------------------------------------

U3_ORACLE = "SELECT DISTINCT user_id, event_type FROM events"


@register("u3_distinct", oracle=U3_ORACLE)
def u3_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return Flow.source(ev).map("user_id", "event_type").distinct().df


# -- U4: threshold (multiplicity rewrite; here: clip at 3) -----------------

U4_ORACLE = """
WITH counted AS (
  SELECT user_id, event_type, least(count(*), 3) AS m
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type, unnest(range(m)) AS i FROM counted
"""


@register("u4_threshold_clip", oracle=U4_ORACLE)
def u4_threshold_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 threshold — rewrite each (value)'s multiplicity to min(m,3) and
    re-expand (generalizes distinct; /root/reference/src/flow.rs:452-457).
    The expansion index is exposed so the oracle comparison sees identical
    multisets."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    clipped = Flow.source(ev).threshold(lambda m: F.least(m, F.lit(3)))
    # number the copies within each value for a deterministic comparison
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id", "event_type").orderBy(F.lit(1))
    return clipped.df.withColumn("i", F.row_number().over(w).cast("long") - 1)


# -- U5: global per-value count -------------------------------------------

U5_ORACLE = "SELECT event_type, count(*) AS count FROM events GROUP BY 1"


@register("u5_count_values", oracle=U5_ORACLE)
def u5_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return Flow.source(ev).map("event_type").count_values().df


# -- F7 + set ops: except_all / intersect_all ------------------------------

SET_EXCEPT_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'purchase'
EXCEPT ALL
SELECT user_id FROM events WHERE event_type = 'error'
"""


@register("set_except_all", oracle=SET_EXCEPT_ORACLE)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat + negate + threshold idiom (SURVEY.md §2.3) — native exceptAll."""
    ev = load_table(spark, sf_dir, "events")
    a = Flow.source(ev).filter(F.col("event_type") == "purchase").map("user_id")
    b = Flow.source(ev).filter(F.col("event_type") == "error").map("user_id")
    return a.except_all(b).df


SET_INTERSECT_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT ALL
SELECT user_id FROM events WHERE event_type = 'signup'
"""


@register("set_intersect_all", oracle=SET_INTERSECT_ORACLE)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = Flow.source(ev).filter(F.col("event_type") == "purchase").map("user_id")
    b = Flow.source(ev).filter(F.col("event_type") == "signup").map("user_id")
    return a.intersect_all(b).df


# -- G3: inner equi-join (1:many combiner) ---------------------------------

G3_ORACLE = """
SELECT o.o_orderkey, c.c_name, c.c_mktsegment,
       CAST(o.o_totalprice AS DOUBLE) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal > 0
"""


@register("g3_join", oracle=G3_ORACLE)
def g3_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 — the reference's only join type (inner equi,
    /root/reference/src/flow.rs:493-501). Catalyst picks broadcast vs
    sort-merge from stats; customer is broadcast-size up to large SF."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    g_orders = Flow.source(orders).group_by("o_custkey")
    g_cust = Flow.source(cust).filter(F.col("c_acctbal") > 0).group_by("c_custkey")
    return g_orders.join(
        g_cust,
        "o_orderkey",
        "c_name",
        "c_mktsegment",
        F.col("o_totalprice").cast("double").alias("total"),
        broadcast_right=True,
    ).df


# -- G4: join_single (1:1) -------------------------------------------------

G4_ORACLE = """
SELECT n.n_name AS nation, r.r_name AS region
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@register("g4_join_single", oracle=G4_ORACLE)
def g4_join_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        Flow.source(nation)
        .group_by("n_regionkey")
        .join_single(
            Flow.source(region).group_by("r_regionkey"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            broadcast_right=True,
        )
        .df
    )


# -- G8: per-key count -----------------------------------------------------

G8_ORACLE = "SELECT o_custkey, count(*) AS count FROM orders GROUP BY 1"


@register("g8_group_count", oracle=G8_ORACLE)
def g8_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return Flow.source(orders).group_by("o_custkey").count().df


# -- G9/G10: per-key min/max whole record (lexicographic Ord) --------------

G9_ORACLE = """
SELECT l_returnflag, l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS l_quantity
FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_orderkey ASC, l_linenumber ASC, l_quantity ASC) AS rn
  FROM lineitem
) WHERE rn = 1
"""


@register("g9_min_record", oracle=G9_ORACLE)
def g9_min_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9 — min whole record; struct comparison = field-order
    lexicographic = Rust derived Ord (SURVEY.md §7.4)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", F.col("l_quantity").cast("double").alias("l_quantity")
    )
    return Flow.source(li).group_by("l_returnflag").min_record().df


G10_ORACLE = """
SELECT l_returnflag, l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS l_quantity
FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_orderkey DESC, l_linenumber DESC, l_quantity DESC) AS rn
  FROM lineitem
) WHERE rn = 1
"""


@register("g10_max_record", oracle=G10_ORACLE)
def g10_max_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", F.col("l_quantity").cast("double").alias("l_quantity")
    )
    return Flow.source(li).group_by("l_returnflag").max_record().df


# -- G11: per-key argmax by computed sort key ------------------------------

G11_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


@register("g11_max_by", oracle=G11_ORACLE)
def g11_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G11 max_by — hash aggregate (max_by over an order struct), not a
    window sort: one exchange, map-side combine, no per-partition sort.
    Tie-break on the full record (o_orderkey first) is deterministic."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )
    return Flow.source(orders).group_by("o_custkey").max_by("o_totalprice").df


# -- G13: regroup ----------------------------------------------------------

G13_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1
)
SELECT n_orders, count(*) AS n_customers FROM per_cust GROUP BY 1
"""


@register("g13_regroup", oracle=G13_ORACLE)
def g13_regroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G13 — re-key an aggregated collection (orders/cust → histogram)."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = Flow.source(orders).group_by("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return per_cust.group_by("n_orders").agg(F.count(F.lit(1)).alias("n_customers")).df


# -- IVM: snapshot-diff (the delta/retraction layer as a query) ------------

IVM_ORACLE = """
WITH old AS (
  SELECT user_id, count(*) AS n FROM events WHERE event_id < 500 GROUP BY 1
), new AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY 1
), o AS (
  SELECT user_id, n, count(*) AS c FROM old GROUP BY 1, 2
), nn AS (
  SELECT user_id, n, count(*) AS c FROM new GROUP BY 1, 2
)
SELECT coalesce(o.user_id, nn.user_id) AS user_id,
       coalesce(o.n, nn.n) AS n,
       coalesce(nn.c, 0) - coalesce(o.c, 0) AS delta
FROM o FULL OUTER JOIN nn ON o.user_id = nn.user_id AND o.n = nn.n
WHERE coalesce(nn.c, 0) - coalesce(o.c, 0) <> 0
"""


@register("ivm_snapshot_diff", oracle=IVM_ORACLE)
def ivm_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retraction layer (K2 + snapshot-diff, delta.py): deltas that
    turn the per-user count view over events[:500] into the view over all
    events — ±1 rows exactly as the reference's delta stream would emit
    (/root/reference/src/coll.rs:89-101)."""
    ev = load_table(spark, sf_dir, "events")
    old = ev.filter(F.col("event_id") < 500).groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    new = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return snapshot_diff(old, new)


# -- pivot: long -> wide conditional aggregation ----------------------------

# CAST(... AS BIGINT) on every conditional sum: DuckDB types sum(INTEGER)
# as HUGEINT (int128), which some Arrow/pandas fetch paths render as
# float ("2.0" != "2") and the driver's value hash diverges on identical
# data. BIGINT round-trips exactly everywhere.
PIVOT_ORACLE = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events GROUP BY user_id
"""

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@register("pivot_event_counts", oracle=PIVOT_ORACLE)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot with the value list pinned: Spark plans one hash
    aggregate of conditional counts (no second pass to discover values,
    no extra shuffle — exactly the oracle's CASE sums). Always pin the
    value list at 100 TB: value discovery is a full extra scan."""
    events = load_table(spark, sf_dir, "events")
    out = events.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


# -- grouped top-k: two-phase (salt-pruned) window ranking ------------------

TOPK_ORACLE = """
WITH ranked AS (
  SELECT c.c_nationkey, o.o_orderkey,
         CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
         row_number() OVER (
           PARTITION BY c.c_nationkey ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
         ) AS rank
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_nationkey, o_orderkey, o_totalprice, rank FROM ranked WHERE rank <= 3
"""


@register("topk_orders_per_nation", oracle=TOPK_ORACLE)
def topk_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per nation WITHOUT a per-nation global sort: phase 1
    ranks within (nation, salt) shards — 16 parallel sorts of 1/16 of a
    hot nation each — and keeps 3 per shard; phase 2 ranks the <= 48
    survivors per nation. Identical output to the oracle's single
    window, but the full-data sort never concentrates one nation's rows
    in one task (the low-cardinality-partition trap of naive
    row_number top-N at scale)."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    base = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_nationkey", "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
        .withColumn("_salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(16)))
    )
    order_cols = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    w1 = W.partitionBy("c_nationkey", "_salt").orderBy(*order_cols)
    survivors = (
        base.withColumn("_r1", F.row_number().over(w1)).filter(F.col("_r1") <= 3).drop("_r1", "_salt")
    )
    w2 = W.partitionBy("c_nationkey").orderBy(*order_cols)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= 3)
        .select("c_nationkey", "o_orderkey", "o_totalprice", "rank")
    )


# -- exact percentiles (sort-based distribution statistics) -----------------

PCTL_ORACLE = """
SELECT o_orderstatus,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS median_price,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) AS p90_price,
       count(*) AS n
FROM orders GROUP BY o_orderstatus
"""


@register("percentiles_order_price", oracle=PCTL_ORACLE)
def percentiles_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles via the native ``percentile`` aggregate
    (per-group sort inside the hash aggregate; both engines interpolate
    linearly over the same doubles, hash-verified). At 100 TB prefer
    ``approx_percentile`` (t-digest, mergeable, no per-group sort) when
    the consumer tolerates bounded error — exact percentile is the
    oracle-checkable form."""
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("double")
    return orders.groupBy("o_orderstatus").agg(
        F.percentile(price, F.lit(0.5)).alias("median_price"),
        F.percentile(price, F.lit(0.9)).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


# -- fixed-width histogram --------------------------------------------------

HIST_ORACLE = """
SELECT event_type,
       CAST(floor(value / 5.0) AS BIGINT) AS bucket,
       count(*) AS n,
       CAST(min(value) AS DOUBLE) AS lo,
       CAST(max(value) AS DOUBLE) AS hi
FROM events GROUP BY event_type, CAST(floor(value / 5.0) AS BIGINT)
"""


@register("histogram_event_values", oracle=HIST_ORACLE)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as a plain two-key hash aggregate — the
    bucket id is a scan-side expression, so the whole histogram is one
    map-side-combinable pass (no sort, no window)."""
    events = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 5.0).cast("long")
    return events.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").cast("double").alias("lo"),
        F.max("value").cast("double").alias("hi"),
    )


# -- ntile quartiles --------------------------------------------------------

NTILE_ORACLE = """
WITH t AS (
  SELECT c_nationkey, c_custkey, CAST(c_acctbal AS DOUBLE) AS bal,
         ntile(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
           AS quartile
  FROM customer
)
SELECT c_nationkey, quartile, count(*) AS n,
       CAST(sum(CAST(CAST(bal AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_bal_fp2
FROM t GROUP BY c_nationkey, quartile
"""


@register("ntile_customer_quartiles", oracle=NTILE_ORACLE)
def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation balance quartiles: one keyed window sort (deterministic
    tie-break on the key) feeding a hash aggregate. Partition count =
    nations; at scale with few partitions, shard first as in
    topk_orders_per_nation — ntile is the one window function a salt
    two-phase CANNOT replicate (tile boundaries are global per key), so
    it stays a per-key sort by construction."""
    from pyspark.sql import Window as W

    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    tiled = cust.select(
        "c_nationkey",
        X.cents("c_acctbal").alias("_bal_c"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return tiled.groupBy("c_nationkey", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_bal_c").cast("decimal(28,0)")).cast("long").alias("sum_bal_fp2"),
    )


# -- incremental join maintenance (delta_join) ------------------------------

DELTA_JOIN_ORACLE = """
WITH e AS (SELECT event_id, user_id, event_type FROM events),
ao AS (SELECT user_id, event_id AS click_id FROM e WHERE event_type = 'click' AND event_id < 5000),
an AS (SELECT user_id, event_id AS click_id FROM e WHERE event_type = 'click' AND event_id < 6000),
bo AS (SELECT user_id, event_id AS buy_id FROM e WHERE event_type = 'purchase' AND event_id < 5000),
bn AS (SELECT user_id, event_id AS buy_id FROM e
       WHERE event_type = 'purchase' AND event_id >= 1000 AND event_id < 6000),
oc AS (SELECT a.user_id, a.click_id, b.buy_id, count(*) AS n
       FROM ao a JOIN bo b ON a.user_id = b.user_id GROUP BY 1, 2, 3),
nc AS (SELECT a.user_id, a.click_id, b.buy_id, count(*) AS n
       FROM an a JOIN bn b ON a.user_id = b.user_id GROUP BY 1, 2, 3)
SELECT coalesce(oc.user_id, nc.user_id) AS user_id,
       coalesce(oc.click_id, nc.click_id) AS click_id,
       coalesce(oc.buy_id, nc.buy_id) AS buy_id,
       coalesce(nc.n, 0) - coalesce(oc.n, 0) AS delta
FROM oc FULL OUTER JOIN nc
  ON oc.user_id = nc.user_id AND oc.click_id = nc.click_id AND oc.buy_id = nc.buy_id
WHERE coalesce(nc.n, 0) - coalesce(oc.n, 0) != 0
"""


@register("ivm_delta_join", oracle=DELTA_JOIN_ORACLE)
def ivm_delta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True-IVM join maintenance: clicks gain an insert batch, purchases
    gain inserts AND retract their oldest rows; ``delta_join`` emits the
    exact signed delta of the join from the three churn-sized terms
    (ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB). The oracle brute-forces it as the diff of
    the old and new joins — the gate proves the algebra, churn-only
    cost is the point (operators cited in delta.py)."""
    from ..delta import delta_join

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id")
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("buy_id")
    )
    a_old = clicks.filter(F.col("click_id") < 5000)
    da = clicks.filter(F.col("click_id").between(5000, 5999)).withColumn("delta", F.lit(1))
    b_old = buys.filter(F.col("buy_id") < 5000)
    db = (
        buys.filter(F.col("buy_id").between(5000, 5999)).withColumn("delta", F.lit(1))
        .unionByName(buys.filter(F.col("buy_id") < 1000).withColumn("delta", F.lit(-1)))
    )
    return delta_join(a_old, da, b_old, db, on="user_id").select(
        "user_id", "click_id", "buy_id", "delta"
    )


# -- mergeable sketches (approximate aggregates; rows-only check) -----------


# Sketch estimates are engine-specific, so the oracle cannot compare
# them directly. Instead the query emits the EXACT answers (computable
# in DuckDB) plus boolean bound-check flags for each sketch, and the
# oracle asserts the exact values and that every flag is TRUE — the
# sketches are verified against their published error guarantees
# without ever hashing an engine-specific estimate.
SKETCH_ORACLE = """
SELECT event_type,
       count(*) AS n,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS hll_ok,
       TRUE AS median_rank_ok
FROM events GROUP BY event_type
"""

# HLL++ rsd=0.02 is one standard error; 5 sigma ≈ never fails honestly.
_HLL_RSD = 0.02
_HLL_TOL = 5 * _HLL_RSD
# approx_percentile(accuracy=1000) guarantees rank error <= n/1000;
# allow 5x slack plus one row.
_MEDIAN_RANK_EPS = 5.0 / 1000


@register("sketch_user_stats", oracle=SKETCH_ORACLE)
def sketch_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates per event_type: HyperLogLog++ distinct users
    (`approx_count_distinct`) and a mergeable approximate median
    (`approx_percentile`). Both are constant-space, partial-aggregable
    sketches — the 100 TB substitutes for exact distinct/percentile
    (exact forms: skew_salted_distinct, percentiles_order_price).

    Bound verification: `hll_ok` checks |approx − exact| ≤ 5·rsd·exact;
    `median_rank_ok` checks the estimate's actual rank sits within
    5× the sketch's guaranteed n/accuracy rank error of n/2 (rank is
    measured by one conditional-count pass against the broadcast
    5-row estimates table — the exact check costs one extra scan at
    test scale and is NOT part of the production sketch path)."""
    events = load_table(spark, sf_dir, "events")
    est = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=_HLL_RSD).alias("approx_users"),
        F.approx_percentile("value", F.lit(0.5), F.lit(1000)).alias("approx_median_value"),
        F.count(F.lit(1)).alias("n"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    # rank of the median estimate: strictly-below and at-or-below counts
    rank = (
        events.join(
            F.broadcast(est.select("event_type", "approx_median_value")), "event_type"
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("value") < F.col("approx_median_value"), 1).otherwise(0)
            ).alias("n_lt"),
            F.sum(
                F.when(F.col("value") <= F.col("approx_median_value"), 1).otherwise(0)
            ).alias("n_le"),
        )
    )
    eps = F.col("n") * F.lit(_MEDIAN_RANK_EPS) + F.lit(1)
    half = F.col("n") * F.lit(0.5)
    return (
        est.join(F.broadcast(exact), "event_type")
        .join(F.broadcast(rank), "event_type")
        .select(
            "event_type",
            "n",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.greatest(F.lit(1.0), F.lit(_HLL_TOL) * F.col("exact_users"))
            ).alias("hll_ok"),
            (
                (F.col("n_lt") <= half + eps) & (F.col("n_le") >= half - eps)
            ).alias("median_rank_ok"),
        )
    )


# -- semi-structured extraction: JSON props ---------------------------------

JSON_PROPS_ORACLE = """
WITH jx AS (
  SELECT event_type, CAST(props->>'$.k' AS INT) AS k FROM events
)
SELECT event_type,
       count(*) AS n,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM jx
GROUP BY event_type
"""


@register("json_props_stats", oracle=JSON_PROPS_ORACLE)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: parse the events' JSON ``props`` payload
    in-flight (from_json with an explicit schema — a codegen'd JVM
    parse, no Python) and aggregate the extracted field per event type.
    Missing/malformed props become NULLs that count(k) excludes — the
    schema-on-read contract. Scale: parse + aggregate in one pass, no
    shuffle beyond the 1-key agg."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_with_k"),
            F.sum(F.col("k").cast("long")).alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# -- semi-structured extraction: CBOR payloads ------------------------------


@register("cbor_props_stats", oracle=JSON_PROPS_ORACLE)
def cbor_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's OTHER payload wire format: CBOR
    (/root/reference/src/machine.rs:71-75 — payloads are CBOR/JSON
    values decoded via serde). The testdata carries JSON, so this query
    re-encodes props to CBOR bytes in-flight and runs the engine's
    binary-payload decode (RFC 8949 codec + JSON bridge,
    sources/cbor.py) into the same field extraction as
    json_props_stats, against the same oracle: the CBOR path must be
    value-identical to the JVM from_json path. Rows whose props are
    NULL / non-object / unencodable keep a NULL k and STAY COUNTED —
    mirroring from_json's schema-on-read nulls — so the shared
    count(*) oracle holds even if the driver regenerates props with
    degenerate values (the skip-on-corrupt envelope path is
    decode_cbor_payload, exercised in tests/test_cbor.py). Both UDFs
    are Arrow-batched and run in the scan stage; blobs never shuffle."""
    from ..sources.cbor import cbor_to_json, json_to_cbor

    ev = load_table(spark, sf_dir, "events").withColumn("payload", json_to_cbor("props"))
    k = F.from_json(cbor_to_json("payload"), "k INT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_with_k"),
            F.sum(F.col("k").cast("long")).alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# -- bucketed co-located join (storage-layout scale path) ------------------
#
# Same answer as the plain join; the point is the PHYSICAL shape: both
# sides are written hash-clustered on the join key once
# (sources/bucketed.py), so the join plans with NO Exchange on either
# side — the amortized answer to repeated fact joins at 100 TB. The
# no-shuffle claim is plan-asserted in tests/test_plans.py.

BUCKETED_JOIN_ORACLE = """
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
         AS total_price_fp2
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


@register("bucketed_join_colocated", oracle=BUCKETED_JOIN_ORACLE, bench=True)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer through bucketed mirrors (8 buckets on the
    custkey): first call writes the layout, every later join on the
    key reads both sides pre-distributed — bucket spec satisfies the
    join's HashPartitioning requirement, so no shuffle of either side.
    Values identical to the plain join (the oracle IS the plain
    join)."""
    from ..sources.bucketed import ensure_bucketed

    o = ensure_bucketed(spark, sf_dir, "orders", ("o_custkey",))
    c = ensure_bucketed(spark, sf_dir, "customer", ("c_custkey",))
    j = o.join(c, o["o_custkey"] == c["c_custkey"])
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        X.cents_sum("o_totalprice").alias("total_price_fp2"),
    )


# -- SQL front door: ONE ANSI text, two engines ----------------------------

# This exact string is BOTH the Spark query (spark.sql) and the DuckDB
# oracle — nothing is translated, so the row proves the engine's SQL
# surface is genuinely ANSI-portable (types, casts, grouping, ordering
# semantics all agree bit-for-bit under the value hash).
SQL_FRONTDOOR_TEXT = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_qty_fp2,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_base_fp2,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                * (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT))) AS BIGINT)
         AS sum_disc_fp4,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_discount >= 0.02 AND l_quantity < 45
GROUP BY l_returnflag, l_linestatus
"""


@register("sql_frontdoor_pricing", oracle=SQL_FRONTDOOR_TEXT)
def sql_frontdoor_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: the oracle string itself runs verbatim
    through ``spark.sql`` over a registered ``lineitem`` view — the
    DataFrame path is bypassed entirely, and the identical ANSI text
    is what DuckDB executes. Scaled-integer sums (x100 cents, one
    product x10^4) keep the aggregate order-free AND build-portable —
    the one ANSI text must hash-match itself across engines, so it
    carries no DOUBLE or precision-38 decimal arithmetic at all.
    Catalyst still gets its usual shots: the WHERE conjuncts reach the
    parquet scan as PushedFilters and only the 5 referenced columns
    are read — declaring the plan in SQL loses nothing."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(SQL_FRONTDOOR_TEXT)
