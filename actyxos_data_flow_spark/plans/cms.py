"""Count-min sketch query: heavy-hitter estimates vs exact counts,
with the DuckDB oracle rebuilding the sketch cell-for-cell (the
one-sided error — est ≥ exact, bounded overshoot — is IN the hashed
output, so the sketch's accuracy contract is itself oracle-gated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators import cms as C
from ..operators.retrieval import _tokens
from ..sources import load_table
from . import register

HH_TOP = 10

_D, _W = C.CMS_D, C.CMS_W

CMS_HH_ORACLE = f"""
WITH ctok AS (
  SELECT t AS term FROM (
    SELECT unnest(string_split(lower(coalesce(text, '')), ' ')) AS t FROM documents
  ) WHERE t <> ''
),
cex AS (SELECT term, count(*) AS cnt FROM ctok GROUP BY 1),
chash AS (
  SELECT term,
         ('0x' || substr(md5(term), 1, 15))::BIGINT AS p1,
         ('0x' || substr(md5(term), 17, 15))::BIGINT AS p2
  FROM cex
),
crows AS (SELECT unnest(generate_series(0, {_D - 1})) AS row),
ccell AS (
  SELECT r.row, (h.p1 + r.row * h.p2) % {_W} AS bucket, sum(e.cnt) AS c
  FROM cex e JOIN chash h USING (term) CROSS JOIN crows r
  GROUP BY 1, 2
),
ccand AS (
  SELECT term, cnt FROM (
    SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank
    FROM cex
  ) WHERE rank <= {HH_TOP}
),
cest AS (
  SELECT d.term, min(s.c) AS est
  FROM (SELECT h.term, r.row, (h.p1 + r.row * h.p2) % {_W} AS bucket
        FROM chash h CROSS JOIN crows r
        WHERE h.term IN (SELECT term FROM ccand)) d
  JOIN ccell s ON s.row = d.row AND s.bucket = d.bucket
  GROUP BY d.term
)
SELECT c.term, c.cnt AS exact_cnt, CAST(e.est AS BIGINT) AS est,
       CAST(e.est - c.cnt AS BIGINT) AS overshoot,
       row_number() OVER (ORDER BY c.cnt DESC, c.term ASC) AS rank
FROM ccand c JOIN cest e USING (term)
"""


CMS_JOIN_ORACLE = f"""
WITH ka AS (SELECT CAST(o_orderkey AS VARCHAR) AS term FROM orders),
kb AS (SELECT CAST(l_orderkey AS VARCHAR) AS term FROM lineitem),
rows_ AS (SELECT unnest(generate_series(0, {_D - 1})) AS row),
ha AS (
  SELECT t.term, count(*) AS cnt,
         ('0x' || substr(md5(t.term), 1, 15))::BIGINT AS p1,
         ('0x' || substr(md5(t.term), 17, 15))::BIGINT AS p2
  FROM ka t GROUP BY 1
),
hb AS (
  SELECT t.term, count(*) AS cnt,
         ('0x' || substr(md5(t.term), 1, 15))::BIGINT AS p1,
         ('0x' || substr(md5(t.term), 17, 15))::BIGINT AS p2
  FROM kb t GROUP BY 1
),
ska AS (
  SELECT r.row, (h.p1 + r.row * h.p2) % {_W} AS bucket, sum(h.cnt) AS c
  FROM ha h CROSS JOIN rows_ r GROUP BY 1, 2
),
skb AS (
  SELECT r.row, (h.p1 + r.row * h.p2) % {_W} AS bucket, sum(h.cnt) AS c
  FROM hb h CROSS JOIN rows_ r GROUP BY 1, 2
),
ip AS (
  SELECT a.row, sum(a.c * b.c) AS ip
  FROM ska a JOIN skb b ON a.row = b.row AND a.bucket = b.bucket
  GROUP BY 1
),
jest AS (SELECT CAST(min(ip) AS BIGINT) AS est_pairs FROM ip),
jexact AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_pairs
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
)
SELECT x.exact_pairs, e.est_pairs,
       CAST(e.est_pairs - x.exact_pairs AS BIGINT) AS overshoot,
       e.est_pairs >= x.exact_pairs AS never_undershoots
FROM jexact x CROSS JOIN jest e
"""


def _sketch_cte(tag: str, table: str, key: str) -> str:
    """CTEs building the count-min sketch of one join key — shared by
    the advisor oracle for each (table, key) side."""
    return f"""
k{tag} AS (SELECT CAST({key} AS VARCHAR) AS term FROM {table}),
h{tag} AS (
  SELECT t.term, count(*) AS cnt,
         ('0x' || substr(md5(t.term), 1, 15))::BIGINT AS p1,
         ('0x' || substr(md5(t.term), 17, 15))::BIGINT AS p2
  FROM k{tag} t GROUP BY 1
),
s{tag} AS MATERIALIZED (
  -- MATERIALIZED: the {_D}x{_W}-cell sketch is the SHARED artifact each
  -- downstream inner-product reads; hinting it pins the one-scan-per-
  -- (table,key) cost no matter how DuckDB's inliner treats the chain
  -- (the 10x Selinger probe's ceiling was these 8 builds)
  SELECT r.row, (h.p1 + r.row * h.p2) % {_W} AS bucket, sum(h.cnt) AS c
  FROM h{tag} h CROSS JOIN rows_ r GROUP BY 1, 2
)"""


def _ip_cte(tag: str, a: str, b: str) -> str:
    return f"""
ip{tag} AS (
  SELECT a.row, sum(a.c * b.c) AS ip
  FROM s{a} a JOIN s{b} b ON a.row = b.row AND a.bucket = b.bucket
  GROUP BY 1
),
e{tag} AS (SELECT CAST(min(ip) AS BIGINT) AS est_pairs FROM ip{tag})"""


ADVISOR_ORACLE = (
    f"WITH rows_ AS (SELECT unnest(generate_series(0, {_D - 1})) AS row),"
    + _sketch_cte("c", "customer", "c_custkey")
    + ","
    + _sketch_cte("o1", "orders", "o_custkey")
    + ","
    + _sketch_cte("o2", "orders", "o_orderkey")
    + ","
    + _sketch_cte("l", "lineitem", "l_orderkey")
    + ","
    + _ip_cte("co", "c", "o1")
    + ","
    + _ip_cte("ol", "o2", "l")
    + f""",
xco AS (SELECT CAST(count(*) AS BIGINT) AS exact_pairs
        FROM customer JOIN orders ON o_custkey = c_custkey),
xol AS (SELECT CAST(count(*) AS BIGINT) AS exact_pairs
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
steps AS (
  SELECT 'customer*orders' AS first_join, e.est_pairs, x.exact_pairs
  FROM eco e CROSS JOIN xco x
  UNION ALL
  SELECT 'orders*lineitem', e.est_pairs, x.exact_pairs
  FROM eol e CROSS JOIN xol x
)
SELECT first_join, est_pairs, exact_pairs,
       est_pairs >= exact_pairs AS never_undershoots,
       est_pairs = (SELECT min(est_pairs) FROM steps) AS chosen,
       exact_pairs = (SELECT min(exact_pairs) FROM steps) AS optimal
FROM steps
"""
)


@register("join_order_advisor", oracle=ADVISOR_ORACLE)
def join_order_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch statistics DRIVING a plan decision: for the 3-table
    chain customer ⋈ orders ⋈ lineitem, estimate both candidate first
    joins from 2 KB sketches (no data touched) and mark the cheaper
    one ``chosen``; ``optimal`` records whether the sketch pick agrees
    with the exact cardinalities — so the hash gate verifies not just
    the estimates but the DECISION they imply. This is the classic
    cost-based join-ordering step, priced entirely from the model
    layer (Selinger-style, with AMS/CMS inner products as the
    cardinality model)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def sk(df, col):
        # pre-aggregate per key BEFORE the d-row explode — exactly the
        # oracle's h{tag} GROUP BY — so the sketch job hashes each
        # DISTINCT key once (md5 is the cost; a 6M-row fact with 1.5M
        # distinct orderkeys explodes 6M rows instead of 24M, and a
        # 2k-part dimension column collapses ~3000x)
        terms = (
            df.select(F.col(col).cast("string").alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        return C.cms_build(terms, weight_col="_cnt")

    est_co = C.cms_join_estimate(sk(cust, "c_custkey"), sk(orders, "o_custkey"))
    est_ol = C.cms_join_estimate(sk(orders, "o_orderkey"), sk(li, "l_orderkey"))
    x_co = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .agg(F.count(F.lit(1)).cast("long").alias("exact_pairs"))
    )
    x_ol = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .agg(F.count(F.lit(1)).cast("long").alias("exact_pairs"))
    )
    a = est_co.crossJoin(x_co).select(
        F.lit("customer*orders").alias("first_join"), "est_pairs", "exact_pairs"
    )
    b = est_ol.crossJoin(x_ol).select(
        F.lit("orders*lineitem").alias("first_join"), "est_pairs", "exact_pairs"
    )
    steps = a.unionByName(b)
    mins = steps.agg(
        F.min("est_pairs").alias("_me"), F.min("exact_pairs").alias("_mx")
    )
    return steps.crossJoin(F.broadcast(mins)).select(
        "first_join",
        "est_pairs",
        "exact_pairs",
        (F.col("est_pairs") >= F.col("exact_pairs")).alias("never_undershoots"),
        (F.col("est_pairs") == F.col("_me")).alias("chosen"),
        (F.col("exact_pairs") == F.col("_mx")).alias("optimal"),
    )


@register("cms_join_cardinality", oracle=CMS_JOIN_ORACLE)
def cms_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|orders ⋈ lineitem| estimated from two 2 KB count-min sketches
    via the AMS/CMS inner-product (min over hash rows of the bucket
    dot product) — the optimizer-statistics primitive that prices a
    join WITHOUT touching the data: the whole estimate is a d×w
    model join. One-sided overshoot (collisions only add mass) is
    asserted into the hashed output; the true join count appears only
    as ground truth."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ska = C.cms_build(orders.select(F.col("o_orderkey").cast("string").alias("term")))
    skb = C.cms_build(li.select(F.col("l_orderkey").cast("string").alias("term")))
    est = C.cms_join_estimate(ska, skb)
    exact = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .agg(F.count(F.lit(1)).cast("long").alias("exact_pairs"))
    )
    return exact.crossJoin(est).select(
        "exact_pairs",
        "est_pairs",
        (F.col("est_pairs") - F.col("exact_pairs")).cast("long").alias("overshoot"),
        (F.col("est_pairs") >= F.col("exact_pairs")).alias("never_undershoots"),
    )


@register("cms_heavy_hitters", oracle=CMS_HH_ORACLE)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4, w=64 — a 2 KB model) built in one pass
    over all document tokens; the top-10 exact heavy hitters are then
    estimated from the sketch. est ≥ exact always (one-sided error);
    the hashed overshoot column IS the accuracy report. Both the build
    and the probe are model-sized aggregates — the vocabulary-sized
    exact table appears here only to furnish the ground truth."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(_tokens("text")).alias("term"))
    sketch = C.cms_build(tokens)
    exact = tokens.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    cand = exact.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(HH_TOP)
    est = C.cms_estimate(sketch, cand.select("term"))
    w = W.orderBy(F.col("exact_cnt").desc(), F.col("term").asc())
    return (
        cand.join(est, "term")
        .select(
            "term",
            F.col("cnt").alias("exact_cnt"),
            F.col("est").cast("long").alias("est"),
            (F.col("est") - F.col("cnt")).cast("long").alias("overshoot"),
        )
        .withColumn("rank", F.row_number().over(w))
    )


# -- sketch-driven join rewrite, APPLIED ------------------------------------
#
# join_order_advisor emits the decision; this query ACTS on it: the two
# candidate first joins of the filtered customer ⋈ orders ⋈ lineitem
# chain (the q3 shape) are priced from 2 KB count-min sketches of the
# FILTERED join keys, the Spark join tree is then BUILT in the chosen
# order (left-deep, cheaper first join innermost, dimension side
# broadcast), and both the answer and the decision are value-hashed —
# the oracle re-derives the same estimates, the same choice, and the
# same (order-independent) answer. tests/test_plans.py asserts the
# physical plan's scan nesting matches the sketch decision, proving the
# rewrite FIRED rather than being a reported bit.

_REWRITE_FILTERS = """
fc AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
fo AS (SELECT o_custkey, o_orderkey, o_orderpriority FROM orders
       WHERE o_orderdate < TIMESTAMP '1995-03-15'),
fl AS (SELECT l_orderkey, l_extendedprice, l_discount FROM lineitem
       WHERE l_shipdate > TIMESTAMP '1995-03-15')"""

JOIN_REWRITE_ORACLE = (
    f"WITH rows_ AS (SELECT unnest(generate_series(0, {_D - 1})) AS row),"
    + _REWRITE_FILTERS
    + ","
    + _sketch_cte("c", "fc", "c_custkey")
    + ","
    + _sketch_cte("o1", "fo", "o_custkey")
    + ","
    + _sketch_cte("o2", "fo", "o_orderkey")
    + ","
    + _sketch_cte("l", "fl", "l_orderkey")
    + ","
    + _ip_cte("co", "c", "o1")
    + ","
    + _ip_cte("ol", "o2", "l")
    + """,
choice AS (
  SELECT CASE WHEN e1.est_pairs <= e2.est_pairs
              THEN 'customer*orders' ELSE 'orders*lineitem' END AS first_join,
         CAST(least(e1.est_pairs, e2.est_pairs) AS BIGINT) AS est_first
  FROM eco e1 CROSS JOIN eol e2
),
ans AS (
  SELECT o.o_orderpriority,
         CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                  * (100 - CAST(CAST(l.l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)))
              AS BIGINT) AS revenue_fp4,
         count(*) AS n_items
  FROM fc c JOIN fo o ON c.c_custkey = o.o_custkey
            JOIN fl l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
)
SELECT a.o_orderpriority, a.revenue_fp4, a.n_items, ch.first_join, ch.est_first
FROM ans a CROSS JOIN choice ch
"""
)


def _rewrite_inputs(spark: SparkSession, sf_dir: str):
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return cust, orders, li


def rewrite_decision(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """Price both candidate first joins from sketches of the FILTERED
    keys (two d×w model aggregates — the only rows that cross the
    driver) and return (chosen first join, its estimate)."""
    cust, orders, li = _rewrite_inputs(spark, sf_dir)

    def sk(df, col):
        # pre-aggregate per key BEFORE the d-row explode — exactly the
        # oracle's h{tag} GROUP BY — so the sketch job hashes each
        # DISTINCT key once (md5 is the cost; a 6M-row fact with 1.5M
        # distinct orderkeys explodes 6M rows instead of 24M, and a
        # 2k-part dimension column collapses ~3000x)
        terms = (
            df.select(F.col(col).cast("string").alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        return C.cms_build(terms, weight_col="_cnt")

    est_co = C.cms_join_estimate(sk(cust, "c_custkey"), sk(orders, "o_custkey")).first()[
        "est_pairs"
    ]
    est_ol = C.cms_join_estimate(sk(orders, "o_orderkey"), sk(li, "l_orderkey")).first()[
        "est_pairs"
    ]
    if est_co <= est_ol:
        return "customer*orders", int(est_co)
    return "orders*lineitem", int(est_ol)


@register("join_rewrite_applied", oracle=JOIN_REWRITE_ORACLE)
def join_rewrite_applied(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the q3-shaped chain in the order the sketches choose:
    cheaper first join innermost (left-deep), customer side broadcast.
    Catalyst does not reorder joins without CBO statistics, so the
    constructed nesting IS the executed nesting (plan-asserted in
    tests); the decision columns ride along under the value hash."""
    first_join, est_first = rewrite_decision(spark, sf_dir)
    cust, orders, li = _rewrite_inputs(spark, sf_dir)
    if first_join == "customer*orders":
        joined = orders.join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey
        ).join(li, li.l_orderkey == orders.o_orderkey)
    else:
        joined = orders.join(li, li.l_orderkey == orders.o_orderkey).join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey
        )
    rev4 = (F.col("l_extendedprice").cast("decimal(12,2)") * F.lit(100)).cast("long") * (
        F.lit(100) - (F.col("l_discount").cast("decimal(12,2)") * F.lit(100)).cast("long")
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.sum(rev4.cast("decimal(28,0)")).cast("long").alias("revenue_fp4"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "o_orderpriority",
            "revenue_fp4",
            "n_items",
            F.lit(first_join).alias("first_join"),
            F.lit(est_first).cast("long").alias("est_first"),
        )
    )


# -- Selinger chain: sketch-driven ordering of a 3-join star -----------------
#
# join_rewrite_applied prices ONE binary choice; this query runs the
# full (small) Selinger enumeration over a q9-shaped star — lineitem
# fact, three filtered dimensions (part / supplier / orders) — with a
# CMS-estimated, independence-model cost. All six left-deep orders are
# enumerated; cost(d1,d2,d3) = |J1| + |J2| under the independence
# assumption |J2| ≈ |J1|·est(d2)/N, held in EXACT integer arithmetic by
# multiplying through by N: cost' = est1·N + est1·est2 (the final join
# size est1·est2·est3/N² is permutation-invariant, so it never
# discriminates and is omitted; BIGINT holds cost' through ~sf100 —
# beyond that both engines switch the comparison to HUGEINT/DECIMAL).
# Ties break on the lexicographic order string in BOTH engines. The
# decision sequence rides in the hashed output; the executed left-deep
# nesting is plan-asserted in tests/test_plans.py.

_SEL_DIMS = ("orders", "part", "supplier")

_SEL_FILTERS = """
selp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
sels AS (SELECT s_suppkey, s_nationkey FROM supplier WHERE s_nationkey < 10),
selo AS (SELECT o_orderkey, o_orderdate FROM orders
         WHERE o_orderdate >= TIMESTAMP '2000-01-01')"""

_SEL_PERM_ROWS = ",\n    ".join(
    f"('{a}', '{b}', '{c}')"
    for a in _SEL_DIMS for b in _SEL_DIMS for c in _SEL_DIMS
    if len({a, b, c}) == 3
)

_SEL_EST_CASE = (
    "CASE {d} WHEN 'part' THEN est_part WHEN 'supplier' THEN est_supplier "
    "ELSE est_orders END"
)

SELINGER_ORACLE = (
    f"WITH rows_ AS (SELECT unnest(generate_series(0, {_D - 1})) AS row),"
    + _SEL_FILTERS
    + ","
    + _sketch_cte("xlp", "lineitem", "l_partkey")
    + ","
    + _sketch_cte("xls", "lineitem", "l_suppkey")
    + ","
    + _sketch_cte("xlo", "lineitem", "l_orderkey")
    + ","
    + _sketch_cte("xp", "selp", "p_partkey")
    + ","
    + _sketch_cte("xs", "sels", "s_suppkey")
    + ","
    + _sketch_cte("xo", "selo", "o_orderkey")
    + ","
    + _ip_cte("sp", "xlp", "xp")
    + ","
    + _ip_cte("ss", "xls", "xs")
    + ","
    + _ip_cte("so", "xlo", "xo")
    + f""",
selests AS (
  SELECT (SELECT est_pairs FROM esp) AS est_part,
         (SELECT est_pairs FROM ess) AS est_supplier,
         (SELECT est_pairs FROM eso) AS est_orders,
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_fact
),
selperms AS (SELECT * FROM (VALUES {_SEL_PERM_ROWS}) AS t(d1, d2, d3)),
selcosts AS (
  SELECT p.d1 || ',' || p.d2 || ',' || p.d3 AS join_order,
         {_SEL_EST_CASE.format(d='p.d1')} * e.n_fact
           + {_SEL_EST_CASE.format(d='p.d1')} * {_SEL_EST_CASE.format(d='p.d2')} AS cost
  FROM selperms p CROSS JOIN selests e
),
selchoice AS (
  SELECT join_order FROM (
    SELECT join_order, row_number() OVER (ORDER BY cost, join_order) AS rn
    FROM selcosts
  ) WHERE rn = 1
),
selans AS (
  SELECT s.s_nationkey AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
         CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                  * (100 - CAST(CAST(l.l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)))
              AS BIGINT) AS revenue_fp4,
         count(*) AS n_items
  FROM lineitem l
  JOIN selp p ON p.p_partkey = l.l_partkey
  JOIN sels s ON s.s_suppkey = l.l_suppkey
  JOIN selo o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
)
SELECT a.nation, a.o_year, a.revenue_fp4, a.n_items,
       c.join_order, e.est_part, e.est_supplier, e.est_orders, e.n_fact
FROM selans a CROSS JOIN selchoice c CROSS JOIN selests e
"""
)


def _selinger_inputs(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 10)
        .select("s_suppkey", "s_nationkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_orderkey", "o_orderdate")
    )
    return li, part, supp, orders


def selinger_decision(spark: SparkSession, sf_dir: str):
    """Price all three fact⋈dim joins from 2 KB sketches, then run the
    (3! = 6 plan) Selinger enumeration with the integer independence
    cost — only the three d×w sketch aggregates and one fact count
    cross the driver. Returns (order tuple, {dim: est}, n_fact). At a
    bigger join graph this same loop becomes the bitmask DP over
    connected subsets; the cost model and tie rule stay as they are."""
    import itertools

    li, part, supp, orders = _selinger_inputs(spark, sf_dir)

    def sk(df, col):
        # pre-aggregate per key BEFORE the d-row explode — exactly the
        # oracle's h{tag} GROUP BY — so the sketch job hashes each
        # DISTINCT key once (md5 is the cost; a 6M-row fact with 1.5M
        # distinct orderkeys explodes 6M rows instead of 24M, and a
        # 2k-part dimension column collapses ~3000x)
        terms = (
            df.select(F.col(col).cast("string").alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        return C.cms_build(terms, weight_col="_cnt")

    # ONE driver action for the whole pricing round (r12, guide §5.2):
    # the three 1-row estimate frames and the fact count used to run as
    # FOUR serial collects — four full job round-trips for four
    # integers. A tagged union evaluates all four Spark-side in one
    # job; values are unchanged (each leg is the identical plan).
    est_frames = [
        C.cms_join_estimate(sk(li, "l_partkey"), sk(part, "p_partkey"))
        .select(F.lit("part").alias("_tag"), F.col("est_pairs").cast("long").alias("_v")),
        C.cms_join_estimate(sk(li, "l_suppkey"), sk(supp, "s_suppkey"))
        .select(F.lit("supplier").alias("_tag"), F.col("est_pairs").cast("long").alias("_v")),
        C.cms_join_estimate(sk(li, "l_orderkey"), sk(orders, "o_orderkey"))
        .select(F.lit("orders").alias("_tag"), F.col("est_pairs").cast("long").alias("_v")),
        li.agg(F.count(F.lit(1)).alias("_v")).select(
            F.lit("_n_fact").alias("_tag"), F.col("_v").cast("long")
        ),
    ]
    u = est_frames[0]
    for f in est_frames[1:]:
        u = u.unionByName(f)
    vals = {r["_tag"]: int(r["_v"]) for r in u.collect()}
    ests = {k: vals[k] for k in ("part", "supplier", "orders")}
    n_fact = vals["_n_fact"]
    best = None
    for perm in itertools.permutations(_SEL_DIMS):
        e1, e2 = ests[perm[0]], ests[perm[1]]
        key = (e1 * n_fact + e1 * e2, ",".join(perm))
        if best is None or key < best[0]:
            best = (key, perm)
    return best[1], ests, n_fact


@register("join_selinger_applied", oracle=SELINGER_ORACLE)
def join_selinger_applied(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven Selinger ordering of the q9-shaped star, APPLIED:
    the chosen left-deep order is the order the Spark join tree is
    BUILT in (dimensions broadcast; Catalyst does not reorder joins
    without CBO stats, so the constructed nesting is the executed
    nesting — plan-asserted in tests/test_plans.py), and the full
    decision sequence (join_order, the three sketch estimates, the
    fact count) rides in the hashed output, so the oracle re-derives
    the same enumeration, the same winner and the same answer."""
    order, ests, n_fact = selinger_decision(spark, sf_dir)
    li, part, supp, orders = _selinger_inputs(spark, sf_dir)
    dims = {
        "part": (part, F.col("p_partkey") == F.col("l_partkey")),
        "supplier": (supp, F.col("s_suppkey") == F.col("l_suppkey")),
        "orders": (orders, F.col("o_orderkey") == F.col("l_orderkey")),
    }
    joined = li
    for d in order:
        dim_df, cond = dims[d]
        joined = joined.join(F.broadcast(dim_df), cond)
    rev4 = (F.col("l_extendedprice").cast("decimal(12,2)") * F.lit(100)).cast("long") * (
        F.lit(100) - (F.col("l_discount").cast("decimal(12,2)") * F.lit(100)).cast("long")
    )
    return (
        joined.groupBy(
            F.col("s_nationkey").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(rev4.cast("decimal(28,0)")).cast("long").alias("revenue_fp4"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "nation",
            "o_year",
            "revenue_fp4",
            "n_items",
            F.lit(",".join(order)).alias("join_order"),
            F.lit(ests["part"]).cast("long").alias("est_part"),
            F.lit(ests["supplier"]).cast("long").alias("est_supplier"),
            F.lit(ests["orders"]).cast("long").alias("est_orders"),
            F.lit(n_fact).cast("long").alias("n_fact"),
        )
    )


# -- Selinger bitmask DP: 4-relation join graph (nation chains via supplier) --
#
# join_selinger_applied enumerates the 3! left-deep orders of a pure
# star; this is the REAL Selinger shape — dynamic programming over
# CONNECTED subsets of a join graph that is not a star: part/supplier/
# orders join the lineitem fact directly, nation joins THROUGH supplier
# (s_nationkey = n_nationkey), so {nation} alone and {part, nation} are
# not reachable states. Cost model (round-9 rescale): selectivities are
# fixed-point PARTS-PER-10^6 integers — sel6_d = (est_d·10^6) DIV N for
# the fact dims, (est_nation·10^6) DIV |sels| for nation — and the
# estimated size of a subset S is the TRUNCATING SORTED FOLD
#   size_fp(S) = fold(x = N; for d in sorted(S): x = (x·sel6_d) DIV 10^6),
# identical text in both engines (the sorted dim order makes the
# truncation sequence canonical). Every intermediate is ≤ N·max(sel6),
# so cells stay ~N at ANY scale factor — the previous exact common-
# denominator form (N^(4-f)·|sels|^(1-i)·Π est) grew as N^4 and hit
# 7.2e37 at the 10x probe, within one SF of the 38-digit integer
# ceiling (the headroom assertion caught it). Cost of an order = sum of
# its proper-prefix sizes (the FULL 4-join size is order-invariant
# under the canonical fold and omitted); ties break on the
# lexicographic order string in BOTH engines. The oracle replays the
# WHOLE DP TABLE (one unrolled CTE per connected subset, min over its
# predecessor transitions), and the table itself rides in the hashed
# output alongside the executed answer.

_DP_FACT_DIMS = frozenset({"part", "supplier", "orders"})
_DP_DIMS = ("nation", "orders", "part", "supplier")


def _dp_states() -> tuple[list[frozenset], dict]:
    """Connected subsets of the join graph + their (pred, last-dim)
    transitions: nation is reachable only once supplier is joined."""
    import itertools

    def connected(s: frozenset) -> bool:
        return "nation" not in s or "supplier" in s

    subsets = [
        frozenset(c)
        for k in range(1, len(_DP_DIMS) + 1)
        for c in itertools.combinations(_DP_DIMS, k)
    ]
    subsets = [s for s in subsets if connected(s)]
    trans: dict[frozenset, list[tuple[frozenset, str]]] = {}
    for s in subsets:
        preds = []
        for d in sorted(s):
            p = s - {d}
            if not p:
                preds.append((p, d))  # singletons are fact joins (connected)
            elif connected(p) and (d != "nation" or "supplier" in p):
                preds.append((p, d))
        trans[s] = preds
    return subsets, trans


def _dp_size_fp(s: frozenset, n_fact: int, sel6: dict[str, int]) -> int:
    """Estimated |S-join| as the canonical truncating fold over sorted
    dims: x = N, then x = (x·sel6_d) DIV 10^6 per dim. The full set is
    omitted (order-invariant under the canonical fold)."""
    if len(s) == len(_DP_DIMS):
        return 0
    x = n_fact
    for d in sorted(s):
        x = (x * sel6[d]) // 10**6
    return x


def _dp_sel6(ests: dict[str, int], n_fact: int, s_cnt: int) -> dict[str, int]:
    """Fixed-point parts-per-10^6 selectivities (nation's denominator
    is the filtered supplier count — it joins through supplier)."""
    return {
        d: (ests[d] * 10**6) // (s_cnt if d == "nation" else n_fact) for d in _DP_DIMS
    }


def _dp_key(s: frozenset) -> str:
    return "+".join(sorted(s))


def selinger_dp_decision(spark: SparkSession, sf_dir: str):
    """Sketch-priced bitmask DP: CMS estimates for the four joins (the
    three fact keys + supplier⋈nation), then integer DP over the 11
    connected subsets (15 non-empty minus the 4 holding nation without
    supplier). Returns (winning order, DP-table rows, {dim: est},
    n_fact, s_cnt); only model-sized aggregates cross the driver.
    Costs use the fixed-point selectivity fold (_dp_size_fp): cells
    stay ~N at any SF (the exact common-denominator form grew as N^4
    and came within one SF of the 38-digit ceiling at the 10x probe);
    a BIGINT-headroom backstop still asserts the invariant."""
    li, part, supp, orders = _selinger_inputs(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")

    def sk(df, col):
        terms = (
            df.select(F.col(col).cast("string").alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        return C.cms_build(terms, weight_col="_cnt")

    # ONE driver action for the whole pricing round (r12, guide §5.2):
    # four 1-row estimates + two counts used to be SIX serial collects.
    # A tagged union evaluates them Spark-side in one job; each leg is
    # the identical plan, so values are unchanged.
    est_frames = [
        C.cms_join_estimate(sk(li, "l_partkey"), sk(part, "p_partkey"))
        .select(F.lit("part").alias("_tag"), F.col("est_pairs").cast("long").alias("_v")),
        C.cms_join_estimate(sk(li, "l_suppkey"), sk(supp, "s_suppkey"))
        .select(F.lit("supplier").alias("_tag"), F.col("est_pairs").cast("long").alias("_v")),
        C.cms_join_estimate(sk(li, "l_orderkey"), sk(orders, "o_orderkey"))
        .select(F.lit("orders").alias("_tag"), F.col("est_pairs").cast("long").alias("_v")),
        C.cms_join_estimate(sk(supp, "s_nationkey"), sk(nation, "n_nationkey"))
        .select(F.lit("nation").alias("_tag"), F.col("est_pairs").cast("long").alias("_v")),
        li.agg(F.count(F.lit(1)).alias("_v")).select(
            F.lit("_n_fact").alias("_tag"), F.col("_v").cast("long")
        ),
        supp.agg(F.count(F.lit(1)).alias("_v")).select(
            F.lit("_s_cnt").alias("_tag"), F.col("_v").cast("long")
        ),
    ]
    u = est_frames[0]
    for f in est_frames[1:]:
        u = u.unionByName(f)
    vals = {r["_tag"]: int(r["_v"]) for r in u.collect()}
    ests = {k: vals[k] for k in ("part", "supplier", "orders", "nation")}
    n_fact = vals["_n_fact"]
    s_cnt = vals["_s_cnt"]
    sel6 = _dp_sel6(ests, n_fact, s_cnt)
    subsets, trans = _dp_states()

    best: dict[frozenset, tuple[int, str]] = {}
    for s in sorted(subsets, key=lambda x: (len(x), _dp_key(x))):
        cands = []
        for p, d in trans[s]:
            pc, po = best[p] if p else (0, "")
            cands.append((pc + _dp_size_fp(s, n_fact, sel6), (po + "," + d) if po else d))
        best[s] = min(cands)
        if best[s][0] >= 10**18:  # BIGINT headroom backstop (cells are ~N by construction)
            raise OverflowError(
                f"selinger DP cell {_dp_key(s)} cost {best[s][0]:.3e} exceeds the "
                "BIGINT replay budget — cost-model invariant broken"
            )
    order = best[frozenset(_DP_DIMS)][1].split(",")
    table = sorted(
        (_dp_key(s), len(s), best[s][0], best[s][1]) for s in subsets
    )
    return order, table, ests, n_fact, s_cnt


def _dp_term_sql(s: frozenset) -> str:
    """size_fp(s) as the SAME canonical sorted truncating fold the
    Python decision runs — unrolled to nested integer expressions."""
    if len(s) == len(_DP_DIMS):
        return "CAST(0 AS HUGEINT)"
    expr = "e.n_fact"
    for d in sorted(s):
        expr = f"(({expr} * e.sel6_{d}) // 1000000)"
    return expr


def _dp_ctes() -> str:
    """The DP table as unrolled SQL — one CTE per connected subset,
    each taking the (cost, ord)-lexicographic minimum over its
    predecessor transitions; plus dptab, the union of every cell."""
    subsets, trans = _dp_states()
    parts = []
    for s in sorted(subsets, key=lambda x: (len(x), _dp_key(x))):
        abbrev = "".join(sorted(d[0] for d in s))
        cands = []
        for p, d in trans[s]:
            if not p:
                cands.append(
                    f"SELECT {_dp_term_sql(s)} AS cost, '{d}' AS ord FROM selests e"
                )
            else:
                pab = "".join(sorted(x[0] for x in p))
                cands.append(
                    f"SELECT dp_{pab}.cost + {_dp_term_sql(s)} AS cost, "
                    f"dp_{pab}.ord || ',{d}' AS ord FROM dp_{pab}, selests e"
                )
        union = "\n      UNION ALL\n      ".join(cands)
        # MATERIALIZED: each dp cell is read by every superset's
        # transition list, and selests by every cell — inlined, DuckDB
        # re-evaluates the whole upstream sketch chain per reference
        # (the k-core-oracle lesson: ~3^depth blow-up; this oracle took
        # ~30 min at the 10x probe un-hinted, seconds materialized)
        parts.append(
            f"""dp_{abbrev} AS MATERIALIZED (
  SELECT cost, ord FROM (
    SELECT cost, ord, row_number() OVER (ORDER BY cost, ord) AS rn FROM (
      {union}
    )
  ) WHERE rn = 1
)"""
        )
    rows = "\n    UNION ALL\n    ".join(
        f"SELECT '{_dp_key(s)}' AS subset, {len(s)} AS k, "
        f"CAST(dp_{''.join(sorted(d[0] for d in s))}.cost AS BIGINT) AS best_cost_fp, "
        f"dp_{''.join(sorted(d[0] for d in s))}.ord AS best_order "
        f"FROM dp_{''.join(sorted(d[0] for d in s))}"
        for s in sorted(subsets, key=lambda x: (len(x), _dp_key(x)))
    )
    return ",\n".join(parts) + f""",
dptab AS (
    {rows}
)"""


SELINGER_DP_ORACLE = (
    f"WITH rows_ AS (SELECT unnest(generate_series(0, {_D - 1})) AS row),"
    + _SEL_FILTERS
    + ", selnn AS (SELECT n_nationkey, n_name FROM nation),"
    + _sketch_cte("xlp", "lineitem", "l_partkey")
    + ","
    + _sketch_cte("xls", "lineitem", "l_suppkey")
    + ","
    + _sketch_cte("xlo", "lineitem", "l_orderkey")
    + ","
    + _sketch_cte("xp", "selp", "p_partkey")
    + ","
    + _sketch_cte("xs", "sels", "s_suppkey")
    + ","
    + _sketch_cte("xo", "selo", "o_orderkey")
    + ","
    + _sketch_cte("xsn", "sels", "s_nationkey")
    + ","
    + _sketch_cte("xn", "selnn", "n_nationkey")
    + ","
    + _ip_cte("sp", "xlp", "xp")
    + ","
    + _ip_cte("ss", "xls", "xs")
    + ","
    + _ip_cte("so", "xlo", "xo")
    + ","
    + _ip_cte("sn", "xsn", "xn")
    + f""",
selests AS MATERIALIZED (
  SELECT (CAST((SELECT est_pairs FROM esp) AS HUGEINT) * 1000000)
           // (SELECT count(*) FROM lineitem) AS sel6_part,
         (CAST((SELECT est_pairs FROM ess) AS HUGEINT) * 1000000)
           // (SELECT count(*) FROM lineitem) AS sel6_supplier,
         (CAST((SELECT est_pairs FROM eso) AS HUGEINT) * 1000000)
           // (SELECT count(*) FROM lineitem) AS sel6_orders,
         (CAST((SELECT est_pairs FROM esn) AS HUGEINT) * 1000000)
           // (SELECT count(*) FROM sels) AS sel6_nation,
         CAST((SELECT count(*) FROM lineitem) AS HUGEINT) AS n_fact
),
"""
    + _dp_ctes()
    + """,
dpans AS (
  SELECT nn.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
         CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                  * (100 - CAST(CAST(l.l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)))
              AS BIGINT) AS revenue_fp4,
         count(*) AS n_items
  FROM lineitem l
  JOIN selp p ON p.p_partkey = l.l_partkey
  JOIN sels s ON s.s_suppkey = l.l_suppkey
  JOIN selo o ON o.o_orderkey = l.l_orderkey
  JOIN selnn nn ON nn.n_nationkey = s.s_nationkey
  GROUP BY 1, 2
)
SELECT a.nation, a.o_year, a.revenue_fp4, a.n_items,
       t.subset, t.k, t.best_cost_fp, t.best_order
FROM dpans a CROSS JOIN dptab t
"""
)


@register("join_selinger_dp", oracle=SELINGER_DP_ORACLE)
def join_selinger_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selinger as the textbook BITMASK DP, applied: CMS-priced
    dynamic programming over the 11 connected subsets of the
    4-relation join graph (part/supplier/orders on the lineitem fact;
    nation only through supplier), fixed-point-selectivity integer
    costs (parts-per-10^6, canonical sorted truncating fold — cells
    stay ~N at any SF), (cost, order)-lexicographic cell minima. The
    winning order BUILDS the executed left-deep broadcast tree (nation
    joins after supplier by construction — the DP never emits a
    disconnected prefix), and the ENTIRE DP table (subset, k,
    best_cost_fp, best_order) rides in the hashed output cross-joined
    with the executed answer, so the oracle must reproduce every cell,
    not just the winner. The answer's revenue is an exact x10^4 BIGINT
    (integer cents x integer discount-complement per row) — the
    round-8 driver run split on the hashed-DOUBLE/precision-38-decimal
    form."""
    order, table, ests, n_fact, s_cnt = selinger_dp_decision(spark, sf_dir)
    li, part, supp, orders = _selinger_inputs(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dims = {
        "part": (part, F.col("p_partkey") == F.col("l_partkey")),
        "supplier": (supp, F.col("s_suppkey") == F.col("l_suppkey")),
        "orders": (orders, F.col("o_orderkey") == F.col("l_orderkey")),
        "nation": (nation, F.col("n_nationkey") == F.col("s_nationkey")),
    }
    joined = li
    for d in order:
        dim_df, cond = dims[d]
        joined = joined.join(F.broadcast(dim_df), cond)
    rev4 = (F.col("l_extendedprice").cast("decimal(12,2)") * F.lit(100)).cast("long") * (
        F.lit(100) - (F.col("l_discount").cast("decimal(12,2)") * F.lit(100)).cast("long")
    )
    ans = (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(rev4.cast("decimal(28,0)")).cast("long").alias("revenue_fp4"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    dp = spark.createDataFrame(
        [(k, n, int(c), o) for k, n, c, o in table],
        "subset string, k int, best_cost_fp long, best_order string",
    )
    return ans.crossJoin(F.broadcast(dp)).select(
        "nation", "o_year", "revenue_fp4", "n_items",
        "subset", "k", "best_cost_fp", "best_order",
    )
