"""PageRank query over the customer→supplier trade graph (orders ⋈
lineitem), with an unrolled-iteration DuckDB oracle.

Node encoding: customers = custkey·2, suppliers = suppkey·2 + 1 (the
two key spaces overlap numerically). Suppliers have no out-edges, so
the dangling-mass redistribution path is exercised on real data, not
just in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .. import cache
from ..operators import graph as G
from ..sources import load_table
from . import register

PR_TOP = 20


def _pagerank_ctes(iters: int) -> tuple[str, str]:
    """Unrolled PageRank iterations as CTEs; mirror of
    operators/graph.pagerank — fp9 BIGINT ranks, pure integer
    arithmetic (init 10^9 // N, contributions pr // deg, damping
    (17·x) // 20, dangling mass folded into the teleport term).
    Returns (sql, final_ranks_cte)."""
    from fractions import Fraction

    dfr = Fraction(str(G.DAMPING))
    dn, dd = dfr.numerator, dfr.denominator
    tp = ((dd - dn) * 10**9) // dd
    sql = """
ge AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
gn AS (SELECT src AS node FROM ge UNION SELECT dst FROM ge),
gd AS (SELECT src, count(*) AS deg FROM ge GROUP BY 1),
gc AS (SELECT count(*) AS n FROM gn),
gr0 AS (SELECT node, (1000000000 // gc.n)::BIGINT AS pr_fp9 FROM gn, gc)"""
    prev = "gr0"
    for i in range(1, iters + 1):
        sql += f""",
gin{i} AS (
  SELECT e.dst AS node, CAST(sum(r.pr_fp9 // d.deg) AS BIGINT) AS cin
  FROM ge e JOIN {prev} r ON r.node = e.src JOIN gd d ON d.src = e.src
  GROUP BY e.dst
),
gdm{i} AS (
  SELECT coalesce(CAST(sum(r.pr_fp9) AS BIGINT), 0) AS dm
  FROM {prev} r LEFT JOIN gd d ON d.src = r.node WHERE d.src IS NULL
),
gr{i} AS (
  SELECT n.node,
         CAST(({tp} + ({dn} * dm.dm) // {dd}) // gc.n
              + ({dn} * coalesce(i.cin, 0)) // {dd} AS BIGINT) AS pr_fp9
  FROM gn n CROSS JOIN gc CROSS JOIN gdm{i} dm
  LEFT JOIN gin{i} i ON i.node = n.node
)"""
        prev = f"gr{i}"
    return sql, prev


_PR_SQL, _PR_FINAL = _pagerank_ctes(G.PR_ITERS)

PAGERANK_ORACLE = (
    "WITH "
    + _PR_SQL
    + f""",
prr AS (
  SELECT node, pr_fp9, row_number() OVER (ORDER BY pr_fp9 DESC, node ASC) AS rank
  FROM {_PR_FINAL}
)
SELECT node, CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       pr_fp9, rank
FROM prr WHERE rank <= {PR_TOP}
"""
)


PARTNERS_TOP = 8

# the supplier strong-tie edge chain (shared-order co-occurrence →
# per-supplier top-k partners → undirected edge set `te`) — shared by
# the triangle census, link prediction, and label propagation
_STRONG_TIE_CTE = f"""tco AS MATERIALIZED (
  SELECT least(x.l_suppkey, y.l_suppkey) AS a,
         greatest(x.l_suppkey, y.l_suppkey) AS b,
         count(DISTINCT x.l_orderkey) AS shared
  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
  WHERE x.l_suppkey < y.l_suppkey
  GROUP BY 1, 2
),
tdir AS (
  SELECT a AS s, b AS p, shared FROM tco
  UNION ALL
  SELECT b, a, shared FROM tco
),
ttop AS (
  SELECT s, p FROM (
    SELECT s, p, row_number() OVER (PARTITION BY s ORDER BY shared DESC, p ASC) AS rn
    FROM tdir
  ) WHERE rn <= {PARTNERS_TOP}
),
te AS MATERIALIZED (
  SELECT DISTINCT least(s, p) AS a, greatest(s, p) AS b FROM ttop
)"""

TRIANGLE_ORACLE = f"""
WITH {_STRONG_TIE_CTE},
td AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM te UNION ALL SELECT b FROM te
  ) GROUP BY 1
),
tor AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
              THEN e.a ELSE e.b END AS u,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
              THEN e.b ELSE e.a END AS v,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
              THEN db.deg ELSE da.deg END AS dv
  FROM te e JOIN td da ON da.node = e.a JOIN td db ON db.node = e.b
),
tw AS (
  SELECT o1.v AS u, o2.v AS v
  FROM tor o1 JOIN tor o2 ON o1.u = o2.u
  WHERE o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v)
),
tt AS (
  SELECT count(*) AS triangles
  FROM tw WHERE EXISTS (SELECT 1 FROM tor o WHERE o.u = tw.u AND o.v = tw.v)
),
tstats AS (
  SELECT (SELECT count(*) FROM td) AS nodes,
         (SELECT count(*) FROM te) AS edges,
         (SELECT CAST(coalesce(sum((deg * (deg - 1)) // 2), 0) AS BIGINT) FROM td) AS wedges
)
SELECT s.nodes, s.edges, s.wedges, CAST(t.triangles AS BIGINT) AS triangles,
       (3 * t.triangles * 1000000) // (CASE WHEN s.wedges = 0 THEN 1 ELSE s.wedges END) AS clustering_fp6
FROM tstats s CROSS JOIN tt t
"""


@register("graph_triangles_supplier", oracle=TRIANGLE_ORACLE)
def graph_triangles_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle census of the supplier STRONG-TIE graph: each
    supplier keeps its top-{top} partners by shared-order count (ties
    by id), so the graph has O(n) edges BY CONSTRUCTION no matter how
    dense the raw co-occurrence gets — the raw sharing graph is >90%
    dense at sf0.1 (every pair of 1000 suppliers shares some order),
    where a triangle census just enumerates a clique; the thresholded
    partner graph is the form social/affinity analysis actually runs
    at scale. Pair generation stays bounded by the per-order item
    count; the top-k window partitions by supplier (no skew: each
    partition is at most n rows); counting is degree-ordered
    orientation (operators/graph.triangle_stats — wedge out-degree
    O(sqrt m), three equi-joins). clustering = 3·triangles/wedges at
    6dp gates the ratio into the value hash.""".format(top=PARTNERS_TOP)
    # the strong-tie table is already canonical (src<dst, distinct, no
    # self-loops) — skip the operator's defensive re-canonicalization
    return G.triangle_stats(_strong_tie_edges(spark, sf_dir), edges_canonical=True)


def _supplier_pair_counts(li: DataFrame) -> DataFrame:
    """Shared-order supplier co-occurrence counts (a < b, shared =
    number of DISTINCT orders in which both appear), without the
    lineitem SELF-JOIN the r12 form paid (r13, guide §2.4): one
    groupBy(l_orderkey) collects each order's distinct supplier SET
    (collect_set buffer bounded by the order's line count — the same
    per-order bound the old join's output already had), pairs are
    generated ROW-LOCALLY by a streaming double explode (the r12
    capped-LSH idiom), and `count` replaces the countDistinct expand
    (each unordered pair appears exactly once per order because the set
    is deduped). Drops the SMJ sort of the fact table AND the
    distinct-aggregate expansion; the pair shuffle carries map-side
    partial counts instead of raw per-order pair rows. Values are
    identical: count over once-per-order pairs == count(DISTINCT
    orderkey) per pair."""
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_set("l_suppkey").alias("_ss")
    )
    pairs = per_order.select(F.explode("_ss").alias("a"), F.col("_ss")).select(
        "a", F.explode(F.filter("_ss", lambda x: x > F.col("a"))).alias("b")
    )
    return pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("shared"))


# the top-k strong-tie partner table (s, p, shared), localCheckpointed
# and memoized per (session, sf_dir) — the clean_doc_ids discipline
# (plans/pipeline.py): SIX registered graph queries consume the
# strong-tie derivation (census, link prediction, LPA, neighbor
# features, k-core, modularity) and two more its weighted sibling, each
# previously re-deriving the full co-occurrence + top-k subtree (~6s of
# fixed stage overhead even at sf0.001). Checkpoints are session-owned
# RDDs and testdata dirs are immutable within a session, so the memo
# cannot serve stale rows; bench.py's cold passes clear it
# (_clear_spark_caches) so every cold row honestly re-pays the build.
_STRONG_TIES: dict = {}


def _strong_ties_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (id(spark.sparkContext), sf_dir)
    if key not in _STRONG_TIES:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        co = _supplier_pair_counts(li)
        directed = co.select(
            F.col("a").alias("s"), F.col("b").alias("p"), "shared"
        ).unionByName(
            co.select(F.col("b").alias("s"), F.col("a").alias("p"), "shared")
        )
        w = W.partitionBy("s").orderBy(F.col("shared").desc(), F.col("p").asc())
        # the window rows already carry `shared`, so the weighted
        # variant needs no join-back (the r12 form re-joined `kept`
        # against `directed` to re-attach a column it had just dropped)
        _STRONG_TIES[key] = (
            directed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= PARTNERS_TOP)
            .select("s", "p", "shared")
            .localCheckpoint()
        )
    return _STRONG_TIES[key]


def _strong_tie_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier strong-tie graph (undirected, (src,dst) with
    src<dst): shared-order co-occurrence counts, each supplier keeping
    its top-{top} partners — the Spark twin of _STRONG_TIE_CTE's `te`.
    Shared by the census, link-prediction, and community rows; the
    co-occurrence + top-k build comes from the session memo.""".format(
        top=PARTNERS_TOP
    )
    return (
        _strong_ties_kept(spark, sf_dir)
        .select(F.least("s", "p").alias("src"), F.greatest("s", "p").alias("dst"))
        .distinct()
    )


def _census_over_edges_sql(edges_cte: str) -> str:
    """The degree-ordered census CTE chain over an (a, b) edge relation
    named ``te`` — shared by the supplier and near-dup censuses."""
    return f"""
{edges_cte},
td AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM te UNION ALL SELECT b FROM te
  ) GROUP BY 1
),
tor AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
              THEN e.a ELSE e.b END AS u,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
              THEN e.b ELSE e.a END AS v,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
              THEN db.deg ELSE da.deg END AS dv
  FROM te e JOIN td da ON da.node = e.a JOIN td db ON db.node = e.b
),
tw AS (
  SELECT o1.v AS u, o2.v AS v
  FROM tor o1 JOIN tor o2 ON o1.u = o2.u
  WHERE o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v)
),
tt AS (
  SELECT count(*) AS triangles
  FROM tw WHERE EXISTS (SELECT 1 FROM tor o WHERE o.u = tw.u AND o.v = tw.v)
),
tstats AS (
  SELECT (SELECT count(*) FROM td) AS nodes,
         (SELECT count(*) FROM te) AS edges,
         (SELECT CAST(coalesce(sum((deg * (deg - 1)) // 2), 0) AS BIGINT) FROM td) AS wedges
)
SELECT s.nodes, s.edges, s.wedges, CAST(t.triangles AS BIGINT) AS triangles,
       (3 * t.triangles * 1000000) // (CASE WHEN s.wedges = 0 THEN 1 ELSE s.wedges END) AS clustering_fp6
FROM tstats s CROSS JOIN tt t
"""


def _dedup_transitivity_oracle() -> str:
    from .dedup import MINHASH_PAIRS_ORACLE

    return (
        f"WITH mp AS ({MINHASH_PAIRS_ORACLE}),"
        + _census_over_edges_sql("te AS (SELECT id_a AS a, id_b AS b FROM mp)")[1:]
    )


@register("dedup_graph_transitivity", oracle=None)
def dedup_graph_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census over the VERIFIED near-dup pair graph (the
    dedup_minhash_pairs output): clustering here measures how
    transitive the >= 0.5-Jaccard relation actually is — high
    clustering justifies treating connected components as duplicate
    groups (the dedup_clusters assumption); low clustering would mean
    chains of borderline pairs are gluing unrelated docs together.
    The near-dup graph is sparse by construction (LSH banding), so the
    census is equi-joins over an O(dup-pairs) edge list. Same census
    machinery as graph_triangles_supplier; oracle replays the MinHash
    pipeline AND the census."""
    from .dedup import dedup_minhash_pairs

    pairs = dedup_minhash_pairs(spark, sf_dir).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    return G.triangle_stats(pairs)


# the oracle composes another module's CTE chain — bind it after both
# definitions exist (import inside a function avoids a load-order trap)
from . import REGISTRY as _REG  # noqa: E402

_REG["dedup_graph_transitivity"].oracle = _dedup_transitivity_oracle()


@register("graph_pagerank_trade", oracle=PAGERANK_ORACLE, bench=True)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{top} PageRank nodes of the customer→supplier trade graph
    after 3 damped iterations — importance propagation over a bipartite
    edge list where every supplier is a dangling node. Each iteration
    is one equi-join + one hash aggregate; the oracle unrolls the same
    iterations as CTEs and hash-matches the 9dp ranks.""".format(top=PR_TOP)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
    )
    edges = cache.pin(edges)  # each PR pass rescans the edge list
    ranks = G.pagerank(edges)
    lim = ranks.orderBy(F.col("pr_fp9").desc(), F.col("node").asc()).limit(PR_TOP)
    w = W.orderBy(F.col("pr_fp9").desc(), F.col("node").asc())
    kind = F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier")
    return lim.withColumn("rank", F.row_number().over(w)).select(
        "node", kind.alias("kind"), "pr_fp9", "rank"
    )


def _trade_edges_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTINCT trade edge list through a src-bucketed mirror
    (sources/bucketed.ensure_bucketed_frame): the orders⋈lineitem
    derivation, the (src,dst) dedupe shuffle, and the src clustering
    are all paid ONCE at write time. Every later scan reports
    HashPartitioning(src), so an iterative consumer's per-round
    edges⋈ranks join and out-degree aggregate plan with ZERO Exchange
    on the edge side — the storage-layout answer to 'the edge list
    reshuffles every PageRank round' at 100 TB (plan-asserted in
    tests/test_plans.py::test_pagerank_bucketed_no_edge_exchange)."""
    from ..sources.bucketed import ensure_bucketed_frame

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
        return (
            orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
            .select(
                (F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"),
            )
            .distinct()
        )

    return ensure_bucketed_frame(
        spark,
        sf_dir,
        "trade_edges_src",
        build,
        keys=("src",),
        source_tables=("orders", "lineitem"),
    )


@register("graph_pagerank_bucketed", oracle=PAGERANK_ORACLE)
def graph_pagerank_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_pagerank_trade through the src-bucketed edge mirror —
    IDENTICAL values (same oracle, hash-gated), different physics:
    the non-bucketed query pays three edge-sized Exchanges building
    its working set (the (src,dst) distinct, the out-degree aggregate,
    the degree pre-join) before iterating; here the mirror's bucket
    spec satisfies every one of those HashPartitioning requirements,
    so setup AND each damped pass plan exchange-free on the edge side
    (only the node-sized rank table moves). The mirror write is a
    one-time cost amortized across every graph query on the same
    edge list — PageRank, BFS, shortest paths all share it."""
    edges = _trade_edges_bucketed(spark, sf_dir)
    # the mirror is written deduped — skip the operator's distinct
    ranks = G.pagerank(edges, edges_deduped=True)
    lim = ranks.orderBy(F.col("pr_fp9").desc(), F.col("node").asc()).limit(PR_TOP)
    w = W.orderBy(F.col("pr_fp9").desc(), F.col("node").asc())
    kind = F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier")
    return lim.withColumn("rank", F.row_number().over(w)).select(
        "node", kind.alias("kind"), "pr_fp9", "rank"
    )


BFS_DEPTH = 3
BFS_NATION = 0

BFS_ORACLE = f"""
WITH RECURSIVE
be AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
bu AS (SELECT src, dst FROM be UNION SELECT dst, src FROM be),
bs AS (SELECT DISTINCT c_custkey * 2 AS node FROM customer
       WHERE c_nationkey = {BFS_NATION}),
walk AS (
  SELECT node, 0 AS dist FROM bs
  UNION
  SELECT bu.dst, walk.dist + 1 FROM walk JOIN bu ON bu.src = walk.node
  WHERE walk.dist < {BFS_DEPTH}
)
SELECT node,
       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       CAST(min(dist) AS INT) AS dist
FROM walk GROUP BY 1, 2
"""


@register("graph_bfs_reach", oracle=BFS_ORACLE)
def graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS (depth {d}) over the UNDIRECTED trade graph
    from the nation-{n} customer seed set: every reached node with its
    minimum hop count. Transposes the reference's recursive-subscription
    reachability idiom onto an iterative frontier expansion — per round
    one frontier⋈edges equi-join + one anti-join against the visited
    set, lineage cut per round. The oracle is a recursive CTE computing
    the same bounded-depth minimum-distance closure, so any node the
    frontier expansion missed (or reached at the wrong depth) breaks
    the hash. Seeds with no orders stay isolated at dist 0 on both
    sides — the dist histogram is 0/1/2/3 with real mass in each
    bucket (suppliers only at odd depths: the graph is bipartite).
    """.format(d=BFS_DEPTH, n=BFS_NATION)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    fwd = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    # dedupe ONE direction and mirror it: the graph is bipartite
    # (customers even, suppliers odd), so fwd rows are (even, odd) and
    # reversed rows (odd, even) — the two sets are disjoint and the
    # union of a distinct set with its reversal is distinct. Halves the
    # bytes through the dedupe Exchange, the query's biggest shuffle
    # (r13, guide §2.3).
    d = fwd.distinct()
    edges = d.unionByName(
        d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = cust.filter(F.col("c_nationkey") == BFS_NATION).select(
        (F.col("c_custkey") * 2).alias("node")
    )
    dist = G.bfs_distances(edges, seeds, BFS_DEPTH, edges_deduped=True)
    kind = F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier")
    return dist.select("node", kind.alias("kind"), "dist")


def _trade_edges_und_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNDIRECTED trade edge list (both directions materialized) through
    a src-bucketed mirror — the frontier-expansion sibling of
    :func:`_trade_edges_bucketed`: BFS probes `frontier ⋈ edges` on
    ``src`` every round, so a src-clustered layout makes every round's
    edge side exchange-free and only the node-sized frontier moves."""
    from ..sources.bucketed import ensure_bucketed_frame

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
        fwd = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        return fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()

    return ensure_bucketed_frame(
        spark,
        sf_dir,
        "trade_edges_und_src",
        build,
        keys=("src",),
        source_tables=("orders", "lineitem"),
    )


@register("graph_bfs_bucketed", oracle=BFS_ORACLE)
def graph_bfs_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_bfs_reach through the src-bucketed undirected edge mirror —
    IDENTICAL values (same recursive-CTE oracle), different physics:
    the per-round ``frontier ⋈ edges`` equi-join and the up-front
    (src,dst) dedupe read data already clustered on src, so every BFS
    round plans exchange-free on the edge side; only the frontier and
    the visited anti-join move node-sized rows. The one-time mirror
    write amortizes across the graph family exactly like the PageRank
    mirror (both directions stored: 2|E| rows — the classic
    space-for-shuffle trade every distributed BFS makes)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    seeds = cust.filter(F.col("c_nationkey") == BFS_NATION).select(
        (F.col("c_custkey") * 2).alias("node")
    )
    dist = G.bfs_distances(
        # the mirror is written deduped — skip the operator's distinct
        _trade_edges_und_bucketed(spark, sf_dir), seeds, BFS_DEPTH,
        edges_deduped=True,
    )
    kind = F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier")
    return dist.select("node", kind.alias("kind"), "dist")


# -- link prediction: common neighbors + Adamic-Adar -----------------------

LINKPRED_TOP = 25

LINKPRED_ORACLE = f"""
WITH {_STRONG_TIE_CTE},
lud AS (SELECT a AS s, b AS p FROM te UNION ALL SELECT b, a FROM te),
lnd AS (SELECT s AS node, count(*) AS deg FROM lud GROUP BY 1),
lwedge AS (
  SELECT u1.p AS u, u2.p AS v, u1.s AS w
  FROM lud u1 JOIN lud u2 ON u1.s = u2.s AND u1.p < u2.p
),
lsc AS (
  SELECT w.u, w.v, count(*) AS common_neighbors,
         sum(CAST(round(CAST(1.0 AS DOUBLE) / ln(d.deg), 7) AS DECIMAL(28,9))) AS aa
  FROM lwedge w JOIN lnd d ON d.node = w.w
  GROUP BY 1, 2
),
lnew AS (
  SELECT s.u, s.v, s.common_neighbors, s.aa
  FROM lsc s LEFT JOIN te ON te.a = s.u AND te.b = s.v
  WHERE te.a IS NULL
),
lrank AS (
  SELECT u, v, common_neighbors, aa,
         row_number() OVER (ORDER BY aa DESC, u ASC, v ASC) AS rank
  FROM lnew
)
SELECT u, v, CAST(common_neighbors AS BIGINT) AS common_neighbors,
       CAST(aa AS DOUBLE) AS adamic_adar, rank
FROM lrank WHERE rank <= {LINKPRED_TOP}
"""


@register("graph_link_prediction", oracle=LINKPRED_ORACLE)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the supplier strong-tie graph: the top-{k}
    NOT-YET-CONNECTED pairs by Adamic-Adar (Σ 1/ln(deg(w)) over common
    neighbors w — rare shared partners count more), with the
    common-neighbor count alongside. Wedge enumeration is the same
    per-center neighbor self-join the census uses — bounded because
    the strong-tie construction caps the graph at top-{p} partners per
    supplier — existing edges drop out with one anti-join against the
    edge set. Per-wedge weights round to 7dp and sum as DECIMAL(28,9)
    (order-free); ranking happens ON the decimal sum, ties on (u,v).
    """.format(k=LINKPRED_TOP, p=PARTNERS_TOP)
    te = _strong_tie_edges(spark, sf_dir).localCheckpoint()  # edges +
    # wedge sides + anti-join probe: scanned 4x
    ud = te.select(F.col("src").alias("s"), F.col("dst").alias("p")).unionByName(
        te.select(F.col("dst").alias("s"), F.col("src").alias("p"))
    )
    deg = ud.groupBy(F.col("s").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    u1 = ud.select(F.col("s").alias("w"), F.col("p").alias("u"))
    u2 = ud.select(F.col("s").alias("w"), F.col("p").alias("v"))
    wedges = u1.join(u2, "w").filter(F.col("u") < F.col("v"))
    aa_term = F.expr("CAST(round(CAST(1.0 AS DOUBLE) / ln(deg), 7) AS DECIMAL(28,9))")
    scored = (
        wedges.join(deg.withColumnRenamed("node", "w"), "w")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum(aa_term).alias("_aa"),
        )
    )
    new = scored.join(
        te,
        (scored["u"] == te["src"]) & (scored["v"] == te["dst"]),
        "left_anti",
    )
    lim = new.orderBy(
        F.col("_aa").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(LINKPRED_TOP)
    w = W.orderBy(F.col("_aa").desc(), F.col("u").asc(), F.col("v").asc())
    return lim.withColumn("rank", F.row_number().over(w)).select(
        "u", "v", "common_neighbors", F.col("_aa").cast("double").alias("adamic_adar"), "rank"
    )


# -- community detection: synchronous label propagation --------------------

LPA_ITERS = 3

def _lpa_ctes(iters: int) -> tuple[str, str]:
    """Unrolled synchronous LPA rounds; mirror of
    operators/graph.label_propagation (most frequent neighbor label,
    ties to the smallest label)."""
    sql = """
cud AS (SELECT a AS s, b AS p FROM te UNION SELECT b, a FROM te),
cl0 AS (SELECT DISTINCT s AS node, s AS community FROM cud)"""
    prev = "cl0"
    for i in range(1, iters + 1):
        sql += f""",
ccnt{i} AS (
  SELECT u.s AS node, l.community, count(*) AS c
  FROM cud u JOIN {prev} l ON l.node = u.p
  GROUP BY 1, 2
),
cl{i} AS (
  SELECT node, community FROM (
    SELECT node, community,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, community ASC) AS rn
    FROM ccnt{i}
  ) WHERE rn = 1
)"""
        prev = f"cl{i}"
    return sql, prev


_LPA_SQL, _LPA_FINAL = _lpa_ctes(LPA_ITERS)

LPA_ORACLE = (
    f"WITH {_STRONG_TIE_CTE},"
    + _LPA_SQL
    + f""",
csize AS (SELECT community, count(*) AS community_size FROM {_LPA_FINAL} GROUP BY 1)
SELECT l.node, l.community, CAST(s.community_size AS BIGINT) AS community_size
FROM {_LPA_FINAL} l JOIN csize s USING (community)
"""
)


@register("graph_label_propagation", oracle=LPA_ORACLE)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by {n} rounds of SYNCHRONOUS label
    propagation over the supplier strong-tie graph: every node adopts
    its neighbors' most frequent community label, ties to the smallest
    label — fully deterministic, no RNG, no update-order dependence,
    which is what makes the round-for-round unrolled oracle possible.
    Per round one neighbor equi-join + one count aggregate + one
    per-node arg-max (window partitions by node — no global sort);
    community sizes join back node-sized. The community structure
    complements the census (local transitivity) and link prediction
    (edge-level affinity) with the graph's mesoscale.""".format(n=LPA_ITERS)
    te = _strong_tie_edges(spark, sf_dir)
    labels = G.label_propagation(te, iters=LPA_ITERS, edges_deduped=True)
    size = labels.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("community_size")
    )
    return labels.join(F.broadcast(size), "community").select(
        "node", "community", "community_size"
    )


# -- weighted shortest paths: bounded-round Bellman-Ford -------------------

SP_ROUNDS = 3
SP_COST_NUM = 1000  # edge cost = 1000 DIV shared — strong ties are cheap

def _sp_ctes(rounds: int) -> tuple[str, str]:
    """Unrolled min-plus relaxations; mirror of
    operators/graph.bounded_min_plus over the strong-tie graph with
    integer costs and the min-suppkey seed."""
    sql = f"""
swe AS (
  SELECT least(s, p) AS a, greatest(s, p) AS b,
         {SP_COST_NUM} // max(shared) AS w
  FROM ttop JOIN tdir USING (s, p) GROUP BY 1, 2
),
sue AS (SELECT a AS src, b AS dst, w FROM swe UNION ALL SELECT b, a, w FROM swe),
sp0 AS (SELECT (SELECT min(a) FROM te) AS node, CAST(0 AS BIGINT) AS cost)"""
    prev = "sp0"
    for i in range(1, rounds + 1):
        sql += f""",
sp{i} AS (
  SELECT node, min(cost) AS cost FROM (
    SELECT node, cost FROM {prev}
    UNION ALL
    SELECT e.dst AS node, s.cost + e.w AS cost
    FROM {prev} s JOIN sue e ON e.src = s.node
  ) GROUP BY node
)"""
        prev = f"sp{i}"
    return sql, prev


_SP_SQL, _SP_FINAL = _sp_ctes(SP_ROUNDS)

SHORTEST_PATH_ORACLE = (
    f"WITH {_STRONG_TIE_CTE},"
    + _SP_SQL
    + f"""
SELECT node, cost FROM {_SP_FINAL}
"""
)


@register("graph_shortest_paths", oracle=SHORTEST_PATH_ORACLE)
def graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round Bellman-Ford over the supplier strong-tie graph:
    cheapest <= {r}-hop path cost from the smallest supplier node,
    edge cost = {c} DIV tie-strength (strong ties are cheap) — all
    INTEGER arithmetic, so the min-plus semiring is exact and the
    unrolled oracle replays it bit-for-bit. Per round one
    frontier-adjacent equi-join + one min aggregate, lineage cut per
    round; the weighted sibling of graph_bfs_reach. At 100 TB the same
    skeleton runs delta-stepping-style: seeds become a frontier table
    and rounds continue until the relaxation fixpoint.""".format(
        r=SP_ROUNDS, c=SP_COST_NUM
    )
    te_w = _strong_tie_weighted_edges(spark, sf_dir)
    seed_row = te_w.agg(F.min(F.least("src", "dst")).alias("_m")).first()
    seeds = spark.createDataFrame([(int(seed_row["_m"]),)], "node long")
    und = te_w.select("src", "dst", "cost").unionByName(
        te_w.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "cost")
    )
    return G.bounded_min_plus(und, seeds, rounds=SP_ROUNDS)


def _strong_tie_und_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNDIRECTED weighted strong-tie edge list through a
    src-bucketed mirror. The strong-tie derivation is the single most
    expensive graph working-set build in the repo — a lineitem
    co-occurrence SELF-JOIN, a distinct-count aggregate and a top-k
    window — and five queries consume its output; the mirror pays all
    of that plus the (src) clustering once, so every later
    frontier-style consumer plans its per-round src equi-join with a
    Bucketed scan and zero edge-side Exchange."""
    from ..sources.bucketed import ensure_bucketed_frame

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        te_w = _strong_tie_weighted_edges(spark, sf_dir)
        return (
            te_w.select("src", "dst", "cost")
            .unionByName(
                te_w.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "cost"
                )
            )
            .distinct()
        )

    return ensure_bucketed_frame(
        spark,
        sf_dir,
        "strong_tie_und_src",
        build,
        keys=("src",),
        source_tables=("lineitem",),
    )


@register("graph_shortest_paths_bucketed", oracle=SHORTEST_PATH_ORACLE)
def graph_shortest_paths_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_shortest_paths through the src-bucketed strong-tie mirror
    — same bounded Bellman-Ford, same values (hash-gated against the
    SAME unrolled oracle), different physics: the co-occurrence
    self-join +
    top-k-partners build is paid once at mirror-write time, and each
    relaxation round's ``frontier ⋈ edges`` reads src-clustered data —
    zero edge-side Exchange per round (the pagerank/BFS mirror
    contract, extended to the weighted family)."""
    und = _strong_tie_und_bucketed(spark, sf_dir)
    seed_row = und.agg(F.min(F.least("src", "dst")).alias("_m")).first()
    seeds = spark.createDataFrame([(int(seed_row["_m"]),)], "node long")
    return G.bounded_min_plus(und, seeds, rounds=SP_ROUNDS)


def _strong_tie_weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The strong-tie edge set WITH integer costs: canonical (src<dst)
    pairs kept by either endpoint's top-{k} list, cost = {c} DIV
    shared-order count (max over the two directed copies, which carry
    the same value). Reads the session memo; the kept rows already
    carry `shared`, so the r12 join-back against the full directed
    table is gone.""".format(k=PARTNERS_TOP, c=SP_COST_NUM)
    return (
        _strong_ties_kept(spark, sf_dir)
        .groupBy(
            F.least("s", "p").alias("src"), F.greatest("s", "p").alias("dst")
        )
        .agg(
            F.expr(f"{SP_COST_NUM} DIV max(shared)").cast("long").alias("cost")
        )
    )


# -- GNN-style neighborhood feature aggregation ----------------------------

NEIGH_ORACLE = (
    f"WITH {_STRONG_TIE_CTE},"
    + """
nud AS (SELECT a AS s, b AS p FROM te UNION ALL SELECT b, a FROM te),
nf AS (SELECT s_suppkey AS node, CAST(s_acctbal AS DECIMAL(18,2)) AS bal FROM supplier),
nh1 AS (
  SELECT u.s AS node, count(*) AS deg,
         CAST(sum(f.bal) AS DOUBLE) / count(*) AS h1_mean_bal,
         CAST(min(f.bal) AS DOUBLE) AS h1_min_bal,
         CAST(max(f.bal) AS DOUBLE) AS h1_max_bal
  FROM nud u JOIN nf f ON f.node = u.p
  GROUP BY 1
),
n2 AS (
  SELECT DISTINCT u1.s AS node, u2.p AS v
  FROM nud u1 JOIN nud u2 ON u2.s = u1.p
  WHERE u2.p <> u1.s
),
nh2 AS (
  SELECT n2.node, count(*) AS h2_count,
         CAST(sum(f.bal) AS DOUBLE) / count(*) AS h2_mean_bal
  FROM n2 JOIN nf f ON f.node = n2.v
  GROUP BY 1
)
SELECT h1.node, CAST(h1.deg AS BIGINT) AS deg, h1.h1_mean_bal, h1.h1_min_bal,
       h1.h1_max_bal, CAST(h2.h2_count AS BIGINT) AS h2_count, h2.h2_mean_bal
FROM nh1 h1 JOIN nh2 h2 USING (node)
"""
)


@register("graph_neighbor_features", oracle=NEIGH_ORACLE)
def graph_neighbor_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GNN-style neighborhood feature aggregation (the batch core of a
    GraphSAGE-like pipeline): for every strong-tie node, mean/min/max
    account balance over 1-hop neighbors and the mean over the
    DISTINCT within-2-hop set (self excluded) — message passing as two
    equi-join + aggregate layers, features broadcast onto the edge
    list. Balances are DECIMAL(18,2) sums (order-free) and the means
    are exact-sum quotients — never re-rounded, per the half-ulp rule.
    The per-layer costs are |E| and Σdeg² — the latter bounded by the
    top-{p}-partner construction, exactly the wedge bound the census
    relies on.""".format(p=PARTNERS_TOP)
    te = _strong_tie_edges(spark, sf_dir).localCheckpoint()
    ud = te.select(F.col("src").alias("s"), F.col("dst").alias("p")).unionByName(
        te.select(F.col("dst").alias("s"), F.col("src").alias("p"))
    ).localCheckpoint()
    feats = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("p"),
        F.expr("CAST(s_acctbal AS DECIMAL(18,2))").alias("bal"),
    )
    h1 = (
        ud.join(F.broadcast(feats), "p")
        .groupBy(F.col("s").alias("node"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("deg"),
            (F.sum("bal").cast("double") / F.count(F.lit(1))).alias("h1_mean_bal"),
            F.min("bal").cast("double").alias("h1_min_bal"),
            F.max("bal").cast("double").alias("h1_max_bal"),
        )
    )
    u2 = ud.select(F.col("s").alias("p"), F.col("p").alias("v"))
    n2 = (
        ud.join(u2, "p")
        .filter(F.col("v") != F.col("s"))
        .select(F.col("s").alias("node"), "v")
        .distinct()
    )
    h2 = (
        n2.join(F.broadcast(feats.withColumnRenamed("p", "v")), "v")
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("long").alias("h2_count"),
            (F.sum("bal").cast("double") / F.count(F.lit(1))).alias("h2_mean_bal"),
        )
    )
    return h1.join(h2, "node").select(
        "node", "deg", "h1_mean_bal", "h1_min_bal", "h1_max_bal",
        "h2_count", "h2_mean_bal",
    )


# -- bounded k-core peeling ------------------------------------------------

KCORE_K = 3
KCORE_ROUNDS = 4

def _kcore_ctes(k: int, rounds: int) -> tuple[str, str]:
    """Unrolled peeling rounds; mirror of operators/graph.kcore_prune
    (per round: degrees -> keep deg>=k -> prune edges)."""
    sql = """
ke0 AS (SELECT a, b FROM te)"""
    prev = "ke0"
    for i in range(1, rounds + 1):
        sql += f""",
kd{i} AS MATERIALIZED (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}
  ) GROUP BY 1
),
kk{i} AS MATERIALIZED (SELECT node FROM kd{i} WHERE deg >= {k}),
ke{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM {prev} e
  JOIN kk{i} x ON x.node = e.a JOIN kk{i} y ON y.node = e.b
)"""
        prev = f"ke{i}"
    return sql, prev


_KC_SQL, _KC_FINAL = _kcore_ctes(KCORE_K, KCORE_ROUNDS)

KCORE_ORACLE = (
    f"WITH {_STRONG_TIE_CTE},"
    + _KC_SQL
    + f""",
kfin AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM {_KC_FINAL} UNION ALL SELECT b FROM {_KC_FINAL}
  ) GROUP BY 1
)
SELECT node, CAST(deg AS BIGINT) AS deg FROM kfin WHERE deg >= {KCORE_K}
"""
)


@register("graph_kcore", oracle=KCORE_ORACLE)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling (k={k}, {r} rounds) of the supplier
    strong-tie graph: iteratively drop nodes with degree < {k} and the
    edges touching them — the standard dense-substructure filter
    (spam rings, tightly-coupled supplier cliques). Per round one
    degree aggregate + two LeftSemi prunes over a monotonically
    shrinking edge table, lineage cut per round; the oracle unrolls
    the same peeling sequence round for round, so a single node
    surviving or dying at the wrong round breaks the hash.""".format(
        k=KCORE_K, r=KCORE_ROUNDS
    )
    te = _strong_tie_edges(spark, sf_dir)
    return G.kcore_prune(te, k=KCORE_K, rounds=KCORE_ROUNDS, edges_canonical=True)


# -- community quality: Newman modularity of the LPA partition --------------

MODULARITY_ORACLE = (
    f"WITH {_STRONG_TIE_CTE},"
    + _LPA_SQL
    + f""",
mM AS (SELECT count(*) AS M FROM cud),
mdeg AS (SELECT s AS node, count(*) AS deg FROM cud GROUP BY 1),
mic AS (
  SELECT count(*) AS ic
  FROM cud u
  JOIN {_LPA_FINAL} la ON la.node = u.s
  JOIN {_LPA_FINAL} lb ON lb.node = u.p
  WHERE la.community = lb.community
),
mdsq AS (
  SELECT sum(dc * dc) AS dsq FROM (
    SELECT l.community, sum(d.deg) AS dc
    FROM mdeg d JOIN {_LPA_FINAL} l USING (node) GROUP BY 1
  )
),
mnc AS (SELECT count(DISTINCT community) AS n_communities,
               count(*) AS n_nodes FROM {_LPA_FINAL}),
magg AS (
  SELECT CAST(mM.M AS BIGINT) AS m2,
         CAST(mic.ic AS BIGINT) AS ic,
         CAST(mdsq.dsq AS BIGINT) AS dsq,
         CAST(mM.M * mic.ic - mdsq.dsq AS BIGINT) AS q_num,
         CAST(mM.M * mM.M AS BIGINT) AS q_den,
         mnc.n_nodes, mnc.n_communities
  FROM mM, mic, mdsq, mnc
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_communities AS BIGINT) AS n_communities,
       m2 // 2 AS m_edges,
       ic // 2 AS internal_edges,
       q_num AS modularity_num,
       q_den AS modularity_den,
       CASE WHEN q_num >= 0
            THEN CAST((CAST(q_num AS HUGEINT) * 1000000000) // q_den AS BIGINT)
            ELSE -CAST((CAST(-q_num AS HUGEINT) * 1000000000) // q_den AS BIGINT)
       END AS modularity_fp9
FROM magg
"""
)


@register("graph_modularity", oracle=MODULARITY_ORACLE)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation partition — the
    number that says whether the detected communities are real
    structure or noise (Q > 0.3 ≈ strong): Q = (M·ic − Σ_c d_c²) / M²
    over the doubled edge count M, internal directed pairs ic, and
    per-community degree sums — kept as an EXACT integer rational
    (modularity_num / modularity_den) plus a sign-guarded truncating
    fp9 rendering, because DuckDB's ``//`` floors while Spark's ``DIV``
    truncates and Q can be negative. One degree aggregate, one
    two-sided label join, model-sized algebra; the oracle replays the
    LPA rounds AND the modularity algebra."""
    te = _strong_tie_edges(spark, sf_dir)
    labels = G.label_propagation(
        te, iters=LPA_ITERS, edges_deduped=True
    ).localCheckpoint()
    # te is canonical (src<dst, distinct) so its two directed copies
    # are disjoint — the union is distinct by construction (r13 §2.4)
    und = te.select(F.col("src").alias("s"), F.col("dst").alias("p")).unionByName(
        te.select(F.col("dst").alias("s"), F.col("src").alias("p"))
    )
    M = und.agg(F.count(F.lit(1)).alias("m2"))
    deg = und.groupBy(F.col("s").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    la = labels.withColumnRenamed("node", "s").withColumnRenamed("community", "ca")
    lb = labels.withColumnRenamed("node", "p").withColumnRenamed("community", "cb")
    ic = (
        und.join(la, "s")
        .join(lb, "p")
        .filter(F.col("ca") == F.col("cb"))
        .agg(F.count(F.lit(1)).alias("ic"))
    )
    dsq = (
        deg.join(labels, "node")
        .groupBy("community")
        .agg(F.sum("deg").alias("dc"))
        .agg(F.sum(F.col("dc") * F.col("dc")).alias("dsq"))
    )
    nc = labels.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.countDistinct("community").alias("n_communities"),
    )
    row = M.crossJoin(ic).crossJoin(dsq).crossJoin(nc).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_communities").cast("long").alias("n_communities"),
        F.expr("m2 DIV 2").cast("long").alias("m_edges"),
        F.expr("ic DIV 2").cast("long").alias("internal_edges"),
        F.expr("CAST(m2 * ic - dsq AS BIGINT)").alias("modularity_num"),
        F.expr("CAST(m2 * m2 AS BIGINT)").alias("modularity_den"),
        F.expr(
            "CASE WHEN m2 * ic - dsq >= 0"
            " THEN CAST((CAST(m2 * ic - dsq AS DECIMAL(20,0)) * 1000000000) DIV (m2 * m2) AS BIGINT)"
            " ELSE -CAST((CAST(-(m2 * ic - dsq) AS DECIMAL(20,0)) * 1000000000) DIV (m2 * m2) AS BIGINT)"
            " END"
        ).alias("modularity_fp9"),
    )
    return row
