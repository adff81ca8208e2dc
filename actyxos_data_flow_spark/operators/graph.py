"""Iterative graph analytics beyond connected components: PageRank as
pure DataFrame iterations.

Dedup clustering (operators/dedup.py) already walks similarity graphs;
PageRank generalizes that to weighted-importance propagation — in a
data pipeline it ranks documents by how central they are in the
near-dup/citation/link graph (centrality-weighted sampling, picking
cluster representatives, spam sinks score low). The shape is the
canonical MapReduce PageRank:

    pr_{t+1}(v) = (1−d)/N + d · Σ_{u→v} pr_t(u) / outdeg(u)

Each iteration is ONE job: edges join ranks on src (both sides keyed
by node id — at scale, co-partitioned so the join is shuffle-free
after the first), contributions aggregate per dst. Dangling nodes
(no out-edges) keep receiving the teleport term; their mass is
redistributed uniformly, the standard correction.

Determinism contract (for the unrolled-CTE oracle): per-edge
contributions pr/outdeg round to 9dp and sum as DECIMAL(28,9) (exact,
association-free); each new rank rounds to 9dp. Iterations are a
small fixed count. No RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

DAMPING = 0.85
PR_ITERS = 3


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    edges_canonical: bool = False,
) -> DataFrame:
    """Exact triangle count + global clustering coefficient of an
    undirected graph, via degree-ordered edge orientation (the
    MapReduce-triangles formulation of Suri & Vassilvitskii, WWW'11).

    Why this shape at 100 TB: the naive wedge enumeration explodes on
    hub nodes (a degree-d node contributes d² wedges). Orienting every
    edge from its lower-(degree, id) endpoint to the higher one caps
    every node's OUT-degree at O(sqrt(m)), so the wedge join is
    skew-bounded regardless of hub degree, and each triangle is
    counted exactly once (at its lowest-ranked vertex). Three hash
    equi-joins total — no windows, no cross joins.

    Input may be directed/duplicated; it is canonicalized (a<b,
    distinct, self-loops dropped) unless the caller proves the work is
    already done (``edges_canonical=True``: src<dst, distinct, no
    self-loops — skips a redundant Exchange, r13 guide §2.4). Output:
    one row (nodes, edges,
    wedges, triangles, clustering) where wedges = Σ C(deg,2) — all
    exact integers — and clustering_fp6 = (3·triangles·10^6) DIV wedges
    (pure integer: round(3t/w, 6) of an exact rational can land ON a
    6dp half-boundary where engines' double rounds split)
    (a quotient of exact ints: identical doubles on both engines)."""
    if edges_canonical:
        e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        e = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
    e = e.localCheckpoint()  # scanned for degrees, orientation, closure
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
        .localCheckpoint()  # wedge side × 2 + closure probe
    )
    o1 = oriented.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    o2 = oriented.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedge_order = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    wedges = o1.join(o2, "u").filter(wedge_order).select(
        F.col("x").alias("u"), F.col("y").alias("v")
    )
    tri = wedges.join(oriented.select("u", "v"), ["u", "v"], "left_semi")
    counts = tri.agg(F.count(F.lit(1)).alias("triangles"))
    n_nodes = deg.count()
    n_edges = e.count()
    n_wedges = (
        deg.agg(F.expr("sum((deg * (deg - 1)) DIV 2)").cast("long").alias("w"))
        .first()["w"]
        or 0
    )
    return counts.select(
        F.lit(n_nodes).alias("nodes"),
        F.lit(n_edges).alias("edges"),
        F.lit(n_wedges).alias("wedges"),
        F.col("triangles").cast("long").alias("triangles"),
        F.expr(f"(3 * triangles * 1000000) DIV {n_wedges or 1}").cast("long").alias(
            "clustering_fp6"
        ),
    )


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    damping: float = DAMPING,
    src: str = "src",
    dst: str = "dst",
    edges_deduped: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list (duplicate edges count once —
    deduped up front). Returns (node, pr_fp9) for every node appearing
    as src or dst — ranks as 1e-9 fixed-point BIGINTs: every step
    (init 10^9 DIV N, per-edge contribution pr DIV deg, damping
    (dn·x) DIV dd, teleport) is exact integer arithmetic, so the
    ranking cannot split across engine builds (round(pr/deg, 9) of an
    exact rational — the previous form — lands ON 9dp half-boundaries
    whenever deg divides 2·pr, the round-7 driver hazard class).

    Scale notes: ``nodes``/``outdeg`` are node-sized; each pass is
    edges ⋈ ranks (equi-join on src) + one hash aggregate on dst —
    partial aggregation makes the shuffle carry per-task partials.
    Persist the (deduped) edge list before calling. The rank table is
    ``localCheckpoint``ed after every pass — like the connected-
    components rounds, this CUTS the iterative lineage so pass i+1's
    plan is one join deep instead of replaying every earlier pass
    (without it the final plan is exponential in iterations: the
    mechanized audit showed 154 Exchanges for 3 passes); swap in
    ``checkpoint()`` on a real cluster. Dangling mass is a 1-row
    aggregate folded into the teleport term (broadcast join)."""
    # ``edges_deduped=True``: the caller proves the edge list is
    # already distinct (e.g. the src-bucketed mirrors, written deduped)
    # — skips a redundant (src, dst) Exchange (r13, guide §2.4)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_deduped:
        e = e.distinct()
    e = e.localCheckpoint()  # edge list + everything derived below is
    # reused every pass; materialize once
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()  # reused every pass (base join) + final
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Pre-join the out-degree into the edge table ONCE and materialize
    # it src-partitioned (the groupBy/join leave it hash-partitioned by
    # src, and localCheckpoint PRESERVES outputPartitioning): every
    # pass's contrib join then exchanges only the node-sized rank table
    # — the edge side never reshuffles. Before this, each of the
    # `iters` passes re-aggregated outdeg from e and reshuffled the
    # edge list for the join: two edge-sized stages per pass gone.
    e2 = e.join(outdeg, "src").localCheckpoint()
    # the dangling set (no out-edges) is STATIC — materialize once; the
    # per-pass dangling-mass scan is then a semi-join against it
    dangling = (
        nodes.join(outdeg.withColumnRenamed("src", "node"), "node", "left_anti")
        .localCheckpoint()
    )
    # N and the per-pass dangling mass are MODEL-SIZED scalars — collect
    # them (1-row jobs) and fold as literals instead of broadcast-
    # joining two 1-row frames per pass: same IEEE arithmetic (the
    # scalar ops below mirror the oracle's expression order exactly),
    # three fewer plan trees per iteration.
    n = nodes.count()

    from fractions import Fraction

    dfr = Fraction(str(damping))
    dn, dd = dfr.numerator, dfr.denominator
    # pr_0 = 10^9 DIV N for every node (exact integer)
    ranks = nodes.select("node", F.lit(10**9 // n).cast("long").alias("pr_fp9"))
    for _ in range(iters):
        contrib = (
            e2.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), F.expr("pr_fp9 DIV deg").alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").cast("long").alias("_in"))
        )
        # dangling mass: rank held by nodes with no out-edges (exact
        # BIGINT sum — a model-sized scalar collected per pass)
        dm_row = (
            ranks.join(dangling, "node", "left_semi")
            .agg(F.sum("pr_fp9").cast("long").alias("_dm"))
            .first()
        )
        dm = int(dm_row["_dm"]) if dm_row["_dm"] is not None else 0
        # teleport + damped dangling share, folded driver-side in exact
        # integer arithmetic (matches the oracle's expression order)
        base = (((dd - dn) * 10**9) // dd + (dn * dm) // dd) // n
        ranks = (
            nodes.join(contrib, "node", "left_outer")
            .select(
                "node",
                F.expr(
                    f"CAST({base} AS BIGINT)"
                    f" + ({dn} * coalesce(_in, CAST(0 AS BIGINT))) DIV {dd}"
                ).alias("pr_fp9"),
            )
            .localCheckpoint()  # cut the per-pass lineage (see docstring)
        )
    return ranks


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    depth: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    info: dict | None = None,
    edges_deduped: bool = False,
) -> DataFrame:
    """Bounded-depth BFS over a directed edge list (symmetrize before
    calling for undirected semantics): returns ``(node, dist)`` with the
    MINIMUM hop count from any seed, for every node within ``depth``
    hops. Seeds appear at dist 0 even when isolated.

    Scale shape: per round ONE equi-join of the frontier against the
    src-partitioned edge list plus one anti-join against the visited
    set — cost is O(frontier-adjacent edges), never the whole graph.
    The visited table grows monotonically and is ``localCheckpoint``ed
    per round (same lineage-cut discipline as :func:`pagerank`; swap in
    ``checkpoint()`` on a real cluster). Min-distance needs no
    aggregation: a node enters `dist` the first round it is seen and
    the anti-join keeps later sightings out.

    Convergence early-exit: each round's frontier is already
    materialized (localCheckpoint), so counting it is a model-sized
    job; an empty frontier means every later round is a no-op and the
    loop stops — the bounded result IS the exact fixpoint whenever the
    graph is exhausted before ``depth``. Pass ``info={}`` to receive
    ``{"rounds_run": r, "converged": bool}``; ``rounds_run`` counts
    only the rounds that CHANGED state — the final round whose compute
    merely detected convergence (empty frontier) is excluded, so a
    graph exhausted on round 3 of ``depth=3`` reports
    ``rounds_run=2, converged=True``."""
    # ``edges_deduped=True``: the caller proves the list is distinct
    # (a deduped bucketed mirror, or a dedupe done on HALF the rows —
    # a bipartite plan can distinct one direction and mirror it) —
    # skips a redundant (src, dst) Exchange over 2|E| rows (r13 §2.4)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_deduped:
        e = e.distinct()
    e = e.localCheckpoint()  # rescanned every round
    dist = (
        seeds.select(F.col(node).alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("int").alias("dist"))
        .localCheckpoint()
    )
    frontier = dist.select("node")
    rounds_run, converged = 0, False
    for d in range(1, depth + 1):
        nxt = (
            frontier.withColumnRenamed("node", "src")
            .join(e, "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(d).cast("int").alias("dist"))
            .localCheckpoint()
        )
        # emptiness is the only question — limit-1 probe over the
        # already-materialized frontier instead of a full count (r13,
        # guide §5: one fewer full scan job per round)
        if nxt.isEmpty():
            converged = True
            break
        rounds_run = d
        # r12: the visited set is a UNION of per-round checkpointed
        # legs — re-checkpointing the union copied the whole O(V) table
        # every round (O(V·rounds) writes). The lazy union reads each
        # materialized leg directly; plan depth grows by one leg per
        # round, bounded by `depth`.
        dist = dist.unionByName(nxt)
        frontier = nxt.select("node")
    if info is not None:
        info["rounds_run"] = rounds_run
        info["converged"] = converged
    return dist


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    info: dict | None = None,
    edges_deduped: bool = False,
) -> DataFrame:
    """Synchronous label propagation over an UNDIRECTED edge list
    (pass (a,b) once; both directions are derived here): labels start
    as the node id, and each round every node adopts its neighbors'
    most frequent label (ties → smallest label). Deterministic by
    construction — no asynchronous update order to pin down — and
    bounded to ``iters`` rounds, which is how LPA is run in practice
    (it plateaus in a handful of rounds; fixed rounds also keep the
    unrolled oracle finite). Returns (node, community).

    Scale shape: per round one neighbor-label equi-join + one
    (node,label) count aggregate + one per-node arg-max — all
    hash-partitioned on node, no global window (the arg-max partitions
    by node). Label tables are ``localCheckpoint``ed per round (the
    pagerank/CC lineage discipline).

    Convergence early-exit (r13, guide §5 — fold the convergence count
    into the per-round materialization): each round's checkpointed
    label table carries a row-local ``_chg`` flag (new label != old,
    attached by a node-sized join INSIDE the checkpointed plan), so
    detecting the fixpoint is a limit-1 emptiness probe over the
    already-materialized table instead of a separate join + full-count
    job — one full job per round instead of two. Zero changes means
    sync-LPA — a deterministic function of the label table — has
    reached a fixpoint and every later round would reproduce it, so
    the loop stops with the trajectory intact. Pass ``info={}`` to
    receive ``{"rounds_run", "converged"}``; ``rounds_run`` counts only
    state-changing rounds — the round whose compute detected the
    fixpoint is excluded (converging on round 3 of ``iters=3`` reports
    ``rounds_run=2, converged=True``).

    ``edges_deduped=True``: the caller proves the CANONICAL edge list
    is distinct (e.g. the strong-tie table, src<dst distinct) — the two
    directed copies are then disjoint by construction and the union's
    distinct is a redundant Exchange, skipped."""
    und = edges.select(F.col(src).alias("s"), F.col(dst).alias("p")).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("p"))
    )
    if not edges_deduped:
        und = und.distinct()
    und = und.localCheckpoint()  # rescanned every round
    labels = (
        und.select(F.col("s").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("community"))
        .localCheckpoint()
    )
    w = W.partitionBy("node").orderBy(F.col("_c").desc(), F.col("community").asc())
    rounds_run, converged = 0, False
    for _ in range(iters):
        cnt = (
            und.join(labels.withColumnRenamed("node", "p"), "p")
            .groupBy(F.col("s").alias("node"), "community")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        # the changed-flag join runs INSIDE the checkpointed plan (both
        # sides node-sized, the old side already materialized), so the
        # round's one materialization job carries the convergence
        # signal; every node has >= 1 neighbor, so the inner join keeps
        # the full node set
        new_labels = (
            cnt.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "community")
            .join(labels.select("node", F.col("community").alias("_prev")), "node")
            .select(
                "node",
                "community",
                (F.col("community") != F.col("_prev")).alias("_chg"),
            )
            .localCheckpoint()
        )
        labels = new_labels.select("node", "community")
        if new_labels.filter("_chg").isEmpty():
            converged = True
            break
        rounds_run += 1
    if info is not None:
        info["rounds_run"] = rounds_run
        info["converged"] = converged
    return labels


def bounded_min_plus(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    cost: str = "cost",
    node: str = "node",
    info: dict | None = None,
) -> DataFrame:
    """Bounded-round Bellman-Ford: ``rounds`` synchronous min-plus
    relaxations of an integer-cost edge list from a seed set, returning
    (node, cost) with the cheapest known path using <= rounds hops.
    Integer costs keep every value exact — no float accumulation, so
    the unrolled oracle matches bit-for-bit.

    Scale shape: per round only the CHANGED frontier (rows whose cost
    improved in the previous round, seeds in round 1) joins the edge
    list, so the relax join touches frontier-adjacent edges only —
    re-relaxing a settled node u is provably a no-op (dist(v) already
    absorbed dist(u)+w the round u last changed, and dist only
    decreases), so skipping it preserves the exact per-round
    trajectory of full synchronous Bellman-Ford. One min aggregate
    over (old ∪ relaxed) per round; dist is node-sized and
    ``localCheckpoint``ed per round (the pagerank/CC lineage
    discipline). The weighted sibling of :func:`bfs_distances` — same
    iteration skeleton, min-plus semiring instead of first-discovery.

    Convergence early-exit: an empty frontier (no cost improved) is a
    fixpoint — the loop stops and the bounded result is exact. Pass
    ``info={}`` to receive ``{"rounds_run", "converged"}``;
    ``rounds_run`` counts only rounds that improved some cost — the
    convergence-detecting round itself is excluded."""
    e = (
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(cost).alias("w")
        )
        .localCheckpoint()
    )
    dist = (
        sources.select(F.col(node).alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("cost"))
        .localCheckpoint()
    )
    frontier = dist
    rounds_run, converged = 0, False
    for _ in range(rounds):
        relaxed = (
            frontier.withColumnRenamed("node", "src")
            .join(e, "src")
            .select(F.col("dst").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
        )
        # r12: ONE aggregate yields the new minimum AND the previous
        # cost (conditional min over the old-tagged rows — `dist` has
        # unique nodes, so min(old-only) == the old value), replacing
        # the former new_dist-join-dist frontier derivation: one
        # localCheckpoint per round instead of two, no per-round join.
        # Frontier semantics unchanged: improved == old is NULL (new
        # node) or new cost < old cost.
        merged = (
            dist.select("node", "cost", F.lit(1).alias("_old"))
            .unionByName(relaxed.select("node", "cost", F.lit(0).alias("_old")))
            .groupBy("node")
            .agg(
                F.min("cost").alias("cost"),
                F.min(F.when(F.col("_old") == 1, F.col("cost"))).alias("_oldcost"),
            )
            .localCheckpoint()
        )
        dist = merged.select("node", "cost")
        frontier = merged.filter(
            F.col("_oldcost").isNull() | (F.col("cost") < F.col("_oldcost"))
        ).select("node", "cost")
        if frontier.isEmpty():
            converged = True
            break
        rounds_run += 1
    if info is not None:
        info["rounds_run"] = rounds_run
        info["converged"] = converged
    return dist


def kcore_prune(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    info: dict | None = None,
    edges_canonical: bool = False,
) -> DataFrame:
    """Bounded-round k-core peeling of an undirected edge list
    (canonicalized here unless ``edges_canonical=True`` — the caller
    proves src<dst, distinct, no self-loops, skipping a redundant
    Exchange, r13 §2.4): ``rounds`` synchronous passes of "drop every
    node with degree < k, then drop edges touching dropped nodes".
    Returns the surviving (node, deg) — after enough rounds this IS
    the k-core; with a fixed round count it is the standard bounded
    approximation (run to fixpoint on a cluster; bounded rounds keep
    the unrolled oracle finite, and peeling converges fast in
    practice).

    Scale shape: per round one degree aggregate + two anti-joins
    (edge endpoints against the below-threshold nodes — the SMALL side
    of each round, broadcast once AQE sees its materialized size); the
    edge table shrinks monotonically and is ``localCheckpoint``ed per
    round.

    Convergence early-exit: an empty below-threshold set means no node
    fell below k, so peeling has reached its fixpoint — the bounded
    result IS the exact k-core, detected BEFORE any no-op edge-table
    rebuild. Pass
    ``info={}`` to receive ``{"rounds_run", "converged"}``;
    ``rounds_run`` counts only rounds that peeled at least one edge —
    the convergence-detecting round itself is excluded."""
    if edges_canonical:
        e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        e = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
    e = e.localCheckpoint()
    rounds_run, converged = 0, False
    for _ in range(rounds):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        # r12: peel by ANTI-joining the BELOW-threshold nodes instead of
        # semi-joining the survivors — identical edge set (keep edge iff
        # neither endpoint is below k), but the peel set is the small
        # side (AQE broadcasts it once materialized), and its emptiness
        # IS the fixpoint test: a below-k node has >= 1 incident edge,
        # so bad nonempty <=> some edge peels. Convergence is detected
        # BEFORE rebuilding the edge table, saving the former final
        # no-op e-materialization + two per-round counts.
        bad = deg.filter(F.col("deg") < k).select("node").localCheckpoint()
        if bad.isEmpty():
            converged = True
            break
        e = (
            e.join(bad.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(bad.withColumnRenamed("node", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint()
        )
        rounds_run += 1
    if info is not None:
        info["rounds_run"] = rounds_run
        info["converged"] = converged
    return (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .filter(F.col("deg") >= k)
    )
