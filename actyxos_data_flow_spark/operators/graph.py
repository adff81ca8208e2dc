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
from pyspark.sql import functions as F

DAMPING = 0.85
PR_ITERS = 3


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    damping: float = DAMPING,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list (duplicate edges count once —
    deduped up front). Returns (node, pr) for every node appearing as
    src or dst, ranks rounded to 9dp.

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
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()  # edge list + everything derived below is
        # reused every pass; materialize once
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()  # reused every pass (base join) + final
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # N and the per-pass dangling mass are MODEL-SIZED scalars — collect
    # them (1-row jobs) and fold as literals instead of broadcast-
    # joining two 1-row frames per pass: same IEEE arithmetic (the
    # scalar ops below mirror the oracle's expression order exactly),
    # three fewer plan trees per iteration.
    n = nodes.count()

    # pr_0 = 1/N for every node
    ranks = nodes.select("node", F.round(F.lit(1.0 / n), 9).alias("pr"))
    dec = "CAST(round(pr / deg, 9) AS DECIMAL(28,9))"
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"), F.expr(dec).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").cast("double").alias("_in"))
        )
        # dangling mass: rank held by nodes with no out-edges
        dm_row = (
            ranks.join(outdeg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(
                F.sum(F.expr("CAST(round(pr, 9) AS DECIMAL(28,9))"))
                .cast("double")
                .alias("_dm")
            )
            .first()
        )
        dm = float(dm_row["_dm"]) if dm_row["_dm"] is not None else 0.0
        base = ((1.0 - damping) + damping * dm) / n  # matches oracle op order
        ranks = (
            nodes.join(contrib, "node", "left_outer")
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0)),
                    9,
                ).alias("pr"),
            )
            .localCheckpoint()  # cut the per-pass lineage (see docstring)
        )
    return ranks
