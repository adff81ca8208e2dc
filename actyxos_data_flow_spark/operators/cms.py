"""Count-min sketch: sub-linear frequency estimation for corpus-scale
token/term counting.

At 100 TB the exact (term, count) table is itself huge; a count-min
sketch compresses it to a fixed d×w counter grid (here 4×64 longs = 2
KB) that answers point-frequency queries with one-sided error: the
estimate NEVER undershoots, and overshoots by at most εN with
probability 1−δ (ε = e/w, δ = e^−d). The build is ONE pass — explode
tokens, project the d bucket ids per token (seeded md5, the same
Kirsch-Mitzenmacher double-hash family as the MinHash path), and
hash-aggregate into (row, bucket) partial counts — a model-sized
shuffle (d×w cells per task), never a vocabulary-sized one.

Determinism: bucket = (p1 + row·p2) mod w with p1/p2 the two 60-bit
md5 pieces (exact longs on both engines), so a DuckDB oracle rebuilds
the sketch cell-for-cell and the estimates hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_D = 4  # hash rows
CMS_W = 64  # buckets per row


def _md5_piece(col, start: int):
    """60-bit unsigned long from 15 hex chars of md5 (shared convention
    with operators/dedup.py — exact in Spark conv() and DuckDB
    ('0x'||h)::BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), start, 15), 16, 10).cast("long")


def cms_build(
    items: DataFrame, item_col: str = "term", weight_col: str | None = None,
    d: int = CMS_D, w: int = CMS_W,
) -> DataFrame:
    """Build the sketch over one item per row (pre-exploded; pass
    ``weight_col`` to add counts in bulk, e.g. pre-aggregated tf).
    Returns the (row, bucket, c) counter table — d×w cells, the model.

    One explode of the d rows per item + one hash aggregate; partial
    (map-side) combine means the shuffle carries at most d×w cells per
    task regardless of corpus size."""
    p1 = _md5_piece(F.col(item_col), 1)
    p2 = _md5_piece(F.col(item_col), 17)
    wcol = F.col(weight_col) if weight_col else F.lit(1)
    rows = items.select(
        F.posexplode(
            F.array(*[F.pmod(p1 + F.lit(r) * p2, F.lit(w)) for r in range(d)])
        ).alias("row", "bucket"),
        wcol.alias("_w"),
    )
    return rows.groupBy("row", "bucket").agg(F.sum("_w").alias("c"))


def cms_join_estimate(
    sketch_a: DataFrame, sketch_b: DataFrame, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches:
    |A ⋈ B| ≈ min over the d hash rows of Σ_bucket aᵣᵦ·bᵣᵦ (the
    AMS/CMS inner-product estimator — Cormode & Muthukrishnan '05).
    One-sided like the point estimate: NEVER undershoots the true join
    size (every colliding pair only adds mass). All-integer arithmetic
    (products sum in DECIMAL for 100 TB headroom), so a SQL oracle
    reproduces it exactly. Both sketches are d×w rows — the whole
    estimate is a model-sized join, no data is touched. Output: one
    row (est_pairs)."""
    a = sketch_a.select("row", "bucket", F.col("c").alias("ca"))
    b = sketch_b.select("row", "bucket", F.col("c").alias("cb"))
    per_row = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(
            F.sum(
                F.col("ca").cast("decimal(19,0)") * F.col("cb").cast("decimal(19,0)")
            ).alias("_ip")
        )
    )
    return per_row.agg(F.min("_ip").cast("long").alias("est_pairs"))


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, item_col: str = "term",
    d: int = CMS_D, w: int = CMS_W,
) -> DataFrame:
    """Point-frequency estimates for ``candidates``: min over the d
    counters each item hashes to. The sketch is d×w rows — broadcast;
    per candidate the probe is d equi-join hits + a min aggregate.
    Output: (item, est)."""
    p1 = _md5_piece(F.col(item_col), 1)
    p2 = _md5_piece(F.col(item_col), 17)
    probes = candidates.select(
        item_col,
        F.posexplode(
            F.array(*[F.pmod(p1 + F.lit(r) * p2, F.lit(w)) for r in range(d)])
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(item_col)
        .agg(F.min("c").alias("est"))
    )
