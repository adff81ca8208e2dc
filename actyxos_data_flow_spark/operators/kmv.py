"""KMV (k-minimum-values) distinct sketch with SET ALGEBRA.

The fourth mergeable-sketch family beside CMS (frequency), HLL
(cardinality) and HDR (quantiles): a KMV sketch is the k smallest
distinct 60-bit hashes of a set — a k-row model that supports not just
|A| estimation but UNION and INTERSECTION cardinalities across sketches
(Beyer et al. 2007, "On synopses for distinct-value estimation under
multiset operations"; the same synopsis family as the theta sketch).

Everything is exact integer arithmetic over the engine-portable md5
hash (the stratified_sample idiom), so the DuckDB oracle replays the
sketch value-for-value — no RNG, no floats:

- estimator: with θ = the k-th minimum, est = (k−1)·2^60 DIV θ
  (if the set has fewer than k distinct hashes, the sketch IS the set
  and est = exact);
- union: KMV(A∪B) = k smallest of (sketch_A ∪ sketch_B) — closed under
  merge because any of the union's k minima is a minimum of its side;
- intersection: the union sketch is a k-point uniform sample of A∪B,
  so est(A∩B) = |{x ∈ KMV(A∪B) : x ∈ A ∧ x ∈ B}| · est(A∪B) DIV k
  (Jaccard times union).

Scale shape: per set, one distinct-hash projection and a k-row
TakeOrderedAndProject (tournament top-k, no global sort); all set
algebra runs on ≤ 2k-row models. The 3σ accuracy contract
(se ≈ 1/√(k−2)) is checked IN the output via a cross-multiplied
integer comparison — no sqrt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KMV_K = 256
KMV_SALT = "kmv:1"
_SPACE = 1 << 60


def kmv_hash(col: Column) -> Column:
    """60-bit salted md5 of the value — shared verbatim with the
    oracle (DuckDB: ('0x' || substr(md5('kmv:1:' || v), 1, 15))::BIGINT)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(KMV_SALT + ":"), col.cast("string")).cast("binary")),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def kmv_sketch(df: DataFrame, value_col: str, k: int = KMV_K) -> DataFrame:
    """The k smallest distinct hashes of ``value_col``: one column
    ``h``, ≤ k rows. Distinct-then-top-k plans as a hash aggregate
    feeding TakeOrderedAndProject — the sketch is the only thing that
    leaves the scan stage."""
    return (
        df.select(kmv_hash(F.col(value_col)).alias("h"))
        .distinct()
        .orderBy(F.col("h").asc())
        .limit(k)
    )


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """(n_sk, theta, est): est = (k−1)·2^60 DIV θ when the sketch is
    full, else the sketch size itself (the set fit entirely). The
    (k−1)·2^60 constant is folded as one integer literal and divided in
    DECIMAL so nothing approaches the 38-digit cap."""
    num = (KMV_K - 1) * _SPACE if k == KMV_K else (k - 1) * _SPACE
    return sketch.agg(
        F.count(F.lit(1)).alias("n_sk"), F.max("h").alias("theta")
    ).select(
        "n_sk",
        "theta",
        F.when(
            F.col("n_sk") < k, F.col("n_sk").cast("long")
        ).otherwise(
            F.expr(f"CAST(CAST({num} AS DECIMAL(25,0)) DIV theta AS BIGINT)")
        ).alias("est"),
    )
