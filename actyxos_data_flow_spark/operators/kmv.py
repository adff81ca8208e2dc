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
    num = (k - 1) * _SPACE
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


# -- priority sampling (weighted subset-sum synopsis) ------------------------

PRI_K = 256
PRI_SALT = "pri:1"
_H30 = 1 << 30


def priority_sample_estimates(
    df: DataFrame,
    group_col: str,
    weight_cents: Column,
    key_cols: list[str],
    k: int = PRI_K,
) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup 2007): ONE (k+1)-row
    weighted sample answers ANY subset-sum query over the weights —
    here grouped by ``group_col`` — with variance ≤ W_S·W/(k−1)
    (Szegedy 2006). Derandomized: the uniform is a salted 60-bit md5 of
    the row's content key, so the sample, threshold and estimates are
    engine-identical (identical duplicate rows are interchangeable
    under the total tie order, leaving the estimator unchanged).

    priority = (w · 2^30) DIV ((h >> 30) + 1)   — exact integers;
    τ = the (k+1)-th priority, or 0 when the population has ≤ k rows
    (the sample is then the population and every estimate is EXACT);
    estimate per sampled row = max(w, τ); the 3σ contract is checked in
    DECIMAL cross-multiplication ((est−exact)²·(k−1) ≤ 9·exact·W —
    DECIMAL(16) operands keep products ≤ 36 digits up to 10^16−1-cent
    totals).

    Scale shape: a projection computing (g, w, h, priority), ONE
    TakeOrderedAndProject of k+1 rows, model-sized estimator algebra,
    and the exact-answer aggregate it is audited against."""
    key = F.concat_ws(":", F.lit(PRI_SALT), *[F.col(c).cast("string") for c in key_cols])
    h = F.conv(F.substring(F.md5(key.cast("binary")), 1, 15), 16, 10).cast("long")
    # TWO-SCAN FLOOR, measured (round 12): the top-k branch and the
    # exact branch deliberately scan the source twice. They are NOT
    # symmetric scans — Catalyst prunes `h` out of the exact branch, so
    # only the top-k scan pays the per-row salted md5 (sf0.1 fresh-JVM
    # decomposition: md5 top-k scan 1.37s standalone, exact agg 0.40s,
    # full query ~2.0s ≈ the sum). Pinning the shared projection to
    # fuse them was measured WORSE (3.0s vs 2.0s cold min-of-3): the
    # cache write forces md5 materialization for the exact branch that
    # pruning had made free, and the columnar cache round-trip breaks
    # the whole-stage-codegen scan both branches otherwise enjoy. A
    # bounded per-group top-k aggregate (no such built-in) or a changed
    # hash function would be the only ways under one scan, and the md5
    # input is the cross-engine sample contract — so two scans IS the
    # floor for this operator.
    base = df.select(
        F.col(group_col).alias("g"),
        weight_cents.cast("long").alias("w"),
        h.alias("h"),
    ).withColumn("pri", F.expr(f"(w * {_H30}) DIV ((h >> 30) + 1)"))
    order = [F.col("pri").desc(), F.col("h").asc(), F.col("w").asc(), F.col("g").asc()]
    from .. import cache

    top = cache.pin(base.orderBy(*order).limit(k + 1))
    # tau is the (k+1)-th priority; when the population has <= k rows it
    # does not exist and tau = 0, making the sample the population and
    # every estimate EXACT (max(w, 0) = w) - the Duffield-Lund-Thorup
    # below-k degeneracy
    tau = top.agg(
        F.when(F.count(F.lit(1)) <= k, F.lit(0).cast("long"))
        .otherwise(F.min("pri"))
        .alias("tau")
    )
    sample = top.orderBy(*order).limit(k)
    est = (
        sample.crossJoin(F.broadcast(tau))
        .groupBy("g")
        .agg(
            F.sum(F.greatest(F.col("w"), F.col("tau"))).alias("est_w"),
            F.count(F.lit(1)).alias("n_in_sample"),
        )
    )
    # 64-bit envelope guard (the wordpiece _WP_C_MAX / dsir_model
    # assertion posture): w·2^30 silently wraps in non-ANSI long math
    # past w = 2^33 cents (~$86M/row) while the DuckDB oracle errors or
    # diverges. Round 10 guarded per-row with a CASE in the hot `pri`
    # projection — a measurable branch cost on every input row (the
    # r10 warm-drift finding); the check only needs max(w), so it now
    # rides the `exact` aggregate the estimator already pays for and is
    # evaluated once per GROUP (model-sized), covering every input row
    # because each belongs to some group and `exact` is the output's
    # left side.
    exact = base.groupBy("g").agg(F.sum("w").alias("exact_w"), F.max("w").alias("_mxw"))
    # grand total = sum of the per-group sums (exact integer identity):
    # derived from `exact`'s model-sized output instead of a third full
    # scan of base (the scan was ~1/3 of the query's warm cost)
    tot = exact.agg(F.sum("exact_w").alias("tot_w"))

    # The guard wraps EVERY numeric output column, not just exact_cents:
    # a consumer selecting only est_cents/n_in_sample would let Catalyst
    # prune an unguarded exact_cents and with it the fail-loud check
    # (ADVICE r11) — wrapped per-column it survives any projection that
    # reads a value. Cost is one CASE per model-sized output row per
    # column, nothing on the corpus scan.
    def _guard(value_sql: str, typ: str = "BIGINT") -> F.Column:
        return F.expr(
            f"CASE WHEN _mxw < {1 << 33} THEN {value_sql} "
            f"ELSE CAST(raise_error(concat('priority_sample: weight_cents ', "
            f"CAST(_mxw AS STRING), ' exceeds the 2^33 overflow envelope')) AS {typ}) END"
        )

    out = (
        exact.join(est, "g", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "g",
            _guard("exact_w").cast("long").alias("exact_cents"),
            _guard("coalesce(est_w, 0)").cast("long").alias("est_cents"),
            _guard("coalesce(n_in_sample, 0)").cast("long").alias("n_in_sample"),
            F.lit(k).cast("long").alias("k"),
            # DECIMAL(16) operands keep every product <= 36 digits while
            # admitting totals to 10^16-1 cents (~SF 500); beyond that,
            # widen or cross-multiply in HUGEINT-equivalent pieces
            _guard(
                f"(CAST(CAST(abs(coalesce(est_w, 0) - exact_w) AS DECIMAL(16,0)) *"
                f" CAST(abs(coalesce(est_w, 0) - exact_w) AS DECIMAL(16,0)) AS DECIMAL(33,0))"
                f" * {k - 1} <= CAST(9 AS DECIMAL(2,0)) * CAST(exact_w AS DECIMAL(16,0))"
                f" * CAST(tot_w AS DECIMAL(16,0)))",
                typ="BOOLEAN",
            ).alias("within_3se"),
        )
    )
    return out
