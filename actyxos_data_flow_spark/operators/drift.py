"""Corpus drift detection: Jensen–Shannon divergence between two
corpus slices' term distributions.

A continuously-ingesting training corpus needs a tripwire for
distribution shift — a new crawl source, a scraper regression, a
language mix change. The standard monitor is JSD between the standing
corpus's term distribution P and the new epoch's Q:

    JSD(P, Q) = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m),  m = (p+q)/2

(0 ≤ JSD ≤ ln 2; 0·ln 0 ≡ 0). Per-term contributions also rank WHICH
terms drive the drift — the actionable part of the alert.

Scale shape: two map-side-combined term-count aggregates + one
full-outer equi-join on term (vocabulary-sized, not corpus-sized);
totals are 1-row broadcasts; the report is a TakeOrdered top-k and a
1-row sum.

Determinism: counts are exact longs; probabilities are single IEEE
divisions; each term's contribution rounds to 7dp (ln ulp) and the
total sums those as DECIMAL(20,7) — the oracle replays bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def term_dist(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, cnt) over whitespace tokens of lower(text) — the same
    tokenizer as the retrieval index, so drift terms line up with
    postings."""
    from .retrieval import _tokens

    return (
        docs.select(F.explode(_tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def drift_contributions(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Per-term JSD contributions between two corpora:
    (term, p_base_fp6, p_delta_fp6, contrib) — contrib rounded to 7dp
    (libm ln, irrational — never ON a boundary), p columns as fp6
    integers ((cnt·10^6) DIV total: exact rationals through round()
    were the round-7 cross-engine hazard). Probabilities use each
    side's own total; absent terms contribute their ½·q·ln 2 (or
    ½·p·ln 2) mass."""
    b = base.select(F.col("term"), F.col("cnt").alias("_cb"))
    d = delta.select(F.col("term"), F.col("cnt").alias("_cd"))
    nb = b.agg(F.sum("_cb").alias("_nb"))
    nd = d.agg(F.sum("_cd").alias("_nd"))
    joined = (
        b.join(d, "term", "full_outer")
        .select("term", F.coalesce("_cb", F.lit(0)).alias("_cb"), F.coalesce("_cd", F.lit(0)).alias("_cd"))
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nd))
    )
    p = F.col("_cb").cast("double") / F.col("_nb")
    q = F.col("_cd").cast("double") / F.col("_nd")
    m = (p + q) / F.lit(2.0)
    term_p = F.when(F.col("_cb") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
    term_q = F.when(F.col("_cd") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    contrib = F.round(F.lit(0.5) * term_p + F.lit(0.5) * term_q, 7)
    return joined.select(
        "term",
        F.expr("(_cb * 1000000) DIV _nb").alias("p_base_fp6"),
        F.expr("(_cd * 1000000) DIV _nd").alias("p_delta_fp6"),
        contrib.alias("contrib"),
    )


def drift_report(base: DataFrame, delta: DataFrame, top: int = 10) -> tuple[DataFrame, DataFrame]:
    """Returns (total, top_terms): ``total`` is one row
    (jsd, n_terms) with the DECIMAL-exact contribution sum; ``top_terms``
    the ``top`` largest contributors (contrib desc, term asc — a
    TakeOrdered, rank attached post-limit)."""
    c = drift_contributions(base, delta)
    total = c.agg(
        F.round(
            F.sum(F.expr("CAST(round(contrib, 7) AS DECIMAL(20,7))")).cast("double"), 7
        ).alias("jsd"),
        F.count(F.lit(1)).alias("n_terms"),
    )
    lim = c.orderBy(F.col("contrib").desc(), F.col("term").asc()).limit(top)
    w = W.orderBy(F.col("contrib").desc(), F.col("term").asc())
    top_terms = lim.withColumn("rank", F.row_number().over(w))
    return total, top_terms
