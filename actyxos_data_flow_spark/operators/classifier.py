"""Distributed training of a quality/language classifier — full-batch
logistic regression by gradient descent, every pass one Spark job.

LLM data pipelines filter with small linear classifiers (the
fastText-style quality filter: seed labels + cheap features). Beyond
APPLYING such a model, an engine at 100 TB must TRAIN it distributed:
each gradient-descent pass here is one scan + a model-sized aggregate —
the corpus never shuffles; only the (n_features+1)-element gradient
crosses the driver between passes, exactly the kmeans_fit topology.

Determinism contract (the whole fit replays as unrolled SQL CTEs):

- features are 6dp-rounded ratios (deterministic single-op arithmetic);
- sigmoid rounds to 7dp (``exp`` ulp across engines — same convention
  as the ln-based scores elsewhere);
- per-doc gradient contributions quantize HALF_UP to 7dp fixed-point
  (floor(r·xj·1e7 + 0.5) — exact BIGINT from identical doubles on any
  engine; round(·,7) is NOT safe here: the items are exact ≤13dp
  decimals sitting on 7dp half-boundaries, where engines' round()
  implementations split) and sum as integers — order-free — then
  /1e7/N in doubles;
- weights update in plain IEEE doubles (w + lr·g, identical on both
  engines); no RNG anywhere (zero init).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LR = 1.0  # learning rate
GD_ITERS = 3  # full-batch passes

# feature names in vector order; x0 is the bias term
FEATURES = ("bias", "len_sat", "stop_ratio", "distinct_ratio", "wlen_scaled")


def feature_vector(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, y, x array<double>): 6dp-rounded quality features + English
    weak label (lang = 'en' — the seed-set stand-in). Zero-token docs
    are excluded (their ratios are undefined). One projection, no
    shuffle."""
    from .text import LANG_STOPWORDS, with_tokens

    t = with_tokens(docs, text_col).filter(F.size("tokens") > 0)  # drops NULL text
    n_tok = F.size("tokens").cast("double")
    en = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter("tokens", lambda x: F.array_contains(en, x))).cast("double")
    mean_wlen = (F.length(text_col).cast("double") - (n_tok - 1)) / n_tok
    x = F.array(
        F.lit(1.0),
        F.round(F.least(n_tok / F.lit(100.0), F.lit(1.0)), 6),
        F.round(stop_hits / n_tok, 6),
        F.round(F.size(F.array_distinct("tokens")).cast("double") / n_tok, 6),
        F.round(mean_wlen / F.lit(10.0), 6),
    )
    y = F.when(F.col("lang") == "en", 1.0).otherwise(0.0)
    return t.select(F.col(id_col), y.alias("y"), x.alias("x"))


def _sigmoid7(z: Column) -> Column:
    """σ(z) rounded to 7dp (absorbs exp() ulps — repo convention for
    ln/exp-derived scores). z arrives from :func:`_dot_w` already
    fixed-point-quantized, bit-identical across engines, so there is
    deliberately NO inner re-round: z is an integer multiple of 1e-9
    expressed as a double, and round(n/1e9, 9) sits ON a decimal
    boundary by construction — re-rounding it is the half-ulp hazard,
    not protection (bit at sf0.1: one doc's 5-term fold landed on
    ...205 exactly and the two engines' round() split it)."""
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 7)


def _dot_w(w: list[float]) -> Column:
    """w·x, EXACT across engines: each term quantizes HALF_UP to 9dp
    fixed-point — floor(xi·wi·1e9 + 0.5), identical doubles in,
    identical BIGINT out — the integer terms sum order-free, and one
    final /1e9 produces the same double on any engine. A plain double
    fold is association-sensitive: the engines' 5-term accumulation
    orders differ by an ulp, and a downstream round(z, 9) turns that
    ulp into a 1e-9 value split (observed at sf0.1). Same shape as the
    ANN kernels otherwise: plan size O(dot), model enters as one
    literal; |term|·1e9 ≲ 1e10 ≪ 2^53, so the floor is exact."""
    wl = F.from_json(F.lit(str(list(w))), "array<double>")
    terms = F.zip_with(
        F.col("x"),
        wl,
        lambda xi, wi: F.floor(xi * wi * F.lit(1e9) + F.lit(0.5)).cast("long"),
    )
    z9i = F.aggregate(terms, F.lit(0).cast("long"), lambda s, v: s + v)
    return z9i.cast("double") / F.lit(1e9)


def logreg_fit(
    feats: DataFrame, lr: float = LR, iters: int = GD_ITERS
) -> list[list[float]]:
    """Full-batch GD from zero init; returns the weight vector after
    each pass (``weights[i]`` = after pass i+1), so callers can expose
    the training trajectory. Each pass: one scan, p = σ(w·x) rounded
    7dp, per-feature gradient mean via posexplode + DECIMAL-exact sum
    (a model-sized aggregate — n_features×tasks partials, never the
    corpus), one driver-side w += lr·g."""
    n_feat = len(FEATURES)
    w = [0.0] * n_feat
    out: list[list[float]] = []
    for _ in range(iters):
        resid = feats.select(
            (F.col("y") - _sigmoid7(_dot_w(w))).alias("_r"), "x"
        )
        # per-item HALF_UP fixed-point at 7dp — floor((y−p)·xj·1e7+0.5)
        # — NOT round(·, 7): the items are products of 6dp features and
        # 7dp probabilities, i.e. exact ≤13dp decimals that land ON
        # 7dp half-boundaries systematically, where the engines' round()
        # implementations (exact-expansion HALF_UP vs multiply-and-
        # nearbyint) split for identical input doubles (observed at
        # sf0.1: two weight components off by 4e-11 after 3 passes).
        # floor of an identical double is exact on any engine; the
        # integer sum is order-free; /1e7/n replays identically.
        g = resid.select(F.posexplode("x").alias("j", "xj"), "_r").groupBy("j").agg(
            (
                F.sum(
                    F.floor(F.col("_r") * F.col("xj") * F.lit(1e7) + F.lit(0.5)).cast("long")
                ).cast("double")
                / F.lit(1e7)
                / F.count(F.lit(1))
            ).alias("g")
        )
        grad = {int(r["j"]): float(r["g"]) for r in g.collect()}
        w = [w[j] + lr * grad[j] for j in range(n_feat)]
        out.append(list(w))
    return out


def logreg_metrics(feats: DataFrame, w: list[float]) -> DataFrame:
    """Training metrics for one weight vector, in EXACT form: correct
    count at p ≥ 0.5 and per-true-class (count, 7dp-decimal sum of
    predicted probability) — one model-sized aggregate. Ratios
    (accuracy, mean p per class) are left to the reader as quotients of
    the exact columns: rounding a decimal-sum/count quotient to fixed
    dp is the half-ulp cross-engine hazard this repo bans, so the
    operator never emits one. Output: (n_docs, n_correct, n_pos,
    sum_p_pos, n_neg, sum_p_neg)."""
    p = _sigmoid7(_dot_w(w))
    scored = feats.select("y", p.alias("p"))
    correct = F.when(
        ((F.col("p") >= 0.5) & (F.col("y") == 1.0))
        | ((F.col("p") < 0.5) & (F.col("y") == 0.0)),
        1,
    ).otherwise(0)
    dec = lambda c: F.sum(F.expr(f"CAST(round({c}, 7) AS DECIMAL(20,7))"))  # noqa: E731
    return scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(correct).cast("long").alias("n_correct"),
        F.coalesce(F.sum(F.when(F.col("y") == 1.0, 1)), F.lit(0)).cast("long").alias("n_pos"),
        dec("CASE WHEN y = 1.0 THEN p END").alias("sum_p_pos"),
        F.coalesce(F.sum(F.when(F.col("y") == 0.0, 1)), F.lit(0)).cast("long").alias("n_neg"),
        dec("CASE WHEN y = 0.0 THEN p END").alias("sum_p_neg"),
    )


def logreg_calibration(feats: DataFrame, w: list[float], bins: int = 10) -> DataFrame:
    """Reliability diagram for one weight vector, in EXACT form:
    predictions bucketed into ``bins`` equal-width probability bins;
    per bin the count, the positive count, the 7dp-decimal sum of
    predicted probability, and the exact-decimal calibration-gap
    numerator |sum_p − n_pos| (per-bin ECE numerator ×n; divide by n
    for the gap). Means/fractions are quotients of the exact columns —
    never emitted pre-rounded (the half-ulp hazard). One scan + one
    |bins|-row aggregate, same shape as logreg_metrics. floor(p·bins)
    with a top clamp is the cross-engine binning convention (p is
    already rounded to 7dp, so both engines bin identical doubles)."""
    p = _sigmoid7(_dot_w(w))
    scored = feats.select("y", p.alias("p"))
    bin_id = F.least(F.floor(F.col("p") * bins).cast("int"), F.lit(bins - 1))
    dec = F.sum(F.expr("CAST(round(p, 7) AS DECIMAL(20,7))"))
    per = scored.groupBy(bin_id.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("int")).cast("long").alias("n_pos"),
        dec.alias("sum_p"),
    )
    return per.select(
        "bin", "n", "n_pos", "sum_p",
        F.abs(F.col("sum_p") - F.col("n_pos").cast("decimal(20,7)")).alias("gap_numer"),
    )
