"""Distributed training of a quality/language classifier — full-batch
logistic regression by gradient descent, every pass one Spark job.

LLM data pipelines filter with small linear classifiers (the
fastText-style quality filter: seed labels + cheap features). Beyond
APPLYING such a model, an engine at 100 TB must TRAIN it distributed:
each gradient-descent pass here is one scan + a model-sized aggregate —
the corpus never shuffles; only the (n_features+1)-element gradient
crosses the driver between passes, exactly the kmeans_fit topology.

Determinism contract — INTEGER FIXED-POINT END-TO-END (round 8):

Round 7 proved that ``round(double, k)`` inside a hashed column is not
portable across engine builds (the driver's libm/round split three
rows that matched locally at every scale factor). This module now
carries NO doubles anywhere a hashed value can see, except one
scan-verified sigmoid:

- features are 1e-6 fixed-point BIGINTs via integer division of exact
  integer numerators (``(stop_hits*1000000) DIV n_tok`` — truncation
  toward zero, which Spark ``DIV`` and DuckDB ``//`` both implement);
- weights are 1e-9 fixed-point BIGINTs (zero init, no RNG);
- z accumulates as Σ x_fp6·w_fp9 (exact BIGINT, ≤ 2.5e16 for 5 terms)
  then quantizes to the 1e-3 grid: ``z_mils = z15 DIV 10^12``;
- the ONLY transcendental is σ on that FINITE grid:
  ``p_fp7 = floor(1e7 / (1 + exp(-z_mils/1000)) + 0.5)``. An
  exhaustive scan of every grid point in [-19000, 19000] shows the
  minimum distance of the floor argument from an integer is 3.0e-6
  (tests/test_operators.py::test_sigmoid_grid_half_boundary_margin),
  ~1000× any cross-libm ulp drift; outside ±19 the argument sits
  0.444 from the nearest integer analytically (1e7·e^{-19} < 0.056),
  so the floor is engine-independent everywhere;
- per-doc gradient items are exact BIGINT products
  ``(y·10^7 − p_fp7)·x_fp6`` summed as DECIMAL(38,0)/HUGEINT, and the
  weight step is one integer truncating division per feature
  (driver-side Python, replayed by ``//`` in the oracle's CTEs).

No round(), no float quotient, no double fold — every hashed output of
the classifier family is a BIGINT.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LR = 1.0  # learning rate (must be exactly representable as a fraction)
GD_ITERS = 3  # full-batch passes

# feature names in vector order; x0 is the bias term
FEATURES = ("bias", "len_sat", "stop_ratio", "distinct_ratio", "wlen_scaled")

FP6 = 10**6  # feature scale
FP7 = 10**7  # probability scale
FP9 = 10**9  # weight scale
# z15 = Σ x_fp6·w_fp9 is in 1e-15 units; z_mils = z15 DIV Z15_TO_MILS
Z15_TO_MILS = 10**12
# |z_mils| ≤ this is scanned exhaustively for sigmoid half-boundary
# margin; beyond it σ saturates and the floor argument is provably
# ≥ 0.444 from any integer (see module docstring).
SIG_SCAN_MILS = 19_000


def _tdiv(n: int, d: int) -> int:
    """Integer division truncating toward zero — the shared semantics
    of Spark ``DIV`` and DuckDB ``//`` (Python ``//`` floors, which
    differs on negatives, hence this helper for driver-side steps)."""
    q = abs(n) // abs(d)
    return q if (n >= 0) == (d >= 0) else -q


def feature_vector(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, y, x array<long>): 1e-6 fixed-point quality features +
    English weak label (lang = 'en' — the seed-set stand-in). Every
    feature is an integer division of exact integer numerators — no
    doubles, no round(). Zero-token docs are excluded (their ratios
    are undefined). One projection, no shuffle."""
    from .text import LANG_STOPWORDS, with_tokens

    t = with_tokens(docs, text_col).filter(F.size("tokens") > 0)  # drops NULL text
    n_tok = F.size("tokens").cast("long")
    # total token chars = length(text) − (n_tok − 1) separators;
    # mean_wlen/10 in fp6 = chars·100000 DIV n_tok (all non-negative).
    # Spark's Column API has no DIV operator, so the integer-division
    # features are SQL expr fragments (the numerators are exact BIGINTs).
    x = F.array(
        F.lit(FP6).cast("long"),
        F.least(n_tok * F.lit(10_000), F.lit(FP6).cast("long")),
        F.expr(
            "(CAST(size(filter(tokens, t -> array_contains("
            + "array("
            + ",".join(repr(w) for w in LANG_STOPWORDS["en"])
            + "), t))) AS BIGINT) * 1000000) DIV CAST(size(tokens) AS BIGINT)"
        ),
        F.expr(
            "(CAST(size(array_distinct(tokens)) AS BIGINT) * 1000000)"
            " DIV CAST(size(tokens) AS BIGINT)"
        ),
        F.expr(
            f"((CAST(length({text_col}) AS BIGINT) - CAST(size(tokens) AS BIGINT) + 1)"
            " * 100000) DIV CAST(size(tokens) AS BIGINT)"
        ),
    )
    y = F.when(F.col("lang") == "en", 1).otherwise(0).cast("long")
    return t.select(F.col(id_col), y.alias("y"), x.alias("x"))


def _z_mils_sql(w_fp9: list[int], x_col: str = "x") -> str:
    """SQL fragment: z on the 1e-3 grid — exact BIGINT Σ x_fp6·w_fp9
    truncated by 10^12 via ``DIV`` (Spark) which matches DuckDB ``//``
    toward-zero truncation. True 64-bit integer arithmetic end-to-end
    (products can pass 2^53, so no double detour is allowed)."""
    wl = ", ".join(f"CAST({int(v)} AS BIGINT)" for v in w_fp9)
    z15 = (
        f"aggregate(zip_with({x_col}, array({wl}), (xi, wi) -> xi * wi), "
        "CAST(0 AS BIGINT), (s, v) -> s + v)"
    )
    return f"(({z15}) DIV {Z15_TO_MILS})"


def _p_fp7(w_fp9: list[int], x_col: str = "x") -> Column:
    """σ quantized to the 1e-7 grid over the FINITE z_mils grid:
    floor(1e7 / (1 + exp(-z_mils/1000)) + 0.5). The only libm call in
    the family; half-boundary margin scan-verified (module docstring).
    Formula text must match the oracle's exactly — one division, no
    1/(1+e) then multiply."""
    zm = _z_mils_sql(w_fp9, x_col)
    return F.expr(
        f"CAST(floor(1e7 / (1.0 + exp(-(CAST({zm} AS DOUBLE) / 1000.0))) + 0.5) AS BIGINT)"
    )


def sigmoid_fp7(z_mils: int) -> int:
    """Python replay of :func:`_p_fp7` for one grid point — used by
    tests and the margin scan."""
    import math

    return int(math.floor(1e7 / (1.0 + math.exp(-(z_mils / 1000.0))) + 0.5))


def logreg_fit(
    feats: DataFrame, lr: float = LR, iters: int = GD_ITERS
) -> list[list[int]]:
    """Full-batch GD from zero init; returns the fp9 weight vector
    after each pass (``weights[i]`` = after pass i+1), so callers can
    expose the training trajectory. Each pass: one scan, p_fp7 on the
    sigmoid grid, per-feature gradient item sums via posexplode +
    DECIMAL(38,0)-exact BIGINT sums (a model-sized aggregate —
    n_features partials, never the corpus), then one driver-side
    integer step per feature:
    Δw_fp9 = (lr_num·Σ items) tdiv (lr_den·N·10^4)
    (items are 1e-13 units; ·1e9/1e13 = /1e4)."""
    lrf = Fraction(str(lr))
    n_feat = len(FEATURES)
    w = [0] * n_feat
    out: list[list[int]] = []
    for _ in range(iters):
        resid = feats.select(
            ((F.col("y") * F.lit(FP7)) - _p_fp7(w)).alias("_r"), "x"
        )
        g = (
            resid.select(F.posexplode("x").alias("j", "xj"), "_r")
            .groupBy("j")
            .agg(
                F.sum((F.col("_r") * F.col("xj")).cast("decimal(38,0)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        rows = {int(r["j"]): (int(r["s"]), int(r["n"])) for r in g.collect()}
        w = [
            w[j]
            + _tdiv(
                lrf.numerator * rows[j][0],
                lrf.denominator * rows[j][1] * 10_000,
            )
            for j in range(n_feat)
        ]
        out.append(list(w))
    return out


def logreg_metrics(feats: DataFrame, w_fp9: list[int]) -> DataFrame:
    """Training metrics for one fp9 weight vector, in EXACT integer
    form: correct count at p_fp7 ≥ 5·10^6 (⇔ p ≥ 0.5) and
    per-true-class (count, BIGINT sum of p_fp7) — one model-sized
    aggregate. Ratios (accuracy, mean p per class) are left to the
    reader as quotients of the exact columns. Output: (n_docs,
    n_correct, n_pos, sum_p_pos_fp7, n_neg, sum_p_neg_fp7), all
    BIGINT."""
    p = _p_fp7(w_fp9)
    scored = feats.select("y", p.alias("p"))
    half = FP7 // 2
    correct = F.when(
        ((F.col("p") >= half) & (F.col("y") == 1))
        | ((F.col("p") < half) & (F.col("y") == 0)),
        1,
    ).otherwise(0)
    return scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(correct).cast("long").alias("n_correct"),
        F.coalesce(F.sum(F.when(F.col("y") == 1, 1)), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum(F.when(F.col("y") == 1, F.col("p"))), F.lit(0))
        .cast("long")
        .alias("sum_p_pos_fp7"),
        F.coalesce(F.sum(F.when(F.col("y") == 0, 1)), F.lit(0)).cast("long").alias("n_neg"),
        F.coalesce(F.sum(F.when(F.col("y") == 0, F.col("p"))), F.lit(0))
        .cast("long")
        .alias("sum_p_neg_fp7"),
    )


def logreg_calibration(feats: DataFrame, w_fp9: list[int], bins: int = 10) -> DataFrame:
    """Reliability diagram for one fp9 weight vector, in EXACT integer
    form: predictions bucketed into ``bins`` equal-width probability
    bins by pure integer division (bin = p_fp7 DIV (10^7/bins), top
    clamped); per bin the count, the positive count, the BIGINT sum of
    p_fp7, and the exact calibration-gap numerator
    |sum_p_fp7 − n_pos·10^7| (per-bin ECE numerator ×n×10^7). Means and
    fractions are reader quotients of exact columns. One scan + one
    |bins|-row aggregate, same shape as logreg_metrics."""
    assert FP7 % bins == 0, "bins must divide 10^7 for exact integer binning"
    p = _p_fp7(w_fp9)
    scored = feats.select("y", p.alias("p"))
    width = FP7 // bins
    # p ≥ 0 so DIV == floor division on both engines
    bin_id = F.least(F.expr(f"p DIV {width}").cast("int"), F.lit(bins - 1))
    per = scored.groupBy(bin_id.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y")).cast("long").alias("n_pos"),
        F.sum("p").cast("long").alias("sum_p_fp7"),
    )
    return per.select(
        "bin",
        "n",
        "n_pos",
        "sum_p_fp7",
        F.abs(F.col("sum_p_fp7") - F.col("n_pos") * F.lit(FP7)).alias("gap_numer_fp7"),
    )
