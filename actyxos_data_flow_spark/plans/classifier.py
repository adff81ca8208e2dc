"""Quality-classifier training queries: full-batch logistic regression
over ``documents`` (weak label: lang = 'en'), DuckDB oracles unroll the
gradient-descent passes as CTEs — the same replay strategy as the
k-means and PQ fits, extended to a model with a nonlinearity.

Round-8 numeric contract: INTEGER FIXED-POINT END-TO-END. The round-7
driver run proved ``round(double, k)`` in hashed columns splits across
engine builds (libm/round differences), so every hashed value here is
a BIGINT produced by exact integer arithmetic; the ONLY transcendental
is the sigmoid evaluated on the finite 1e-3 z-grid, where an
exhaustive scan shows the floor argument is ≥ 3.0e-6 from any integer
(~1000× cross-libm drift; see operators/classifier.py docstring and
tests/test_operators.py::test_sigmoid_grid_half_boundary_margin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cache
from ..operators import classifier as C
from ..operators.text import LANG_STOPWORDS
from ..sources import load_table
from . import register

_EN = list(LANG_STOPWORDS["en"])
_NF = len(C.FEATURES)

# σ on the 1e-3 grid, quantized to 1e-7 — shared formula text with
# operators/classifier.py::_p_fp7 (one division; scan-verified margin)
_SIG = (
    "CAST(floor(1e7 / (1.0 + exp(-(CAST({zm} AS DOUBLE) / 1000.0))) + 0.5) AS BIGINT)"
)


def _logreg_ctes(iters: int, lr: float) -> tuple[str, str]:
    """Unrolled GD as CTEs; returns (sql, final_weights_cte). Mirrors
    operators/classifier.py exactly: fp6 integer features (integer
    division of exact numerators), fp9 BIGINT weights from zero init,
    z_mils = (Σ x_fp6·w_fp9) // 10^12, p_fp7 on the sigmoid grid,
    gradient items (y·10^7 − p_fp7)·x_fp6 summed exactly (HUGEINT),
    and the integer step Δw_fp9 = (lr_num·Σ) // (lr_den·N·10^4) —
    DuckDB ``//`` and Spark ``DIV`` both truncate toward zero."""
    from fractions import Fraction

    lrf = Fraction(str(lr))
    sql = f"""
lrt AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks
        FROM documents WHERE text IS NOT NULL),
lrf AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END::BIGINT AS y,
         [1000000::BIGINT,
          least(len(toks)::BIGINT * 10000, 1000000::BIGINT),
          (len(list_filter(toks, t -> list_contains({_EN!r}, t)))::BIGINT
           * 1000000) // len(toks)::BIGINT,
          (len(list_distinct(toks))::BIGINT * 1000000) // len(toks)::BIGINT,
          ((length(text)::BIGINT - len(toks)::BIGINT + 1) * 100000)
           // len(toks)::BIGINT] AS x
  FROM lrt WHERE len(toks) > 0
),
lrx AS (SELECT doc_id, y, unnest(generate_series(0, {_NF - 1})) AS j,
               unnest(x)::BIGINT AS xj
        FROM lrf),
lrw0 AS (SELECT unnest(generate_series(0, {_NF - 1})) AS j, 0::BIGINT AS w)"""
    prev = "lrw0"
    zm = "(CAST(sum(x.xj * w.w) AS BIGINT) // 1000000000000)"
    for i in range(1, iters + 1):
        sql += f""",
lrz{i} AS (
  SELECT x.doc_id, x.y, {_SIG.format(zm=zm)} AS p
  FROM lrx x JOIN {prev} w ON x.j = w.j
  GROUP BY x.doc_id, x.y
),
lrg{i} AS (
  SELECT x.j,
         CAST((sum((z.y * 10000000 - z.p) * x.xj)::HUGEINT * {lrf.numerator})
              // (count(*)::HUGEINT * 10000 * {lrf.denominator}) AS BIGINT) AS dw
  FROM lrx x JOIN lrz{i} z ON x.doc_id = z.doc_id
  GROUP BY x.j
),
lrw{i} AS (SELECT w.j, w.w + g.dw AS w
           FROM {prev} w JOIN lrg{i} g ON w.j = g.j)"""
        prev = f"lrw{i}"
    return sql, prev


_LR_SQL_FIT, _LR_WFINAL = _logreg_ctes(C.GD_ITERS, C.LR)

# trajectory: weights after every pass (union of the unrolled lrw CTEs)
_FEAT_CASE = (
    "CASE "
    + " ".join(f"WHEN j = {k} THEN '{n}'" for k, n in enumerate(C.FEATURES))
    + " END"
)

QC_FIT_ORACLE = (
    "WITH "
    + _LR_SQL_FIT
    + ",\ntraj AS (\n"
    + "\n  UNION ALL\n".join(
        f"  SELECT {i} AS pass, j, w FROM lrw{i}" for i in range(1, C.GD_ITERS + 1)
    )
    + "\n)\n"
    + f"SELECT pass, {_FEAT_CASE} AS feature, CAST(w AS BIGINT) AS weight_fp9 FROM traj"
)


@register("quality_classifier_fit", oracle=QC_FIT_ORACLE)
def quality_classifier_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed full-batch logistic regression (3 GD passes, zero
    init, no RNG) on fp6 integer quality features with the lang='en'
    weak label. Output: the weight trajectory (pass, feature, fp9
    BIGINT weight). Each pass is one scan + a model-sized aggregate;
    only the gradient crosses the driver (kmeans_fit topology). The
    oracle unrolls the same passes as CTEs — integer math end-to-end,
    so the trajectory is bit-identical on any engine build."""
    docs = load_table(spark, sf_dir, "documents")
    feats = cache.pin(C.feature_vector(docs))
    traj = C.logreg_fit(feats)
    rows = [
        (p + 1, C.FEATURES[j], int(w[j]))
        for p, w in enumerate(traj)
        for j in range(_NF)
    ]
    return spark.createDataFrame(rows, "pass int, feature string, weight_fp9 long")


QC_METRICS_ORACLE = (
    "WITH "
    + _LR_SQL_FIT
    + f""",
lrp AS (
  SELECT x.doc_id, x.y,
         {_SIG.format(zm="(CAST(sum(x.xj * w.w) AS BIGINT) // 1000000000000)")} AS p
  FROM lrx x JOIN {_LR_WFINAL} w ON x.j = w.j
  GROUP BY x.doc_id, x.y
)
SELECT count(*) AS n_docs,
       CAST(sum(CASE WHEN (p >= 5000000 AND y = 1) OR (p < 5000000 AND y = 0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(coalesce(sum(CASE WHEN y = 1 THEN 1 END), 0) AS BIGINT) AS n_pos,
       CAST(coalesce(sum(CASE WHEN y = 1 THEN p END), 0) AS BIGINT) AS sum_p_pos_fp7,
       CAST(coalesce(sum(CASE WHEN y = 0 THEN 1 END), 0) AS BIGINT) AS n_neg,
       CAST(coalesce(sum(CASE WHEN y = 0 THEN p END), 0) AS BIGINT) AS sum_p_neg_fp7
FROM lrp
"""
)


@register("quality_classifier_metrics", oracle=QC_METRICS_ORACLE)
def quality_classifier_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training metrics of the fitted classifier: accuracy at
    p_fp7 ≥ 5·10^6 (⇔ p ≥ 0.5 ⇔ z ≥ 0) and per-class exact BIGINT sums
    of p_fp7 (means are reader quotients). On THIS corpus the numbers
    honestly show ~chance separation (sum_p_pos_fp7/n_pos ≈
    sum_p_neg_fp7/n_neg): the synthetic documents' text is identically
    distributed across lang labels, so there is no signal to learn —
    the queries prove the distributed fit and its oracle replay;
    tests/test_operators.py (test_logreg_learns_separable_labels)
    proves the same trainer reaches high accuracy when the label IS
    learnable. Every hashed column is a BIGINT from integer math."""
    docs = load_table(spark, sf_dir, "documents")
    feats = cache.pin(C.feature_vector(docs))
    w = C.logreg_fit(feats)[-1]
    return C.logreg_metrics(feats, w)


QC_CAL_BINS = 10

QC_CALIBRATION_ORACLE = (
    "WITH "
    + _LR_SQL_FIT
    + f""",
lrp AS (
  SELECT x.doc_id, x.y,
         {_SIG.format(zm="(CAST(sum(x.xj * w.w) AS BIGINT) // 1000000000000)")} AS p
  FROM lrx x JOIN {_LR_WFINAL} w ON x.j = w.j
  GROUP BY x.doc_id, x.y
),
cbin AS (
  SELECT least(CAST(p // {10**7 // QC_CAL_BINS} AS INTEGER), {QC_CAL_BINS - 1}) AS bin,
         y, p
  FROM lrp
),
cagg AS (
  SELECT bin, count(*) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(p) AS BIGINT) AS sum_p_fp7
  FROM cbin GROUP BY bin
)
SELECT bin, CAST(n AS BIGINT) AS n, n_pos, sum_p_fp7,
       abs(sum_p_fp7 - n_pos * 10000000) AS gap_numer_fp7
FROM cagg
"""
)


@register("quality_classifier_calibration", oracle=QC_CALIBRATION_ORACLE)
def quality_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the fitted classifier: 10 equal-width
    probability bins assigned by pure integer division of p_fp7, each
    with its exact BIGINT sum of p_fp7, the observed positive count,
    and the integer gap numerator |sum_p_fp7 − n_pos·10^7| (the ECE
    numerator ×n×10^7) — the go/no-go artifact before a trained
    quality filter is allowed to gate a corpus. Same one-scan +
    |bins|-row-aggregate shape as the metrics row; the oracle replays
    binning and the BIGINT sums over the unrolled-GD predictions."""
    docs = load_table(spark, sf_dir, "documents")
    feats = cache.pin(C.feature_vector(docs))
    w = C.logreg_fit(feats)[-1]
    return C.logreg_calibration(feats, w, bins=QC_CAL_BINS)
