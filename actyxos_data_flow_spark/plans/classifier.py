"""Quality-classifier training queries: full-batch logistic regression
over ``documents`` (weak label: lang = 'en'), DuckDB oracles unroll the
gradient-descent passes as CTEs — the same replay strategy as the
k-means and PQ fits, extended to a model with a nonlinearity.
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


def _logreg_ctes(iters: int, lr: float) -> tuple[str, str]:
    """Unrolled GD as CTEs; returns (sql, final_weights_cte). Mirrors
    operators/classifier.py: 6dp features, z = Σ floor(xj·wj·1e9+0.5)
    / 1e9 (exact fixed-point dot — order-free integer sum),
    σ(z) rounded 7dp,
    gradient items floor((y−p)·xj·1e7+0.5) summed as BIGINT, /1e7/N,
    w += lr·g in
    plain doubles from zero init."""
    sql = f"""
lrt AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks
        FROM documents WHERE text IS NOT NULL),
lrf AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         [1.0,
          round(least(len(toks)::DOUBLE / 100.0, 1.0), 6),
          round(len(list_filter(toks, t -> list_contains({_EN!r}, t)))::DOUBLE
                / len(toks), 6),
          round(len(list_distinct(toks))::DOUBLE / len(toks), 6),
          round(((length(text)::DOUBLE - (len(toks)::DOUBLE - 1)) / len(toks))
                / 10.0, 6)] AS x
  FROM lrt
),
lrx AS (SELECT doc_id, y, unnest(generate_series(0, {_NF - 1})) AS j,
               unnest(x)::DOUBLE AS xj
        FROM lrf),
lrw0 AS (SELECT unnest(generate_series(0, {_NF - 1})) AS j, 0.0 AS w)"""
    prev = "lrw0"
    for i in range(1, iters + 1):
        sql += f""",
lrz{i} AS (
  SELECT x.doc_id, x.y,
         round(1.0 / (1.0 + exp(-(CAST(sum(CAST(floor(x.xj * w.w * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / 1e9))), 7) AS p
  FROM lrx x JOIN {prev} w ON x.j = w.j
  GROUP BY x.doc_id, x.y
),
lrg{i} AS (
  SELECT x.j,
         CAST(sum(CAST(floor((z.y - z.p) * x.xj * 1e7 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1e7 / count(*) AS g
  FROM lrx x JOIN lrz{i} z ON x.doc_id = z.doc_id
  GROUP BY x.j
),
lrw{i} AS (SELECT w.j, w.w + {lr!r} * g.g AS w
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
    + f"SELECT pass, {_FEAT_CASE} AS feature, round(w, 6) AS weight FROM traj"
)


@register("quality_classifier_fit", oracle=QC_FIT_ORACLE)
def quality_classifier_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed full-batch logistic regression (3 GD passes, zero
    init, no RNG) on 6dp quality features with the lang='en' weak
    label. Output: the weight trajectory (pass, feature, weight@6dp).
    Each pass is one scan + a model-sized aggregate; only the gradient
    crosses the driver (kmeans_fit topology). The oracle unrolls the
    same passes as CTEs."""
    docs = load_table(spark, sf_dir, "documents")
    feats = cache.pin(C.feature_vector(docs))
    traj = C.logreg_fit(feats)
    rows = [
        (p + 1, C.FEATURES[j], round(w[j], 6))
        for p, w in enumerate(traj)
        for j in range(_NF)
    ]
    return spark.createDataFrame(rows, "pass int, feature string, weight double")


QC_METRICS_ORACLE = (
    "WITH "
    + _LR_SQL_FIT
    + f""",
lrp AS (
  SELECT x.doc_id, x.y,
         round(1.0 / (1.0 + exp(-(CAST(sum(CAST(floor(x.xj * w.w * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / 1e9))), 7) AS p
  FROM lrx x JOIN {_LR_WFINAL} w ON x.j = w.j
  GROUP BY x.doc_id, x.y
)
SELECT count(*) AS n_docs,
       CAST(sum(CASE WHEN (p >= 0.5 AND y = 1.0) OR (p < 0.5 AND y = 0.0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(coalesce(sum(CASE WHEN y = 1.0 THEN 1 END), 0) AS BIGINT) AS n_pos,
       sum(CASE WHEN y = 1.0 THEN CAST(round(p, 7) AS DECIMAL(20,7)) END) AS sum_p_pos,
       CAST(coalesce(sum(CASE WHEN y = 0.0 THEN 1 END), 0) AS BIGINT) AS n_neg,
       sum(CASE WHEN y = 0.0 THEN CAST(round(p, 7) AS DECIMAL(20,7)) END) AS sum_p_neg
FROM lrp
"""
)


@register("quality_classifier_metrics", oracle=QC_METRICS_ORACLE)
def quality_classifier_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training metrics of the fitted classifier: accuracy at p ≥ 0.5
    and per-class mean predicted probability. On THIS corpus the
    numbers honestly show ~chance separation (sum_p_pos/n_pos ≈
    sum_p_neg/n_neg):
    the synthetic documents' text is identically distributed across
    lang labels, so there is no signal to learn — the queries prove the
    distributed fit and its oracle replay; tests/test_operators.py
    (test_logreg_learns_separable_labels) proves the same trainer
    reaches high accuracy when the label IS learnable."""
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
         round(1.0 / (1.0 + exp(-(CAST(sum(CAST(floor(x.xj * w.w * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / 1e9))), 7) AS p
  FROM lrx x JOIN {_LR_WFINAL} w ON x.j = w.j
  GROUP BY x.doc_id, x.y
),
cbin AS (
  SELECT least(CAST(floor(p * {QC_CAL_BINS}) AS INTEGER), {QC_CAL_BINS - 1}) AS bin, y, p
  FROM lrp
),
cagg AS (
  SELECT bin, count(*) AS n,
         CAST(sum(CAST(y AS INTEGER)) AS BIGINT) AS n_pos,
         sum(CAST(round(p, 7) AS DECIMAL(20,7))) AS sum_p
  FROM cbin GROUP BY bin
)
SELECT bin, CAST(n AS BIGINT) AS n, n_pos, sum_p,
       abs(sum_p - CAST(n_pos AS DECIMAL(20,7))) AS gap_numer
FROM cagg
"""
)


@register("quality_classifier_calibration", oracle=QC_CALIBRATION_ORACLE)
def quality_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the fitted classifier: 10 equal-width
    probability bins, each with its decimal-exact mean prediction, the
    observed positive rate, and their gap (the ECE numerator) — the
    go/no-go artifact before a trained quality filter is allowed to
    gate a corpus. Same one-scan + |bins|-row-aggregate shape as the
    metrics row; the oracle replays binning and the decimal means over
    the unrolled-GD predictions."""
    docs = load_table(spark, sf_dir, "documents")
    feats = cache.pin(C.feature_vector(docs))
    w = C.logreg_fit(feats)[-1]
    return C.logreg_calibration(feats, w, bins=QC_CAL_BINS)
