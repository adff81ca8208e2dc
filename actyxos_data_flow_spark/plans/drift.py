"""Corpus-drift queries: JSD between the standing corpus (doc_id % 5
!= 0) and the "new epoch" slice (doc_id % 5 == 0 — the same DELTA_MOD
convention as the incremental-LSH queries), DuckDB oracle replaying
the divergence with identical rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import drift as DR
from ..sources import load_table
from . import register

DRIFT_MOD = 5
DRIFT_TOP = 10

_DRIFT_CTE = f"""
dtok AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split(lower(coalesce(text, '')), ' ')) AS t
    FROM documents
  ) WHERE t <> ''
),
db AS (SELECT term, count(*) AS cb FROM dtok WHERE doc_id % {DRIFT_MOD} <> 0 GROUP BY 1),
dd AS (SELECT term, count(*) AS cd FROM dtok WHERE doc_id % {DRIFT_MOD} = 0 GROUP BY 1),
dn AS (SELECT (SELECT sum(cb) FROM db) AS nb, (SELECT sum(cd) FROM dd) AS nd),
dj AS (
  SELECT coalesce(b.term, d.term) AS term,
         coalesce(b.cb, 0) AS cb, coalesce(d.cd, 0) AS cd
  FROM db b FULL OUTER JOIN dd d ON b.term = d.term
),
dc AS (
  SELECT term,
         (cb * 1000000) // CAST(dn.nb AS BIGINT) AS p_base_fp6,
         (cd * 1000000) // CAST(dn.nd AS BIGINT) AS p_delta_fp6,
         round(0.5 * (CASE WHEN cb > 0
                 THEN (cb::DOUBLE / dn.nb) * ln((cb::DOUBLE / dn.nb)
                      / (((cb::DOUBLE / dn.nb) + (cd::DOUBLE / dn.nd)) / 2.0))
                 ELSE 0.0 END)
             + 0.5 * (CASE WHEN cd > 0
                 THEN (cd::DOUBLE / dn.nd) * ln((cd::DOUBLE / dn.nd)
                      / (((cb::DOUBLE / dn.nb) + (cd::DOUBLE / dn.nd)) / 2.0))
                 ELSE 0.0 END), 7) AS contrib
  FROM dj, dn
)
"""

DRIFT_JSD_ORACLE = (
    "WITH "
    + _DRIFT_CTE
    + """
SELECT round(CAST(sum(CAST(round(contrib, 7) AS DECIMAL(20,7))) AS DOUBLE), 7) AS jsd,
       count(*) AS n_terms
FROM dc
"""
)


@register("corpus_drift_jsd", oracle=DRIFT_JSD_ORACLE)
def corpus_drift_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total Jensen–Shannon divergence between the standing corpus and
    the new-epoch slice — the drift tripwire (0 = identical mixes,
    ln 2 = disjoint). Two map-side-combined term counts + one
    vocabulary-sized full-outer join; the DECIMAL-exact contribution
    sum is the hashed result."""
    docs = load_table(spark, sf_dir, "documents")
    base = DR.term_dist(docs.filter(F.col("doc_id") % DRIFT_MOD != 0))
    delta = DR.term_dist(docs.filter(F.col("doc_id") % DRIFT_MOD == 0))
    total, _ = DR.drift_report(base, delta, top=DRIFT_TOP)
    return total


DRIFT_TERMS_ORACLE = (
    "WITH "
    + _DRIFT_CTE
    + f""",
dr AS (
  SELECT term, p_base_fp6, p_delta_fp6, contrib,
         row_number() OVER (ORDER BY contrib DESC, term ASC) AS rank
  FROM dc
)
SELECT term, p_base_fp6, p_delta_fp6, contrib, rank FROM dr WHERE rank <= {DRIFT_TOP}
"""
)


@register("corpus_drift_terms", oracle=DRIFT_TERMS_ORACLE)
def corpus_drift_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable half of the drift alert: the top-10 terms driving
    the divergence (per-term JSD contributions, 7dp), with each side's
    fp6 integer probability — 'which tokens does the new epoch over/under-use'.
    TakeOrdered top-k; rank attached post-limit."""
    docs = load_table(spark, sf_dir, "documents")
    base = DR.term_dist(docs.filter(F.col("doc_id") % DRIFT_MOD != 0))
    delta = DR.term_dist(docs.filter(F.col("doc_id") % DRIFT_MOD == 0))
    _, top = DR.drift_report(base, delta, top=DRIFT_TOP)
    return top
