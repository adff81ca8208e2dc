"""Similarity-search queries over the ``embeddings`` table.

Oracle strategy: DuckDB computes the identical cosine via parallel
unnest (values promoted float→double, products exact, sums in array
order — verified bit-identical to Spark's ``aggregate`` fold). Final
scores are rounded to 6 decimals on both sides *after* ranking, and
ranking tie-breaks on vec_id, so the compared output is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..sources import load_table
from . import register

K = 10
N_QUERIES = 10  # vec_id < 10 are the query vectors

_COS_CTE = f"""
e AS (SELECT vec_id, embedding, label FROM embeddings),
q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlabel FROM e WHERE vec_id < {N_QUERIES}),
"""

_SCORE = """
u AS (SELECT qid, vec_id, unnest(qe)::DOUBLE a, unnest(embedding)::DOUBLE b FROM p),
s AS (SELECT qid, vec_id, sum(a*b) AS dot, sqrt(sum(a*a)) AS na, sqrt(sum(b*b)) AS nb
      FROM u GROUP BY 1, 2),
scored AS (SELECT qid, vec_id, dot/(na*nb) AS cosine FROM s),
ranked AS (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT qid, vec_id, rank, round(cosine, 6) AS cosine FROM ranked WHERE rank <= {k}
"""

ANN_BRUTE_ORACLE = "WITH " + _COS_CTE + "p AS (SELECT qid, vec_id, qe, embedding FROM q, e),\n" + _SCORE.format(k=K)


@register("ann_cosine_topk", oracle=ANN_BRUTE_ORACLE, bench=True)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k (the recall=1 baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return S.cosine_topk(queries, emb.select("vec_id", "embedding"), k=K)


ANN_IVF_ORACLE = (
    "WITH "
    + _COS_CTE
    + "p AS (SELECT qid, vec_id, qe, embedding FROM q JOIN e ON e.label = q.qlabel),\n"
    + _SCORE.format(k=K)
)


@register("ann_ivf_topk", oracle=ANN_IVF_ORACLE, bench=True)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned top-k (nprobe=1 over the pretrained ``label`` coarse
    assignment) — the ANN scale path; equi-join instead of cross join."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), F.col("label")
    )
    return S.ivf_topk(queries, emb.select("vec_id", "embedding", "label"), k=K)


# -- embedding-cosine near-duplicate pairs (dedup by embedding) ------------

NEAR_DUP_THRESHOLD = 0.95

EMB_NEARDUP_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
),
u AS (SELECT id_a, id_b, unnest(ea)::DOUBLE x, unnest(eb)::DOUBLE y FROM p),
s AS (SELECT id_a, id_b, sum(x*y) AS dot, sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
      FROM u GROUP BY 1, 2)
SELECT id_a, id_b, round(dot/(na*nb), 6) AS cosine
FROM s WHERE dot/(na*nb) >= {NEAR_DUP_THRESHOLD}
"""


@register("dedup_embedding_cosine", oracle=EMB_NEARDUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by the coarse partition
    (same-label pairs only — LSH-bucketed blocking at scale; exhaustive
    within the block)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"), "label")
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"), "label")
    pairs = a.join(b, on="label").filter(F.col("id_a") < F.col("id_b"))
    cos = S._dot(F.col("ea"), F.col("eb")) / (S._norm(F.col("ea")) * S._norm(F.col("eb")))
    return (
        pairs.select("id_a", "id_b", cos.alias("_c"))
        .filter(F.col("_c") >= NEAR_DUP_THRESHOLD)
        .select("id_a", "id_b", F.round("_c", 6).alias("cosine"))
    )
