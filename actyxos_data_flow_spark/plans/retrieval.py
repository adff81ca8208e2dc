"""Inverted-index retrieval queries (postings stats + BM25 search) over
the ``documents`` table, each with a DuckDB oracle that rebuilds the
index and replays the scoring with the same rounding/decimal-sum
contract (see operators/retrieval.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import retrieval as R
from ..sources import load_table
from . import register

TOP_TERMS = 20
BM25_K = 10
BM25_TERMS = ("vector", "hash", "merge", "scan")

# shared tokenize/postings CTEs — tokenizer identical to the Spark side:
# lower, split on one space, drop empties, NULL text -> zero tokens
_IDX_CTE = """
itok AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split(lower(coalesce(text, '')), ' ')) AS t
    FROM documents
  ) WHERE t <> ''
),
ipost AS (SELECT term, doc_id, count(*) AS tf FROM itok GROUP BY 1, 2),
idl AS (
  SELECT doc_id,
         len(list_filter(string_split(lower(coalesce(text, '')), ' '), t -> t <> '')) AS dl
  FROM documents
),
"""

POSTINGS_STATS_ORACLE = (
    "WITH "
    + _IDX_CTE
    + f"""
inn AS (SELECT count(*) AS n FROM documents),
ipt AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf FROM ipost GROUP BY 1),
ir AS (
  SELECT term, df, cf,
         round(ln((inn.n - df + 0.5) / (df + 0.5) + 1), 6) AS idf,
         row_number() OVER (ORDER BY df DESC, term ASC) AS rank
  FROM ipt, inn
)
SELECT term, df, cf, idf, rank FROM ir WHERE rank <= {TOP_TERMS}
"""
)


@register("index_postings_stats", oracle=POSTINGS_STATS_ORACLE)
def index_postings_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build + health report: top-20 terms by document
    frequency with df, collection frequency, and 6dp BM25 idf. The
    postings aggregate is the one corpus-sized stage (map-side combined
    explode + hash agg); everything after is vocabulary-sized."""
    docs = load_table(spark, sf_dir, "documents")
    return R.postings_stats(docs, top=TOP_TERMS)


_K1 = R.BM25_K1
_B = R.BM25_B

# CTE chain ending in `br` (every term-matching doc BM25-scored and
# ranked) — shared by the plain top-k row and the RRF fusion row
_BM25_CTE = f"""
bqt AS (SELECT unnest({list(BM25_TERMS)!r}) AS term),
bqp AS (SELECT p.term, p.doc_id, p.tf FROM ipost p JOIN bqt USING (term)),
bst AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT sum(dl) FROM idl) AS sumdl),
bdf AS (SELECT term, count(*) AS df FROM bqp GROUP BY 1),
bidf AS (
  SELECT term, round(ln((bst.n - df + 0.5) / (df + 0.5) + 1), 6) AS idf
  FROM bdf, bst
),
bcon AS (
  SELECT q.doc_id,
         CAST(round(i.idf * q.tf::DOUBLE * {_K1 + 1.0!r}
                    / (q.tf + {_K1!r} * ({1.0 - _B!r} + {_B!r}
                       * (d.dl::DOUBLE * bst.n / bst.sumdl))), 6)
              AS DECIMAL(18,6)) AS c
  FROM bqp q JOIN bidf i USING (term) JOIN idl d USING (doc_id), bst
),
bsc AS (SELECT doc_id, sum(c) AS s, count(*) AS n_terms FROM bcon GROUP BY 1),
br AS (
  SELECT doc_id, s, n_terms,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM bsc
)"""

BM25_ORACLE = (
    "WITH "
    + _IDX_CTE
    + _BM25_CTE
    + f"""
SELECT doc_id, rank, CAST(s AS DOUBLE) AS bm25, CAST(n_terms AS BIGINT) AS n_terms
FROM br WHERE rank <= {BM25_K}
"""
)


@register("bm25_search_topk", oracle=BM25_ORACLE, bench=True)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for the bag-of-terms query
    {terms}: Lucene-variant idf (6dp), exact dl·N/Σdl length
    normalizer, DECIMAL-exact contribution sum, ties on doc_id. The
    oracle rebuilds the index and replays scoring bit-for-bit.""".format(
        terms=BM25_TERMS
    )
    docs = load_table(spark, sf_dir, "documents")
    return R.bm25_topk(docs, list(BM25_TERMS), k=BM25_K)


IDX_DELTA_MOD = 5  # "new" docs: doc_id % 5 == 0 (the repo's ingest-batch slice)


@register("bm25_index_delta_topk", oracle=BM25_ORACLE)
def bm25_index_delta_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over an INCREMENTALLY-maintained index — the segment-merge
    IVM shape every production search engine runs: the standing
    corpus's postings/doclen tables are REAL parquet segments
    (sources/bucketed.ensure_segment — written once, read by every
    later session); the 20% ingest batch is tokenized ALONE and its
    postings simply union in (doc sets are disjoint, so the merge is
    concatenation — the Lucene segment model). Scoring reads the
    merged index: tf is doc-local, and df / N / Σdl are exact
    query-time monoid aggregates over the merged tables, so the scores
    are BIT-IDENTICAL to a from-scratch rebuild — proven by holding
    this row to the SAME from-scratch oracle as bm25_search_topk.
    Per-batch steady-state cost: O(|batch| tokens) + the term-filtered
    segment scan; the base corpus is never re-tokenized."""
    from ..sources.bucketed import ensure_segment

    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % IDX_DELTA_MOD == 0

    def build_post(s: SparkSession, d: str) -> DataFrame:
        base = load_table(s, d, "documents").filter(
            F.col("doc_id") % IDX_DELTA_MOD != 0
        )
        return R.build_postings(base)[0]

    def build_dl(s: SparkSession, d: str) -> DataFrame:
        base = load_table(s, d, "documents").filter(
            F.col("doc_id") % IDX_DELTA_MOD != 0
        )
        return R.build_postings(base)[1]

    post_base = ensure_segment(
        spark, sf_dir, f"bm25_post_m{IDX_DELTA_MOD}", build_post, ("documents",)
    )
    dl_base = ensure_segment(
        spark, sf_dir, f"bm25_dl_m{IDX_DELTA_MOD}", build_dl, ("documents",)
    )
    post_new, dl_new = R.build_postings(docs.filter(is_new))
    postings = post_base.unionByName(post_new)
    doclen = dl_base.unionByName(dl_new)
    return R.bm25_from_index(postings, doclen, list(BM25_TERMS), k=BM25_K)


# reuse the token-stats oracle: the ORC hop must be value-lossless, so
# the parquet-backed oracle IS the ground truth for the ORC-backed scan
from .text import TOKEN_STATS_ORACLE  # noqa: E402


PHRASE = ("part", "filter")
PHRASE_K = 10

PHRASE_ORACLE = f"""
WITH ptok AS (
  SELECT doc_id,
         list_filter(string_split(lower(coalesce(text, '')), ' '), t -> t <> '') AS toks
  FROM documents
),
ppos AS (
  SELECT doc_id, toks[i] AS term, i - 1 AS pos
  FROM ptok, unnest(generate_series(1, len(toks))) AS s(i)
  WHERE toks[i] IN ('{PHRASE[0]}', '{PHRASE[1]}')
),
pm AS (
  SELECT a.doc_id, count(*) AS n_hits
  FROM (SELECT doc_id, pos FROM ppos WHERE term = '{PHRASE[0]}') a
  JOIN (SELECT doc_id, pos - 1 AS pos FROM ppos WHERE term = '{PHRASE[1]}') b
    ON a.doc_id = b.doc_id AND a.pos = b.pos
  GROUP BY 1
)
SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits,
       row_number() OVER (ORDER BY n_hits DESC, doc_id ASC) AS rank
FROM pm ORDER BY n_hits DESC, doc_id ASC LIMIT {PHRASE_K}
"""


@register("index_phrase_search", oracle=PHRASE_ORACLE)
def index_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval ("{p0} {p1}" consecutively) from the
    POSITIONAL inverted index: the index is filtered to the phrase's
    terms before anything joins, so each adjacency join's inputs are
    df-sized (one query term's postings), never corpus-sized; matching
    is an (id, pos+i) equi-join chain and the ranking a windowless
    TakeOrdered top-{k}. The oracle rebuilds the positional index via
    ordinal unnest and replays the adjacency join.""".format(
        p0=PHRASE[0], p1=PHRASE[1], k=PHRASE_K
    )
    docs = load_table(spark, sf_dir, "documents")
    out = R.phrase_search(docs, list(PHRASE), k=PHRASE_K)
    from pyspark.sql import functions as F

    return out.select("doc_id", F.col("n_hits").cast("long").alias("n_hits"), "rank")


NEAR_TERMS = ("hash", "join")
NEAR_WINDOW = 5

PROXIMITY_ORACLE = f"""
WITH ptok AS (
  SELECT doc_id,
         list_filter(string_split(lower(coalesce(text, '')), ' '), t -> t <> '') AS toks
  FROM documents
),
ppos AS (
  SELECT doc_id, toks[i] AS term, i - 1 AS pos
  FROM ptok, unnest(generate_series(1, len(toks))) AS s(i)
  WHERE toks[i] IN ('{NEAR_TERMS[0]}', '{NEAR_TERMS[1]}')
),
pm AS (
  SELECT a.doc_id, count(*) AS n_pairs
  FROM (SELECT doc_id, pos FROM ppos WHERE term = '{NEAR_TERMS[0]}') a
  JOIN (SELECT doc_id, pos FROM ppos WHERE term = '{NEAR_TERMS[1]}') b
    ON a.doc_id = b.doc_id
  WHERE abs(a.pos - b.pos) <= {NEAR_WINDOW} AND a.pos <> b.pos
  GROUP BY 1
)
SELECT doc_id, CAST(n_pairs AS BIGINT) AS n_pairs,
       row_number() OVER (ORDER BY n_pairs DESC, doc_id ASC) AS rank
FROM pm ORDER BY n_pairs DESC, doc_id ASC LIMIT {PHRASE_K}
"""


@register("index_proximity_search", oracle=PROXIMITY_ORACLE)
def index_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR/{w} retrieval ("{a}" within {w} tokens of "{b}", either
    order) from the positional index — the other classic positional
    query: term-filter first, (id)-equi-join of two df-sized postings
    sets, band predicate on the position gap, TakeOrdered top-k.
    Oracle replays via ordinal unnest.""".format(
        w=NEAR_WINDOW, a=NEAR_TERMS[0], b=NEAR_TERMS[1]
    )
    docs = load_table(spark, sf_dir, "documents")
    out = R.proximity_search(
        docs, NEAR_TERMS[0], NEAR_TERMS[1], window=NEAR_WINDOW, k=PHRASE_K
    )
    from pyspark.sql import functions as F

    return out.select("doc_id", F.col("n_pairs").cast("long").alias("n_pairs"), "rank")


@register("source_orc_roundtrip", oracle=TOKEN_STATS_ORACLE)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format portability: documents mirrored to ORC (written once,
    mtime-keyed cache), then the token-stats query runs over the ORC
    scan and must hash-match the PARQUET-backed oracle — strings,
    longs, and token arrays survive the format hop bit-for-bit. The
    ORC reader keeps the same pushdown/pruning machinery (vectorized
    scan, PushedFilters) as parquet."""
    from ..operators.text import token_stats
    from ..sources.bucketed import ensure_orc_mirror

    path = ensure_orc_mirror(spark, sf_dir, "documents")
    return token_stats(spark.read.orc(path))


FUSE_N = 50     # depth of each per-system ranking fed into the fusion
HYBRID_K = 15   # fused results returned
RRF_C = 60      # the standard reciprocal-rank-fusion constant


HYBRID_RRF_ORACLE = (
    "WITH "
    + _IDX_CTE
    + _BM25_CTE
    + f""",
hq AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
hu AS (SELECT e.vec_id, unnest(hq.qe)::DOUBLE a, unnest(e.embedding)::DOUBLE b
       FROM embeddings e, hq),
hs AS (SELECT vec_id, sum(a*b) AS dot, sqrt(sum(a*a)) AS na, sqrt(sum(b*b)) AS nb
       FROM hu GROUP BY 1),
hd AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY dot/(na*nb) DESC, vec_id ASC) AS rank
  FROM hs
),
hlex AS (SELECT doc_id, rank FROM br WHERE rank <= {FUSE_N}),
hden AS (SELECT doc_id, rank FROM hd WHERE rank <= {FUSE_N}),
hfuse AS (
  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
         CAST(l.rank AS INT) AS rank_lex, CAST(d.rank AS INT) AS rank_dense,
         coalesce(1000000000 // ({RRF_C} + l.rank), 0)::BIGINT
           + coalesce(1000000000 // ({RRF_C} + d.rank), 0)::BIGINT AS rrf_fp9
  FROM hlex l FULL OUTER JOIN hden d ON l.doc_id = d.doc_id
),
htop AS (
  SELECT doc_id, rank_lex, rank_dense, rrf_fp9,
         row_number() OVER (ORDER BY rrf_fp9 DESC, doc_id ASC) AS fused_rank
  FROM hfuse
)
SELECT doc_id, rank_lex, rank_dense, rrf_fp9, fused_rank
FROM htop WHERE fused_rank <= {HYBRID_K}
"""
)


@register("hybrid_rrf_search", oracle=HYBRID_RRF_ORACLE)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by RECIPROCAL-RANK FUSION: the BM25 top-{n}
    for the bag-of-terms query and the dense cosine top-{n} for the
    vec_id-0 query embedding (doc_id = vec_id, the corpus is 1:1
    text/vector) are fused as ``rrf = Σ 1/({c} + rank)``, missing
    membership contributing 0; top-{k} by fused score. The two
    rankings run independently (their plans are the proven
    bm25_topk / cosine_topk shapes — term-filtered postings join;
    broadcast query matmul that never shuffles the corpus), and the
    fusion itself is list-sized: a full-outer join of two {n}-row
    frames. Ranks are ints and each reciprocal quantizes to fp9 BEFORE
    the sum (rrf_fp9 = Σ 10^9 DIV (c + rank) — a rounded double sum of
    exact unit fractions was the reachable-half-boundary class), so
    the fused order is pure integer; the oracle replays index build,
    both scorings, and the fusion.""".format(
        n=FUSE_N, c=RRF_C, k=HYBRID_K
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators import similarity as S

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    lex = R.bm25_topk(docs, list(BM25_TERMS), k=FUSE_N).select(
        "doc_id", F.col("rank").cast("int").alias("rank_lex")
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    den = S.cosine_topk(q, emb, k=FUSE_N).select(
        F.col("vec_id").alias("doc_id"), F.col("rank").cast("int").alias("rank_dense")
    )
    fused = lex.join(den, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_dense",
        (
            F.coalesce(F.expr(f"1000000000 DIV ({RRF_C} + rank_lex)"), F.lit(0))
            + F.coalesce(F.expr(f"1000000000 DIV ({RRF_C} + rank_dense)"), F.lit(0))
        ).cast("long").alias("rrf_fp9"),
    )
    lim = fused.orderBy(F.col("rrf_fp9").desc(), F.col("doc_id").asc()).limit(HYBRID_K)
    w = Window.orderBy(F.col("rrf_fp9").desc(), F.col("doc_id").asc())
    return lim.withColumn("fused_rank", F.row_number().over(w))
