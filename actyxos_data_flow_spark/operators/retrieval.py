"""Inverted-index retrieval over the ``documents`` table: postings
build + BM25 ranked search.

Training-data pipelines need corpus-scale lexical retrieval for
decontamination probes, targeted quality audits ("show me documents
about X"), and hard-negative text mining; BM25 over an inverted index
is the standard answer. Everything here is pure JVM DataFrame ops —
tokenize (split), explode, hash-aggregate — no Python in any path.

Determinism contract (so DuckDB oracles hash-match): idf and per-term
contributions round to 6dp (``ln`` ulp across engines), and the per-doc
score sums those contributions as DECIMAL(18,6) — exact, association-
free — before casting back to double. Ranking ties break on doc_id.

Scale shape: the postings build is one explode + map-side-combined
hash aggregate keyed by (term, doc) — the classic sharded-index
construction; at cluster scale the postings table persists bucketed by
term so a query's term-probe is a pruned scan, not a shuffle. Search
filters postings to the (tiny) query-term set BEFORE any aggregation,
so scoring work is O(Σ df(term)), not corpus-sized; corpus-wide
constants (N, avg doclen) are a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

BM25_K1 = 1.2
BM25_B = 0.75


def _tokens(text_col: str):
    """Whitespace tokens of lower(text), empties dropped — the same
    tokenizer the text-stats family uses (string_split on one space),
    so index stats line up with token stats. NULL text tokenizes to []
    (coalesce), so every document keeps a doclen row with dl=0."""
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda t: t != F.lit(""),
    )


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Inverted index: returns ``(postings(term, id, tf), doclen(id,
    dl))``. One tokenize projection feeds both; the postings aggregate
    is map-side combined (partial tf per task before the (term, id)
    shuffle)."""
    toks = docs.select(F.col(id_col), _tokens(text_col).alias("_toks"))
    doclen = toks.select(id_col, F.size("_toks").alias("dl"))
    postings = (
        toks.select(id_col, F.explode("_toks").alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return postings, doclen


def postings_stats(
    docs: DataFrame, top: int = 20, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Index-health report: the ``top`` terms by document frequency with
    df (docs containing), cf (total occurrences), and 6dp-rounded BM25
    idf. Output: (term, df, cf, idf) — term-count-sized, never
    corpus-sized past the first aggregate."""
    postings, doclen = build_postings(docs, id_col, text_col)
    n = doclen.agg(F.count(F.lit(1)).alias("_n"))
    per_term = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    idf = F.round(
        F.log(
            (F.col("_n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ),
        6,
    )
    # top-N via orderBy+limit => TakeOrderedAndProject (per-partition
    # partial top-N, tiny merge) — NOT a single-partition global window;
    # the rank window then runs over <= top rows. The (df desc, term)
    # ordering is total, so post-limit row_number equals global rank.
    lim = (
        per_term.crossJoin(F.broadcast(n))
        .select("term", "df", "cf", idf.alias("idf"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(top)
    )
    w = W.orderBy(F.col("df").desc(), F.col("term").asc())
    return lim.withColumn("rank", F.row_number().over(w)).select(
        "term", "df", "cf", "idf", "rank"
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k documents for a bag-of-terms query, index built
    in-flight from ``docs`` — see :func:`bm25_from_index` for the
    scoring contract (this is the one-shot convenience; an
    incrementally-maintained index scores identically because tf is
    doc-local and df/N/Σdl are query-time aggregates)."""
    postings, doclen = build_postings(docs, id_col, text_col)
    return bm25_from_index(postings, doclen, terms, k=k, k1=k1, b=b, id_col=id_col)


def bm25_from_index(
    postings: DataFrame,
    doclen: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k over a prebuilt (possibly incrementally-maintained)
    inverted index: ``postings(term, id, tf)`` + ``doclen(id, dl)``.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1) (the Lucene
    non-negative variant). dl/avgdl is computed as dl·N/Σdl — integer
    products stay exact in double, one IEEE division — so both engines
    derive the identical normalizer. Per-term contributions round to
    6dp and sum as DECIMAL(18,6) (exact, order-free); rank ties break
    on id. Output: (doc_id, rank, bm25, n_terms).

    Scale shape: postings filter to the query terms *before* df/tf
    aggregation, so everything downstream of the index scan is
    O(Σ df(query terms)); N/Σdl is a 1-row broadcast; final top-k is a
    TakeOrdered over the (small) scored set."""
    qpost = postings.filter(F.col("term").isin([t.lower() for t in terms]))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dl").alias("_sumdl")
    )
    df_t = qpost.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(
        F.log(
            (F.col("_n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ),
        6,
    )
    dlr = F.col("dl").cast("double") * F.col("_n") / F.col("_sumdl")
    denom = F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dlr)
    contrib = F.round(
        F.col("_idf") * F.col("tf").cast("double") * F.lit(k1 + 1.0) / denom, 6
    )
    scored = (
        qpost.join(F.broadcast(df_t.crossJoin(stats).select("term", idf.alias("_idf"))), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            contrib.cast("decimal(18,6)").alias("_c"),
        )
        .groupBy(id_col)
        .agg(F.sum("_c").alias("_s"), F.count(F.lit(1)).alias("n_terms"))
    )
    # same TakeOrdered shape as postings_stats: the scored set is
    # O(Σ df(query terms)) which can be large for common terms — never
    # single-partition-sort it; rank attaches after the distributed
    # top-k (total order, so post-limit row_number == global rank)
    lim = scored.orderBy(F.col("_s").desc(), F.col(id_col).asc()).limit(k)
    w = W.orderBy(F.col("_s").desc(), F.col(id_col).asc())
    return lim.withColumn("rank", F.row_number().over(w)).select(
        id_col,
        "rank",
        F.col("_s").cast("double").alias("bm25"),
        "n_terms",
    )


def build_positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional inverted index: (term, id, pos) with pos the 0-based
    token offset — the structure phrase and proximity queries need.
    One posexplode + nothing else; positions are doc-local so the
    index appends per batch exactly like the tf postings."""
    return docs.select(
        F.col(id_col), F.posexplode(_tokens(text_col)).alias("pos", "term")
    ).select(id_col, "term", "pos")


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase top-k: documents containing the tokens of
    ``phrase`` CONSECUTIVELY, ranked by occurrence count (ties by id).

    The scalable shape: the positional index is filtered to the
    phrase's terms FIRST (an IN filter the scan can push), then the
    occurrences self-join term-by-term on (id, pos+i) — each join is
    an equi-join on (id, position) whose build side only holds
    postings of one query term, so cost scales with the phrase terms'
    document frequency, never the corpus. A windowless
    orderBy+limit(k) produces the final ranking (TakeOrdered).
    Output: (id, n_hits, rank)."""
    pp = build_positional_postings(docs, id_col, text_col)
    first = pp.filter(F.col("term") == phrase[0]).select(id_col, "pos")
    hits = first
    for i, t in enumerate(phrase[1:], start=1):
        nxt = pp.filter(F.col("term") == t).select(
            F.col(id_col), (F.col("pos") - i).alias("pos")
        )
        hits = hits.join(nxt, [id_col, "pos"])
    perdoc = hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits"))
    lim = perdoc.orderBy(F.col("n_hits").desc(), F.col(id_col).asc()).limit(k)
    w = W.orderBy(F.col("n_hits").desc(), F.col(id_col).asc())
    return lim.withColumn("rank", F.row_number().over(w))


def proximity_search(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    window: int = 5,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """NEAR/k retrieval: documents where ``term_a`` and ``term_b``
    occur within ``window`` token positions (either order), ranked by
    co-occurrence pair count (ties by id). Same scalable shape as
    phrase_search: the positional index is term-filtered before the
    (id)-equi-join, so the join sides are each one term's df-sized
    postings with per-doc position lists bounded by doc length; the
    band predicate |pos_a − pos_b| <= window filters the joined pairs.
    Output: (id, n_pairs, rank)."""
    pp = build_positional_postings(docs, id_col, text_col)
    a = pp.filter(F.col("term") == term_a).select(id_col, F.col("pos").alias("pa"))
    b = pp.filter(F.col("term") == term_b).select(id_col, F.col("pos").alias("pb"))
    pairs = a.join(b, id_col).filter(
        (F.abs(F.col("pa") - F.col("pb")) <= window) & (F.col("pa") != F.col("pb"))
    )
    perdoc = pairs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_pairs"))
    lim = perdoc.orderBy(F.col("n_pairs").desc(), F.col(id_col).asc()).limit(k)
    w = W.orderBy(F.col("n_pairs").desc(), F.col(id_col).asc())
    return lim.withColumn("rank", F.row_number().over(w))
