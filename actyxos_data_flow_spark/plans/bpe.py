"""BPE tokenizer queries with a DuckDB oracle that RE-LEARNS the merge
table from scratch.

The oracle cannot be handed Spark's merges — that would prove nothing —
so it unrolls the training loop as CTE stages: stage i counts adjacent
pairs over the current symbol table, picks the top pair with the same
deterministic (count DESC, left, right) rule, and applies the same
leftmost-nonoverlapping merge. Hash equality therefore certifies the
full training trajectory, not just the final statistics.

The merge step is deliberately a DIFFERENT formulation from Spark's
fold (DuckDB 1.0's list_reduce cannot thread list-typed accumulators —
probed: list_append(acc.out, x) yields [x] each iteration): candidate
positions are paired by window arithmetic — within each maximal RUN of
consecutive candidates (runs longer than 1 exist only when left ==
right), the 1st, 3rd, 5th… positions merge — which is exactly
leftmost-nonoverlapping semantics. Two independent formulations
agreeing bit-for-bit is a stronger check than a mirrored one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import bpe as B
from ..sources import load_table
from . import register

N_MERGES = B.BPE_MERGES


def _train_ctes(k: int, src: str = "documents") -> str:
    """wf → w0 → (p0, m0, w1) → … → (p{k-1}, m{k-1}, w{k}), trained on
    the ``src`` relation's text column."""
    parts = [
        f"""wf AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {src})
  WHERE word <> '' GROUP BY 1
),
w0 AS MATERIALIZED (SELECT word, freq, list_append(string_split(word, ''), '·') AS syms FROM wf)"""
    ]
    for i in range(k):
        parts.append(
            f"""p{i} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r, sum(freq) AS c
  FROM w{i}, unnest(range(1, len(syms))) AS t(i)
  GROUP BY 1, 2
),
m{i} AS MATERIALIZED (SELECT l, r, c FROM p{i} ORDER BY c DESC, l ASC, r ASC LIMIT 1),
c{i} AS (
  SELECT w.word, u.i
  FROM w{i} w, m{i} m, unnest(range(1, len(w.syms))) u(i)
  WHERE w.syms[u.i] = m.l AND w.syms[u.i + 1] = m.r
),
s{i} AS MATERIALIZED (
  SELECT word, i FROM (
    SELECT word, i, row_number() OVER (PARTITION BY word, i - rn ORDER BY i) AS rr
    FROM (SELECT word, i, row_number() OVER (PARTITION BY word ORDER BY i) AS rn FROM c{i})
  ) WHERE rr % 2 = 1
),
w{i + 1} AS MATERIALIZED (
  SELECT word, freq, list(sym ORDER BY j) AS syms FROM (
    SELECT t.word, t.freq, u.j,
           CASE WHEN st.i IS NOT NULL THEN m.l || m.r ELSE t.syms[u.j] END AS sym
    FROM w{i} t CROSS JOIN m{i} m
    CROSS JOIN unnest(range(1, len(t.syms) + 1)) u(j)
    LEFT JOIN s{i} st ON st.word = t.word AND st.i = u.j
    LEFT JOIN s{i} s2 ON s2.word = t.word AND s2.i = u.j - 1
    WHERE s2.i IS NULL
  ) GROUP BY word, freq
)"""
        )
    return ",\n".join(parts)


BPE_MERGES_ORACLE = (
    "WITH "
    + _train_ctes(N_MERGES)
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_rank, l AS left_sym, r AS right_sym, c::BIGINT AS pair_count FROM m{i}"
        for i in range(N_MERGES)
    )
)


@register("bpe_merges", oracle=BPE_MERGES_ORACLE)
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table, (merge_rank, left_sym, right_sym,
    pair_count): the oracle re-runs training in DuckDB with the same
    deterministic tie rule — agreement certifies every round's pair
    counts AND every round's winner."""
    docs = load_table(spark, sf_dir, "documents")
    merges = B.bpe_train(docs, n_merges=N_MERGES)
    return spark.createDataFrame(
        merges, "merge_rank int, left_sym string, right_sym string, pair_count long"
    )


BPE_STATS_ORACLE = (
    "WITH "
    + _train_ctes(N_MERGES)
    + f""",
occ AS (
  SELECT lang, word, count(*) AS occ
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY 1, 2
)
SELECT occ.lang,
       sum(occ)::BIGINT AS ws_tokens,
       sum(occ * len(occ.word))::BIGINT AS chars,
       sum(occ * len(w{N_MERGES}.syms))::BIGINT AS bpe_tokens
FROM occ JOIN w{N_MERGES} ON w{N_MERGES}.word = occ.word
GROUP BY 1
"""
)


@register("bpe_token_stats", oracle=BPE_STATS_ORACLE, bench=True)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language compression report of the trained tokenizer:
    whitespace tokens vs characters vs BPE symbols. Encoding runs over
    word TYPES (vocab-sized) and joins back to per-language occurrence
    counts — the corpus is scanned once for the counts and never
    touched by the merge folds."""
    docs = load_table(spark, sf_dir, "documents")
    merges = B.bpe_train(docs, n_merges=N_MERGES)
    return B.bpe_corpus_stats(docs, merges)


BPE_VOCAB_ORACLE = (
    "WITH "
    + _train_ctes(N_MERGES)
    + f""",
occ AS (
  SELECT word, count(*) AS occ
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY 1
),
symocc AS (
  SELECT s.sym, sum(occ.occ) AS n
  FROM w{N_MERGES} w JOIN occ ON occ.word = w.word,
       unnest(w.syms) AS s(sym)
  GROUP BY 1
)
SELECT row_number() OVER (ORDER BY n DESC, sym ASC) - 1 AS token_id, sym, n::BIGINT AS n
FROM symocc
ORDER BY token_id
LIMIT 64
"""
)


@register("bpe_vocab", oracle=BPE_VOCAB_ORACLE)
def bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained tokenizer's top-64 vocabulary with deterministic
    token ids (corpus frequency DESC, then symbol) — the id table a
    training pipeline ships with its tokenizer. Symbol counting runs
    over encoded word TYPES weighted by occurrence counts; the top-64
    pick is a TakeOrderedAndProject, never a global sort."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    merges = B.bpe_train(docs, n_merges=N_MERGES)
    occ = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    enc = B.bpe_encode_words(occ, merges)
    symocc = (
        enc.select("occ", F.explode("bpe_syms").alias("sym"))
        .groupBy("sym")
        .agg(F.sum("occ").cast("long").alias("n"))
    )
    top = symocc.orderBy(F.col("n").desc(), F.col("sym").asc()).limit(64)
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("n").desc(), F.col("sym").asc())
    return top.select(
        (F.row_number().over(w) - 1).cast("long").alias("token_id"), "sym", "n"
    )


# -- flagship composite: clean corpus → trained tokenizer → packed bins ----

from .pipeline import PIPELINE_ORACLE  # noqa: E402
from .text import PACK_BUDGET  # noqa: E402

BPE_BATCHES_ORACLE = (
    f"""WITH clean AS (
  SELECT doc_id FROM ({PIPELINE_ORACLE})
),
documents_clean AS MATERIALIZED (
  SELECT d.doc_id, d.lang, d.text FROM documents d JOIN clean USING (doc_id)
),
"""
    + _train_ctes(N_MERGES, src="documents_clean")
    + f""",
occ2 AS (
  SELECT doc_id, lang, word, count(*) AS occ
  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents_clean)
  WHERE word <> '' GROUP BY 1, 2, 3
),
dl AS (
  SELECT doc_id, lang, sum(occ * len(w{N_MERGES}.syms))::BIGINT AS bpe_tokens
  FROM occ2 JOIN w{N_MERGES} ON w{N_MERGES}.word = occ2.word
  GROUP BY 1, 2
),
cum AS (
  SELECT lang, doc_id, bpe_tokens,
         sum(bpe_tokens) OVER (PARTITION BY lang ORDER BY doc_id) - bpe_tokens AS strt
  FROM dl
)
SELECT lang, doc_id, bpe_tokens,
       CAST(strt // {PACK_BUDGET} AS BIGINT) AS bin_id,
       CAST(strt % {PACK_BUDGET} AS BIGINT) AS bin_offset
FROM cum
"""
)


@register("pipeline_bpe_batches", oracle=BPE_BATCHES_ORACLE, bench=True)
def pipeline_bpe_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-aware flagship: clean the corpus (quality → exact
    dedup → LSH near-dup removal), TRAIN the BPE tokenizer on the clean
    text, measure every document in trained-tokenizer tokens, and pack
    documents into fixed-token-budget training bins per language — one
    oracle replays the whole composition including the training
    trajectory. Scale shape: the clean set is doc_ids joined back to
    the scan, training runs on the word-type table, per-doc lengths are
    an occurrence join against the tiny encoded vocabulary, and packing
    is the skew-proof two-level prefix sum."""
    from pyspark.sql import functions as F

    from ..operators import text as X
    from .pipeline import clean_doc_ids

    # lineage cut at the composition boundary, memoized — see
    # plans/pipeline.clean_doc_ids (this plan audited at 919 static
    # Exchange nodes before the cut)
    clean = clean_doc_ids(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").join(clean, "doc_id").persist()
    merges = B.bpe_train(docs, n_merges=N_MERGES)
    occ = (
        docs.select("doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "lang", "word")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    enc = B.bpe_encode_words(occ.select("word").distinct(), merges)
    dl = (
        occ.join(F.broadcast(enc.select("word", "n_bpe")), "word")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("occ") * F.col("n_bpe")).cast("long").alias("bpe_tokens"))
    )
    return X.pack_sequences(
        dl, id_col="doc_id", len_col="bpe_tokens", budget=PACK_BUDGET, order_cols=("doc_id",)
    )
