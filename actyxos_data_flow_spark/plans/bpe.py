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

from .. import cache
from ..operators import bpe as B
from ..sources import load_table
from . import register

N_MERGES = B.BPE_MERGES
TOPR = B.BPE_TOPR
_CAND_N = 4 * TOPR


def _apply_cte(win: str, wout: str, mm: str, cp: str, sp: str) -> str:
    """Apply table ``mm``'s single merge (0 or 1 rows) to symbol table
    ``win`` → ``wout``: window-arithmetic leftmost-nonoverlapping, with
    a scalar-subquery fused symbol so an EMPTY mm is the identity (the
    unrolled round may have accepted fewer than TOPR merges)."""
    return f"""{cp} AS (
  SELECT w.word, u.k
  FROM {win} w, {mm} m, unnest(range(1, len(w.syms))) u(k)
  WHERE w.syms[u.k] = m.l AND w.syms[u.k + 1] = m.r
),
{sp} AS MATERIALIZED (
  SELECT word, k FROM (
    SELECT word, k, row_number() OVER (PARTITION BY word, k - rn ORDER BY k) AS rr
    FROM (SELECT word, k, row_number() OVER (PARTITION BY word ORDER BY k) AS rn FROM {cp})
  ) WHERE rr % 2 = 1
),
{wout} AS MATERIALIZED (
  SELECT word, freq, list(sym ORDER BY jj) AS syms FROM (
    SELECT t.word, t.freq, u.jj,
           CASE WHEN st.k IS NOT NULL THEN (SELECT l || r FROM {mm}) ELSE t.syms[u.jj] END AS sym
    FROM {win} t CROSS JOIN unnest(range(1, len(t.syms) + 1)) u(jj)
    LEFT JOIN {sp} st ON st.word = t.word AND st.k = u.jj
    LEFT JOIN {sp} s2 ON s2.word = t.word AND s2.k = u.jj - 1
    WHERE s2.k IS NULL
  ) GROUP BY word, freq
)"""


def _train_ctes(k: int, src: str = "documents") -> str:
    """wf → w0 → per round i: (p{i} pair counts, cand{i} top-{_CAND_N},
    gsel{i} greedy disjoint acceptance via a nested recursive CTE,
    acc{i} capped to the remaining budget, am{i+1} cumulative merge
    table, {TOPR} apply stages) → … → w{k}, trained on ``src``'s text
    column. Replays :func:`operators.bpe.bpe_train_topr`'s trajectory:
    rank by (count DESC, l, r), accept pairs symbol-disjoint from every
    higher-ranked accepted pair, at most {TOPR} per round. ``k`` rounds
    always suffice for ``k`` merges (a nonempty round accepts >= 1)."""
    grd = f"(NOT list_contains(gr.used, c2.l)) AND (NOT list_contains(gr.used, c2.r)) AND gr.n_acc < {TOPR}"
    parts = [
        f"""wf AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {src})
  WHERE word <> '' GROUP BY 1
),
w0 AS MATERIALIZED (SELECT word, freq, list_append(string_split(word, ''), '·') AS syms FROM wf),
am0 AS (SELECT CAST(NULL AS BIGINT) AS grank, CAST(NULL AS VARCHAR) AS l,
               CAST(NULL AS VARCHAR) AS r, CAST(NULL AS HUGEINT) AS c WHERE false)"""
    ]
    for i in range(k):
        parts.append(
            f"""p{i} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r, sum(freq) AS c
  FROM w{i}, unnest(range(1, len(syms))) AS t(i)
  GROUP BY 1, 2
),
cand{i} AS MATERIALIZED (
  SELECT l, r, c, row_number() OVER (ORDER BY c DESC, l ASC, r ASC) AS rk
  FROM p{i} ORDER BY c DESC, l ASC, r ASC LIMIT {_CAND_N}
),
gsel{i} AS MATERIALIZED (
  WITH RECURSIVE gr(rk, l, r, c, acc, used, n_acc) AS (
    SELECT rk, l, r, c, true, [l, r], 1 FROM cand{i} WHERE rk = 1
    UNION ALL
    SELECT c2.rk, c2.l, c2.r, c2.c, {grd},
           CASE WHEN {grd} THEN list_concat(gr.used, [c2.l, c2.r]) ELSE gr.used END,
           gr.n_acc + CASE WHEN {grd} THEN 1 ELSE 0 END
    FROM gr JOIN cand{i} c2 ON c2.rk = gr.rk + 1
  )
  SELECT rk, l, r, c FROM gr WHERE acc
),
acc{i} AS MATERIALIZED (
  SELECT l, r, c, row_number() OVER (ORDER BY rk) AS j FROM gsel{i}
  QUALIFY row_number() OVER (ORDER BY rk) <= {k} - (SELECT count(*) FROM am{i})
),
am{i + 1} AS MATERIALIZED (
  SELECT * FROM am{i}
  UNION ALL
  SELECT (SELECT count(*) FROM am{i}) + j AS grank, l, r, c FROM acc{i}
)"""
        )
        win = f"w{i}"
        for j in range(1, TOPR + 1):
            wout = f"w{i + 1}" if j == TOPR else f"w{i}x{j}"
            parts.append(f"mm{i}x{j} AS MATERIALIZED (SELECT l, r FROM acc{i} WHERE j = {j})")
            parts.append(_apply_cte(win, wout, f"mm{i}x{j}", f"cp{i}x{j}", f"sp{i}x{j}"))
            win = wout
    return ",\n".join(parts)


BPE_MERGES_ORACLE = (
    "WITH "
    + _train_ctes(N_MERGES)
    + f"\nSELECT (grank - 1)::INT AS merge_rank, l AS left_sym, r AS right_sym,"
    f" c::BIGINT AS pair_count FROM am{N_MERGES}"
)


@register("bpe_merges", oracle=BPE_MERGES_ORACLE)
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table, (merge_rank, left_sym, right_sym,
    pair_count): the oracle re-runs the TOP-R training in DuckDB with
    the same deterministic rank + disjoint-acceptance rule — agreement
    certifies every round's pair counts, every round's accepted batch,
    and the batching itself."""
    docs = load_table(spark, sf_dir, "documents")
    merges = B.bpe_train_topr(docs, n_merges=N_MERGES)
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
    # TWO corpus explode scans instead of three (r12): the pinned
    # vocab-sized (word, freq) table feeds every training round AND the
    # encoder's word-type set; the (lang, word) occurrence table is
    # executed exactly once, in the final join. (Pinning occ itself and
    # rolling wf up from it — one scan — was measured SLOWER at 10x:
    # raw-parquet re-explodes are cheap, caching the |langs|x-vocab
    # table is not.)
    wf = cache.pin(B.word_freqs(docs))
    merges = B.bpe_train_topr(docs, n_merges=N_MERGES, wf=wf)
    return B.bpe_corpus_stats(docs, merges, types=wf)


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
    # the (word, freq) table IS this query's occurrence table — pin it
    # once for the trainer's per-round reads and the symbol counting
    # (r12: one corpus explode scan instead of two)
    wf = cache.pin(B.word_freqs(docs))
    merges = B.bpe_train_topr(docs, n_merges=N_MERGES, wf=wf)
    occ = wf.select("word", F.col("freq").alias("occ"))
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


# -- WordPiece: likelihood-driven merges, exact-integer score ------------

N_WP = B.WP_MERGES
_WPS = B.WP_SCORE_SCALE


def _wp_train_ctes(k: int, src: str = "documents", with_base: bool = True) -> str:
    """Unrolled WordPiece training: per round i, symbol counts wps{i} +
    pair counts wpp{i} → single winner wpmm{i} by the exact integer
    score ``(c * 10^9) // n_l // n_r`` (score DESC, c DESC, l, r) →
    cumulative table wpam{i+1} → one :func:`_apply_cte` stage. All
    operands positive, so DuckDB's floor ``//`` equals Spark's
    truncating ``DIV``. ``with_base=False`` reuses an existing ``w0``
    (the shared char-symbol table) instead of re-deriving it."""
    parts = []
    if with_base:
        parts.append(
            f"""wf AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {src})
  WHERE word <> '' GROUP BY 1
),
w0 AS MATERIALIZED (SELECT word, freq, list_append(string_split(word, ''), '·') AS syms FROM wf)"""
        )
    parts.append(
        """wpw0 AS (SELECT * FROM w0),
wpam0 AS (SELECT CAST(NULL AS BIGINT) AS grank, CAST(NULL AS VARCHAR) AS l,
                 CAST(NULL AS VARCHAR) AS r, CAST(NULL AS HUGEINT) AS c,
                 CAST(NULL AS HUGEINT) AS score WHERE false)"""
    )
    for i in range(k):
        parts.append(
            f"""wps{i} AS (
  SELECT s.sym, sum(freq) AS n FROM wpw{i}, unnest(syms) AS s(sym) GROUP BY 1
),
wpp{i} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r, sum(freq) AS c
  FROM wpw{i}, unnest(range(1, len(syms))) AS t(i)
  GROUP BY 1, 2
),
wpmm{i} AS MATERIALIZED (
  SELECT p.l, p.r, p.c, (p.c * {_WPS}) // sl.n // sr.n AS score
  FROM wpp{i} p
  JOIN wps{i} sl ON sl.sym = p.l
  JOIN wps{i} sr ON sr.sym = p.r
  ORDER BY score DESC, c DESC, l ASC, r ASC LIMIT 1
),
wpam{i + 1} AS (
  SELECT * FROM wpam{i}
  UNION ALL
  SELECT {i} AS grank, l, r, c, score FROM wpmm{i}
)"""
        )
        parts.append(_apply_cte(f"wpw{i}", f"wpw{i + 1}", f"wpmm{i}", f"wpcp{i}", f"wpsp{i}"))
    return ",\n".join(parts)


WP_MERGES_ORACLE = (
    "WITH "
    + _wp_train_ctes(N_WP)
    + f"""
SELECT grank::INT AS merge_rank, l AS left_sym, r AS right_sym,
       c::BIGINT AS pair_count, score::BIGINT AS score_fp9
FROM wpam{N_WP}"""
)


@register("wordpiece_merges", oracle=WP_MERGES_ORACLE)
def wordpiece_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WordPiece merge table (merge_rank, left_sym, right_sym,
    pair_count, score_fp9): BERT-style likelihood-gain selection
    count(pair)/(count(l)*count(r)) as an exact integer score — the
    oracle re-learns the trajectory from scratch, so hash equality
    certifies every round's counts, scores, and winner. Complements
    `bpe_merges` (frequency-driven selection) as the second tokenizer
    family; no floating point anywhere in either engine."""
    docs = load_table(spark, sf_dir, "documents")
    merges = B.wordpiece_train(docs, n_merges=N_WP)
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, pair_count long, score_fp9 long",
    )


TOKENIZER_COMPARE_ORACLE = (
    "WITH "
    + _train_ctes(N_MERGES)
    + ",\n"
    + _wp_train_ctes(N_WP, with_base=False)
    + f""",
occ AS (
  SELECT lang, word, count(*) AS occ
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY 1, 2
)
SELECT occ.lang,
       sum(occ)::BIGINT AS ws_tokens,
       sum(occ * len(occ.word))::BIGINT AS chars,
       sum(occ * len(wb.syms))::BIGINT AS bpe_tokens,
       sum(occ * len(ww.syms))::BIGINT AS wp_tokens
FROM occ
JOIN w{N_MERGES} wb ON wb.word = occ.word
JOIN wpw{N_WP} ww ON ww.word = occ.word
GROUP BY 1
"""
)


@register("tokenizer_compare", oracle=TOKENIZER_COMPARE_ORACLE)
def tokenizer_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train BOTH tokenizer families on the same corpus and report
    per-language compression side by side (whitespace tokens, chars,
    BPE symbols, WordPiece symbols) — the comparison a pipeline runs
    before freezing its tokenizer. Both trainings operate on the shared
    word-TYPE table (corpus scanned once for the counts); encoding is
    vocab-sized; the oracle replays both trajectories in one query."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    # TWO corpus explode scans instead of five (r12): ONE pinned
    # vocab-sized (word, freq) table drives BOTH trainers and both
    # encoders' type sets (was: each trainer built its own word_freqs,
    # and occ re-executed under each encoder broadcast); the (lang,
    # word) occurrence table runs exactly once, in the final join.
    wf = cache.pin(B.word_freqs(docs))
    bpe = B.bpe_train_topr(docs, n_merges=N_MERGES, wf=wf)
    wp = B.wordpiece_train(docs, n_merges=N_WP, wf=wf)
    occ = (
        docs.select("lang", F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    types = wf.select("word")
    encb = B.bpe_encode_words(types, bpe).select("word", F.col("n_bpe").alias("nb"))
    encw = B.bpe_encode_words(types, wp).select("word", F.col("n_bpe").alias("nw"))
    joined = occ.join(F.broadcast(encb), "word").join(F.broadcast(encw), "word")
    return joined.groupBy("lang").agg(
        F.sum("occ").cast("long").alias("ws_tokens"),
        F.sum(F.col("occ") * F.length("word")).cast("long").alias("chars"),
        F.sum(F.col("occ") * F.col("nb")).cast("long").alias("bpe_tokens"),
        F.sum(F.col("occ") * F.col("nw")).cast("long").alias("wp_tokens"),
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
    docs = load_table(spark, sf_dir, "documents").join(clean, "doc_id")
    # r13 (guide §2.3 aggregate before you shuffle): the r12 form
    # pinned a per-(doc, word) occurrence table — but that groupBy
    # shuffled ~every token occurrence under NEAR-UNIQUE keys (no
    # map-side combining; the widest exchange in the query) only so two
    # consumers could share one cache. Both consumers aggregate
    # FURTHER: word frequencies collapse to the vocab (tiny partials on
    # `word`) and document lengths collapse to one row per doc (tiny
    # partials on (doc_id, lang)) — so each now aggregates straight off
    # the row-local exploded tokens with REAL partial aggregation, and
    # the occurrence exchange plus its cache disappear. Two corpus
    # explode scans instead of one cached table: measured cheaper at
    # the 10x probe both this round and in r12 §13 (explodes are
    # row-local; the cache write was the cost).
    tokens = docs.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    wf = cache.pin(tokens.groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    merges = B.bpe_train_topr(docs, n_merges=N_MERGES, wf=wf)
    enc = B.bpe_encode_words(wf.select("word"), merges)
    # per-doc length: one shuffle of per-task (doc, lang) partials —
    # Σ_token n_bpe(word) == Σ_word occ·n_bpe, exact integer sum
    dl = (
        tokens.join(F.broadcast(enc.select("word", "n_bpe")), "word")
        .groupBy("doc_id", "lang")
        .agg(F.sum("n_bpe").cast("long").alias("bpe_tokens"))
    )
    return X.pack_sequences(
        dl, id_col="doc_id", len_col="bpe_tokens", budget=PACK_BUDGET, order_cols=("doc_id",)
    )


# -- Unigram-LM (SentencePiece-style) tokenizer ---------------------------

from ..functions.intlog import ilog_chain_sql  # noqa: E402
from ..operators import unigram as U  # noqa: E402


def _ulm_ctes(src: str = "documents") -> str:
    """Unrolled unigram-LM training: word types (≤ ULM_MAX_WORD chars)
    → substring piece counts → seed vocab (top-ULM_SEED_TOP + all
    single chars) → integer-log2 piece scores → ULM_MAX_WORD lockstep
    Viterbi DP stages → argmax edge table → ULM_MAX_WORD backtracking
    walk stages → usage counts. Every stage is the same exact integer
    arithmetic operators/unigram runs as Columns."""
    mw, mp, st = U.ULM_MAX_WORD, U.ULM_MAX_PIECE, U.ULM_SEED_TOP
    parts = [
        f"""uwf AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {src})
  WHERE word <> '' AND len(word) <= {mw} GROUP BY 1
),
usub AS MATERIALIZED (
  SELECT word, freq, s, l, substr(word, s, l) AS piece
  FROM uwf, unnest(range(1, len(word) + 1)) AS ts(s),
       unnest([{", ".join(str(i) for i in range(1, mp + 1))}]) AS tl(l)
  WHERE s + l - 1 <= len(word)
),
upc AS (SELECT piece, sum(freq) AS cnt FROM usub GROUP BY 1),
uvocp AS (
  SELECT piece, cnt FROM (SELECT piece, cnt FROM upc ORDER BY cnt DESC, piece ASC LIMIT {st})
  UNION
  SELECT piece, cnt FROM upc WHERE len(piece) = 1
),
utot AS (SELECT sum(cnt) AS t FROM uvocp),
uvoc AS MATERIALIZED (
  SELECT piece, cnt, ilog2_fp20 AS lp_fp20 FROM ({ilog_chain_sql(
      "SELECT piece, cnt, "
      f"greatest(CAST((cnt * {1 << 30}) // (SELECT t FROM utot) AS BIGINT), 1) AS y0, "
      f"CAST(length(bin(greatest(CAST((cnt * {1 << 30}) // (SELECT t FROM utot) AS BIGINT), 1))) AS INT) AS blen "
      "FROM uvocp")})
),
uedges AS MATERIALIZED (
  SELECT u.word, u.s - 1 AS frm, u.s + u.l - 1 AS tto, u.piece, v.lp_fp20
  FROM usub u JOIN uvoc v USING (piece)
),
uball0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS score FROM uwf)"""
    ]
    for p in range(1, mw + 1):
        parts.append(
            f"""ubp{p} AS (
  SELECT e.word, {p} AS pos, max(b.score + e.lp_fp20) AS score
  FROM uedges e JOIN uball{p - 1} b ON b.word = e.word AND b.pos = e.frm
  WHERE e.tto = {p} GROUP BY e.word
),
uball{p} AS MATERIALIZED (SELECT * FROM uball{p - 1} UNION ALL SELECT * FROM ubp{p})"""
        )
    parts.append(
        f"""uchosen AS MATERIALIZED (
  SELECT word, frm, tto, piece FROM (
    SELECT e.word, e.frm, e.tto, e.piece,
           row_number() OVER (PARTITION BY e.word, e.tto
                              ORDER BY b.score + e.lp_fp20 DESC, e.frm ASC) AS rn
    FROM uedges e JOIN uball{mw} b ON b.word = e.word AND b.pos = e.frm
  ) WHERE rn = 1
),
uw0 AS (SELECT word, len(word) AS pos FROM uwf)"""
    )
    for t in range(1, mw + 1):
        parts.append(
            f"""uw{t} AS MATERIALIZED (
  SELECT w.word, c.frm AS pos, c.piece
  FROM uw{t - 1} w JOIN uchosen c ON c.word = w.word AND c.tto = w.pos
  WHERE w.pos > 0
)"""
        )
    walk_union = "\n  UNION ALL\n  ".join(
        f"SELECT word, piece FROM uw{t}" for t in range(1, mw + 1)
    )
    parts.append(
        f"""upieces AS (
  {walk_union}
),
uused AS (
  SELECT p.piece, sum(f.freq) AS used_cnt
  FROM upieces p JOIN uwf f USING (word) GROUP BY 1
)"""
    )
    return ",\n".join(parts)


ULM_VOCAB_ORACLE = (
    "WITH "
    + _ulm_ctes()
    + f"""
SELECT CAST(row_number() OVER (ORDER BY coalesce(u.used_cnt, 0) DESC, v.piece ASC) AS BIGINT) AS rank,
       v.piece, CAST(v.cnt AS BIGINT) AS seed_cnt,
       CAST(coalesce(u.used_cnt, 0) AS BIGINT) AS used_cnt,
       CAST(v.lp_fp20 AS BIGINT) AS lp_fp20
FROM uvoc v LEFT JOIN uused u USING (piece)
ORDER BY coalesce(u.used_cnt, 0) DESC, v.piece ASC
LIMIT {U.ULM_VOCAB_TOP}
"""
)


@register("unigram_lm_vocab", oracle=ULM_VOCAB_ORACLE)
def unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third tokenizer family: unigram-LM (SentencePiece) hard-EM
    round — seed substring vocabulary, exact-integer log2 piece scores,
    Viterbi segmentation of every word type, usage re-estimation. The
    oracle re-runs the ENTIRE trajectory (piece counts, scores, all 16
    DP stages, the argmax walk), so hash equality certifies every
    word's segmentation, not just the final table. Zero libm anywhere
    (functions/intlog)."""
    docs = load_table(spark, sf_dir, "documents")
    return U.ulm_train(docs)


ULM_STATS_ORACLE = (
    "WITH "
    + _ulm_ctes()
    + f""",
uocc AS (
  SELECT lang, word, count(*) AS occ
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' AND len(word) <= {U.ULM_MAX_WORD} GROUP BY 1, 2
),
unp AS (SELECT word, count(*) AS np FROM upieces GROUP BY 1)
SELECT uocc.lang,
       sum(occ)::BIGINT AS ws_tokens,
       sum(occ * len(uocc.word))::BIGINT AS chars,
       sum(occ * unp.np)::BIGINT AS ulm_tokens
FROM uocc JOIN unp USING (word)
GROUP BY 1
"""
)


@register("unigram_lm_stats", oracle=ULM_STATS_ORACLE)
def unigram_lm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language compression of the trained unigram-LM tokenizer
    (whitespace tokens vs chars vs Viterbi pieces) — the deployment
    report that completes the family triptych with `bpe_token_stats`
    and `tokenizer_compare`. Segmentation runs once over word TYPES;
    the corpus contributes only the per-language occurrence counts."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    # wf is PINNED, not manually persisted (r12): the old
    # persist/unpersist pair released wf at plan-BUILD time, before the
    # lazy vocab/segmentation plans ever executed — every downstream
    # read recomputed the word table. The pin keeps it cached through
    # execution and releases it with the query result.
    wf = cache.pin(U.ulm_word_freqs(docs))
    voc, _ = U.ulm_vocab(wf)
    seg = U.ulm_segment(wf, voc.localCheckpoint())
    np_ = seg.groupBy("word").agg(F.count(F.lit(1)).alias("np"))
    occ = (
        docs.select("lang", F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter((F.col("word") != "") & (F.length("word") <= U.ULM_MAX_WORD))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    return occ.join(F.broadcast(np_), "word").groupBy("lang").agg(
        F.sum("occ").cast("long").alias("ws_tokens"),
        F.sum(F.col("occ") * F.length("word")).cast("long").alias("chars"),
        F.sum(F.col("occ") * F.col("np")).cast("long").alias("ulm_tokens"),
    )
