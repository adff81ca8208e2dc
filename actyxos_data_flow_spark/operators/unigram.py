"""Unigram-LM (SentencePiece-style) tokenizer: the third tokenizer
family beside BPE (frequency merges) and WordPiece (likelihood merges).

Kudo 2018 ("Subword regularization") tokenizes with a UNIGRAM model
over a piece vocabulary: a word's tokenization is the piece sequence
maximizing Σ log p(piece) — found by Viterbi DP — and training
alternates segmentation (E) with count re-estimation (M). This module
implements the deterministic hard-EM variant, integer end to end:

- seed vocabulary: every substring of length ≤ ULM_MAX_PIECE over the
  word-TYPE table, top ULM_SEED_TOP by weighted count plus ALL single
  characters (coverage guarantee — every word stays segmentable);
- piece scores: lp(piece) = ilog2_fp20(cnt / total) via the exact
  integer log2 kernel (functions/intlog) — zero libm, so both engines
  derive bit-identical scores;
- Viterbi: DP over word positions with edges (frm → tto) for vocab
  pieces; ties break (score DESC, frm ASC) — the longest piece wins a
  tie — making every path unique and engine-identical;
- M-step: piece usage counts from the chosen segmentations, weighted
  by word frequency.

Scale shape mirrors operators/bpe: the corpus is touched once by the
word-count aggregate; everything else — substring explosion, piece
counts, the ≤ MAXWORD DP rounds, the backtracking walk — runs on the
vocab-sized word-TYPE table with model-sized joins. Words longer than
ULM_MAX_WORD chars are excluded from training and stats (a fixed
contract both engines share, keeping the unrolled oracle finite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import intlog
from .bpe import word_freqs

ULM_MAX_WORD = 16
ULM_MAX_PIECE = 4
ULM_SEED_TOP = 48
ULM_VOCAB_TOP = 32


def ulm_word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return word_freqs(docs, text_col).filter(F.length("word") <= ULM_MAX_WORD)


def ulm_pieces(wf: DataFrame) -> DataFrame:
    """All (word, s, l, piece) substring slots of length ≤ ULM_MAX_PIECE
    over the word-type table, carrying the word freq."""
    subs = wf.select(
        "word",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("s"),
    ).select(
        "word",
        "freq",
        "s",
        F.explode(
            F.array(*[F.lit(i) for i in range(1, ULM_MAX_PIECE + 1)])
        ).alias("l"),
    )
    return subs.filter(F.col("s") + F.col("l") - 1 <= F.length("word")).withColumn(
        "piece", F.expr("substring(word, s, l)")
    )


def ulm_vocab(wf: DataFrame) -> tuple[DataFrame, int]:
    """(vocab with integer lp, total): top ULM_SEED_TOP pieces by
    (weighted count DESC, piece ASC) plus all single characters;
    lp_fp20 = ilog2_fp20(cnt / total) over the selected vocabulary."""
    pc = ulm_pieces(wf).groupBy("piece").agg(F.sum("freq").alias("cnt"))
    top = pc.orderBy(F.col("cnt").desc(), F.col("piece").asc()).limit(ULM_SEED_TOP)
    singles = pc.filter(F.length("piece") == 1)
    voc = top.union(singles).dropDuplicates(["piece"])
    total = int(voc.agg(F.sum("cnt")).first()[0] or 0)
    assert 0 < total < (1 << 33), f"piece total {total} outside the ilog2 envelope"
    voc = voc.withColumn(
        "y0", F.expr(f"greatest((cnt * {1 << 30}) DIV {total}, 1)")
    ).withColumn("blen", F.length(F.conv(F.col("y0"), 10, 2)).cast("int"))
    for col, expr in intlog.ilog2_cols("y0", "blen", div="DIV"):
        voc = voc.withColumn(col, F.expr(expr))
    return voc.select("piece", "cnt", F.col("ilog2_fp20").alias("lp_fp20")), total


def ulm_segment(wf: DataFrame, voc: DataFrame, max_word: int = ULM_MAX_WORD) -> DataFrame:
    """Viterbi-segment every word type against the vocabulary: returns
    (word, piece) rows, one per chosen piece per word. DP runs
    ``max_word`` lockstep rounds over the word-TYPE table (positions
    advance together for all words); backtracking walks the argmax
    edges — unique because ties break (cand_score DESC, frm ASC)."""
    edges = (
        ulm_pieces(wf)
        .join(F.broadcast(voc), "piece")
        .select(
            "word",
            (F.col("s") - 1).alias("frm"),
            (F.col("s") + F.col("l") - 1).alias("tto"),
            "piece",
            "lp_fp20",
        )
    )
    # rounds beyond the corpus' actual longest word are provably empty
    # (no edge ends there), so bound the lockstep loop by the data —
    # the oracle's fixed ULM_MAX_WORD stages no-op identically
    actual = wf.agg(F.max(F.length("word"))).first()[0] or 0
    max_word = min(max_word, int(actual))
    best = wf.select("word", F.lit(0).alias("pos"), F.lit(0).cast("long").alias("score"))
    for p in range(1, max_word + 1):
        cand = (
            edges.filter(F.col("tto") == p)
            .join(best, "word")
            .filter(F.col("frm") == F.col("pos"))
            .select("word", (F.col("score") + F.col("lp_fp20")).alias("cscore"))
        )
        bp = cand.groupBy("word").agg(F.max("cscore").alias("score")).select(
            "word", F.lit(p).alias("pos"), "score"
        )
        best = best.union(bp)
        if p % 4 == 0:
            best = best.localCheckpoint()
    scored = (
        edges.join(best.withColumnRenamed("pos", "frm"), ["word", "frm"])
        .withColumn("cscore", F.col("score") + F.col("lp_fp20"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("word", "tto").orderBy(F.col("cscore").desc(), F.col("frm").asc())
    chosen = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("word", "frm", "tto", "piece")
        .localCheckpoint()
    )
    cur = wf.select("word", F.length("word").alias("pos"))
    picked: list[DataFrame] = []
    for _ in range(max_word):
        step = cur.filter(F.col("pos") > 0).join(
            chosen.withColumnRenamed("tto", "pos"), ["word", "pos"]
        )
        picked.append(step.select("word", "piece"))
        cur = step.select("word", F.col("frm").alias("pos")).localCheckpoint()
    if not picked:  # empty word table (e.g. every word over the cap)
        return wf.sparkSession.createDataFrame([], "word string, piece string")
    out = picked[0]
    for d in picked[1:]:
        out = out.union(d)
    return out


def ulm_train(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One hard-EM round: seed vocab → Viterbi segment → usage counts.
    Returns the re-estimated vocabulary report: (rank, piece, seed_cnt,
    used_cnt, lp_fp20), top ULM_VOCAB_TOP by (used_cnt DESC, piece)."""
    wf = ulm_word_freqs(docs, text_col).persist()
    voc, _total = ulm_vocab(wf)
    voc = voc.localCheckpoint()  # also cuts the 63-step ilog lineage
    seg = ulm_segment(wf, voc)
    used = (
        seg.join(wf, "word")
        .groupBy("piece")
        .agg(F.sum("freq").alias("used_cnt"))
    )
    wf.unpersist()
    rep = (
        voc.join(used, "piece", "left")
        .withColumn("used_cnt", F.coalesce(F.col("used_cnt"), F.lit(0)).cast("long"))
        .orderBy(F.col("used_cnt").desc(), F.col("piece").asc())
        .limit(ULM_VOCAB_TOP)
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("used_cnt").desc(), F.col("piece").asc())
    return rep.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "piece",
        F.col("cnt").cast("long").alias("seed_cnt"),
        "used_cnt",
        "lp_fp20",
    )
