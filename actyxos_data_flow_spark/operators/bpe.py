"""Distributed BPE tokenizer training and encoding.

The missing piece between "count whitespace tokens" and a real
training-data pipeline: learn a byte-pair-encoding merge table FROM the
corpus, distributed, and encode the corpus with it. Classic BPE
(Sennrich et al. 2016) made Spark-shaped:

- work on WORD TYPES, not occurrences: the corpus collapses to a
  (word, freq) table first, so every training pass scans vocab-sized
  data regardless of corpus size — the standard trick that makes BPE
  train on 100 TB (the corpus is touched exactly once, by the
  word-count aggregate);
- each merge round is one scan: explode adjacent symbol pairs weighted
  by word freq, one map-side-combined sum, and a deterministic top-1
  (count DESC, then lexicographic (left, right) — ties never depend on
  partitioning); only the single winning pair crosses the driver per
  round, like the k-means model;
- applying a merge is a pure JVM fold over each word's symbol array
  (struct accumulator: emitted prefix + one pending symbol), i.e.
  leftmost-nonoverlapping replacement — 'aaa' under (a,a) becomes
  [aa, a]. No Python anywhere;
- encoding reuses the same fold: encode word TYPES (vocab-sized), then
  join the tiny encoded vocabulary back to the corpus occurrences.

Everything is derandomized, so the DuckDB oracle re-learns the SAME
merge table from scratch (unrolled CTE stages with list_reduce folds)
and must agree bit-for-bit — see plans/bpe.py.

The reference has no tokenizer surface (payloads are structured
events); this is extension surface for the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BPE_MERGES = 6
END_MARK = "·"  # end-of-word sentinel appended as its own symbol


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens — the vocab-sized table all
    training passes run on. Empty tokens dropped."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def base_symbols(word: Column) -> Column:
    """Characters plus the end-of-word sentinel as the final symbol."""
    return F.concat(F.split(word, ""), F.array(F.lit(END_MARK)))


def merge_fold(syms: Column, left: Column | str, right: Column | str) -> Column:
    """Apply ONE merge (left, right) → left||right to a symbol array:
    leftmost-nonoverlapping, single pass, pure JVM. Accumulator is
    (out: emitted symbols, pend: one unemitted symbol); a match emits
    the fused pair and clears pend, otherwise pend shifts into out."""
    l = F.lit(left) if isinstance(left, str) else left
    r = F.lit(right) if isinstance(right, str) else right
    init = F.struct(
        F.expr("array()").cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )
    step = lambda acc, s: F.when(  # noqa: E731
        (acc["pend"] == l) & (s == r),
        F.struct(
            F.concat(acc["out"], F.array(F.concat(l, r))).alias("out"),
            F.lit(None).cast("string").alias("pend"),
        ),
    ).otherwise(
        F.struct(
            F.when(acc["pend"].isNull(), acc["out"])
            .otherwise(F.concat(acc["out"], F.array(acc["pend"])))
            .alias("out"),
            s.alias("pend"),
        )
    )
    finish = lambda acc: F.when(  # noqa: E731
        acc["pend"].isNull(), acc["out"]
    ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))
    return F.aggregate(syms, init, step, finish)


def _pair_counts(syms_tbl: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word freq: one explode + one
    map-side-combined sum over the vocab-sized symbol table."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice("syms", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("syms", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        syms_tbl.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("c"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
    checkpoint_every: int = 8,
    wf: DataFrame | None = None,
) -> list[tuple[int, str, str, int]]:
    """Learn the merge table: [(rank, left, right, pair_count)].

    Per round only the winning (l, r, count) row reaches the driver.
    The symbol column accretes one fold per round; every
    ``checkpoint_every`` rounds the table is localCheckpoint'ed so plan
    depth stays bounded for large merge counts (swap for checkpoint()
    on a real cluster).

    ``wf``: a precomputed (word, freq) table. Callers that already
    aggregated the corpus (e.g. a pinned per-doc occurrence table whose
    word-sums ARE the frequencies) pass it here so training adds ZERO
    extra corpus scans; the caller owns its persistence (it is read
    once per round — hand in a pinned/persisted frame). Frequencies are
    identical to :func:`word_freqs`'s by construction, so the learned
    table is unchanged."""
    own_wf = wf is None
    wf = word_freqs(docs, text_col).persist() if own_wf else wf
    syms_tbl = wf.select("word", "freq", base_symbols(F.col("word")).alias("syms"))
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(n_merges):
            top = (
                _pair_counts(syms_tbl)
                .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
                .limit(1)
                .collect()
            )
            if not top:
                break
            l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
            merges.append((rank, l, r, c))
            syms_tbl = syms_tbl.withColumn("syms", merge_fold(F.col("syms"), l, r))
            if (rank + 1) % checkpoint_every == 0:
                syms_tbl = syms_tbl.localCheckpoint()
    finally:
        if own_wf:
            wf.unpersist()
    return merges


BPE_TOPR = 3


def bpe_train_topr(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    r: int = BPE_TOPR,
    text_col: str = "text",
    candidates_per_round: int | None = None,
    wf: DataFrame | None = None,
) -> list[tuple[int, str, str, int]]:
    """Learn the merge table with up to ``r`` merges per driver round —
    the standard parallel-BPE batching trick: rank the round's top
    pairs, greedily accept pairs whose symbols are DISJOINT from every
    higher-ranked accepted pair (disjointness means applying one cannot
    create, destroy, or shift occurrences of another, so each accepted
    pair's recorded count is still its true count), apply the accepted
    batch, re-count. Driver syncs drop from ``n_merges`` to
    ``ceil(n_merges / r)`` in the common case — at vocab=50k rounds the
    difference between 50k and ~17k blocking round-trips. The
    acceptance rule is deterministic ((count DESC, l, r) rank order,
    top ``4r`` candidates considered), so the DuckDB oracle replays the
    identical trajectory (plans/bpe.py). ``r=1`` degenerates to
    :func:`bpe_train`'s classic sequential trainer. ``wf``: optional
    precomputed (word, freq) table — see :func:`bpe_train`."""
    cand_n = candidates_per_round or 4 * r
    own_wf = wf is None
    wf = word_freqs(docs, text_col).persist() if own_wf else wf
    syms_tbl = wf.select("word", "freq", base_symbols(F.col("word")).alias("syms"))
    merges: list[tuple[int, str, str, int]] = []
    # depth-bounded lineage cuts (r12, guide §5): checkpoint only when
    # the UN-CUT fold depth would exceed the same bound bpe_train uses
    # (checkpoint_every=8 single folds) — a per-round cut materialized a
    # whole symbol table to save the next round 3 nested array folds,
    # which the round's pair-count scan absorbs for free. Values are
    # unchanged: the folds run either way, only where they run moves.
    max_fold_depth = 8
    pending_folds = 0
    try:
        while len(merges) < n_merges:
            top = (
                _pair_counts(syms_tbl)
                .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
                .limit(cand_n)
                .collect()
            )
            if not top:
                break
            used: set[str] = set()
            acc: list[tuple[str, str, int]] = []
            for row in top:
                if len(acc) >= r:
                    break
                if row["l"] in used or row["r"] in used:
                    continue
                acc.append((row["l"], row["r"], int(row["c"])))
                used.add(row["l"])
                used.add(row["r"])
            acc = acc[: n_merges - len(merges)]
            for left, right, c in acc:
                merges.append((len(merges), left, right, c))
                syms_tbl = syms_tbl.withColumn(
                    "syms", merge_fold(F.col("syms"), left, right)
                )
            # Skipped after the FINAL round (r12): nothing reads
            # syms_tbl once the budget is spent, so a last checkpoint
            # would be a wasted materialization job executing the final
            # folds for no consumer. Otherwise cut only when the next
            # round's folds would push the un-cut depth past the bound —
            # using the next round's TRUE upper bound min(r, remaining)
            # (r13, ADVICE r12: the raw per-round budget forced an
            # unnecessary cut on a penultimate round whose remaining
            # merge budget was < r). Caveat: when r > max_fold_depth the
            # un-cut depth still reaches r within a single round — the
            # bound holds between rounds, not inside one.
            pending_folds += len(acc)
            nxt = min(r, n_merges - len(merges))
            if nxt > 0 and pending_folds + nxt > max_fold_depth:
                syms_tbl = syms_tbl.localCheckpoint()
                pending_folds = 0
    finally:
        if own_wf:
            wf.unpersist()
    return merges


WP_MERGES = 6
WP_SCORE_SCALE = 10**9
# the integer score c*10^9 must fit a signed 64-bit value on both
# engines; c is bounded by the corpus symbol total, so guard that once
_WP_C_MAX = (2**63 - 1) // WP_SCORE_SCALE


def wordpiece_train(
    docs: DataFrame,
    n_merges: int = WP_MERGES,
    text_col: str = "text",
    checkpoint_every: int = 4,
    wf: DataFrame | None = None,
) -> list[tuple[int, str, str, int, int]]:
    """Learn a WordPiece merge table: [(rank, left, right, pair_count,
    score_fp9)].

    WordPiece (Schuster & Nakajima 2012; the BERT tokenizer) differs
    from BPE only in the selection rule: instead of the most FREQUENT
    adjacent pair it fuses the pair maximizing the likelihood gain
    count(l,r) / (count(l) * count(r)) — rare-but-strongly-associated
    symbols merge first. The ratio is quantized to an exact integer
    score ``(c * 10^9) DIV n_l DIV n_r`` (sequential truncating integer
    division, Spark ``DIV`` == DuckDB ``//``) with the deterministic
    tie-break (score DESC, c DESC, l, r), so the DuckDB oracle replays
    the identical trajectory with zero floating point anywhere — the
    same determinism envelope as the rest of the registry.

    Scale shape matches :func:`bpe_train`: both per-round aggregates
    (pair counts and unigram symbol counts) scan the vocab-sized word-
    TYPE table, the join of the two is model-sized, and only the single
    winning row crosses the driver per round. The merge application is
    the same pure-JVM :func:`merge_fold`. ``wf``: optional precomputed
    (word, freq) table — see :func:`bpe_train`.
    """
    own_wf = wf is None
    wf = word_freqs(docs, text_col).persist() if own_wf else wf
    total = wf.select(
        F.sum((F.length("word") + 1) * F.col("freq")).cast("long")
    ).first()[0]
    assert total is not None and total <= _WP_C_MAX, (
        f"corpus symbol total {total} leaves no 64-bit headroom for the "
        f"10^9-scaled WordPiece score; shard the corpus or lower the scale"
    )
    syms_tbl = wf.select("word", "freq", base_symbols(F.col("word")).alias("syms"))
    merges: list[tuple[int, str, str, int, int]] = []
    try:
        for rank in range(n_merges):
            pc = _pair_counts(syms_tbl)
            sc = (
                syms_tbl.select("freq", F.explode("syms").alias("sym"))
                .groupBy("sym")
                .agg(F.sum("freq").alias("n"))
            )
            top = (
                pc.join(sc.withColumnRenamed("sym", "l").withColumnRenamed("n", "n_l"), "l")
                .join(sc.withColumnRenamed("sym", "r").withColumnRenamed("n", "n_r"), "r")
                .withColumn(
                    "score_fp9",
                    F.expr(f"(c * CAST({WP_SCORE_SCALE} AS BIGINT)) DIV n_l DIV n_r"),
                )
                .orderBy(
                    F.col("score_fp9").desc(),
                    F.col("c").desc(),
                    F.col("l").asc(),
                    F.col("r").asc(),
                )
                .limit(1)
                .collect()
            )
            if not top:
                break
            l, r = top[0]["l"], top[0]["r"]
            merges.append((rank, l, r, int(top[0]["c"]), int(top[0]["score_fp9"])))
            syms_tbl = syms_tbl.withColumn("syms", merge_fold(F.col("syms"), l, r))
            if (rank + 1) % checkpoint_every == 0:
                syms_tbl = syms_tbl.localCheckpoint()
    finally:
        if own_wf:
            wf.unpersist()
    return merges


def bpe_encode_words(
    words: DataFrame, merges: list[tuple], word_col: str = "word"
) -> DataFrame:
    """Apply the merge table (in rank order) to word types: adds
    ``bpe_syms`` (array) and ``n_bpe`` (symbol count incl. the
    end-of-word sentinel). Accepts BPE (rank, l, r, count) or WordPiece
    (rank, l, r, count, score) rows — the fold only needs (l, r)."""
    syms = base_symbols(F.col(word_col))
    for row in sorted(merges):
        l, r = row[1], row[2]
        syms = merge_fold(syms, l, r)
    return words.withColumn("bpe_syms", syms).withColumn("n_bpe", F.size("bpe_syms"))


def bpe_corpus_stats(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    group_col: str = "lang",
    text_col: str = "text",
    occ: DataFrame | None = None,
    types: DataFrame | None = None,
) -> DataFrame:
    """Per-group compression report: whitespace tokens, characters, and
    BPE symbols over the corpus — encoded on word TYPES and joined back
    to per-group occurrence counts, so the merge folds run over the
    vocabulary, never the corpus.

    ``occ``: optional precomputed (group, word, occ) occurrence table
    (caller-persisted if it feeds anything else). ``types``: optional
    word-type frame (one ``word`` column, e.g. the trainer's pinned
    word-frequency table) — without it the type set is derived from
    ``occ``, which then executes twice (once under the encoder's
    broadcast, once in the join)."""
    if occ is None:
        occ = (
            docs.select(group_col, F.explode(F.split(F.col(text_col), " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy(group_col, "word")
            .agg(F.count(F.lit(1)).alias("occ"))
        )
    enc = bpe_encode_words(
        types.select("word") if types is not None else occ.select("word").distinct(),
        merges,
    )
    joined = occ.join(F.broadcast(enc.select("word", "n_bpe")), "word")
    return (
        joined.groupBy(group_col)
        .agg(
            F.sum("occ").cast("long").alias("ws_tokens"),
            F.sum(F.col("occ") * F.length("word")).cast("long").alias("chars"),
            F.sum(F.col("occ") * F.col("n_bpe")).cast("long").alias("bpe_tokens"),
        )
    )
