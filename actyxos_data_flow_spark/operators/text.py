"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything is built from JVM-side expressions (regexp, higher-order
array functions) — no Python in the hot path — and from engine-portable
primitives so DuckDB oracles replicate results exactly. Every ratio or
score is fp6 fixed-point — (numerator·10^6) DIV denominator over exact
integers — never round(double, k), which splits across engine builds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import cache

# Per-language stopword lists for the n-gram/stopword-hit language-ID
# heuristic. Tiny on purpose: the heuristic is argmax of hit *ratios*;
# real deployments swap in fuller lists (the plan shape is unchanged —
# an array-filter per language, no joins, no shuffles).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "es": ("el", "los", "y", "es", "que", "un", "para"),
    "fr": ("le", "la", "et", "est", "que", "un", "pour"),
    "zh": ("的", "是", "了", "在", "和", "有", "不"),
}

# BPE-ish token pattern: letter runs, digit runs, single punctuation.
# ASCII-only classes so Java regex (Spark) and RE2 (DuckDB) agree.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", F.split(F.col(text_col), " "))


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count, regex (BPE-ish) token count, char count."""
    t = with_tokens(df, text_col)
    return t.select(
        id_col,
        F.size("tokens").alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{TOKEN_PATTERN}', 0)")).alias("re_tokens"),
        F.length(text_col).alias("n_chars"),
    )


# fp6 fixed-point scale for quality/ratio columns: 1.0 == 1_000_000.
# Round-8 contract: every hashed ratio is an INTEGER produced by
# integer division of exact integer numerators — round(double, 6) of an
# exact rational can land ON a 6dp half-boundary where the two engines'
# double-round implementations legitimately split (the round-7 driver
# incident). Spark DIV and DuckDB // share toward-zero truncation.
QFP6 = 10**6

_EN_ARR_SQL = "array(" + ",".join(repr(w) for w in LANG_STOPWORDS["en"]) + ")"


def _q_terms_sql(tok: str, text_col: str) -> tuple[str, str, str, str, str, str]:
    """Shared Spark-SQL fragments (n_tok, chars, and the four fp6 score
    terms) over a tokens expression ``tok``."""
    ntok = f"CAST(size({tok}) AS BIGINT)"
    hits = f"CAST(size(filter({tok}, t -> array_contains({_EN_ARR_SQL}, t))) AS BIGINT)"
    dist = f"CAST(size(array_distinct({tok})) AS BIGINT)"
    chars = f"(CAST(length({text_col}) AS BIGINT) - {ntok} + 1)"
    t1 = f"least({ntok} * 10000, CAST({QFP6} AS BIGINT))"
    t2 = f"least(({hits} * {5 * QFP6}) DIV {ntok}, CAST({QFP6} AS BIGINT))"
    t3 = f"({dist} * {QFP6}) DIV {ntok}"
    t4 = (
        f"(CASE WHEN {chars} >= 3 * {ntok} AND {chars} <= 10 * {ntok} "
        f"THEN {QFP6} ELSE 0 END)"
    )
    return ntok, chars, t1, t2, t3, t4


def quality_col(text_col: str = "text") -> Column:
    """The combined quality score as ONE column expression over the raw
    text — fp6 BIGINT in [0, 10^6] (same formula as
    :func:`quality_score`) — for callers that want to gate inline in a
    projection instead of joining the score table back (one scan, zero
    shuffles). score_fp6 = (t1+t2+t3+t4) DIV 4 with
    t1 = min(n_tok·10^4, 10^6)              (length saturation)
    t2 = min((stop_hits·5·10^6) DIV n_tok, 10^6)  (stopword ratio ×5)
    t3 = (n_distinct·10^6) DIV n_tok        (repetition)
    t4 = [3 ≤ mean_wlen ≤ 10]·10^6 via 3·n_tok ≤ chars ≤ 10·n_tok
    — all exact integer arithmetic, no doubles anywhere."""
    tok = f"split({text_col}, ' ')"
    _, _, t1, t2, t3, t4 = _q_terms_sql(tok, text_col)
    return F.expr(f"(({t1} + {t2} + {t3} + {t4}) DIV 4)")


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: length, mean word length, stopword
    ratio, repetition (distinct/total tokens) — combined into one
    score. All ratio columns are fp6 BIGINTs from integer division
    (exact on any engine build); pure column arithmetic, one pass, no
    shuffle."""
    t = with_tokens(df, text_col)
    ntok, chars, t1, t2, t3, t4 = _q_terms_sql("tokens", text_col)
    return t.select(
        id_col,
        F.size("tokens").alias("n_tokens"),
        F.expr(f"({chars} * {QFP6}) DIV {ntok}").alias("mean_word_len_fp6"),
        F.expr(f"(CAST(size(filter(tokens, t -> array_contains({_EN_ARR_SQL}, t))) AS BIGINT) * {QFP6}) DIV {ntok}").alias("stopword_ratio_fp6"),
        F.expr(f"(CAST(size(array_distinct(tokens)) AS BIGINT) * {QFP6}) DIV {ntok}").alias("distinct_ratio_fp6"),
        F.expr(f"(({t1} + {t2} + {t3} + {t4}) DIV 4)").alias("quality_fp6"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: per language, the fraction of tokens in
    its stopword list; argmax wins, ties break alphabetically (fixed
    CASE precedence). Array-filter per language — no explode, no join.
    The argmax compares raw HIT COUNTS (the ratios share the n_tok
    denominator, so hit-count order == ratio order — pure integer
    compares); the reported scores are fp6 BIGINTs from integer
    division."""
    t = with_tokens(df, text_col)
    n_tok = F.size("tokens").cast("long")

    def _hits(words: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter("tokens", lambda x: F.array_contains(arr, x))).cast("long")

    hits = {lang: _hits(words) for lang, words in LANG_STOPWORDS.items()}
    langs = sorted(LANG_STOPWORDS)  # CASE order = alphabetical tie-break
    best = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = hits[lang] >= hits[other]
            cond = c if cond is None else (cond & c)
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    arrs = {
        lang: "array(" + ",".join(repr(w) for w in words) + ")"
        for lang, words in LANG_STOPWORDS.items()
    }
    out_cols = [
        F.expr(
            f"(CAST(size(filter(tokens, t -> array_contains({arrs[lang]}, t))) AS BIGINT)"
            f" * {QFP6}) DIV CAST(size(tokens) AS BIGINT)"
        ).alias(f"score_{lang}_fp6")
        for lang in langs
    ]
    return t.select(id_col, best.alias("lang_pred"), *out_cols)


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 4, n: int = 3) -> DataFrame:
    """Bottom-k sketch fingerprint: the k lexicographically-smallest
    md5(word n-gram) hashes, concatenated. A stable content fingerprint
    robust to local edits (winnowing-style); equal fingerprints ⇒
    near-identical documents."""
    from .dedup import shingle_arrays

    # r12: row-local form — per-doc distinct shingles, md5 per element,
    # sort, take k: same value as the historical explode → groupBy →
    # collect_set formulation with zero Exchange (guide §2.4)
    from ..sources.tables import ensure_parallelism

    sets = shingle_arrays(ensure_parallelism(df), id_col=id_col, text_col=text_col, n=n)
    hs = F.array_sort(
        F.array_distinct(
            F.transform(F.col("_sh"), lambda x: F.md5(x.cast("binary")))
        )
    )
    return sets.select(
        id_col,
        F.array_join(F.slice(hs, 1, k), "").alias("fingerprint"),
    )


def normalize(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Canonical text cleanup for dedup/fingerprint pipelines: lowercase,
    non-alphanumerics → space, whitespace collapsed, trimmed. Pure JVM
    column expressions (regexp_replace in codegen) — zero Python, and a
    deterministic pre-step that makes exact-dedup digests robust to
    case/punctuation noise. Patterns are RE2-compatible so SQL oracles
    replicate them verbatim."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return df.select(id_col, norm.alias("norm_text"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default: float = 0.0,
    salt: str = "sample:1",
) -> DataFrame:
    """Deterministic per-stratum subsampling — the training-data
    rebalancing primitive (e.g. downsample dominant languages). A row
    survives iff a 60-bit hash of (salt, id) falls under its stratum's
    fraction: pure filter, no shuffle, no RNG state — the SAME rows are
    kept on every run, every cluster topology, and in the SQL oracle
    (md5 is the engine-portable hash, as in operators/dedup). Fractions
    are exact in distribution over the hash space, not row-exact."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")).cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    scale = 1 << 60
    frac = F.lit(default)
    for k, v in fractions.items():
        frac = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(frac)
    return df.filter(h < (frac * scale).cast("long"))


# RE2-compatible (no lookaround), so SQL oracles replicate verbatim.
PII_PATTERNS = (
    # order matters: IPs before phones — dotted quads are a subset of
    # the permissive phone charset and must claim their token first
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (r"\+?[0-9][0-9() .-]{7,}[0-9]", "<PHONE>"),
)


def scrub_pii(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Replace emails, phone-like digit runs, and IPv4 literals with
    typed placeholder tokens — the standard pre-training privacy scrub.
    Chained ``regexp_replace`` JVM expressions (one projection, codegen,
    no Python); patterns are deliberately RE2-safe so the same literals
    run in any engine. Emits the scrubbed text plus a per-row count of
    redactions (cheap drift monitor: a corpus whose redaction rate jumps
    changed upstream)."""
    scrubbed = F.col(text_col)
    for pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    n_redacted = F.lit(0)
    for _, token in PII_PATTERNS:
        n_redacted = n_redacted + F.size(F.split(scrubbed, F.lit(token))) - 1
    return df.select(id_col, scrubbed.alias("scrubbed_text"), n_redacted.alias("n_redacted"))


# Repetition thresholds (token-fraction analogues of the Gopher paper's
# repetitive-text filters, adapted to single-line token streams).
# fp6 integer thresholds (0.10 / 0.20): the gates compare fp6 integer
# fractions, so membership in `repetitive` is engine-build-proof
TOP_BIGRAM_MAX_FP6 = 100_000
DUP_TRIGRAM_MAX_FP6 = 200_000


def _max_run_length(arr_sql: str) -> str:
    """SQL expr: highest frequency of any element in an array, computed
    per-row as sort + linear run-length scan — no explode, no shuffle.
    O(n log n) per document regardless of corpus size."""
    step = "if(x <=> acc.prev, acc.run + 1, 1)"
    return f"""aggregate(
        array_sort({arr_sql}),
        struct(cast(null as string) as prev, 0 as run, 0 as best),
        (acc, x) -> struct(x as prev, {step} as run, greatest(acc.best, {step}) as best),
        acc -> acc.best)"""


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_bigram_max_fp6: int = TOP_BIGRAM_MAX_FP6,
    dup_trigram_max_fp6: int = DUP_TRIGRAM_MAX_FP6,
) -> DataFrame:
    """Gopher-style repetition filters over token n-grams: fraction of
    tokens taken by the single most frequent unigram / bigram, and the
    fraction of trigram occurrences that are repeats. Docs with < 3
    tokens drop out (no trigram denominator).

    ``repetitive`` flags docs over either threshold — the signal a
    corpus-cleaning pipeline gates on (boilerplate, keyword stuffing,
    generation loops).

    Scale shape: entirely per-row JVM column expressions (array_sort +
    run-length fold, array_distinct) — zero shuffles, zero Python, so
    the operator is embarrassingly parallel at any corpus size; the
    explode/groupBy formulation would shuffle every token in the
    corpus instead."""
    t = with_tokens(df, text_col).filter(F.size("tokens") >= 3)
    bigrams = (
        "transform(sequence(1, size(tokens) - 1),"
        " i -> concat(element_at(tokens, i), ' ', element_at(tokens, i + 1)))"
    )
    trigrams = (
        "transform(sequence(1, size(tokens) - 2),"
        " i -> concat_ws(' ', slice(tokens, i, 3)))"
    )
    t = t.select(
        id_col,
        F.size("tokens").alias("n_tokens"),
        F.expr(_max_run_length("tokens")).alias("_uc"),
        F.expr(_max_run_length(bigrams)).alias("_bc"),
        F.expr(f"size({trigrams})").alias("_tt"),
        F.expr(f"size(array_distinct({trigrams}))").alias("_td"),
        F.size("tokens").cast("long").alias("_n"),
    )
    # fp6 integer fractions ((x·10^6) DIV denom) — exact rational
    # quotients through round() were the round-7 cross-engine hazard
    t = t.select(
        id_col,
        "n_tokens",
        F.expr("(_uc * 1000000) DIV _n").alias("top_unigram_frac_fp6"),
        F.expr("(_bc * 1000000) DIV (_n - 1)").alias("top_bigram_frac_fp6"),
        F.expr("((_tt - _td) * 1000000) DIV _tt").alias("dup_trigram_frac_fp6"),
        # the top bigram must actually REPEAT to count against the doc —
        # otherwise every short all-distinct doc trips the ratio gate
        ((F.col("_bc") >= 2) & (F.expr("(_bc * 1000000) DIV (_n - 1)") >= top_bigram_max_fp6)).alias("_brep"),
    )
    return t.withColumn(
        "repetitive", F.col("_brep") | (F.col("dup_trigram_frac_fp6") >= dup_trigram_max_fp6)
    ).drop("_brep")


# floor(2^60 / 10^6): per-fp6-unit hash-threshold step. Integer, so the
# keep threshold p_fp6·WSAMPLE_STEP is exact BIGINT arithmetic on both
# engines (the old double p·2^60 cast was correct but re-introduced a
# double into sample MEMBERSHIP).
WSAMPLE_STEP = (1 << 60) // 10**6


def weighted_sample(
    df: DataFrame,
    weight_fp6_col: str,
    id_col: str = "doc_id",
    floor_fp6: int = 50_000,
    salt: str = "wsample:1",
) -> DataFrame:
    """Quality-weighted deterministic subsampling: a row survives iff
    its 60-bit id-hash falls under its own per-row keep probability
    ``clamp(weight_fp6, floor_fp6, 10^6)`` fp6 units — higher-quality
    rows are kept at proportionally higher rates, but nothing is
    excluded outright (``floor_fp6``). Same hash scheme as
    :func:`stratified_sample`: pure per-row filter, no shuffle, no RNG,
    identical output on every run / topology / SQL oracle; the
    threshold p_fp6·⌊2^60/10^6⌋ is exact integer arithmetic. Rows at
    the full weight p_fp6 = 10^6 are kept UNCONDITIONALLY (the integer
    step truncates ⌊2^60/10^6⌋, so 10^6·STEP < 2^60 would drop a
    ~7·10^-13 hash sliver of weight-1.0 rows otherwise)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")).cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    p = F.least(F.greatest(F.col(weight_fp6_col), F.lit(floor_fp6)), F.lit(10**6))
    return df.filter((p == F.lit(10**6)) | (h < p * F.lit(WSAMPLE_STEP)))


def chunk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    overlap: int = 8,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Context-window chunking: split each document into token windows
    of ``size`` with ``overlap`` tokens carried between consecutive
    chunks (stride = size − overlap) — the pre-tokenization step that
    turns long documents into trainable sequences.

    Output: (id, chunk_id, chunk_text, chunk_tokens). The final chunk
    may be short; documents shorter than one stride yield one chunk.

    Scale shape: per-row sequence + slice array expressions and ONE
    posexplode — no shuffle, no Python; chunk count per row is
    ceil((n-overlap)/stride), so output size is linear in corpus
    tokens, fanned out at the scan."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    t = with_tokens(df, text_col).withColumn("_n", F.size("tokens"))
    starts = F.expr(f"sequence(1, greatest(1, _n - {overlap}), {stride})")
    ex = t.select(id_col, *extra_cols, "tokens", "_n", F.posexplode(starts).alias("_i", "_s"))
    piece = F.expr(f"slice(tokens, _s, {size})")
    return ex.select(
        id_col,
        *extra_cols,
        F.col("_i").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("chunk_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    shard_col: str = "lang",
    budget: int = 2048,
    order_cols: tuple[str, ...] | None = None,
    num_range_partitions: int | None = None,
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-token-budget
    training bins. Within each shard, documents are laid end-to-end in
    deterministic (order_cols) order and a document lands in the bin
    where its span begins — the streaming-pack heuristic (bins can
    overflow by at most one document's tail; exact bin-packing is
    NP-hard and order-dependent, useless for a reproducible pipeline).

    Scale shape — two-level prefix sum, NO per-shard window: a single
    ``Window.partitionBy(shard)`` would make the dominant language one
    sort partition (= one task sorting tens of TB at corpus scale).
    Instead:

    1. ``repartitionByRange(shard, *order)`` — every partition holds a
       CONTIGUOUS slice of the packing order, with size set by the
       shuffle-partition config, not by shard skew.
    2. local running sum within (shard, range-partition) — bounded sort.
    3. per-(shard, partition) totals (tiny: partitions × shards rows)
       get an exclusive prefix sum per shard and broadcast back; adding
       the offset reconstructs the EXACT global running sum, because
       range partitions are contiguous in the order key.

    Output values are identical to the single-window formulation for
    any boundary placement, so the oracle (one SQL window) still
    hash-matches. Output: (shard, id, length, bin_id, bin_offset).
    """
    from pyspark.sql import Window

    order = order_cols or (id_col,)
    range_keys = [F.col(shard_col).asc()] + [F.col(c).asc() for c in order]
    # Both branches below (local running sum, per-partition totals) must
    # observe the SAME physical range partitioning — `_pid` appears in
    # both and the join reconciles them. Relying on ReuseExchange to
    # dedupe the two range shuffles is fragile (config- and
    # plan-canonicalization-dependent); persist pins one
    # InMemoryRelation that both branches scan, so `_pid` agrees by
    # construction even if exchange reuse is off. The cache is
    # MEMORY_AND_DISK and LRU-evictable (an evicted block recomputes
    # from the SAME InMemoryRelation instance, so the boundaries stay
    # consistent). It cannot be unpersisted here — the returned plan
    # still reads it lazily — so cache.pin defers the release to the
    # moment the enclosing query's result is dropped.
    #
    # r12 (guide §2.3): no explicit partition COUNT unless the caller
    # pins one — an explicit count disables AQE coalescing on the range
    # exchange, burning shuffle-partition-config tasks on any input
    # (200 window tasks over KBs locally; a non-adaptive constant on a
    # cluster). AQE-coalesced ranges merge ADJACENT slices, so every
    # partition still holds a contiguous run of the packing order and
    # the two-level sum is value-identical for any boundary placement.
    ranged = (
        df.repartitionByRange(num_range_partitions, *range_keys)
        if num_range_partitions
        else df.repartitionByRange(*range_keys)
    )
    ranged = cache.pin(ranged.withColumn("_pid", F.spark_partition_id()))

    w_local = (
        Window.partitionBy(shard_col, "_pid")
        .orderBy(*[F.col(c).asc() for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "_lstart", (F.sum(len_col).over(w_local) - F.col(len_col)).cast("long")
    )

    # Exclusive prefix of per-(shard, pid) totals. The totals table is
    # O(num_partitions × shards) rows — metadata-sized even at 100 TB —
    # so its per-shard window is safe, and the join back is broadcast.
    totals = ranged.groupBy(shard_col, "_pid").agg(
        F.sum(len_col).cast("long").alias("_tot")
    )
    w_prefix = (
        Window.partitionBy(shard_col)
        .orderBy(F.col("_pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        shard_col, "_pid", F.coalesce(F.sum("_tot").over(w_prefix), F.lit(0)).alias("_off")
    )

    start = (F.col("_lstart") + F.col("_off")).cast("long")
    out_keys = [id_col] + [c for c in order if c != id_col]
    return (
        local.join(F.broadcast(offsets), [shard_col, "_pid"])
        .select(
            shard_col,
            *out_keys,
            F.col(len_col),
            F.floor(start / budget).alias("bin_id"),
            (start % budget).alias("bin_offset"),
        )
    )


def sample_exact_k(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ksample:1",
) -> DataFrame:
    """Exact-size deterministic sample: the k rows with the smallest
    salted id-hash per stratum — a fixed BUDGET per class (eval-set
    carve-outs, per-language pilot corpora), where stratified_sample's
    fractions give only an expected size. No RNG: re-runs, engines, and
    topologies pick the identical rows, and growing the corpus only
    swaps rows in/out by hash rank (stable carve-outs under append).

    Scale shape: one exchange on the stratum key + per-stratum TOP-K
    rank. Strata are classes (languages/sources) — if one stratum is
    the whole corpus, use the two-phase salted top-k in operators/skew
    instead (same contract, pre-aggregated per salt shard)."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")).cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(strata_col).orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        df.withColumn("_h", h)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_h", "_rk")
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Phrase mining by pointwise mutual information: for every adjacent
    token bigram, PMI = ln(P(xy) / (P(x)P(y))) — high-PMI bigrams are
    collocations ("new york"-style units) worth fusing before tokenizer
    training; frequent-but-independent pairs score near 0, and the
    ``min_count`` support floor drops one-off noise.

    PMI rounds to 6 (engines' ln may differ a last ulp) and counts are
    exact integers, so results are engine-portable.

    Scale shape: two explode + hash-aggregate passes over the corpus
    (unigrams, bigrams — both map-side combined), then the bigram table
    joins the tiny unigram-count table twice; at web scale the unigram
    side still fits broadcast (vocabulary ≪ corpus)."""
    toks = with_tokens(df, text_col).select("tokens")
    uni = (
        toks.select(F.explode("tokens").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tokens) - 1),"
                    " i -> struct(element_at(tokens, i) AS x, element_at(tokens, i + 1) AS y))"
                )
            ).alias("b")
        )
        .select("b.x", "b.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cxy"))
        .filter(F.col("cxy") >= min_count)
    )
    n_uni = uni.agg(F.sum("c").alias("_n")).collect()[0]["_n"]
    n_bi_total = float(max(n_uni - 1, 1))  # bigram population ~ N per doc-aware? kept simple: N
    cx = F.broadcast(uni.select(F.col("w").alias("x"), F.col("c").alias("cx")))
    cy = F.broadcast(uni.select(F.col("w").alias("y"), F.col("c").alias("cy")))
    pmi = F.round(
        F.log(
            (F.col("cxy").cast("double") * F.lit(float(n_uni)) * F.lit(float(n_uni)))
            / (F.lit(n_bi_total) * F.col("cx").cast("double") * F.col("cy").cast("double"))
        ),
        6,
    )
    return bi.join(cx, "x").join(cy, "y").select("x", "y", "cxy", "cx", "cy", pmi.alias("pmi"))


def lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality proxy: train a unigram LM on
    the corpus itself (add-one smoothed), score each document by its
    mean token log-probability. Documents far below the corpus norm
    (gibberish, wrong-language, boilerplate soups) score low — the
    classic perplexity-bucket filter with the n-gram model standing in
    for KenLM (swap the probability table; the plan is unchanged).

    Per-token log-probs round to 6 before the per-doc mean (ln() ulp
    portability, as in TF-IDF/PMI); the mean sums those 6dp values in
    DECIMAL (exact, order-free) and divides once, emitted UNROUNDED —
    re-rounding the quotient can land on a half-ulp boundary where
    engines' round() disagree (see lm_score_bigram).

    Scale shape: one explode+aggregate builds the vocab table (map-side
    combined); scoring joins tokens to the broadcast vocab and
    re-aggregates per doc — two shuffles total, both narrow."""
    toks = with_tokens(df, text_col).select(id_col, F.explode("tokens").alias("w"))
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.agg(F.sum("c").alias("_n"), F.count(F.lit(1)).alias("_v")).collect()[0]
    n, v = int(totals["_n"]), int(totals["_v"])
    logp = F.round(
        F.log((F.col("c").cast("double") + 1) / F.lit(float(n + v))), 6
    )
    scored = toks.join(F.broadcast(vocab.select("w", logp.alias("_lp"))), "w")
    d = F.col("_lp").cast("decimal(12,6)")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum(d).cast("double") / F.count(F.lit(1))).alias("mean_logp"),
    )


def assign_splits(
    df: DataFrame,
    splits: tuple[tuple[str, float], ...] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    id_col: str = "doc_id",
    salt: str = "split:1",
) -> DataFrame:
    """Deterministic train/val/test assignment: the 60-bit salted id
    hash (same scheme as :func:`stratified_sample`) lands in one of the
    cumulative-fraction buckets. No RNG, no shuffle — a pure per-row
    projection — so every run, engine, and topology agrees on every
    document's split, and growing the corpus never reassigns an
    existing id (the property that keeps eval sets frozen under
    append). Bucket boundaries are precomputed INTEGER thresholds, so
    there is no float-boundary disagreement between engines."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")).cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    expr, cum = None, 0.0
    for name, frac in splits[:-1]:
        cum += frac
        thr = int(cum * (1 << 60))
        expr = F.when(h < thr, name) if expr is None else expr.when(h < thr, name)
    expr = (expr.otherwise(splits[-1][0]) if expr is not None else F.lit(splits[-1][0]))
    return df.withColumn("split", expr)


def vocab_coverage(
    df: DataFrame,
    vocab_size: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-prep coverage analysis: build the top-``vocab_size``
    token vocabulary (count desc, token asc tie-break) and score every
    document's out-of-vocabulary fraction against it — the signal for
    sizing a vocab / spotting domains a tokenizer will shred into
    bytes. Output: (id, n_tokens, n_oov, oov_frac_fp6 — exact fp6 integer).

    Scale shape: the vocab pick runs over the TOKEN TYPE count table
    (map-side combined aggregate) via ``orderBy + limit`` — Spark plans
    that as TakeOrderedAndProject, a distributed per-partition top-k
    merged on the driver, NOT a single-partition global sort (token
    types reach 10^8 at web scale; an unpartitioned row_number window
    would funnel them through one task). The chosen vocab (vocab_size
    rows) broadcasts into the per-doc join, so the corpus shuffles only
    for its own (doc) aggregate."""
    toks = with_tokens(df, text_col).select(id_col, F.explode("tokens").alias("w"))
    cnt = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        cnt.orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(vocab_size)
        .select("w", F.lit(1).alias("_inv"))
    )
    per = (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return per.select(
        id_col,
        "n_tokens",
        "n_oov",
        F.expr("(n_oov * 1000000) DIV n_tokens").alias("oov_frac_fp6"),
    )


def _iroot5(m: int) -> int:
    """Exact ⌊m^(1/5)⌋ on Python integers (double candidate, exact
    integer adjustment — the libm value only SEEDS the search)."""
    if m <= 0:
        return 0
    p = max(int(float(m) ** 0.2), 1)
    while p > 0 and p**5 > m:
        p -= 1
    while (p + 1) ** 5 <= m:
        p += 1
    return p


def alpha3_10_p6(n: int, total: int) -> int:
    """EXACT integer ≈10^6·(n/total)^0.3 — the α=3/10 temperature
    kernel, defined (not approximated) as the composition

        u  = (n·10^9) DIV total          -- truncated 9dp share
        y  = isqrt(u³·10³)               -- = ⌊10^15·(u/10^9)^1.5⌋
        p6 = iroot5(y·10^15)             -- = ⌊(10^30·share^1.5)^(1/5)⌋

    Every step is integer arithmetic bounded by 10^30, so the same
    definition evaluates in DuckDB HUGEINT / Spark DECIMAL(38,0) /
    Python int with BIT-IDENTICAL results — no libm value ever reaches
    the output (round(pow(share, α), 6) was driver-red in round 8: an
    irrational can still sit within one cross-build-libm ulp of a 6dp
    half-boundary). p6(total, total) = iroot5(10^30) = 10^6 exactly."""
    import math

    u = (n * 10**9) // total
    y = math.isqrt(u * u * u * 1000)
    return _iroot5(y * 10**15)


def mix_weights(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-smoothed mixture weights (the T5/mT5 α-sampling
    rule): a group's sampling probability is share^α renormalized —
    α=1 keeps natural proportions, α→0 approaches uniform, between
    the two it up-weights small sources without drowning large ones.
    Output: (group, n, mix_weight_fp6), Σ mix_weight ≈ 10^6.

    Engine portability: share^0.3 is :func:`alpha3_10_p6` — an exact
    integer isqrt/iroot5 composition with zero libm in its value (the
    double sqrt/pow only seed candidates that exact integer compares
    verify), so every engine computes the identical fp6 integer; the
    normalizing sum and the final ratio ((p6·10^6) DIV z) are pure
    integer arithmetic. Output mix_weight_fp6 in [0, 10^6]. Only
    α = 3/10 has the exact kernel (10th root = sqrt∘5th-root within
    38-digit bounds); other α would need their own root ladder.

    Scale shape: one map-side-combined count aggregate reduces the
    corpus to the |groups|-row model table; the root ladder runs
    driver-side on those few rows (the BPE-winning-pair/k-means-
    centroid pattern) and the result is a broadcast-sized literal
    frame — the corpus itself never leaves the executors."""
    if alpha != 0.3:
        raise ValueError("mix_weights: only alpha=0.3 has the exact integer kernel")
    c = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    rows = c.collect()  # model-sized: one row per source/domain
    total = sum(int(r["n"]) for r in rows)
    p6s = [(r[group_col], int(r["n"]), alpha3_10_p6(int(r["n"]), total)) for r in rows]
    z = sum(p for _, _, p in p6s)
    spark = df.sparkSession
    out_schema = T.StructType(
        [
            df.schema[group_col],
            T.StructField("n", T.LongType(), False),
            T.StructField("mix_weight_fp6", T.LongType(), False),
        ]
    )
    data = [(g, n, (p * 10**6) // z) for g, n, p in p6s]
    return spark.createDataFrame(data, out_schema)


def lm_score_bigram(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
) -> DataFrame:
    """Bigram-interpolated LM quality proxy — one step from
    :func:`lm_score` toward the KenLM n-gram filters of CCNet: each
    token after the first scores ln(λ·p(w|prev) + (1−λ)·p(w)), with
    add-one-smoothed conditional and unigram probabilities trained on
    the corpus itself; the doc score is the mean over scored tokens.
    Low scorers read as gibberish/boilerplate even when their unigram
    mix looks normal (the bigram term sees broken word ORDER).

    Portability: the interpolated probability is computed in doubles
    from exact integer counts and rounded to 6dp (ln() ulp); the
    per-doc mean sums those 6dp values in DECIMAL (exact, order-free)
    and divides ONCE — emitted UNROUNDED, because the division of an
    exact sum is already bit-identical everywhere, while re-rounding
    the quotient can land on a half-ulp boundary where engines'
    round() disagree (observed: -143.903361/42).

    Scale shape: two explode+hash-aggregate passes (unigram, bigram
    counts — map-side combined); scoring joins the token stream to the
    broadcast unigram table and to the bigram table on (prev, w), then
    one per-doc aggregate."""
    toks = with_tokens(df, text_col).select(
        id_col,
        F.posexplode("tokens").alias("_i", "w"),
    )
    prev = toks.select(id_col, (F.col("_i") + 1).alias("_i"), F.col("w").alias("prev"))
    stream = toks.join(prev, [id_col, "_i"])  # rows 2..n with (prev, w)
    uni = (
        with_tokens(df, text_col)
        .select(F.explode("tokens").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = stream.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("cxy"))
    totals = uni.agg(F.sum("c").alias("_n"), F.count(F.lit(1)).alias("_v")).collect()[0]
    n, v = int(totals["_n"]), int(totals["_v"])
    cu = F.broadcast(uni.select("w", F.col("c").alias("cw")))
    cp = F.broadcast(uni.select(F.col("w").alias("prev"), F.col("c").alias("cprev")))
    p_uni = (F.col("cw").cast("double") + 1) / F.lit(float(n + v))
    p_bi = (F.col("cxy").cast("double") + 1) / (F.col("cprev").cast("double") + v)
    logp = F.round(F.log(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni), 6)
    scored = (
        stream.join(cu, "w")
        .join(cp, "prev")
        .join(bi, ["prev", "w"])
        .select(id_col, logp.alias("_lp"))
    )
    d = F.col("_lp").cast("decimal(12,6)")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        (F.sum(d).cast("double") / F.count(F.lit(1))).alias("mean_logp"),
    )


def epoch_schedule(
    df: DataFrame,
    group_col: str = "source",
    size_col: str = "n_chars",
    id_col: str = "doc_id",
    alpha: float = 0.3,
    budget_num: int = 17,
    budget_den: int = 10,
    salt: str = "mix:1",
) -> DataFrame:
    """Epoch-aware domain-mixing schedule — the step AFTER
    :func:`mix_weights`: turn the α-temperature target mixture into an
    actual, materialized sampling plan over a fixed token budget
    (transposing the reference's deterministic-replay posture,
    src/flow.rs:28-41, onto the corpus-mixing plane). Every LLM
    pretraining pipeline needs this exact artifact: which documents,
    from which domain, repeated how many times (epochs), in what
    deterministic order.

    Mechanics (all engine-portable, no RNG state):
    - global budget B = Σ size · budget_num // budget_den (pure
      integer, scale-invariant);
    - per-domain budget: floor(B · mix_weight + 0.5) in pure integer
      form (2·B·w_fp6 + 10^6) DIV (2·10^6) — mix_weight is the exact
      fp6 temperature weight (:func:`alpha3_10_p6`, identical integer
      in any engine), and floor(x+0.5) is the cross-engine
      quantization convention;
    - domains smaller than their budget replicate: full_epochs =
      budget // domain_size, and the remainder epoch takes a PREFIX of
      the domain's deterministic permutation — docs ordered by a
      salted 60-bit md5 of their id (the stratified_sample hash), so
      the partial epoch is an unbiased, reproducible subset;
    - one output row per (doc, epoch), with a salted per-(doc, epoch)
      md5 schedule key: sorting by it interleaves domains and epochs
      into the final training order WITHOUT any global row_number —
      at 100 TB the consumer range-partitions by sched_key and no
      unpartitioned window ever materializes.

    Scale shape: one size aggregate per domain (map-side combined), the
    |domains|-row budget table broadcast back, and the per-domain
    running sum via the SAME two-level prefix sum as pack_sequences —
    repartitionByRange over (domain, hkey, id) + local window +
    per-(domain, range-partition) offsets — so a 95%-one-domain corpus
    never becomes one sort task (a plain per-domain window would).
    Values are identical to the single-window form for any boundary
    placement, so the one-window SQL oracle still hash-matches. The
    sequence() explode is bounded by the per-doc epoch count. No
    driver loops."""
    from pyspark.sql import Window

    if alpha != 0.3:
        raise ValueError("epoch_schedule: only alpha=0.3 has the exact integer kernel")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")).cast("binary")), 1, 15
        ),
        16,
        10,
    ).cast("long")
    spark = df.sparkSession
    # two-level prefix sum (pack_sequences pattern): range partitions
    # hold contiguous slices of each domain's permutation, sized by
    # AQE (r12, guide §2.3: no explicit count — adjacent-slice
    # coalescing keeps contiguity and the values are boundary-
    # independent) rather than domain skew; persist pins one
    # partitioning so _pid agrees between the local-sum and totals
    # branches
    ranged = cache.pin(
        df.select(group_col, id_col, F.col(size_col).alias("_sz"), h.alias("_hkey"))
        .repartitionByRange(
            F.col(group_col).asc(), F.col("_hkey").asc(), F.col(id_col).asc()
        )
        .withColumn("_pid", F.spark_partition_id())
    )
    # ONE model-sized collect off the pinned frame feeds BOTH the
    # α-temperature weights and the per-domain budgets (round 9 computed
    # them as three separate corpus aggregates — mix_weights' count
    # collect, a sizes agg, a budget agg — re-scanning the composed
    # cleaning DAG each time; that regressed pipeline_mix_batches
    # 0.90→3.90s warm). Reading the stats FROM `ranged` means the
    # corpus (and any upstream cleaning pipeline) is scanned exactly
    # once, at pin-materialization. The integer math is verbatim
    # alpha3_10_p6 / (2·B·w+10^6) DIV 2·10^6 — values unchanged.
    stats = ranged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_sz").cast("long").alias("_dom_sz")
    )
    srows = stats.collect()  # model-sized: one row per domain
    total_n = sum(int(r["_n"]) for r in srows)
    p6s = {r[group_col]: alpha3_10_p6(int(r["_n"]), total_n) for r in srows}
    z = sum(p6s.values()) or 1
    budget = sum(int(r["_dom_sz"]) for r in srows) * budget_num // budget_den
    dom_rows = []
    for r in srows:
        w_fp6 = (p6s[r[group_col]] * 10**6) // z
        dom_budget = (2 * budget * w_fp6 + 10**6) // (2 * 10**6)
        dom_sz = int(r["_dom_sz"])
        if dom_sz <= 0:  # all-empty domain: NULL-div in the SQL form == dropped
            continue
        dom_rows.append((r[group_col], dom_budget // dom_sz, dom_budget % dom_sz))
    # VALUES literal, NOT createDataFrame: a Python-built local relation
    # never compares sameResult with its identically-built twin, which
    # made every downstream pinned subtree invisible to CacheManager's
    # plan matching — repeated runs re-computed the whole schedule+pack
    # DAG (pipeline_mix_batches warm 2.5s instead of ~0.4s, round-10
    # finding #3). Identical stats -> identical VALUES plan -> the
    # repeated query dedupes onto the still-warm cache entries.
    from ..functions.litframe import values_frame

    dom = values_frame(
        spark,
        dom_rows,
        [group_col, "_full_epochs", "_rem"],
        [df.schema[group_col].dataType.simpleString(), "bigint", "bigint"],
    )
    w_local = (
        Window.partitionBy(group_col, "_pid")
        .orderBy(F.col("_hkey").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "_lstart", (F.sum("_sz").over(w_local) - F.col("_sz")).cast("long")
    )
    totals = ranged.groupBy(group_col, "_pid").agg(F.sum("_sz").cast("long").alias("_tot"))
    w_prefix = (
        Window.partitionBy(group_col)
        .orderBy(F.col("_pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        group_col, "_pid", F.coalesce(F.sum("_tot").over(w_prefix), F.lit(0)).alias("_off")
    )
    placed = (
        local.join(F.broadcast(offsets), [group_col, "_pid"])
        .withColumn("_start", (F.col("_lstart") + F.col("_off")).cast("long"))
        .join(F.broadcast(dom), group_col)
        .withColumn(
            "n_epochs",
            (F.col("_full_epochs") + F.when(F.col("_start") < F.col("_rem"), 1).otherwise(0)).cast(
                "int"
            ),
        )
        .filter(F.col("n_epochs") > 0)
    )
    sched_key = F.md5(
        F.concat(
            F.lit(salt + ":sched:"),
            F.col(id_col).cast("string"),
            F.lit(":"),
            F.col("epoch").cast("string"),
        ).cast("binary")
    )
    return (
        placed.select(
            group_col,
            id_col,
            F.col("_sz").alias(size_col),
            "n_epochs",
            F.explode(F.sequence(F.lit(0), F.col("n_epochs") - 1)).alias("epoch"),
        )
        .select(group_col, id_col, size_col, "n_epochs", "epoch", sched_key.alias("sched_key"))
    )


# content-defined chunking: rolling-hash parameters shared verbatim by
# the DuckDB oracle (plans/dedup.py) — all integer arithmetic, so the
# boundary set is bit-identical on any engine build
CDC_WINDOW = 8
CDC_BASE = 256
CDC_MOD = 1_000_003  # prime; window sum stays < 2^63 long before % 
CDC_MASK = 64  # boundary when h % CDC_MASK == 0 → ~len/64 expected chunks


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking (the FastCDC/rsync idea): split each
    document at positions where a rolling polynomial hash of the last
    CDC_WINDOW characters satisfies a mask, so chunk boundaries are a
    function of CONTENT, not offsets — insert one word at the front of
    a document and every downstream boundary re-synchronizes, letting
    partially-overlapping documents share most of their chunk digests
    (the dedup primitive exact digests and shingles both miss: exact
    digests break on any edit, shingles explode per token).

    Output: (id, chunk_idx, chunk, chunk_digest) — one row per chunk in
    document order.

    Engine portability: h_i = Σ_{j<w} ascii(char_{i-j})·B^j (mod M) is
    pure integer arithmetic (per-step mod on the Spark fold ≡ the
    oracle's sum-then-mod: no intermediate exceeds 255·w·M « 2^63), so
    the boundary set — and therefore every chunk string and digest —
    is identical on any build.

    Scale shape: per-row JVM higher-order functions only (char array →
    per-position window hash → boundary filter → slice), O(len·w) work
    in the scan stage, ZERO shuffle — chunking is embarrassingly
    parallel at any corpus size; only the digest aggregate downstream
    shuffles, and it shuffles 16-byte digests, never text."""
    w, b, m = CDC_WINDOW, CDC_BASE, CDC_MOD
    pw = [pow(b, j, m) for j in range(w)]
    pw_lit = "array(" + ", ".join(f"{p}L" for p in pw) + ")"
    # cache.pin = a projection BARRIER, not (only) a cache: Catalyst's
    # CollapseProject would otherwise INLINE this char-array expression
    # into every per-position lambda below — O(len²·w) per row instead
    # of O(len·w) (measured: the uncollapsed form ran minutes on 500
    # docs; the barrier makes it seconds). The pinned intermediate is
    # (id, text, int array) — linear in corpus bytes.
    t = cache.pin(
        df.select(
            id_col,
            F.col(text_col).alias("_t"),
            # split('') is one O(len) pass; per-position substr would be
            # O(len²) (UTF8String substr walks from the front)
            F.expr(f"transform(split({text_col}, ''), c -> ascii(c))").alias("_ch"),
        )
    )
    # rolling hash as 8 shifted-slice zip_with passes with TRIVIAL
    # lambdas (x·pw + acc), not a per-position aggregate() — the
    # aggregate form costs ~10 interpreted expression nodes per
    # (position × window-step) and ran ~20ms/doc; the slice form is
    # w linear passes (measured ~4x faster). slice j holds, at index
    # k, the char code at position i−j for i = w+k−1, so summing the
    # w slices×powers gives h_i for every window end i in one shape.
    acc = f"transform(slice(_ch, {w}, length(_t) - {w - 1}), x -> x * {pw[0]}L)"
    for j in range(1, w):
        acc = (
            f"zip_with({acc}, slice(_ch, {w - j}, length(_t) - {w - 1}),"
            f" (a, x) -> a + x * {pw[j]}L)"
        )
    # boundary positions: window END i (1-based) where h % mask == 0,
    # plus the text end; array_distinct handles len(text) itself
    # satisfying the mask (sum-then-mod ≡ the oracle: max sum
    # 255·w·MOD « 2^63)
    t = t.withColumn(
        "_brk",
        F.expr(
            f"array_sort(array_distinct(concat("
            f"  CASE WHEN length(_t) >= {w} THEN"
            f"    filter(zip_with({acc}, sequence({w}, greatest(length(_t), {w})),"
            f"                    (h, i) -> IF(h % {m} % {CDC_MASK} = 0, i, -1)),"
            f"           i -> i > 0)"
            f"  ELSE array() END,"
            f"  array(length(_t)))))"
        ),
    )
    chunks = t.select(
        id_col,
        F.expr(
            "filter(transform(sequence(1, size(_brk)),"
            "  k -> struct(k AS _k,"
            "              substring(_t, CASE WHEN k = 1 THEN 1 ELSE element_at(_brk, k - 1) + 1 END,"
            "                        element_at(_brk, k) - CASE WHEN k = 1 THEN 0 ELSE element_at(_brk, k - 1) END)"
            "              AS _c)),"
            "  s -> length(s._c) > 0)"
        ).alias("_cs"),
    )
    out = chunks.select(id_col, F.posexplode("_cs").alias("_i", "_s"))
    return out.select(
        id_col,
        (F.col("_i") + 1).alias("chunk_idx"),
        F.col("_s._c").alias("chunk"),
        F.md5(F.col("_s._c").cast("binary")).alias("chunk_digest"),
    )


# -- DSIR: data selection with importance resampling ------------------------

DSIR_BUCKETS = 4096
DSIR_SALT = "dsir:1"
DSIR_TOPK = 150


def _dsir_bucket(tok: Column) -> Column:
    """Token → feature bucket: 60-bit salted md5 mod DSIR_BUCKETS (the
    engine-portable hash idiom shared with stratified_sample)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(DSIR_SALT + ":"), tok).cast("binary")), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(DSIR_BUCKETS))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int = DSIR_TOPK,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): fit hashed bag-of-
    words models on the TARGET domain and the RAW corpus, score every
    raw document by its importance log-ratio Σ_tokens llr(bucket(w)),
    keep the top-k. The per-bucket log-ratio uses the EXACT integer
    log2 kernel (functions/intlog — shift-and-square over scaled
    integers, zero libm):
    ``llr = ilog2_fp20((tcnt+1)/(ccnt+1))`` on the MODEL-sized bucket
    table, plus the global normalizer ``kc = ilog2_fp20((C+B)/(T+B))``
    once per token (log2((tcnt+1)/(T+B) · (C+B)/(ccnt+1)) split by log
    additivity). Every hashed value is an exact BIGINT by construction
    — a first draft with round(ln(·),6) split between engine builds at
    the FIRST scale factor (4096 libm sites ⇒ near-boundary hits are
    certain), which is why this kernel exists.

    Scale shape: two token-count aggregates (map-side combined), a
    ≤4096-row broadcast join onto the raw token stream, one per-doc
    sum, and a TakeOrderedAndProject top-k — the corpus is scanned
    twice and never shuffled beyond the per-doc aggregate. Ties at the
    cut break on doc_id, so the selection is total-order deterministic.
    """
    bkt, kc = dsir_model(raw, target, text_col=text_col)
    return dsir_score_topk(raw, bkt, kc, k=k, id_col=id_col, text_col=text_col)


def _dsir_buckets(df: DataFrame, text_col: str, id_col: str | None = None) -> DataFrame:
    cols = ([id_col] if id_col else []) + [F.explode("tokens").alias("w")]
    out = with_tokens(df, text_col).select(*cols)
    keep = ([id_col] if id_col else []) + [_dsir_bucket(F.col("w")).alias("b")]
    return out.select(*keep)


def dsir_model(
    raw: DataFrame, target: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, int]:
    """Fit the importance model: a COMPLETE ``DSIR_BUCKETS``-row table
    (bucket, llr_ilfp20) — unseen buckets carry the smoothed ccnt=0
    score, so a FROZEN model can score documents it has never seen —
    plus the integer global normalizer kc (added once per token)."""
    from ..functions import intlog

    rtok = _dsir_buckets(raw, text_col)
    ttok = _dsir_buckets(target, text_col)
    tgt = ttok.groupBy("b").agg(F.count(F.lit(1)).alias("tcnt"))
    cor = rtok.groupBy("b").agg(F.count(F.lit(1)).alias("ccnt"))
    # two INDEPENDENT aggregates (mirroring the oracle's separate ct/tt
    # CTEs): routing t_tot through a crossJoin with cor silently
    # collapsed it to 0 when the raw/standing corpus was empty, skewing
    # the global normalizer kc while the oracle kept the real total
    c_tot = int(cor.agg(F.sum("ccnt")).collect()[0][0] or 0)
    t_tot = int(tgt.agg(F.sum("tcnt")).collect()[0][0] or 0)
    assert max(c_tot, t_tot) + DSIR_BUCKETS < (1 << 33), (
        f"token totals ({c_tot}, {t_tot}) exceed the ilog2 kernel's 2^33 "
        f"overflow envelope; shard the counts or widen the kernel"
    )
    # global normalizer, by log additivity: log2(C+B) - log2(T+B),
    # computed with the SAME truncating integer algorithm the in-plan
    # kernel runs, so oracle and driver agree bit-for-bit
    kc = intlog.py_ilog2_fp20(c_tot + DSIR_BUCKETS, t_tot + DSIR_BUCKETS)
    allb = raw.sparkSession.range(DSIR_BUCKETS).select(F.col("id").alias("b"))
    bkt = (
        allb.join(cor, "b", "left")
        .join(tgt, "b", "left")
        .withColumn("tcnt", F.coalesce(F.col("tcnt"), F.lit(0)))
        .withColumn("ccnt", F.coalesce(F.col("ccnt"), F.lit(0)))
        .withColumn("y0", F.expr(f"greatest(((tcnt + 1) * {1 << 30}) DIV (ccnt + 1), 1)"))
        .withColumn("blen", F.length(F.conv(F.col("y0"), 10, 2)).cast("int"))
    )
    from ..functions.intlog import ilog2_cols

    for col, expr in ilog2_cols("y0", "blen", div="DIV"):
        bkt = bkt.withColumn(col, F.expr(expr))
    return bkt.select("b", F.col("ilog2_fp20").alias("llr_ilfp20")), kc


def dsir_score_topk(
    docs: DataFrame,
    bkt: DataFrame,
    kc: int,
    k: int = DSIR_TOPK,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under a (possibly frozen) bucket model and keep
    the deterministic top-k: one broadcast join of the token stream
    against the ≤ DSIR_BUCKETS-row model, one per-doc BIGINT sum, one
    TakeOrderedAndProject."""
    dtok = _dsir_buckets(docs, text_col, id_col=id_col)
    scored = (
        dtok.join(F.broadcast(bkt), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("llr_ilfp20") + F.count(F.lit(1)) * F.lit(kc)).alias(
                "dsir_score_ilfp20"
            ),
        )
    )
    top = scored.orderBy(
        F.col("dsir_score_ilfp20").desc(), F.col(id_col).asc()
    ).limit(k)
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("dsir_score_ilfp20").desc(), F.col(id_col).asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        id_col,
        "n_tokens",
        "dsir_score_ilfp20",
    )


def dsir_delta_select(
    base: DataFrame,
    delta: DataFrame,
    target: DataFrame,
    k: int = DSIR_TOPK,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental DSIR: fit the model on the STANDING corpus (base +
    target) once, then score an appended batch under the frozen model —
    per-batch cost is O(batch), the standing corpus is only touched by
    the (persistable) model build. Unseen buckets score via the
    smoothed ccnt=0 entry, so the frozen model is total. This is the
    serving shape of data selection under continuous ingest; refreshing
    the model is a policy decision, not a correctness one."""
    bkt, kc = dsir_model(base, target, text_col=text_col)
    return dsir_score_topk(delta, bkt, kc, k=k, id_col=id_col, text_col=text_col)
