"""Text-analysis queries over ``documents``, oracles generated from the
same constants (stopword lists, token regex, score weights) as the Spark
operators so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as X
from ..sources import load_table
from . import register

# -- token stats -----------------------------------------------------------

TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '{X.TOKEN_PATTERN}')) AS re_tokens,
       length(text) AS n_chars
FROM documents
"""


@register("text_token_stats", oracle=TOKEN_STATS_ORACLE, bench=True)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.token_stats(load_table(spark, sf_dir, "documents"))


# -- quality score ---------------------------------------------------------

_EN = ", ".join(f"'{w}'" for w in X.LANG_STOPWORDS["en"])

# DuckDB mirror of operators/text.py::_q_terms_sql — fp6 integer score
# terms over a (tokens, text) pair. `//` == Spark `DIV` (toward-zero).
_Q_NTOK = "len(tokens)::BIGINT"
_Q_HITS = f"len(list_filter(tokens, x -> list_contains([{_EN}], x)))::BIGINT"
_Q_DIST = "len(list_distinct(tokens))::BIGINT"
_Q_CHARS = f"(length(text)::BIGINT - {_Q_NTOK} + 1)"
QFP6 = X.QFP6
_Q_T1 = f"least({_Q_NTOK} * 10000, {QFP6})"
_Q_T2 = f"least(({_Q_HITS} * {5 * QFP6}) // {_Q_NTOK}, {QFP6})"
_Q_T3 = f"({_Q_DIST} * {QFP6}) // {_Q_NTOK}"
_Q_T4 = (
    f"(CASE WHEN {_Q_CHARS} >= 3 * {_Q_NTOK} AND {_Q_CHARS} <= 10 * {_Q_NTOK} "
    f"THEN {QFP6} ELSE 0 END)"
)
# the combined fp6 quality score — importable by every oracle that
# gates or aggregates on quality (pipeline, mutable, curriculum, ...)
QUALITY_FP6_SQL = f"(({_Q_T1} + {_Q_T2} + {_Q_T3} + {_Q_T4}) // 4)"

QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS tokens FROM documents
)
SELECT doc_id, len(tokens) AS n_tokens,
       ({_Q_CHARS} * {QFP6}) // {_Q_NTOK} AS mean_word_len_fp6,
       ({_Q_HITS} * {QFP6}) // {_Q_NTOK} AS stopword_ratio_fp6,
       ({_Q_DIST} * {QFP6}) // {_Q_NTOK} AS distinct_ratio_fp6,
       {QUALITY_FP6_SQL} AS quality_fp6
FROM t
"""


@register("text_quality_score", oracle=QUALITY_ORACLE, bench=True)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.quality_score(load_table(spark, sf_dir, "documents"))


# -- language ID -----------------------------------------------------------

_langs = sorted(X.LANG_STOPWORDS)


def _hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in X.LANG_STOPWORDS[lang])
    return f"len(list_filter(tokens, x -> list_contains([{words}], x)))::BIGINT"


# argmax over hit COUNTS (shared n_tok denominator ⇒ same order as the
# ratios, pure integer compares); reported scores are fp6 integers
_score_cols = ",\n         ".join(
    f"{_hits_sql(lang)} AS h_{lang}" for lang in _langs
) + ",\n         len(tokens)::BIGINT AS n_tok"
_case = " ".join(
    "WHEN "
    + " AND ".join(f"h_{lang} >= h_{other}" for other in _langs if other != lang)
    + f" THEN '{lang}'"
    for lang in _langs
)
_scored = ", ".join(
    f"(h_{lang} * {X.QFP6}) // n_tok AS score_{lang}_fp6" for lang in _langs
)
LANG_ID_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
), s AS (
  SELECT doc_id,
         {_score_cols}
  FROM t
)
SELECT doc_id, CASE {_case} END AS lang_pred, {_scored}
FROM s
"""


@register("text_lang_id", oracle=LANG_ID_ORACLE)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.lang_id(load_table(spark, sf_dir, "documents"))


# -- fingerprint (bottom-k sketch) ----------------------------------------

FINGERPRINT_ORACLE = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, unnest(
    list_transform(generate_series(1, len(tokens) - 2),
                   i -> array_to_string(list_slice(tokens, i, i + 2), ' '))
  ) AS shingle
  FROM tok
),
h AS (SELECT DISTINCT doc_id, md5(shingle) AS h FROM sh),
r AS (
  SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn FROM h
)
SELECT doc_id, string_agg(h, '' ORDER BY h) AS fingerprint
FROM r WHERE rn <= 4 GROUP BY doc_id
"""


@register("text_fingerprint", oracle=FINGERPRINT_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.fingerprint(load_table(spark, sf_dir, "documents"))


NORMALIZE_ORACLE = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))
         AS norm_text,
       len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))
         AS n_tokens
FROM documents
"""


@register("text_normalize", oracle=NORMALIZE_ORACLE)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic normalization (lower / strip punctuation / collapse
    whitespace) + token count — the canonical pre-step before digest
    dedup, all in codegen'd JVM expressions."""
    from ..operators.text import normalize

    docs = load_table(spark, sf_dir, "documents")
    out = normalize(docs)
    return out.select(
        "doc_id", "norm_text", F.size(F.split("norm_text", " ")).alias("n_tokens")
    )


# -- deterministic stratified sampling --------------------------------------

_SAMPLE_FRACS = {"en": 0.5, "zh": 1.0, "de": 1.0, "fr": 1.0, "es": 0.25}
_SAMPLE_SALT = "sample:1"
_SCALE = 1 << 60

_frac_sql = "CASE " + " ".join(
    f"WHEN lang = '{k}' THEN {int(v * _SCALE)}" for k, v in _SAMPLE_FRACS.items()
) + " ELSE 0 END"

SAMPLE_ORACLE = f"""
SELECT doc_id, lang
FROM documents
WHERE ('0x' || substr(md5('{_SAMPLE_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      < {_frac_sql}
"""


@register("sample_stratified_docs", oracle=SAMPLE_ORACLE)
def sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing subsample: keep 50% of English, 25% of
    Spanish, all minority languages — decided per row by a salted
    60-bit md5 threshold, so the kept set is identical across runs,
    partitionings, and engines (no RNG, no shuffle; the filter runs
    at the scan)."""
    docs = load_table(spark, sf_dir, "documents")
    return X.stratified_sample(docs, "lang", _SAMPLE_FRACS).select("doc_id", "lang")


# -- class-balance weights --------------------------------------------------

REWEIGHT_ORACLE = """
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
t AS (SELECT sum(n) AS total, count(*) AS k FROM c)
SELECT c.lang, c.n,
       CAST(t.total AS DOUBLE) / (t.k * c.n) AS weight
FROM c, t
"""


@register("class_weights_by_lang", oracle=REWEIGHT_ORACLE)
def class_weights_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (total / (k·count)) — the
    balanced-sampling dual of stratified_sample: one tiny aggregate
    cross-joined back, so the weight table broadcasts to any consumer
    join at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_k"))
    return c.crossJoin(F.broadcast(t)).select(
        "lang",
        "n",
        (F.col("_total").cast("double") / (F.col("_k") * F.col("n"))).alias("weight"),
    )


# -- PII scrub ---------------------------------------------------------------

_PII_SQL = "text"
for _pat, _tok in X.PII_PATTERNS:
    _esc = _pat.replace("\\", "\\\\").replace("'", "''")
    _PII_SQL = f"regexp_replace({_PII_SQL}, '{_esc}', '{_tok}', 'g')"
_REDACT_SQL = " + ".join(
    f"(len(string_split({_PII_SQL}, '{_tok}')) - 1)" for _, _tok in X.PII_PATTERNS
)

PII_ORACLE = f"""
SELECT doc_id, {_PII_SQL} AS scrubbed_text, {_REDACT_SQL} AS n_redacted
FROM documents
"""


@register("text_scrub_pii", oracle=PII_ORACLE)
def text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone/IP redaction with per-row counts; same RE2 literals
    on both sides of the gate."""
    return X.scrub_pii(load_table(spark, sf_dir, "documents"))


# -- repetition stats ------------------------------------------------------

REPETITION_ORACLE = f"""
WITH rtok AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
runi AS (SELECT doc_id, unnest(tokens) AS g FROM rtok),
ruc AS (SELECT doc_id, g, count(*) AS c FROM runi GROUP BY doc_id, g),
rutop AS (SELECT doc_id, max(c) AS mc FROM ruc GROUP BY doc_id),
rbig AS (
  SELECT doc_id, unnest(
    list_transform(generate_series(1, len(tokens) - 1),
                   i -> tokens[i] || ' ' || tokens[i + 1])
  ) AS g
  FROM rtok
),
rbc AS (SELECT doc_id, g, count(*) AS c FROM rbig GROUP BY doc_id, g),
rbtop AS (SELECT doc_id, max(c) AS mc FROM rbc GROUP BY doc_id),
rtri AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(tokens) - 2),
                        i -> array_to_string(list_slice(tokens, i, i + 2), ' ')) AS tg
  FROM rtok
),
rts AS (SELECT doc_id, len(tg) AS tot, len(list_distinct(tg)) AS dis FROM rtri)
SELECT t.doc_id,
       len(t.tokens) AS n_tokens,
       (u.mc * 1000000) // len(t.tokens)::BIGINT AS top_unigram_frac_fp6,
       (b.mc * 1000000) // (len(t.tokens) - 1)::BIGINT AS top_bigram_frac_fp6,
       ((s.tot - s.dis) * 1000000) // s.tot::BIGINT AS dup_trigram_frac_fp6,
       (b.mc >= 2 AND (b.mc * 1000000) // (len(t.tokens) - 1)::BIGINT >= {X.TOP_BIGRAM_MAX_FP6})
         OR ((s.tot - s.dis) * 1000000) // s.tot::BIGINT >= {X.DUP_TRIGRAM_MAX_FP6} AS repetitive
FROM rtok t
JOIN rutop u ON t.doc_id = u.doc_id
JOIN rbtop b ON t.doc_id = b.doc_id
JOIN rts s ON t.doc_id = s.doc_id
"""


@register("text_repetition_stats", oracle=REPETITION_ORACLE)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate: top-unigram/bigram token fractions
    and duplicate-trigram fraction, computed per-row with sort +
    run-length array folds (zero shuffles; the oracle's unnest/groupBy
    formulation is the shape this operator deliberately avoids)."""
    return X.repetition_stats(load_table(spark, sf_dir, "documents"))


# -- quality-weighted sampling ----------------------------------------------

_WSALT = "wsample:1"

WEIGHTED_SAMPLE_ORACLE = f"""
WITH wq AS ({QUALITY_ORACLE})
SELECT doc_id, quality_fp6
FROM wq
WHERE least(greatest(quality_fp6, 50000), {X.QFP6}) = {X.QFP6}
   OR ('0x' || substr(md5('{_WSALT}:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      < least(greatest(quality_fp6, 50000), {X.QFP6}) * {X.WSAMPLE_STEP}
"""


@register("sample_quality_weighted", oracle=WEIGHTED_SAMPLE_ORACLE)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional subsampling: keep probability is the doc's
    own fp6 quality score (floored at 5%) — high-quality data
    oversampled, junk mostly dropped but never fully excluded. Per-row
    salted-hash decision (no RNG, no shuffle); the keep threshold
    p_fp6·⌊2^60/10^6⌋ is exact BIGINT arithmetic, so sample MEMBERSHIP
    cannot drift across engine builds."""
    docs = load_table(spark, sf_dir, "documents")
    q = X.quality_score(docs).select("doc_id", "quality_fp6")
    return X.weighted_sample(q, "quality_fp6", salt=_WSALT)


# -- context-window chunking -------------------------------------------------

CHUNK_SIZE, CHUNK_OVERLAP = 32, 8
_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP

CHUNK_ORACLE = f"""
WITH ctok AS (
  SELECT doc_id, string_split(text, ' ') AS tokens,
         len(string_split(text, ' ')) AS n FROM documents
),
st AS (
  SELECT doc_id, tokens,
         unnest(generate_series(1, greatest(1, n - {CHUNK_OVERLAP}), {_STRIDE})) AS s,
         unnest(generate_series(0, (greatest(1, n - {CHUNK_OVERLAP}) - 1) // {_STRIDE})) AS i
  FROM ctok
)
SELECT doc_id, i AS chunk_id,
       array_to_string(list_slice(tokens, s, s + {CHUNK_SIZE} - 1), ' ') AS chunk_text,
       len(list_slice(tokens, s, s + {CHUNK_SIZE} - 1)) AS chunk_tokens
FROM st
"""


@register("chunk_documents", oracle=CHUNK_ORACLE, bench=True)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding context-window chunking (32-token windows, 8 overlap) —
    per-row sequence/slice expressions + one posexplode, no shuffle."""
    return X.chunk(load_table(spark, sf_dir, "documents"), size=CHUNK_SIZE, overlap=CHUNK_OVERLAP)


# -- sequence packing --------------------------------------------------------

PACK_BUDGET = 2048

PACK_ORACLE = f"""
WITH ptok AS (
  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
c AS (
  SELECT lang, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) - n_tokens AS strt
  FROM ptok
)
SELECT lang, doc_id, n_tokens,
       CAST(strt // {PACK_BUDGET} AS BIGINT) AS bin_id,
       CAST(strt % {PACK_BUDGET} AS BIGINT) AS bin_offset
FROM c
"""
# CAST AS BIGINT: DuckDB's sum(BIGINT) window is HUGEINT (int128), which
# the driver harness can render as float and break the value hash.


@register("pack_training_bins", oracle=PACK_ORACLE)
def pack_training_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing of documents into 2048-token training bins,
    sharded by language: one running-sum window per shard."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return X.pack_sequences(sized, budget=PACK_BUDGET)


# -- exact-k stratified sampling --------------------------------------------

_KSALT = "ksample:1"
K_PER_LANG = 20

EXACT_K_ORACLE = f"""
WITH kh AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('{_KSALT}:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM documents
),
kr AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
  FROM kh
)
SELECT doc_id, lang FROM kr WHERE rk <= {K_PER_LANG}
"""


@register("sample_exact_k_per_lang", oracle=EXACT_K_ORACLE)
def sample_exact_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 20-doc budget per language, picked by salted hash rank —
    the exact-size counterpart of sample_stratified_docs (stable under
    corpus growth, identical across engines)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return X.sample_exact_k(docs, "lang", K_PER_LANG)


# -- corpus health report ----------------------------------------------------

HEALTH_ORACLE = f"""
WITH hq AS ({QUALITY_ORACLE}),
hd AS (
  SELECT d.source, d.doc_id, d.n_chars, md5(d.text) AS digest, q.quality_fp6
  FROM documents d JOIN hq q ON q.doc_id = d.doc_id
)
SELECT h.source,
       count(*) AS n_docs,
       CAST(sum(h.n_chars) AS BIGINT) AS total_chars,
       CAST(sum(h.quality_fp6) AS BIGINT) AS sum_quality_fp6,
       count(DISTINCT h.digest) AS n_unique,
       ((count(*) - count(DISTINCT h.digest)) * {X.QFP6}) // count(*) AS dup_rate_fp6
FROM hd h
GROUP BY h.source
"""


@register("corpus_health_by_source", oracle=HEALTH_ORACLE)
def corpus_health_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health: volume, exact fp6 quality sum (the
    mean is the reader's quotient), and fp6 exact-dup rate — the
    monitoring rollup a continuous ingestion pipeline alerts on. Every
    hashed column is BIGINT integer arithmetic. One scan feeds the
    quality projection and the digest; a single hash aggregate per
    source (count-distinct expands once; at 100 TB swap for
    approx_count_distinct as in the profiler)."""
    docs = load_table(spark, sf_dir, "documents")
    q = X.quality_score(docs).select("doc_id", "quality_fp6")
    hd = docs.join(q, "doc_id").select(
        "source",
        "n_chars",
        F.md5(F.col("text").cast("binary")).alias("digest"),
        "quality_fp6",
    )
    return hd.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("quality_fp6").cast("bigint").alias("sum_quality_fp6"),
        F.countDistinct("digest").alias("n_unique"),
        F.expr(
            f"((count(1) - count(DISTINCT digest)) * {X.QFP6}) DIV count(1)"
        ).alias("dup_rate_fp6"),
    )


# -- PMI collocations --------------------------------------------------------

PMI_MIN_COUNT = 5

PMI_ORACLE = f"""
WITH ptok AS (SELECT string_split(text, ' ') AS tokens FROM documents),
puni AS (
  SELECT unnest(tokens) AS w FROM ptok
),
pun AS (SELECT w, count(*) AS c FROM puni GROUP BY w),
pn AS (SELECT sum(c) AS n FROM pun),
pbi AS (
  SELECT unnest(list_transform(generate_series(1, len(tokens) - 1),
                               i -> struct_pack(x := tokens[i], y := tokens[i + 1]))) AS b
  FROM ptok
),
pbc AS (
  SELECT b.x AS x, b.y AS y, count(*) AS cxy FROM pbi GROUP BY b.x, b.y
  HAVING count(*) >= {PMI_MIN_COUNT}
)
SELECT b.x, b.y, b.cxy, ux.c AS cx, uy.c AS cy,
       round(ln((b.cxy::DOUBLE * pn.n::DOUBLE * pn.n::DOUBLE)
                / ((pn.n - 1)::DOUBLE * ux.c::DOUBLE * uy.c::DOUBLE)), 6) AS pmi
FROM pbc b
JOIN pun ux ON ux.w = b.x
JOIN pun uy ON uy.w = b.y, pn
"""


@register("text_pmi_collocations", oracle=PMI_ORACLE)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide PMI collocation mining (support >= 5) — the phrase
    detector run before tokenizer/vocab training."""
    return X.pmi_collocations(load_table(spark, sf_dir, "documents"), min_count=PMI_MIN_COUNT)


# -- unigram-LM quality proxy ------------------------------------------------

LM_ORACLE = """
WITH ltok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
lvoc AS (SELECT w, count(*) AS c FROM ltok GROUP BY w),
ltot AS (SELECT sum(c) AS n, count(*) AS v FROM lvoc),
llp AS (
  SELECT lvoc.w, round(ln((lvoc.c::DOUBLE + 1) / (ltot.n + ltot.v)::DOUBLE), 6) AS lp
  FROM lvoc, ltot
)
SELECT t.doc_id,
       count(*) AS n_tokens,
       CAST(sum(CAST(l.lp AS DECIMAL(12,6))) AS DOUBLE) / count(*) AS mean_logp
FROM ltok t JOIN llp l ON l.w = t.w
GROUP BY t.doc_id
"""


@register("text_lm_score", oracle=LM_ORACLE)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram-LM mean log-prob per document — the
    perplexity-style quality filter (low scorers are off-distribution)."""
    return X.lm_score(load_table(spark, sf_dir, "documents"))


# -- deterministic train/val/test split ------------------------------------

_SPLITS = (("train", 0.8), ("val", 0.1), ("test", 0.1))
_T1 = int(0.8 * (1 << 60))
_T2 = int(0.9 * (1 << 60))

SPLIT_ORACLE = f"""
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('split:1:' || doc_id::VARCHAR), 1, 15))::BIGINT AS hv
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN hv < {_T1} THEN 'train'
            WHEN hv < {_T2} THEN 'val'
            ELSE 'test' END AS split
FROM h
"""


@register("corpus_split_assign", oracle=SPLIT_ORACLE)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic 80/10/10 split labels — frozen under corpus
    growth (an id's split never changes), identical across engines via
    integer bucket thresholds."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return X.assign_splits(docs, splits=_SPLITS)


# -- vocabulary coverage / OOV ---------------------------------------------

VOCAB_SIZE = 100

VOCAB_ORACLE = f"""
WITH vtok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
vcnt AS (SELECT w, count(*) AS c FROM vtok GROUP BY w),
vocab AS (
  SELECT w FROM vcnt QUALIFY row_number() OVER (ORDER BY c DESC, w ASC) <= {VOCAB_SIZE}
),
per AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         count(*) FILTER (v.w IS NULL) AS n_oov
  FROM vtok t LEFT JOIN vocab v USING (w)
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, n_oov,
       (n_oov * 1000000) // n_tokens AS oov_frac_fp6
FROM per
"""


@register("text_vocab_coverage", oracle=VOCAB_ORACLE)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV fraction against the corpus top-100 token
    vocabulary (rank over the token-TYPE count table, vocab broadcast
    into the scoring join)."""
    return X.vocab_coverage(load_table(spark, sf_dir, "documents"), vocab_size=VOCAB_SIZE)


# -- temperature-smoothed source mixing ------------------------------------

MIX_ALPHA = 0.3


def p6_exact_ctes(p: str) -> str:
    """The exact α=3/10 kernel (operators.text.alpha3_10_p6) as DuckDB
    CTEs: given ``{p}c(source, n)`` and ``{p}t(total)``, emits the
    chain ending in ``{p}p(source, n, p6)``.

    SEED-FREE since round 10: zero libm calls ANYWHERE (rounds 7-9 the
    oracle seeded the roots from sqrt()/pow() and corrected with a ±3
    CASE ladder whose ELSE silently clamped — a driver-build libm seed
    >3 off produced a wrong floor-root with no visible failure, and
    ``source_mix_weights`` was driver-red three rounds running).  Each
    root is now an exhaustive digit search: every base-10^k digit is
    ``max(d)`` over a ``range()`` join filtered by the defining integer
    inequality, so the result is the true floor root by construction —
    on ANY build.  All compares/multiplies are HUGEINT ≤ ~10^30.

        u  = (n·10^9) // total           (truncated 9dp share)
        y  = isqrt(u³·10³)  via 3 digits of 10^5   (y ≤ 10^15)
        p6 = iroot5(y·10^15) via 2 digits of 10^3  (p6 ≤ 10^6)

    Aggregate-per-level keeps the plan 5 tiny hash-aggs over
    |sources| × ≤10^5 candidate rows — model-sized either way."""
    return f"""{p}u AS (
  SELECT source, n, (CAST(n AS HUGEINT) * 1000000000) // {p}t.total AS u
  FROM {p}c, {p}t),
{p}m1 AS (
  SELECT source, n, u*u*u*CAST(1000 AS HUGEINT) AS m1
  FROM {p}u),
{p}y1 AS (
  SELECT source, n, m1, max(g.d) AS d1
  FROM {p}m1, range(0, 100001) g(d)
  WHERE CAST(g.d AS HUGEINT)*g.d*100000000000000000000 <= m1
  GROUP BY source, n, m1),
{p}y2 AS (
  SELECT source, n, m1, max(d1*100000 + g.d) AS y12
  FROM {p}y1, range(0, 100000) g(d)
  WHERE (d1*CAST(100000 AS HUGEINT) + g.d)*(d1*100000 + g.d)*10000000000 <= m1
  GROUP BY source, n, m1),
{p}y3 AS (
  SELECT source, n, max(y12*100000 + g.d) AS y
  FROM {p}y2, range(0, 100000) g(d)
  WHERE (y12*CAST(100000 AS HUGEINT) + g.d)*(y12*100000 + g.d) <= m1
  GROUP BY source, n, m1),
{p}m2 AS (
  SELECT source, n, y*CAST(1000000000000000 AS HUGEINT) AS m2
  FROM {p}y3),
{p}p1 AS (
  SELECT source, n, m2, max(g.d) AS e1
  FROM {p}m2, range(0, 1001) g(d)
  WHERE CAST(g.d AS HUGEINT)*g.d*g.d*g.d*g.d*1000000000000000 <= m2
  GROUP BY source, n, m2),
{p}p AS (
  SELECT source, n, CAST(max(e1*1000 + g.d) AS HUGEINT) AS p6
  FROM {p}p1, range(0, 1000) g(d)
  WHERE (e1*CAST(1000 AS HUGEINT) + g.d)*(e1*1000 + g.d)*(e1*1000 + g.d)*(e1*1000 + g.d)*(e1*1000 + g.d) <= m2
  GROUP BY source, n, m2)"""


MIX_ORACLE = f"""
WITH mc AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
mt AS (SELECT sum(n) AS total FROM mc),
{p6_exact_ctes("m")},
mz AS (SELECT sum(p6) AS z FROM mp)
SELECT source, CAST(n AS BIGINT) AS n,
       CAST((p6 * 1000000) // mz.z AS BIGINT) AS mix_weight_fp6
FROM mp, mz
"""


@register("source_mix_weights", oracle=MIX_ORACLE)
def source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=0.3 temperature-sampling weights per source — the pretraining
    mixture rebalance (share^α renormalized). share^0.3 is the exact
    integer isqrt/iroot5 ladder (operators.text.alpha3_10_p6): zero
    libm values in the hashed output — round(pow(share, α), 6) was
    driver-red in round 8 (cross-build libm ulp at a 6dp boundary)."""
    return X.mix_weights(load_table(spark, sf_dir, "documents"), group_col="source", alpha=MIX_ALPHA)


# -- epoch-aware mixing schedule (weights -> materialized sampling plan) ---

MIX_BUDGET_NUM, MIX_BUDGET_DEN = 17, 10  # budget = 1.7x the corpus
MIX_SALT = "mix:1"

def epoch_schedule_ctes(rel: str, p: str = "x") -> tuple[str, str]:
    """The mixing-schedule pipeline as composable CTEs over relation
    ``rel`` (must expose source, doc_id, n_chars). Returns
    (cte_body, final_cte_name); prefix ``p`` keeps names collision-free
    when embedded in a larger oracle."""
    body = f"""{p}s AS (SELECT source, sum(n_chars) AS dom_sz FROM {rel} GROUP BY source),
{p}b AS (SELECT CAST(sum(dom_sz) * {MIX_BUDGET_NUM} // {MIX_BUDGET_DEN} AS BIGINT) AS budget FROM {p}s),
{p}c AS (SELECT source, count(*) AS n FROM {rel} GROUP BY source),
{p}t AS (SELECT sum(n) AS total FROM {p}c),
{p6_exact_ctes(p)},
{p}z AS (SELECT CAST(sum(p6) AS BIGINT) AS z FROM {p}p),
{p}w AS (SELECT source, (p6 * 1000000) // {p}z.z AS mix_weight_fp6
       FROM {p}p, {p}z),
{p}d AS (SELECT s.source, s.dom_sz,
              (2 * {p}b.budget * w.mix_weight_fp6 + 1000000) // 2000000 AS dom_budget
       FROM {p}s s JOIN {p}w w ON w.source = s.source, {p}b),
{p}e AS (SELECT source, dom_budget // dom_sz AS full_epochs, dom_budget % dom_sz AS rem
       FROM {p}d),
{p}h AS (SELECT source, doc_id, n_chars,
              ('0x' || substr(md5('{MIX_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hkey
       FROM {rel}),
{p}start AS (SELECT source, doc_id, n_chars,
                  sum(n_chars) OVER (PARTITION BY source ORDER BY hkey, doc_id) - n_chars AS strt
           FROM {p}h),
{p}n AS (SELECT s.source, s.doc_id, s.n_chars,
              CAST(e.full_epochs + (CASE WHEN s.strt < e.rem THEN 1 ELSE 0 END) AS INTEGER)
                AS n_epochs
       FROM {p}start s JOIN {p}e e ON e.source = s.source),
{p}x AS (SELECT source, doc_id, n_chars, n_epochs,
              unnest(generate_series(0, n_epochs - 1)) AS epoch
       FROM {p}n WHERE n_epochs > 0),
{p}sched AS (
  SELECT source, doc_id, n_chars, n_epochs, CAST(epoch AS INTEGER) AS epoch,
         md5('{MIX_SALT}:sched:' || CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR))
           AS sched_key
  FROM {p}x)"""
    return body, f"{p}sched"


_EP_BODY, _EP_FINAL = epoch_schedule_ctes("documents", "x")
EPOCH_SCHEDULE_ORACLE = f"""
WITH {_EP_BODY}
SELECT source, doc_id, n_chars, n_epochs, epoch, sched_key FROM {_EP_FINAL}
"""


@register("mix_epoch_schedule", oracle=EPOCH_SCHEDULE_ORACLE)
def mix_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The temperature weights MATERIALIZED as a training plan: a fixed
    1.7x-corpus token budget splits across sources by mix_weight;
    under-budget sources replicate (epochs), the remainder epoch takes
    a prefix of each source's salted-md5 permutation, and every
    (doc, epoch) row carries an md5 schedule key whose sort order IS
    the interleaved training order — deterministic end to end, no RNG,
    no global row_number (consumers range-partition by sched_key at
    100 TB). Oracle replays budgets, windows, and the explode in SQL."""
    return X.epoch_schedule(
        load_table(spark, sf_dir, "documents"),
        group_col="source",
        size_col="n_chars",
        alpha=MIX_ALPHA,
        budget_num=MIX_BUDGET_NUM,
        budget_den=MIX_BUDGET_DEN,
        salt=MIX_SALT,
    )


# -- curriculum packing (quality-ordered training bins) --------------------

CURRICULUM_ORACLE = f"""
WITH ct0 AS (
  SELECT doc_id, lang, string_split(text, ' ') AS tokens, text FROM documents
), cq AS (
  SELECT doc_id, lang, len(tokens) AS n_tokens,
         {QUALITY_FP6_SQL} AS quality_fp6
  FROM ct0
), cw AS (
  SELECT lang, doc_id, n_tokens, quality_fp6,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY quality_fp6 DESC, doc_id) - n_tokens AS strt
  FROM cq
)
SELECT lang, doc_id, n_tokens, quality_fp6,
       CAST(strt // {PACK_BUDGET} AS BIGINT) AS bin_id,
       CAST(strt % {PACK_BUDGET} AS BIGINT) AS bin_offset
FROM cw
"""


@register("pack_curriculum_bins", oracle=CURRICULUM_ORACLE)
def pack_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: within each language shard, documents pack
    into 2048-token bins in DESCENDING quality order (ties by id), so
    early training bins hold the cleanest data — same single
    running-sum window as pack_training_bins, only the order key
    changes (quality is the fp6 INTEGER score, identical across engine
    builds, so bin boundaries agree exactly)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = X.quality_score(docs).select("doc_id", "n_tokens", "quality_fp6")
    sized = docs.select("doc_id", "lang").join(scored, "doc_id").withColumn(
        "_negq", -F.col("quality_fp6")
    )
    packed = X.pack_sequences(
        sized, id_col="doc_id", len_col="n_tokens", budget=PACK_BUDGET,
        order_cols=("_negq", "doc_id"),
    )
    return packed.select(
        "lang", "doc_id", "n_tokens", (-F.col("_negq")).alias("quality_fp6"), "bin_id", "bin_offset"
    )


# -- bigram-interpolated LM score ------------------------------------------

LM2_LAM = 0.7
LM2_LAM_U = 1.0 - LM2_LAM  # same Python arithmetic lands in both engines

LM2_ORACLE = f"""
WITH btok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS i
  FROM documents
),
bstream AS (
  SELECT a.doc_id, a.i, p.w AS prev, a.w
  FROM btok a JOIN btok p ON p.doc_id = a.doc_id AND p.i = a.i - 1
),
buni AS (SELECT w, count(*) AS c FROM btok GROUP BY w),
btot AS (SELECT sum(c) AS n, count(*) AS v FROM buni),
bbi AS (SELECT prev, w, count(*) AS cxy FROM bstream GROUP BY prev, w),
blp AS (
  SELECT s.doc_id,
         round(ln({LM2_LAM!r} * ((b.cxy + 1)::DOUBLE / (cp.c + t.v)::DOUBLE)
                  + {LM2_LAM_U!r} * ((cu.c + 1)::DOUBLE / (t.n + t.v)::DOUBLE)), 6) AS lp
  FROM bstream s
  JOIN bbi b ON b.prev = s.prev AND b.w = s.w
  JOIN buni cu ON cu.w = s.w
  JOIN buni cp ON cp.w = s.prev, btot t
)
SELECT doc_id, count(*) AS n_scored,
       CAST(sum(CAST(lp AS DECIMAL(12,6))) AS DOUBLE) / count(*) AS mean_logp
FROM blp GROUP BY doc_id
"""


@register("text_lm_score_bigram", oracle=LM2_ORACLE)
def text_lm_score_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-interpolated corpus LM mean log-prob — the word-ORDER-aware
    quality proxy (λ=0.7 conditional + 0.3 unigram, add-one smoothed);
    one step from the unigram filter toward CCNet's KenLM buckets."""
    return X.lm_score_bigram(load_table(spark, sf_dir, "documents"), lam=LM2_LAM)


# -- Zipf rank-frequency fit -----------------------------------------------

ZIPF_TOP = 1000

ZIPF_ORACLE = f"""
WITH zt AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
zc AS (SELECT w, count(*) AS c FROM zt GROUP BY w),
ztop AS (SELECT w, c FROM zc ORDER BY c DESC, w LIMIT {ZIPF_TOP}),
zr AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rnk FROM ztop
),
zxy AS (
  SELECT CAST(round(ln(rnk), 7) * 10000000 AS HUGEINT) AS x,
         CAST(round(ln(c), 7) * 10000000 AS HUGEINT) AS y,
         CAST(round(ln(rnk) * ln(rnk), 7) * 10000000 AS HUGEINT) AS xx,
         CAST(round(ln(rnk) * ln(c), 7) * 10000000 AS HUGEINT) AS xy,
         CAST(round(ln(c) * ln(c), 7) * 10000000 AS HUGEINT) AS yy
  FROM zr
),
zs AS (
  SELECT count(*)::HUGEINT AS n,
         sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
         sum(xx)::HUGEINT AS sxx, sum(xy)::HUGEINT AS sxy,
         sum(yy)::HUGEINT AS syy
  FROM zxy
),
zp AS (
  SELECT n, sx, sy,
         (n * sxy * 10000000 - sx * sy) AS num,
         (n * sxx * 10000000 - sx * sx) AS den,
         (n * syy * 10000000 - sy * sy) AS deny
  FROM zs
),
zq AS (SELECT *, (num * 1000000) // den AS slope_fp6 FROM zp)
SELECT CAST(n AS BIGINT) AS n_terms,
       CAST(slope_fp6 AS BIGINT) AS slope_fp6,
       CAST((sy * 1000000 - slope_fp6 * sx) // (n * 10000000) AS BIGINT) AS intercept_fp6,
       CAST((slope_fp6 * ((num * 1000000) // deny)) // 1000000 AS BIGINT) AS r2_fp6
FROM zq
"""


@register("text_zipf_fit", oracle=ZIPF_ORACLE)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostic: log-log OLS over the top-1000
    rank-frequency curve — slope ≈ −1 is the healthy-natural-corpus
    signature; flat slopes flag boilerplate floods, steep ones
    vocabulary collapse. Shape: one map-side-combined token count, a
    TakeOrdered top-1000 (never an unpartitioned window over the full
    vocabulary), rank via row_number over the LIMITED set, and the
    regression over fp7-integer ln terms — slope/intercept/r² are
    integer fixed-point quotients of exact (≤1e22) integer moments, so
    the fit is bit-identical on any partitioning and any engine build
    (intercept and r² are defined over the QUANTIZED slope to keep all
    intermediates inside 38 digits)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = counts.orderBy(F.col("c").desc(), F.col("w")).limit(ZIPF_TOP)
    rnk = top.select(
        "c", F.row_number().over(Window.orderBy(F.col("c").desc(), F.col("w"))).alias("rnk")
    )
    # 7dp ln terms as fp7 INTEGERS (floor(·1e7+0.5) of a libm value —
    # the only transcendental step); everything after is exact integer
    # arithmetic in DECIMAL(38,0), so the OLS coefficients cannot split
    # across engine builds (rounded quotients of exact decimal sums —
    # the round-7 reachable-half-boundary class — are gone).
    i7 = lambda col: F.expr(f"CAST(round({col}, 7) * 10000000 AS DECIMAL(38,0))")  # noqa: E731
    xy = rnk.select(
        i7("ln(rnk)").alias("x"),
        i7("ln(c)").alias("y"),
        i7("ln(rnk) * ln(rnk)").alias("xx"),
        i7("ln(rnk) * ln(c)").alias("xy"),
        i7("ln(c) * ln(c)").alias("yy"),
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum("xx").cast("decimal(38,0)").alias("sxx"),
        F.sum("xy").cast("decimal(38,0)").alias("sxy"),
        F.sum("yy").cast("decimal(38,0)").alias("syy"),
    )
    # num/den/deny: exact integers (~1e22 max for the top-1000 curve)
    pre = s.select(
        "n", "sx", "sy",
        (F.col("n") * F.col("sxy") * F.lit(10**7) - F.col("sx") * F.col("sy"))
        .cast("decimal(38,0)").alias("num"),
        (F.col("n") * F.col("sxx") * F.lit(10**7) - F.col("sx") * F.col("sx"))
        .cast("decimal(38,0)").alias("den"),
        (F.col("n") * F.col("syy") * F.lit(10**7) - F.col("sy") * F.col("sy"))
        .cast("decimal(38,0)").alias("deny"),
    )
    # slope_fp6 exact; intercept/r2 from the QUANTIZED slope (keeps all
    # intermediates inside 38 digits — documented contract, replayed
    # identically by the oracle)
    q = pre.select(
        "n", "sx", "sy", "num", "deny",
        F.expr("CAST((num * 1000000) DIV den AS BIGINT)").alias("slope_fp6"),
    )
    return q.select(
        F.expr("CAST(n AS BIGINT)").alias("n_terms"),
        F.col("slope_fp6"),
        F.expr(
            "CAST((CAST(sy AS DECIMAL(38,0)) * 1000000 - slope_fp6 * CAST(sx AS DECIMAL(38,0)))"
            " DIV (CAST(n AS DECIMAL(38,0)) * 10000000) AS BIGINT)"
        ).alias("intercept_fp6"),
        F.expr(
            "CAST((slope_fp6 * ((num * 1000000) DIV deny)) DIV 1000000 AS BIGINT)"
        ).alias("r2_fp6"),
    )


# -- DSIR importance-resampling selection -----------------------------------

# the target domain: 'src0' documents (the same slice decontaminate_vs_eval
# uses as its held-out set), everything else is the raw pool
DSIR_TARGET = "src0"
_DB = X.DSIR_BUCKETS
_DBK = X.DSIR_TOPK
_DH = f"('0x' || substr(md5('{X.DSIR_SALT}:' || w), 1, 15))::BIGINT % {_DB}"

from ..functions.intlog import ilog_chain_sql as _ilog_chain  # noqa: E402


# the CTE body (ends in `scored`) is shared with the pipeline_dsir_mix
# composition oracle (plans/pipeline.py)
_DSIR_BODY = f"""rtok AS (
  SELECT doc_id, {_DH} AS b
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE source <> '{DSIR_TARGET}')
),
ttok AS (
  SELECT {_DH} AS b
  FROM (SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE source = '{DSIR_TARGET}')
),
tgt AS (SELECT b, count(*) AS tcnt FROM ttok GROUP BY b),
cor AS (SELECT b, count(*) AS ccnt FROM rtok GROUP BY b),
tt AS (SELECT coalesce(sum(tcnt), 0) AS t FROM tgt),
ct AS (SELECT coalesce(sum(ccnt), 0) AS c FROM cor),
bkb AS (
  SELECT cor.b,
         greatest(CAST(((coalesce(tgt.tcnt, 0) + 1) * {1 << 30}) // (cor.ccnt + 1) AS BIGINT), 1) AS y0,
         CAST(length(bin(greatest(CAST(((coalesce(tgt.tcnt, 0) + 1) * {1 << 30}) // (cor.ccnt + 1) AS BIGINT), 1))) AS INT) AS blen
  FROM cor LEFT JOIN tgt USING (b)
),
bkt AS MATERIALIZED (SELECT b, ilog2_fp20 FROM ({_ilog_chain('SELECT * FROM bkb')})),
kcb AS (
  SELECT CAST(((ct.c + {_DB}) * {1 << 30}) // (tt.t + {_DB}) AS BIGINT) AS y0,
         CAST(length(bin(CAST(((ct.c + {_DB}) * {1 << 30}) // (tt.t + {_DB}) AS BIGINT))) AS INT) AS blen
  FROM ct, tt
),
kc AS (SELECT ilog2_fp20 AS kc FROM ({_ilog_chain('SELECT * FROM kcb')})),
scored AS (
  SELECT r.doc_id, count(*) AS n_tokens,
         CAST(sum(k.ilog2_fp20) + count(*) * (SELECT kc FROM kc) AS BIGINT) AS dsir_score_ilfp20
  FROM rtok r JOIN bkt k USING (b)
  GROUP BY r.doc_id
)"""

DSIR_ORACLE = f"""
WITH {_DSIR_BODY}
SELECT CAST(row_number() OVER (ORDER BY dsir_score_ilfp20 DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, n_tokens, dsir_score_ilfp20
FROM scored
ORDER BY dsir_score_ilfp20 DESC, doc_id ASC
LIMIT {_DBK}
"""


@register("dsir_select", oracle=DSIR_ORACLE)
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (hashed bag-of-words importance resampling):
    score every raw-pool document by how much more likely the TARGET
    domain's unigram model finds it than the raw pool's own model, keep
    the top-k. The log-ratio runs on the exact integer log2 kernel
    (functions/intlog) — zero libm anywhere, every hashed value an
    exact BIGINT by construction; the top-k cut is total-order
    deterministic (score DESC, doc_id). The published technique behind
    'select pretraining data that looks like your eval domain',
    engine-portable."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.filter(F.col("source") != DSIR_TARGET)
    target = docs.filter(F.col("source") == DSIR_TARGET)
    return X.dsir_select(raw, target)


# -- incremental DSIR: frozen-model scoring of an appended batch ------------

_DSALT = "dsirsplit:1"
_DSPLIT = f"('0x' || substr(md5('{_DSALT}:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2"

DSIR_DELTA_ORACLE = f"""
WITH rawd AS (SELECT * FROM documents WHERE source <> '{DSIR_TARGET}'),
bdoc AS (SELECT * FROM rawd WHERE {_DSPLIT} = 0),
ddoc AS (SELECT * FROM rawd WHERE {_DSPLIT} = 1),
rtok AS (
  SELECT {_DH} AS b
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM bdoc)
),
ttok AS (
  SELECT {_DH} AS b
  FROM (SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE source = '{DSIR_TARGET}')
),
tgt AS (SELECT b, count(*) AS tcnt FROM ttok GROUP BY b),
cor AS (SELECT b, count(*) AS ccnt FROM rtok GROUP BY b),
tt AS (SELECT coalesce(sum(tcnt), 0) AS t FROM tgt),
ct AS (SELECT coalesce(sum(ccnt), 0) AS c FROM cor),
bkb AS (
  SELECT tr.b,
         greatest(CAST(((coalesce(tgt.tcnt, 0) + 1) * {1 << 30}) // (coalesce(cor.ccnt, 0) + 1) AS BIGINT), 1) AS y0,
         CAST(length(bin(greatest(CAST(((coalesce(tgt.tcnt, 0) + 1) * {1 << 30}) // (coalesce(cor.ccnt, 0) + 1) AS BIGINT), 1))) AS INT) AS blen
  FROM unnest(range(0, {_DB})) tr(b)
  LEFT JOIN cor ON cor.b = tr.b
  LEFT JOIN tgt ON tgt.b = tr.b
),
bkt AS MATERIALIZED (SELECT b, ilog2_fp20 FROM ({_ilog_chain('SELECT * FROM bkb')})),
kcb AS (
  SELECT CAST(((ct.c + {_DB}) * {1 << 30}) // (tt.t + {_DB}) AS BIGINT) AS y0,
         CAST(length(bin(CAST(((ct.c + {_DB}) * {1 << 30}) // (tt.t + {_DB}) AS BIGINT))) AS INT) AS blen
  FROM ct, tt
),
kc AS (SELECT ilog2_fp20 AS kc FROM ({_ilog_chain('SELECT * FROM kcb')})),
dtok AS (
  SELECT doc_id, {_DH} AS b
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM ddoc)
),
scored AS (
  SELECT d.doc_id, count(*) AS n_tokens,
         CAST(sum(k.ilog2_fp20) + count(*) * (SELECT kc FROM kc) AS BIGINT) AS dsir_score_ilfp20
  FROM dtok d JOIN bkt k USING (b)
  GROUP BY d.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY dsir_score_ilfp20 DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, n_tokens, dsir_score_ilfp20
FROM scored
ORDER BY dsir_score_ilfp20 DESC, doc_id ASC
LIMIT {_DBK}
"""


@register("dsir_delta_select", oracle=DSIR_DELTA_ORACLE)
def dsir_delta_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR under continuous ingest: the raw pool splits
    deterministically (60-bit md5 parity) into a STANDING corpus and an
    appended batch; the importance model is fit on the standing corpus
    only and the batch is scored under that FROZEN model — per-batch
    cost O(batch), unseen feature buckets covered by the smoothed
    ccnt=0 entries of the complete 4096-row model. The oracle rebuilds
    the frozen model and replays the batch scoring, so hash equality
    certifies the incremental path end to end."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.filter(F.col("source") != DSIR_TARGET)
    target = docs.filter(F.col("source") == DSIR_TARGET)
    par = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(_DSALT + ":"), F.col("doc_id").cast("string")
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(2),
    )
    base = raw.filter(par == 0)
    delta = raw.filter(par == 1)
    return X.dsir_delta_select(base, delta, target)
