"""Dedup queries over the ``documents`` corpus, with DuckDB oracles that
replicate the (derandomized) hashing pipelines exactly.

The oracle SQL strings are *generated* from the same parameters
(num_hashes, band layout, simhash bit rule) as the Spark operators in
operators/dedup.py, so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cache
from ..operators import dedup as D
from ..sources import ensure_parallelism, load_table
from . import register

NUM_HASHES = 8
BAND_SIZE = 2
SHINGLE_PERSIST_MIN_DOCS = 20_000
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = D.SIMHASH_BITS

# Shared oracle CTEs: distinct 3-gram shingles per doc ---------------------

_SHINGLES_CTE = """
tok AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, unnest(
    list_transform(generate_series(1, len(tokens) - 2),
                   i -> array_to_string(list_slice(tokens, i, i + 2), ' '))
  ) AS shingle
  FROM tok
)
"""

# -- exact dedup -----------------------------------------------------------

EXACT_ORACLE = """
SELECT md5(text) AS digest, min(doc_id) AS representative, count(*) AS n_copies
FROM documents GROUP BY 1
"""


@register("dedup_exact", oracle=EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(load_table(spark, sf_dir, "documents"))


# -- minhash signatures ----------------------------------------------------
# Double hashing mirror of operators/dedup.minhash_signatures: one md5 per
# shingle, two 60-bit pieces, h_s = p1 + s*p2 (no BIGINT overflow).

_PIECES_CTE = """
pieces AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS p1,
         ('0x' || substr(md5(shingle), 17, 15))::BIGINT AS p2
  FROM sh
)
"""
_mh_cols = ",\n       ".join(f"min(p1 + {s} * p2) AS h{s}" for s in range(NUM_HASHES))
MINHASH_SIG_ORACLE = f"""
WITH {_SHINGLES_CTE},
{_PIECES_CTE}
SELECT doc_id,
       {_mh_cols}
FROM pieces GROUP BY doc_id
"""


@register("dedup_minhash_signatures", oracle=MINHASH_SIG_ORACLE)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # row-local array form (r12): same values, zero Exchange
    return D.minhash_signatures_arrays(
        D.shingle_arrays(ensure_parallelism(docs)), num_hashes=NUM_HASHES
    )


# -- minhash + LSH + jaccard verification (the full near-dup pipeline) -----

_band_rows = ",\n    ".join(
    f"({b}, h{b * BAND_SIZE}, h{b * BAND_SIZE + 1})" for b in range(NUM_HASHES // BAND_SIZE)
)
MINHASH_PAIRS_ORACLE = f"""
WITH {_SHINGLES_CTE},
{_PIECES_CTE},
sig AS (
  SELECT doc_id, {_mh_cols}
  FROM pieces GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band, b.s1, b.s2
  FROM sig, LATERAL (VALUES {_band_rows}) AS b(band, s1, s2)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.s1 = b.s1 AND a.s2 = b.s2
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) AS jaccard
FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id JOIN sizes sb ON i.id_b = sb.doc_id
WHERE CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) >= {JACCARD_THRESHOLD}
"""


@register("dedup_minhash_pairs", oracle=MINHASH_PAIRS_ORACLE, bench=True)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash → LSH banding → exact-Jaccard verification ≥ 0.5.

    The LSH stage bounds pairwise work to same-bucket collisions; the
    verify stage touches only candidates. At 100 TB this is the standard
    near-dup shape (the verify join broadcasts candidates onto the
    shingle inverted index)."""
    return _minhash_verified(spark, sf_dir).select("id_a", "id_b", "jaccard")


def _minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verified near-dup pair pipeline with exact integer
    intersection/union counts kept alongside the double jaccard —
    shared by :func:`dedup_minhash_pairs` (drops the counts) and
    :func:`dedup_source_matrix` (uses them for fixed-point sums)."""
    docs = load_table(spark, sf_dir, "documents")
    # r12: ONE pinned row-local table carries the per-doc shingle SET
    # (_sh) and the MinHash signature (h*) — the separate sets/sig pins
    # were two sequential blocking materializations of the same
    # zero-Exchange pass (guide §5), plus a docs.count() job for the
    # persist threshold. The signature half was always pinned (the band
    # self-join references it twice); the array half rides in the same
    # cache and serves both Jaccard verify sides.
    base = cache.pin(
        D.shingle_sig_table(ensure_parallelism(docs), num_hashes=NUM_HASHES)
    ).filter(F.col("_sh").isNotNull())
    sets = base.select("doc_id", "_sh")
    sig = base.select("doc_id", *[f"h{s}" for s in range(NUM_HASHES)])
    # skew guard armed (no-op at test SF, where no bucket nears the cap;
    # the oracle is the uncapped pipeline, so the gate also proves it)
    cand = cache.pin(
        D.lsh_candidate_pairs(
            sig, num_hashes=NUM_HASHES, band_size=BAND_SIZE, max_bucket=100_000
        )
    )
    # array-set verification: candidates broadcast onto the per-doc
    # shingle-set table twice, so the corpus never shuffles in verify
    return D.jaccard_on_pairs_arrays(cand, sets, with_counts=True).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )


# -- minhash estimator quality (the dedup companion to ann_recall) ---------
#
# Correctness rows prove the estimator is DETERMINISTIC; this query
# measures how well it tracks the exact statistic: per LSH-candidate
# pair, |est − true Jaccard| as an EXACT fp7 integer
# (|a·u − H·i|·10^7) DIV (H·u) — est = a/H is the score the streaming
# ingest gate thresholds on; the BIGINT sum/max are bit-identical on
# any engine build (the mean is the reader's quotient).

_est_sql = " + ".join(f"(a.h{s} = b.h{s})::INT" for s in range(NUM_HASHES))

MINHASH_QUALITY_ORACLE = f"""
WITH {_SHINGLES_CTE},
{_PIECES_CTE},
sig AS (
  SELECT doc_id, {_mh_cols}
  FROM pieces GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band, b.s1, b.s2
  FROM sig, LATERAL (VALUES {_band_rows}) AS b(band, s1, s2)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.s1 = b.s1 AND a.s2 = b.s2
  WHERE a.doc_id < b.doc_id
),
est AS (
  SELECT c.id_a, c.id_b, ({_est_sql})::BIGINT AS agree
  FROM cand c JOIN sig a ON a.doc_id = c.id_a JOIN sig b ON b.doc_id = c.id_b
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
tj AS (
  SELECT i.id_a, i.id_b, i.i::BIGINT AS i, (sa.n + sb.n - i.i)::BIGINT AS u
  FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id JOIN sizes sb ON i.id_b = sb.doc_id
),
errs AS (
  SELECT (abs(e.agree * t.u - {NUM_HASHES} * t.i) * 10000000) // ({NUM_HASHES} * t.u) AS d
  FROM est e JOIN tj t ON t.id_a = e.id_a AND t.id_b = e.id_b
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(d) AS BIGINT) AS sum_abs_err_fp7,
       CAST(max(d) AS BIGINT) AS max_abs_err_fp7
FROM errs
"""


@register("dedup_minhash_quality", oracle=MINHASH_QUALITY_ORACLE)
def dedup_minhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-error report over the LSH candidate pairs: the MinHash
    agreement fraction vs the exact Jaccard it estimates, as (n_pairs,
    sum_abs_err_fp7, max_abs_err_fp7) — exact integers. All work is
    candidate-sized; the hash gate covers the error statistics
    themselves."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingles(ensure_parallelism(docs))
    sig = D.minhash_signatures_arrays(
        D.shingle_arrays(ensure_parallelism(docs)), num_hashes=NUM_HASHES
    )  # r12
    cand = D.lsh_candidate_pairs(sig, num_hashes=NUM_HASHES, band_size=BAND_SIZE)
    sa = sig.select(F.col("doc_id").alias("id_a"), *[F.col(f"h{s}").alias(f"a{s}") for s in range(NUM_HASHES)])
    sb = sig.select(F.col("doc_id").alias("id_b"), *[F.col(f"h{s}").alias(f"b{s}") for s in range(NUM_HASHES)])
    agree = sum(
        (F.col(f"a{s}") == F.col(f"b{s}")).cast("int") for s in range(NUM_HASHES)
    ).cast("long")
    est = (
        F.broadcast(cand).join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", agree.alias("agree"))
    )
    true_j = D.jaccard_on_pairs(cand, sh, with_counts=True)
    # |est − true| = |a/H − i/u| = |a·u − H·i| / (H·u): exact integers
    # end-to-end ((·)·10^7 DIV (H·u) is the fp7 error — round(double
    # difference of exact rationals, 7) was the reachable-half-boundary
    # hazard class)
    d = F.expr(
        f"(abs(agree * u - {NUM_HASHES} * i) * 10000000) DIV ({NUM_HASHES} * u)"
    ).alias("d")
    errs = est.join(true_j, ["id_a", "id_b"]).select(d)
    return errs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("d").cast("long").alias("sum_abs_err_fp7"),
        F.max("d").cast("long").alias("max_abs_err_fp7"),
    )


# -- exact n-gram jaccard (no LSH; inverted-index blocked) -----------------

NGRAM_JACCARD_ORACLE = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) AS jaccard
FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id JOIN sizes sb ON i.id_b = sb.doc_id
WHERE CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) >= {JACCARD_THRESHOLD}
"""


@register("dedup_ngram_jaccard", oracle=NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive n-gram Jaccard via shingle inverted index (all pairs
    sharing ≥1 shingle). Exact-recall counterpart to the LSH pipeline;
    at scale you run the LSH variant — this one's cost grows with the
    square of per-shingle document frequency."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingles(ensure_parallelism(docs))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    return D.jaccard_on_pairs(pairs, sh).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


# -- simhash ---------------------------------------------------------------

_sums = ",\n       ".join(
    f"sum(CASE WHEN substr(h, {j}, 1) >= '8' THEN cnt ELSE -cnt END) AS s{j}"
    for j in range(1, SIMHASH_BITS + 1)
)
_bits = " || ".join(f"(CASE WHEN s{j} > 0 THEN '1' ELSE '0' END)" for j in range(1, SIMHASH_BITS + 1))
SIMHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
counted AS (
  SELECT doc_id, tok, count(*) AS cnt, md5(tok) AS h FROM toks GROUP BY 1, 2
),
sums AS (
  SELECT doc_id,
       {_sums}
  FROM counted GROUP BY doc_id
)
SELECT doc_id, {_bits} AS simhash FROM sums
"""


@register("dedup_simhash", oracle=SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(load_table(spark, sf_dir, "documents"))


_hamming = " + ".join(
    f"(CASE WHEN substr(a.simhash, {j}, 1) <> substr(b.simhash, {j}, 1) THEN 1 ELSE 0 END)"
    for j in range(1, SIMHASH_BITS + 1)
)
# max_hamming + 1 contiguous bands (pigeonhole full recall at the
# threshold — operators/dedup.simhash_bands); mirrored exactly here
_simhash_band_rows = ", ".join(
    f"({b}, {st}, {w})" for b, (st, w) in enumerate(D.simhash_bands(6))
)
SIMHASH_PAIRS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
counted AS (
  SELECT doc_id, tok, count(*) AS cnt, md5(tok) AS h FROM toks GROUP BY 1, 2
),
sums AS (
  SELECT doc_id, {_sums}
  FROM counted GROUP BY doc_id
),
sig AS (SELECT doc_id, {_bits} AS simhash FROM sums),
bands AS (
  SELECT doc_id, simhash, b.band, substr(simhash, b.st, b.w) AS piece
  FROM sig, LATERAL (VALUES {_simhash_band_rows}) AS b(band, st, w)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash AS sh_a, b.simhash AS sh_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.piece = b.piece
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, ({_hamming.replace('a.simhash', 'sh_a').replace('b.simhash', 'sh_b')}) AS hamming
FROM cand
WHERE ({_hamming.replace('a.simhash', 'sh_a').replace('b.simhash', 'sh_b')}) <= 6
"""


@register("dedup_simhash_pairs", oracle=SIMHASH_PAIRS_ORACLE)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pin: the banded self-join reads sig on both sides (same
    # double-execution reasoning as dedup_minhash_pairs)
    sig = cache.pin(D.simhash(load_table(spark, sf_dir, "documents")))
    return D.simhash_near_pairs(sig, max_hamming=6)


# -- edit-distance near-dup (blocked Levenshtein verification) -------------

EDIT_MAX = 5
_PREFIX = 12

EDITDIST_ORACLE = f"""
WITH d AS (SELECT doc_id, text, substr(text, 1, {_PREFIX}) AS blk FROM documents),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.text AS ta, b.text AS tb
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE abs(len(a.text) - len(b.text)) <= {EDIT_MAX}
)
SELECT id_a, id_b, levenshtein(ta, tb) AS edit_dist
FROM p WHERE levenshtein(ta, tb) <= {EDIT_MAX}
"""


@register("dedup_editdistance", oracle=EDITDIST_ORACLE)
def dedup_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup pairs: O(n·m) Levenshtein runs ONLY on
    candidates from two cheap blocks — equal 12-char prefix (equi-join,
    never all-pairs) and a length-difference gate (a free lower bound:
    edit distance >= |len diff|). Both the JVM ``levenshtein`` and the
    blocking are replicated verbatim by the oracle. Recall caveat, by
    construction: an edit inside the first 12 chars moves a pair out of
    the block — prefix blocking is the demo; swap in the MinHash bands
    (dedup_minhash_pairs) as the block source when edits are uniform."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.substring("text", 1, _PREFIX).alias("_blk")
    )
    a = d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("_ta"), "_blk")
    b = d.select(F.col("doc_id").alias("id_b"), F.col("text").alias("_tb"), "_blk")
    pairs = (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.length("_ta") - F.length("_tb")) <= EDIT_MAX)
    )
    return (
        pairs.withColumn("edit_dist", F.levenshtein("_ta", "_tb"))
        .filter(F.col("edit_dist") <= EDIT_MAX)
        .select("id_a", "id_b", "edit_dist")
    )


# -- cross-modal triage: text near-dup pairs scored by embedding cosine ----

CROSSMODAL_ORACLE = f"""
WITH mp AS ({MINHASH_PAIRS_ORACLE}),
xme AS (SELECT vec_id, embedding FROM embeddings),
xmu AS (
  SELECT mp.id_a, mp.id_b, mp.jaccard,
         unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
  FROM mp JOIN xme a ON a.vec_id = mp.id_a JOIN xme b ON b.vec_id = mp.id_b
),
xms AS (
  SELECT id_a, id_b, jaccard, sum(x*y) AS dot, sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
  FROM xmu GROUP BY 1, 2, 3
)
SELECT id_a, id_b, jaccard, round(dot / (na * nb), 6) AS emb_cosine FROM xms
"""


@register("dedup_crossmodal", oracle=CROSSMODAL_ORACLE)
def dedup_crossmodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup triage: every VERIFIED text near-dup pair
    (MinHash-LSH → exact Jaccard) annotated with the same ids' embedding
    cosine — the agreement signal a cleaning pipeline thresholds when
    one modality alone is noisy. Composition stays churn-sized: the
    pair set (already tiny) broadcasts into two id-equi-joins against
    the embedding table; no new pairwise work."""
    pairs = dedup_minhash_pairs(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    from ..operators import similarity as S

    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_eb"))
    cos = S._dot(F.col("_ea"), F.col("_eb")) / (S._norm(F.col("_ea")) * S._norm(F.col("_eb")))
    return (
        F.broadcast(pairs)
        .join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", "jaccard", F.round(cos, 6).alias("emb_cosine"))
    )


# -- near-dup clusters (connected components over the pair graph) ----------

CLUSTERS_ORACLE = f"""
WITH RECURSIVE mp AS ({MINHASH_PAIRS_ORACLE}),
cce AS (
  SELECT id_a AS src, id_b AS dst FROM mp
  UNION SELECT id_b, id_a FROM mp
),
reach(src, dst) AS (
  SELECT src, src FROM cce
  UNION
  SELECT r.src, e.dst FROM reach r JOIN cce e ON e.src = r.dst
)
SELECT src AS node, min(dst) AS component FROM reach GROUP BY src
"""


@register("dedup_clusters", oracle=CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup endgame: verified near-dup pairs collapsed into
    clusters (min-reachable-id labels). The oracle brute-forces the
    transitive closure recursively; the engine converges in
    diameter-many distributed label-propagation rounds."""
    pairs = dedup_minhash_pairs(spark, sf_dir)
    return D.connected_components(pairs)


@register("dedup_clusters_star", oracle=CLUSTERS_ORACLE)
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering through the O(log n)-round large-star/small-star
    contraction — the adversarial-graph (long chain) swap-in, held to
    the identical transitive-closure oracle as the propagation form."""
    pairs = dedup_minhash_pairs(spark, sf_dir)
    return D.connected_components_star(pairs)


@register("dedup_clusters_delta", oracle=CLUSTERS_ORACLE)
def dedup_clusters_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental clustering invariant, driver-checked: the pair list
    splits deterministically into a base batch and a delta batch
    (hash parity); the base is clustered, then the delta folds in via
    connected_components_delta — and the result must hash-match the
    SAME full-graph transitive-closure oracle as dedup_clusters:
    cc_delta(cc(base), delta) == cc(base ∪ delta)."""
    pairs = dedup_minhash_pairs(spark, sf_dir).persist()
    parity = F.pmod(F.xxhash64("id_a", "id_b"), F.lit(2)) == 0
    base = pairs.filter(parity)
    delta = pairs.filter(~parity)
    out = D.connected_components_delta(D.connected_components_star(base), delta)
    # both CC passes eagerly localCheckpoint their edge rounds during
    # construction, so the cache has served its purpose by now
    pairs.unpersist()
    return out


# -- decontamination -------------------------------------------------------

EVAL_SOURCE = "src0"
DECON_MIN_OVERLAP = 2

DECON_ORACLE = f"""
WITH ttok AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
  WHERE source <> '{EVAL_SOURCE}' AND len(string_split(text, ' ')) >= 3
),
tsh AS (
  SELECT DISTINCT doc_id, unnest(
    list_transform(generate_series(1, len(tokens) - 2),
                   i -> array_to_string(list_slice(tokens, i, i + 2), ' '))
  ) AS shingle
  FROM ttok
),
etok AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
  WHERE source = '{EVAL_SOURCE}' AND len(string_split(text, ' ')) >= 3
),
esh AS (
  SELECT DISTINCT unnest(
    list_transform(generate_series(1, len(tokens) - 2),
                   i -> array_to_string(list_slice(tokens, i, i + 2), ' '))
  ) AS shingle
  FROM etok
),
tot AS (SELECT doc_id, count(*) AS n_shingles FROM tsh GROUP BY doc_id),
m AS (
  SELECT t.doc_id, count(*) AS n_matched
  FROM tsh t JOIN esh e USING (shingle)
  GROUP BY t.doc_id
)
SELECT tot.doc_id, tot.n_shingles,
       coalesce(m.n_matched, 0) AS n_matched,
       (coalesce(m.n_matched, 0) * 1000000) // tot.n_shingles AS overlap_ratio_fp6,
       coalesce(m.n_matched, 0) >= {DECON_MIN_OVERLAP} AS contaminated
FROM tot LEFT JOIN m ON tot.doc_id = m.doc_id
"""


@register("decontaminate_vs_eval", oracle=DECON_ORACLE, bench=True)
def decontaminate_vs_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-leakage decontamination: docs from EVAL_SOURCE play the
    held-out eval set; every other doc is scored by distinct-3-gram
    overlap against the eval shingle set (broadcast — the eval side is
    the small side by construction)."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != EVAL_SOURCE)
    ev = docs.filter(F.col("source") == EVAL_SOURCE)
    return D.decontaminate(train, ev, min_overlap=DECON_MIN_OVERLAP)


# -- Bloom-prefiltered decontamination -------------------------------------
#
# Same answer as decontaminate_vs_eval (Bloom has no false negatives and
# the exact join removes false positives), different physical shape: the
# eval membership broadcasts as an m/8-byte bitmap literal instead of
# raw shingle strings. The stats query proves the bitmap itself
# bit-for-bit (DuckDB rebuilds it from the same md5 double-hash family).

BLOOM_M = 1 << 20
BLOOM_K4 = 4

_BLOOM_WORDS_CTE = f"""
epos AS (
  SELECT ((('0x' || substr(md5(shingle), 1, 15))::BIGINT
          + i.i * ('0x' || substr(md5(shingle), 17, 15))::BIGINT) % {BLOOM_M}) AS pos
  FROM esh, range({BLOOM_K4}) AS i(i)
),
words AS (
  SELECT pos // 32 AS widx, bit_or(1::BIGINT << (pos % 32)::INT) AS word
  FROM epos GROUP BY 1
)
"""

BLOOM_STATS_ORACLE = f"""
WITH etok AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
  WHERE source = '{EVAL_SOURCE}' AND len(string_split(text, ' ')) >= 3
),
esh AS (
  SELECT DISTINCT unnest(
    list_transform(generate_series(1, len(tokens) - 2),
                   i -> array_to_string(list_slice(tokens, i, i + 2), ' '))
  ) AS shingle
  FROM etok
),
{_BLOOM_WORDS_CTE},
ttok AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
  WHERE source <> '{EVAL_SOURCE}' AND len(string_split(text, ' ')) >= 3
),
tsh AS (
  SELECT DISTINCT unnest(
    list_transform(generate_series(1, len(tokens) - 2),
                   i -> array_to_string(list_slice(tokens, i, i + 2), ' '))
  ) AS shingle
  FROM ttok
),
tpos AS (
  SELECT shingle,
         ((('0x' || substr(md5(shingle), 1, 15))::BIGINT
          + i.i * ('0x' || substr(md5(shingle), 17, 15))::BIGINT) % {BLOOM_M}) AS pos
  FROM tsh, range({BLOOM_K4}) AS i(i)
),
probe AS (
  SELECT t.shingle,
         bool_and((coalesce(w.word, 0) & (1::BIGINT << (t.pos % 32)::INT)) <> 0) AS maybe
  FROM tpos t LEFT JOIN words w ON w.widx = t.pos // 32
  GROUP BY t.shingle
)
SELECT {BLOOM_M}::BIGINT AS m_bits, {BLOOM_K4}::BIGINT AS k,
       (SELECT count(*) FROM esh)::BIGINT AS n_keys,
       (SELECT sum(bit_count(word)) FROM words)::BIGINT AS bits_set,
       count(*)::BIGINT AS n_probe,
       sum(CASE WHEN probe.maybe THEN 1 ELSE 0 END)::BIGINT AS n_bloom_pos,
       sum(CASE WHEN probe.shingle IN (SELECT shingle FROM esh) THEN 1 ELSE 0 END)::BIGINT
         AS n_true_pos
FROM probe
"""


@register("bloom_filter_stats", oracle=BLOOM_STATS_ORACLE)
def bloom_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row report proving the Bloom machinery bit-for-bit: the
    oracle REBUILDS the bitmap from the same derandomized double-hash
    family and must agree on every set bit (bits_set), every probe
    verdict (n_bloom_pos) and the exact membership baseline
    (n_true_pos). n_bloom_pos − n_true_pos = observed false positives,
    bounded by the fpp formula in operators/bloom.py."""
    from ..operators import bloom as B

    docs = load_table(spark, sf_dir, "documents")
    ev_sh = (
        D.shingles(docs.filter(F.col("source") == EVAL_SOURCE)).select("shingle").distinct()
    )
    dense = B.bloom_dense(B.bloom_build(ev_sh, "shingle", BLOOM_M, BLOOM_K4), BLOOM_M)
    n_keys = ev_sh.count()
    bits_set = sum(bin(w & 0xFFFFFFFF).count("1") for w in dense)
    probe = (
        D.shingles(docs.filter(F.col("source") != EVAL_SOURCE)).select("shingle").distinct()
    )
    flagged = probe.withColumn(
        "maybe", B.bloom_contains(F.col("shingle"), dense, BLOOM_M, BLOOM_K4)
    ).join(
        F.broadcast(ev_sh.withColumn("_hit", F.lit(1))), "shingle", "left"
    )
    return flagged.agg(
        F.lit(BLOOM_M).cast("long").alias("m_bits"),
        F.lit(BLOOM_K4).cast("long").alias("k"),
        F.lit(n_keys).cast("long").alias("n_keys"),
        F.lit(bits_set).cast("long").alias("bits_set"),
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum(F.col("maybe").cast("int")).cast("long").alias("n_bloom_pos"),
        F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_true_pos"),
    )


@register("decontaminate_bloom", oracle=DECON_ORACLE, bench=True)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decontaminate_vs_eval through the Bloom-prefiltered physical
    path — same oracle, bit-identical answer: false positives are
    verified away by the exact join, false negatives don't exist. The
    scale case this exists for: an eval shingle set too large to
    broadcast as raw keys still broadcasts as an m/8-byte bitmap, and
    bloom-negative corpus shingles never reach the match join."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != EVAL_SOURCE)
    ev = docs.filter(F.col("source") == EVAL_SOURCE)
    return D.decontaminate_bloom(
        train, ev, min_overlap=DECON_MIN_OVERLAP, m_bits=BLOOM_M, k=BLOOM_K4
    )


# -- containment (asymmetric near-dup) -------------------------------------

CONTAIN_ORACLE = f"""
WITH {_SHINGLES_CTE},
pieces AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS p1,
         ('0x' || substr(md5(shingle), 17, 15))::BIGINT AS p2
  FROM sh
),
sig AS (
  SELECT doc_id,
         {", ".join(f"min(p1 + {s} * p2) AS h{s}" for s in range(NUM_HASHES))}
  FROM pieces GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band, b.s1, b.s2
  FROM sig, LATERAL (VALUES {_band_rows}) AS b(band, s1, s2)
),
cpair AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.s1 = b.s1 AND a.s2 = b.s2
  WHERE a.doc_id < b.doc_id
),
csizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
cinter AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cpair c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.inter,
       (i.inter * 1000000) // sa.n AS containment_a_fp6,
       (i.inter * 1000000) // sb.n AS containment_b_fp6,
       greatest((i.inter * 1000000) // sa.n, (i.inter * 1000000) // sb.n) AS containment_fp6
FROM cinter i
JOIN csizes sa ON i.id_a = sa.doc_id
JOIN csizes sb ON i.id_b = sb.doc_id
"""


@register("dedup_containment", oracle=CONTAIN_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment scores on the LSH candidate pairs —
    catches short-inside-long duplication that symmetric Jaccard
    dilutes; exact integer intersections, same broadcast inverted-index
    shape as the Jaccard verifier."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingles(ensure_parallelism(docs))
    sig = D.minhash_signatures_arrays(D.shingle_arrays(ensure_parallelism(docs)))  # r12
    cand = D.lsh_candidate_pairs(sig)
    return D.containment_on_pairs(cand, sh)


# -- TF-IDF weighted similarity --------------------------------------------

TFIDF_ORACLE = f"""
WITH {_SHINGLES_CTE},
tpieces AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS p1,
         ('0x' || substr(md5(shingle), 17, 15))::BIGINT AS p2
  FROM sh
),
tsig AS (
  SELECT doc_id,
         {", ".join(f"min(p1 + {s} * p2) AS h{s}" for s in range(NUM_HASHES))}
  FROM tpieces GROUP BY doc_id
),
tbands AS (
  SELECT doc_id, b.band, b.s1, b.s2
  FROM tsig, LATERAL (VALUES {_band_rows}) AS b(band, s1, s2)
),
tpair AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM tbands a JOIN tbands b ON a.band = b.band AND a.s1 = b.s1 AND a.s2 = b.s2
  WHERE a.doc_id < b.doc_id
),
tn AS (SELECT count(DISTINCT doc_id) AS n FROM sh),
tdf AS (SELECT shingle, count(DISTINCT doc_id) AS df FROM sh GROUP BY shingle),
tw AS (
  SELECT s.doc_id, s.shingle, round(ln((tn.n + 1)::DOUBLE / (d.df + 1)) + 1, 6) AS w
  FROM sh s JOIN tdf d ON d.shingle = s.shingle, tn
),
tnorm AS (SELECT doc_id, sqrt(sum(w * w)) AS norm FROM tw GROUP BY doc_id),
tdot AS (
  SELECT p.id_a, p.id_b, sum(a.w * b.w) AS dot
  FROM tpair p
  JOIN tw a ON a.doc_id = p.id_a
  JOIN tw b ON b.doc_id = p.id_b AND b.shingle = a.shingle
  GROUP BY p.id_a, p.id_b
)
SELECT d.id_a, d.id_b,
       round(d.dot / (na.norm * nb.norm), 6) AS tfidf_cosine
FROM tdot d
JOIN tnorm na ON na.doc_id = d.id_a
JOIN tnorm nb ON nb.doc_id = d.id_b
"""


@register("dedup_tfidf_cosine", oracle=TFIDF_ORACLE)
def dedup_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rarity-weighted cosine on the LSH candidate pairs: boilerplate
    shingles (high df) stop inflating similarity — the precision
    complement to containment's recall. idf rounds to 6 before use so
    both engines' ln() agree."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingles(ensure_parallelism(docs))
    sig = D.minhash_signatures_arrays(D.shingle_arrays(ensure_parallelism(docs)))  # r12
    cand = D.lsh_candidate_pairs(sig)
    return D.tfidf_cosine_on_pairs(cand, sh)


# -- span-level exact dedup (ExactSubstr-style masking) --------------------

SPAN_WIDTH = 8
SPAN_MIN_COUNT = 2

SPAN_MASK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tokens,
         len(string_split(text, ' ')) AS n
  FROM documents
), sp AS (
  SELECT doc_id, tokens,
         unnest(generate_series(1, greatest(n - {SPAN_WIDTH} + 1, 0))) AS s
  FROM t
), spans AS (
  SELECT doc_id, s,
         md5(array_to_string(list_slice(tokens, s, s + {SPAN_WIDTH} - 1), ' ')) AS h
  FROM sp
), hot AS (
  SELECT h FROM spans GROUP BY h HAVING count(*) >= {SPAN_MIN_COUNT}
), occ AS (
  SELECT doc_id, s FROM spans JOIN hot USING (h)
), cov AS (
  SELECT DISTINCT doc_id, s + j AS p FROM occ, range(0, {SPAN_WIDTH}) r(j)
), covagg AS (
  SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id
), toks AS (
  SELECT doc_id, unnest(tokens) AS tok, unnest(generate_series(1, n)) AS p FROM t
), clean AS (
  SELECT k.doc_id, string_agg(k.tok, ' ' ORDER BY k.p) AS clean_text
  FROM toks k LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.p = k.p
  WHERE c.p IS NULL
  GROUP BY k.doc_id
)
SELECT t.doc_id,
       coalesce(cl.clean_text, '') AS clean_text,
       t.n AS n_tokens,
       coalesce(ca.n_removed, 0) AS n_removed
FROM t
LEFT JOIN clean cl USING (doc_id)
LEFT JOIN covagg ca USING (doc_id)
"""


@register("dedup_span_mask", oracle=SPAN_MASK_ORACLE, bench=True)
def dedup_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup: tokens covered by any 8-token span that
    repeats corpus-wide are removed in place (clean_text keeps the
    rest); the distributed counterpart of suffix-array ExactSubstr
    dedup, complementing document-level MinHash."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return D.mask_duplicate_spans(
        docs, width=SPAN_WIDTH, min_count=SPAN_MIN_COUNT
    )


# -- incremental LSH maintenance (delta pairs for an ingest batch) ---------

DELTA_MOD = 5  # "new" docs: doc_id % 5 == 0 (SF-independent 20% batch)

MINHASH_DELTA_ORACLE = f"""
WITH {_SHINGLES_CTE},
{_PIECES_CTE},
sig AS (
  SELECT doc_id, {_mh_cols}
  FROM pieces GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band, b.s1, b.s2
  FROM sig, LATERAL (VALUES {_band_rows}) AS b(band, s1, s2)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.s1 = b.s1 AND a.s2 = b.s2
  WHERE a.doc_id < b.doc_id
    AND (a.doc_id % {DELTA_MOD} = 0 OR b.doc_id % {DELTA_MOD} = 0)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) AS jaccard
FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id JOIN sizes sb ON i.id_b = sb.doc_id
WHERE CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) >= {JACCARD_THRESHOLD}
"""


@register("dedup_minhash_delta_pairs", oracle=MINHASH_DELTA_ORACLE)
def dedup_minhash_delta_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-batch dedup as incremental view maintenance: the 20%
    "new" slice (doc_id % 5 == 0) probes the LSH band index of the
    full corpus; only pairs touching a new doc are (re)computed and
    verified. pairs(base) ∪ this == pairs(all) — the nightly full
    recompute collapses to a per-batch delta."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingles(ensure_parallelism(docs))
    sig = D.minhash_signatures_arrays(
        D.shingle_arrays(ensure_parallelism(docs)), num_hashes=NUM_HASHES
    )  # r12
    is_new = F.col("doc_id") % DELTA_MOD == 0
    cand = D.lsh_delta_pairs(
        sig.filter(~is_new), sig.filter(is_new),
        num_hashes=NUM_HASHES, band_size=BAND_SIZE, max_bucket=100_000,
    )
    return D.jaccard_on_pairs(cand, sh).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


# -- incremental LSH under EDITS and DELETES (signed delta pairs) ----------
#
# The full retraction-aware generalization: B' = (B \ affected) ∪ edits;
# the output is the SIGNED candidate-pair delta (mult = ±1), i.e. the
# reference's (record, ±multiplicity) output contract (src/flow.rs:129-146)
# applied to the LSH candidate view. The oracle recomputes pairs(B) and
# pairs(B') from scratch and takes the symmetric difference — the
# incremental path must reproduce it exactly.

EDIT_MOD = 31  # edited docs: doc_id % 31 == 5
EDIT_RES = 5
DEL_MOD = 97  # deleted docs: doc_id % 97 == 3
DEL_RES = 3
EDIT_SUFFIX = " zz edited zz"


def _state_pairs_cte(p: str, docs_cte: str) -> str:
    """CTE chain computing the LSH candidate-pair set for one corpus
    state, name-prefixed so two states coexist in one query."""
    return f"""
{p}tok AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM {docs_cte}
  WHERE len(string_split(text, ' ')) >= 3
),
{p}sh AS (
  SELECT DISTINCT doc_id, unnest(
    list_transform(generate_series(1, len(tokens) - 2),
                   i -> array_to_string(list_slice(tokens, i, i + 2), ' '))
  ) AS shingle
  FROM {p}tok
),
{p}pieces AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS p1,
         ('0x' || substr(md5(shingle), 17, 15))::BIGINT AS p2
  FROM {p}sh
),
{p}sig AS (
  SELECT doc_id, {_mh_cols}
  FROM {p}pieces GROUP BY doc_id
),
{p}bands AS (
  SELECT doc_id, b.band, b.s1, b.s2
  FROM {p}sig, LATERAL (VALUES {_band_rows}) AS b(band, s1, s2)
),
{p}cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM {p}bands a JOIN {p}bands b ON a.band = b.band AND a.s1 = b.s1 AND a.s2 = b.s2
  WHERE a.doc_id < b.doc_id
)"""


MINHASH_EDIT_DELTA_ORACLE = f"""
WITH newdocs AS (
  SELECT doc_id,
         CASE WHEN doc_id % {EDIT_MOD} = {EDIT_RES} THEN text || '{EDIT_SUFFIX}'
              ELSE text END AS text
  FROM documents
  WHERE doc_id % {DEL_MOD} <> {DEL_RES}
),
{_state_pairs_cte('o', 'documents')},
{_state_pairs_cte('n', 'newdocs')}
SELECT n.id_a, n.id_b, 1 AS mult
FROM ncand n LEFT JOIN ocand o ON o.id_a = n.id_a AND o.id_b = n.id_b
WHERE o.id_a IS NULL
UNION ALL
SELECT o.id_a, o.id_b, -1 AS mult
FROM ocand o LEFT JOIN ncand n ON n.id_a = o.id_a AND n.id_b = o.id_b
WHERE n.id_a IS NULL
"""


@register("dedup_minhash_edit_delta", oracle=MINHASH_EDIT_DELTA_ORACLE)
def dedup_minhash_edit_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed candidate-pair delta for an edit batch: docs with
    doc_id % 31 == 5 get their text edited, docs with doc_id % 97 == 3
    are deleted outright. The incremental path probes the band index
    with affected ids only (O(|affected| x bands) — base x base never
    re-pairs) and must reproduce the oracle's from-scratch symmetric
    difference of pairs(old) vs pairs(new) exactly, retractions as
    mult = -1."""
    docs = load_table(spark, sf_dir, "documents")
    sig_base = D.minhash_signatures_arrays(
        D.shingle_arrays(ensure_parallelism(docs)), num_hashes=NUM_HASHES
    )
    edited = (
        docs.filter(
            (F.col("doc_id") % EDIT_MOD == EDIT_RES) & (F.col("doc_id") % DEL_MOD != DEL_RES)
        )
        .withColumn("text", F.concat(F.col("text"), F.lit(EDIT_SUFFIX)))
    )
    sig_edits = D.minhash_signatures_arrays(D.shingle_arrays(edited), num_hashes=NUM_HASHES)
    removed = docs.filter(F.col("doc_id") % DEL_MOD == DEL_RES).select("doc_id")
    return D.lsh_edit_delta_pairs(
        sig_base, sig_edits, removed, num_hashes=NUM_HASHES, band_size=BAND_SIZE
    )


# -- cross-source duplication matrix ---------------------------------------

# The verified-pair pipeline with exact integer intersection/union —
# the round-8 fixed-point contract: jacc_fp7 = (i·10^7) // u is a pure
# integer division of exact integers (DuckDB // and Spark DIV both
# truncate toward zero), so the per-source-pair BIGINT sums are
# bit-identical on ANY engine build. round(jaccard, 7) of the exact
# rational i/u was the round-7 driver-red hazard: when u divides 2·10^7
# the value sits EXACTLY on a 7dp half-boundary and engines' double
# rounds legitimately disagree.
SOURCE_MATRIX_ORACLE = f"""
WITH {_SHINGLES_CTE},
{_PIECES_CTE},
sig AS (
  SELECT doc_id, {_mh_cols}
  FROM pieces GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band, b.s1, b.s2
  FROM sig, LATERAL (VALUES {_band_rows}) AS b(band, s1, s2)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.s1 = b.s1 AND a.s2 = b.s2
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
vp AS (
  SELECT i.id_a, i.id_b, i.i::BIGINT AS i, (sa.n + sb.n - i.i)::BIGINT AS u
  FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id JOIN sizes sb ON i.id_b = sb.doc_id
  WHERE CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) >= {JACCARD_THRESHOLD}
),
sm AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b,
         (vp.i * 10000000) // vp.u AS jacc_fp7
  FROM vp
  JOIN documents da ON da.doc_id = vp.id_a
  JOIN documents db ON db.doc_id = vp.id_b
)
SELECT source_a, source_b, count(*) AS n_pairs,
       CAST(sum(jacc_fp7) AS BIGINT) AS sum_jaccard_fp7
FROM sm GROUP BY source_a, source_b
"""


@register("dedup_source_matrix", oracle=SOURCE_MATRIX_ORACLE)
def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance view of the verified near-dup graph: which SOURCES
    duplicate which (pair count + fixed-point Jaccard sum per unordered
    source pair; the mean is the reader's quotient) — the leakage
    matrix a corpus owner reads before deciding which feed to trust or
    drop. jacc_fp7 = (i·10^7) DIV u is exact integer arithmetic, so the
    hashed BIGINT sums cannot split across engine builds (round-7
    lesson: round(i/u, 7) lands ON 7dp half-boundaries whenever u
    divides 2·10^7, where double-round implementations disagree). Two
    broadcast-size joins from the (already candidate-bounded) verified
    pairs onto the doc→source map, one |sources|²-bounded aggregate.
    The unordered key uses least/greatest so the matrix is symmetric
    by construction."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _minhash_verified(spark, sf_dir).select("id_a", "id_b", "i", "u")
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("_sa"))
    sb = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("_sb"))
    return (
        F.broadcast(pairs)
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            F.expr("(i * 10000000) DIV u").alias("_j7"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("_j7").cast("long").alias("sum_jaccard_fp7"),
        )
    )


PREFIX_JACCARD_T = (7, 10)  # exact threshold 0.7 as a rational

PREFIX_FILTER_ORACLE = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.i AS intersection,
       sa.n + sb.n - i.i AS union_size
FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id JOIN sizes sb ON i.id_b = sb.doc_id
WHERE {PREFIX_JACCARD_T[1]} * i.i >= {PREFIX_JACCARD_T[0]} * (sa.n + sb.n - i.i)
"""


@register("dedup_prefix_filter_pairs", oracle=PREFIX_FILTER_ORACLE, bench=True)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.7 similarity join via PREFIX FILTERING
    (AllPairs/PPJoin family): rare-first global token order, only the
    ``n - ceil(0.7 n) + 1``-token prefixes enter the inverted-index
    self-join, integer length filter, then exact verification on the
    candidates only (inverted-index intersection count). Deterministic and
    exact-recall where MinHash banding is probabilistic — the right
    tool at high thresholds, where prefixes are short and candidates
    scarce.

    The oracle is algorithm-independent ground truth (ALL pairs sharing
    a shingle, exact-counted, integer cross-multiplied threshold — no
    doubles anywhere), so any recall hole the prefix filter opened
    would surface as a missing row, not a lucky hash. Intersection and
    union sizes are emitted as exact BIGINTs; the threshold compare is
    ``10·inter >= 7·union`` on both sides.
    """
    docs = load_table(spark, sf_dir, "documents")
    # r12: the per-doc shingle ARRAY table is the base materialization
    # (row-local, zero Exchange); the exploded posting table derives
    # from it and feeds ONLY the candidate generator (df-rank + prefix
    # self-join), checkpointed partitioned by shingle so the df
    # aggregate and the rank join share one exchange. Verification
    # moved to the array form: the old inverted-index verify shuffled
    # the whole posting table on (id_b, shingle) AND re-aggregated
    # per-doc sizes — both corpus-wide exchanges; now the (pinned,
    # bounded) candidate list broadcasts onto the array table twice and
    # sizes are size(_sh), row-local.
    sets = cache.pin(D.shingle_arrays(ensure_parallelism(docs)))
    sh = (
        sets.select("doc_id", F.explode("_sh").alias("shingle"))
        .repartition(F.col("shingle"))
        .localCheckpoint()
    )
    a, b = PREFIX_JACCARD_T
    pairs = cache.pin(D.prefix_filter_candidates(sh, a, b))
    ver = D.jaccard_on_pairs_arrays(pairs, sets, with_counts=True)
    return (
        ver.select(
            "id_a",
            "id_b",
            F.col("i").alias("intersection"),
            F.col("u").alias("union_size"),
        )
        .filter(F.lit(b) * F.col("intersection") >= F.lit(a) * F.col("union_size"))
    )


# -- incremental prefix filtering (delta pairs for an ingest batch) --------

PREFIX_DELTA_ORACLE = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.doc_id % {DELTA_MOD} = 0 OR b.doc_id % {DELTA_MOD} = 0
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.i AS intersection,
       sa.n + sb.n - i.i AS union_size
FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id JOIN sizes sb ON i.id_b = sb.doc_id
WHERE {PREFIX_JACCARD_T[1]} * i.i >= {PREFIX_JACCARD_T[0]} * (sa.n + sb.n - i.i)
"""


def _base_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.shingles(ensure_parallelism(docs.filter(F.col("doc_id") % DELTA_MOD != 0)))


@register("dedup_prefix_delta_pairs", oracle=PREFIX_DELTA_ORACLE)
def dedup_prefix_delta_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-batch EXACT similarity join as incremental view
    maintenance against a STORED index (round-6 judge directive #5):
    the base corpus's prefix table, df counters, and per-doc shingle
    sets live as parquet segments (sources/bucketed.ensure_segment —
    written once, read by every later session); the 20% batch
    (doc_id % 5 == 0) is tokenized ALONE, its prefixes cut under the
    stored rarity order (exactness under a stale-to-the-batch order is
    the prefix lemma's any-shared-total-order property — see
    operators/dedup._prefix_table), and only batch prefixes probe the
    (stored ∪ batch) index. Verification intersects per-doc shingle
    SETS (stored for base, fresh for batch) — the base corpus is never
    re-tokenized anywhere in the per-batch path.

    The oracle is algorithm-independent ground truth: ALL pairs sharing
    a shingle with at least one new-side doc, exact-counted, integer
    cross-multiplied threshold — so a recall hole opened by the probe
    OR by the stored-order subtlety surfaces as a missing row.
    pairs(base) ∪ this == pairs(all) is asserted in
    tests/test_operators.py (test_prefix_delta_invariant /
    test_prefix_delta_probe_stored_order)."""
    from ..sources.bucketed import ensure_segment

    a, b = PREFIX_JACCARD_T
    docs = load_table(spark, sf_dir, "documents")

    def build_df(s: SparkSession, d: str) -> DataFrame:
        return (
            _base_shingles(s, d)
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
        )

    def build_prefix(s: SparkSession, d: str) -> DataFrame:
        sh_base = _base_shingles(s, d)
        dfb = sh_base.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        return D._prefix_table(sh_base, dfb, a, b)

    def build_sets(s: SparkSession, d: str) -> DataFrame:
        return D.shingle_sets(_base_shingles(s, d)).select(
            "doc_id", "_sh", F.size("_sh").cast("long").alias("_n")
        )

    df_base = ensure_segment(spark, sf_dir, f"pfx_df_m{DELTA_MOD}", build_df, ("documents",))
    prefix_base = ensure_segment(
        spark, sf_dir, f"pfx_{a}_{b}_m{DELTA_MOD}", build_prefix, ("documents",)
    )
    sets_base = ensure_segment(
        spark, sf_dir, f"pfx_sets_m{DELTA_MOD}", build_sets, ("documents",)
    )

    sh_new = D.shingles(
        ensure_parallelism(docs.filter(F.col("doc_id") % DELTA_MOD == 0))
    ).localCheckpoint()
    cand = D.prefix_filter_delta_probe(prefix_base, df_base, sh_new, a, b)
    sets_new = D.shingle_sets(sh_new).select(
        "doc_id", "_sh", F.size("_sh").cast("long").alias("_n")
    )
    sets = sets_base.unionByName(sets_new)
    sa = sets.select(
        F.col("doc_id").alias("id_a"), F.col("_sh").alias("_sha"), F.col("_n").alias("_na")
    )
    sb = sets.select(
        F.col("doc_id").alias("id_b"), F.col("_sh").alias("_shb"), F.col("_n").alias("_nb")
    )
    inter = F.size(F.array_intersect("_sha", "_shb")).cast("long")
    return (
        F.broadcast(cand)
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("intersection"),
            (F.col("_na") + F.col("_nb")).alias("_s"),
        )
        .select(
            "id_a",
            "id_b",
            "intersection",
            (F.col("_s") - F.col("intersection")).cast("long").alias("union_size"),
        )
        .filter(F.lit(b) * F.col("intersection") >= F.lit(a) * F.col("union_size"))
    )


# -- content-defined chunking dedup ------------------------------------------
# The storage-dedup primitive exact digests and shingles both miss:
# rolling-hash boundaries are a function of CONTENT, so an edit at the
# front of a document re-synchronizes every later boundary and
# partially-overlapping documents share most chunk digests. Constants
# and arithmetic (integer polynomial hash mod a prime) are shared
# verbatim with operators/text.cdc_chunks, so the boundary set — and
# every chunk digest — is bit-identical on any engine build.

from ..operators.text import CDC_BASE, CDC_MASK, CDC_MOD, CDC_WINDOW  # noqa: E402

_CDC_PW_ROWS = ", ".join(
    f"({j}, {pow(CDC_BASE, j, CDC_MOD)})" for j in range(CDC_WINDOW)
)

CDC_CHUNKS_ORACLE = f"""
WITH cdcpw AS (SELECT * FROM (VALUES {_CDC_PW_ROWS}) AS t(j, pw)),
cdoc AS MATERIALIZED (SELECT doc_id, text, length(text) AS n FROM documents),
cpos AS (SELECT doc_id, unnest(range({CDC_WINDOW}, n + 1)) AS i FROM cdoc),
chash AS MATERIALIZED (
  SELECT p.doc_id, p.i,
         sum(ascii(substr(d.text, CAST(p.i - t.j AS INTEGER), 1)) * t.pw) % {CDC_MOD} AS h
  FROM cpos p JOIN cdoc d USING (doc_id) CROSS JOIN cdcpw t
  GROUP BY 1, 2
),
cbnd AS (
  SELECT doc_id, i FROM chash WHERE h % {CDC_MASK} = 0
  UNION
  SELECT doc_id, CAST(n AS BIGINT) FROM cdoc WHERE n > 0
),
cbrk AS (
  SELECT doc_id, i, lag(i, 1, 0) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM cbnd
),
cchunk AS MATERIALIZED (
  SELECT b.doc_id, md5(substr(d.text, CAST(b.prev + 1 AS INTEGER), CAST(b.i - b.prev AS INTEGER))) AS dg
  FROM cbrk b JOIN cdoc d USING (doc_id) WHERE b.i > b.prev
),
cshare AS MATERIALIZED (SELECT dg, count(DISTINCT doc_id) AS nd FROM cchunk GROUP BY dg)
SELECT c.doc_id, count(*) AS n_chunks,
       CAST(sum(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS shared_chunks
FROM cchunk c JOIN cshare s ON s.dg = c.dg
GROUP BY 1
"""


@register("dedup_cdc_chunks", oracle=CDC_CHUNKS_ORACLE)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document content-defined-chunk dedup report: (doc_id,
    n_chunks, shared_chunks) where a chunk counts as shared when its
    digest appears in at least two distinct documents — the byte-level
    overlap signal for near-copied documents whose exact digests
    differ. Chunking is per-row JVM array expressions in the scan (zero
    shuffle); the digest share-count is one hash aggregate over 16-byte
    digests and broadcast-joins back — text never shuffles."""
    from ..operators.text import cdc_chunks

    docs = load_table(spark, sf_dir, "documents")
    ch = cache.pin(cdc_chunks(docs))
    share = ch.groupBy("chunk_digest").agg(
        F.count_distinct("doc_id").alias("_nd")
    )
    return (
        ch.join(share, "chunk_digest")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0)).alias("shared_chunks"),
        )
    )
