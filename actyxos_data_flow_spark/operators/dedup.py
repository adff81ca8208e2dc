"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Every primitive here is built from *engine-portable* building blocks
(md5, string ops, array lambdas) so DuckDB oracles can replicate the
pipeline bit-for-bit — randomized hashing is derandomized by seeding
(``md5(shingle || '#' || seed)``), which also makes results reproducible
across runs and cluster topologies.

Scale design (the point of these ops at 100 TB):

- Exact dedup: hash-groupBy on a digest of the content — one shuffle of
  (digest, id), never the payload.
- MinHash: signatures computed in a single pass over the exploded
  shingle inverted index (k ``min()`` aggregates, map-side combined); no
  per-seed re-scan.
- LSH banding: candidate generation is an equi-join on (band, signature)
  buckets — the only pairwise work happens inside buckets, never a cross
  product. Bucket skew (a degenerate signature shared by millions of
  docs) is the classic failure: AQE skew-join splitting plus an optional
  bucket-size cap handle it.
- Verification: exact Jaccard only on LSH candidates, via inverted-index
  intersection counting (join on shingle), not set materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens as an array column ``tokens``."""
    return df.withColumn("tokens", F.split(F.col(text_col), " "))


def shingle_arrays(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Per-document DISTINCT shingle SET as ONE array row (id, _sh) —
    computed entirely row-local (tokenize → slide → ``array_distinct``),
    i.e. the zero-Exchange form of :func:`shingles`/:func:`shingle_sets`:
    (id, shingle) distinctness is per-document by construction, so the
    corpus-wide ``distinct()`` shuffle and the ``collect_set`` re-group
    the exploded formulation paid are both pure overhead — at 100 TB the
    whole shingle stage rides the scan (r12, guide §2.4). Docs with < n
    tokens drop out (both here and in oracles)."""
    toks = tokenize(df, text_col).select(id_col, "tokens").filter(F.size("tokens") >= n)
    arr = F.array_distinct(
        F.expr(f"transform(sequence(1, size(tokens) - {n - 1}), i -> concat_ws(' ', slice(tokens, i, {n})))")
    )
    return toks.select(id_col, arr.alias("_sh"))


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles: (id, shingle). Docs with < n tokens
    drop out (both here and in oracles). Same row set as the historical
    explode-then-``distinct()`` form with zero Exchange (the global
    distinct shuffled the whole corpus token stream for a property the
    per-doc ``array_distinct`` already guarantees).

    The explode's child is deliberately the INLINE expression, not a
    named column from :func:`shingle_arrays`: for a bare attribute,
    Catalyst's InferFiltersFromGenerate adds ``size(e) > 0`` and
    predicate pushdown then substitutes the whole array expression into
    a Filter below any Exchange — the entire shingle computation ran
    TWICE per row (and on the narrow pre-repartition side), measured 8×
    slower at sf0.1. The rule skips complex generator children."""
    toks = tokenize(df, text_col).select(id_col, "tokens").filter(F.size("tokens") >= n)
    arr = F.array_distinct(
        F.expr(f"transform(sequence(1, size(tokens) - {n - 1}), i -> concat_ws(' ', slice(tokens, i, {n})))")
    )
    return toks.select(id_col, F.explode(arr).alias("shingle"))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content digest: per digest keep the minimum id
    (M2 representative semantics) + duplicate count. Only (digest, id)
    shuffles; group sizes are tiny so no skew concern."""
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("representative"), F.count(F.lit(1)).alias("n_copies"))
    )


def _md5_piece(col, start: int) -> F.Column:
    """60-bit unsigned int from 15 hex chars of md5, as a long (exact in
    both Spark ``conv`` and DuckDB ``('0x'||h)::BIGINT``)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), start, 15), 16, 10).cast("long")


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 8) -> DataFrame:
    """MinHash signature per doc via double hashing (Kirsch-Mitzenmacher):
    one md5 per shingle supplies two independent 60-bit pieces (p1, p2);
    the k hash family is h_s = p1 + s*p2 (max 8*(2^60-1) < 2^63: no
    overflow on either engine). min() over LONG columns keeps the
    aggregate in HashAggregate with a fixed-width buffer — at 100 TB this
    is a map-side-combined single shuffle of (doc_id, k longs); the
    earlier min-of-hex-string formulation forced SortAggregate with
    per-row MessageDigest churn that collapsed JIT performance."""
    p1 = _md5_piece(F.col("shingle"), 1)
    p2 = _md5_piece(F.col("shingle"), 17)
    pieces = sh.select(id_col, p1.alias("p1"), p2.alias("p2"))
    aggs = [F.min(F.col("p1") + F.lit(s) * F.col("p2")).alias(f"h{s}") for s in range(num_hashes)]
    return pieces.groupBy(id_col).agg(*aggs)


def minhash_signatures_arrays(
    sets: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    arr_col: str = "_sh",
) -> DataFrame:
    """:func:`minhash_signatures` computed ROW-LOCALLY from the per-doc
    shingle arrays (:func:`shingle_arrays`): one md5 per shingle (nested
    ``transform``, so the digest is computed once and both 60-bit pieces
    slice the same hex string), then k ``array_min`` folds — identical
    values to the grouped formulation (min over the same distinct
    shingle set, same h_s = p1 + s·p2 family) with ZERO Exchange: the
    exploded form shuffled (doc_id, p1, p2) corpus-wide into a hash
    aggregate; here the signature stage rides the scan at any corpus
    size (r12, guide §2.4)."""
    ps = F.transform(
        F.transform(F.col(arr_col), lambda x: F.md5(x.cast("binary"))),
        lambda h: F.struct(
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("p1"),
            F.conv(F.substring(h, 17, 15), 16, 10).cast("long").alias("p2"),
        ),
    )
    t = sets.select(id_col, ps.alias("_ps"))
    cols = [
        F.array_min(
            F.transform(F.col("_ps"), lambda p: p["p1"] + F.lit(s) * p["p2"])
        ).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    return t.select(id_col, *cols)


def shingle_sig_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The fused per-document near-dup table: shingle SET (``_sh``) and
    MinHash signature (``h0..h{k-1}``) in ONE row-local projection, with
    ``keep_cols`` passed through — so a caller pins ONE table where the
    reps/sets/sig chain needed three sequential materializations (r12,
    guide §5: each pin is a blocking multi-job driver action; the three
    stages are all row-local, so fusing them is free).

    Rows with fewer than ``n`` tokens keep their passthrough columns
    with ``_sh`` (and therefore every ``h``) NULL — filtering
    ``_sh IS NOT NULL`` recovers exactly :func:`shingle_arrays`'s row
    set, and the signature values on that subset are bit-identical to
    :func:`minhash_signatures_arrays` (same md5 pieces, same
    h_s = p1 + s·p2 family, same array_min folds)."""
    toks = F.split(F.col(text_col), " ")
    arr = F.array_distinct(
        F.expr(f"transform(sequence(1, size(_toks) - {n - 1}), i -> concat_ws(' ', slice(_toks, i, {n})))")
    )
    t = df.withColumn("_toks", toks).withColumn(
        "_sh", F.when(F.size("_toks") >= n, arr)
    )
    ps = F.transform(
        F.transform(F.col("_sh"), lambda x: F.md5(x.cast("binary"))),
        lambda h: F.struct(
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("p1"),
            F.conv(F.substring(h, 17, 15), 16, 10).cast("long").alias("p2"),
        ),
    )
    t = t.withColumn("_ps", ps)
    sig_cols = [
        F.array_min(
            F.transform(F.col("_ps"), lambda p: p["p1"] + F.lit(s) * p["p2"])
        ).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    return t.select(id_col, *keep_cols, "_sh", *sig_cols)


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int | None = None,
    distinct: bool = True,
) -> DataFrame:
    """Band the signature (num_hashes/band_size bands) and emit unordered
    candidate pairs sharing any band bucket. Pure equi-join on
    (band, bucket_sig); distinct to dedupe multi-band hits.

    ``distinct=False`` skips that dedup Exchange (r12, guide §2.4): a
    consumer whose downstream is per-pair row-local work followed by an
    anti-join/semi-join (the clean-corpus pipeline) is value-identical
    under duplicate pairs — each duplicate recomputes the same verify
    row and the join build side dedupes in its hash table — and the
    duplication factor is bounded by the band count (a pair can collide
    in at most num_hashes/band_size bands). Keep the default for any
    consumer that RETURNS the pair list.

    ``max_bucket`` is the skew guard for 100 TB: a degenerate bucket (one
    signature shared by millions of near-identical docs) makes the
    self-join quadratic in that bucket. Buckets larger than the cap are
    excluded from pair generation (their members still pair through
    their other, non-degenerate bands). The pre-filter joins on the SAME
    (band, sig) key as the pair join, so AQE co-partitions it for free.
    Use :func:`lsh_oversized_buckets` to inspect/log what a cap drops."""
    bands = _lsh_bands(sig, id_col, num_hashes, band_size)
    if max_bucket is not None:
        # r12 (guide §2.4): pairs are generated ROW-LOCALLY by a
        # streaming double explode over each bucket's id array, keyed by
        # the same (band, sig) the join form would have shuffled on.
        # This replaces the previous window-count + self-join: the
        # window forced a SORT of the banded table, and the self-join's
        # two identical subtrees did NOT share one exchange under AQE
        # (locally the planner broadcast one side, which RE-EVALUATED
        # the whole bands subtree as a separate stage job; at cluster
        # scale an SMJ would re-sort both sides).
        # r13 (r12 verdict #1, guide §2.5): the cap must bound the
        # AGGREGATION BUFFER, not just emission. The r12 form filtered
        # `size(_ids) <= max_bucket` on collect_list's OUTPUT, so a
        # degenerate bucket (millions of ids sharing one signature —
        # the exact skew the cap guards) would still materialize its
        # whole membership in one unspillable buffer before the filter
        # discarded it. Oversized buckets are now dropped BEFORE any id
        # is collected: a count aggregate (map-side combinable,
        # constant-size buffer per key) finds the surviving buckets and
        # the bands semi-join onto them, so collect_list's input
        # provably excludes any bucket over the cap — its buffer is
        # <= max_bucket rows by construction. The EXCHANGE IS SHARED:
        # both aggregates and the semi-join consume one explicit
        # hash-repartition of the banded table on (band, sig) — the
        # count aggregate and the join's probe side read the same
        # shuffle output (ReusedExchange; the partitioning already
        # satisfies both groupBys, so neither adds an exchange), so the
        # banded table still shuffles exactly once, as in r12. Per-
        # bucket pair fan-out is streamed (the second explode's input
        # is one bucket-array row, never a materialized pairs array),
        # same cap² bound and same one-task-per-hot-key placement as
        # the join form. Values and multiplicities are identical to the
        # self-join: one occurrence per shared surviving bucket.
        b2 = bands.repartition("band", "sig")
        ok = (
            b2.groupBy("band", "sig")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("band", "sig")
        )
        buckets = (
            b2.join(ok, ["band", "sig"], "left_semi")
            .groupBy("band", "sig")
            .agg(F.collect_list(F.col(id_col)).alias("_ids"))
        )
        pairs = (
            buckets.select(F.explode("_ids").alias("id_a"), F.col("_ids"))
            .select(
                "id_a",
                F.explode(F.filter("_ids", lambda x: x > F.col("id_a"))).alias("id_b"),
            )
        )
        return pairs.distinct() if distinct else pairs
    # uncapped: keep the streaming self-join — collect_list without the
    # cap filter would buffer a degenerate bucket's whole membership in
    # one aggregation buffer, which the join form never does. (A
    # groupBy+JOIN-BACK formulation re-ran the whole minhash DAG per
    # reference and regressed the bench 7s → 58s; this groupBy form has
    # no second reference.)
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")), "inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
    )
    return pairs.distinct() if distinct else pairs


def _lsh_bands(sig: DataFrame, id_col: str, num_hashes: int, band_size: int) -> DataFrame:
    n_bands = num_hashes // band_size
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.struct(
                            *[F.col(f"h{b * band_size + j}").alias(f"k{j}") for j in range(band_size)]
                        ).alias("sig"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, "bs.band", "bs.sig")


def lsh_oversized_buckets(
    sig: DataFrame,
    max_bucket: int,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """The (band, sig, size) buckets a ``max_bucket`` cap would drop —
    the operator pipeline stays lazy, so drop accounting is a separate
    plan the caller runs (and logs) when the cap is in force."""
    return (
        _lsh_bands(sig, id_col, num_hashes, band_size)
        .groupBy("band", "sig")
        .agg(F.count(F.lit(1)).alias("size"))
        .filter(F.col("size") > max_bucket)
    )


def shingle_sets(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document shingle SET as one array row — the compact mirror
    of the exploded shingle table (one map-side-combined collect_set).
    Persist it next to the shingle cache: verification joins against it
    are broadcast-hash scans instead of corpus-wide shuffles."""
    return sh.groupBy(id_col).agg(F.collect_set("shingle").alias("_sh"))


def jaccard_on_pairs_arrays(
    pairs: DataFrame,
    sets: DataFrame,
    id_col: str = "doc_id",
    max_broadcast_pairs: int = 500_000,
    with_counts: bool = False,
) -> DataFrame:
    """Exact Jaccard on candidate pairs via per-doc shingle ARRAYS:
    broadcast the (bucket-capped) candidate list onto the set table
    twice — two broadcast-hash scans, zero exchanges — then
    ``array_intersect`` per pair. Same values as :func:`jaccard_on_pairs`
    (set intersection is order-free), ~1.4x faster per pass at sf0.1
    because the corpus shingle table never shuffles.

    The second broadcast carries candidate rows WITH their first-side
    arrays, so it is only safe while candidates are bounded (LSH
    ``max_bucket`` does this by construction). The guard counts the
    (persisted) pair list and falls back to the exploded-join
    formulation beyond ``max_broadcast_pairs`` — the same
    adaptive-above-threshold posture as similarity.cosine_topk's
    query-matrix chunking.

    Duplicate-pair robustness (r13, ADVICE r12): the exploded fallback
    counts intersections per pair ROW, so duplicated pairs
    (``lsh_candidate_pairs(distinct=False)``) would inflate its counts
    k-fold — it therefore ALWAYS dedupes first, instead of trusting a
    caller-synced flag (the former ``pairs_distinct``). The distinct is
    one pair-metadata exchange paid only on this >500k fallback path,
    where the exploded inverted-index join it feeds dwarfs it; the
    broadcast path is value-identical per row under duplicates and
    stays distinct-free."""
    n = pairs.count()
    if n > max_broadcast_pairs:
        exploded = sets.select(id_col, F.explode("_sh").alias("shingle"))
        return jaccard_on_pairs(
            pairs.distinct(), exploded, id_col, with_counts=with_counts
        )
    a = sets.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sha"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_shb"))
    x = a.join(F.broadcast(pairs), "id_a")
    y = F.broadcast(x).join(b, "id_b")
    inter = F.size(F.array_intersect("_sha", "_shb"))
    union = F.size("_sha") + F.size("_shb") - inter
    # zero-intersection pairs produce NO row in the exploded-join form
    # (the inverted-index join finds nothing) — keep that contract here
    cols = [
        F.col("id_a"),
        F.col("id_b"),
        inter.alias("_i"),
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    ]
    if with_counts:
        # exact integer intersection/union for fixed-point consumers
        cols += [inter.cast("long").alias("i"), union.cast("long").alias("u")]
    return y.select(*cols).filter(F.col("_i") > 0).drop("_i")


def jaccard_on_pairs(
    pairs: DataFrame, sh: DataFrame, id_col: str = "doc_id", with_counts: bool = False
) -> DataFrame:
    """Exact Jaccard for given (id_a, id_b) pairs via inverted-index
    intersection: join pair→shingles of a→shingles of b on equal shingle,
    count, divide by |A|+|B|−∩. Candidates are few relative to the
    corpus → broadcast them onto the shingle index."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        F.broadcast(pairs)
        .join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    # broadcast the CANDIDATE-sized side: `sizes` is one row per corpus
    # document (unbroadcastable at scale), while `inter` is bounded by
    # the LSH candidate count — the small side by construction
    union = F.col("na") + F.col("nb") - F.col("inter")
    cols = [
        F.col("id_a"),
        F.col("id_b"),
        (F.col("inter").cast("double") / union.cast("double")).alias("jaccard"),
    ]
    if with_counts:
        cols += [F.col("inter").cast("long").alias("i"), union.cast("long").alias("u")]
    return F.broadcast(inter).join(na, "id_a").join(nb, "id_b").select(*cols)


SIMHASH_BITS = 32


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash over tokens, term-frequency weighted.

    Bit j (1-based) of a token's hash = high bit of hex digit j of
    md5(token) — i.e. ``substr(md5,j,1) >= '8'`` — which both Spark and
    DuckDB compute identically without hex→int conversion. The doc's bit
    j is 1 iff the weighted sum of ±1 over tokens is positive; output is
    the 32-char bit string."""
    toks = (
        tokenize(df, text_col)
        .select(id_col, F.explode("tokens").alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", F.md5(F.col("tok").cast("binary")))
    )
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.substring("h", j, 1) >= "8", F.col("cnt")).otherwise(-F.col("cnt"))).alias(f"s{j}")
            for j in range(1, SIMHASH_BITS + 1)
        ]
    )
    bits = F.concat(*[F.when(F.col(f"s{j}") > 0, "1").otherwise("0") for j in range(1, SIMHASH_BITS + 1)])
    return bit_sums.select(id_col, bits.alias("simhash"))


def simhash_bands(max_hamming: int, bits: int = SIMHASH_BITS) -> list[tuple[int, int]]:
    """(start, width) 1-based slices splitting ``bits`` into
    ``max_hamming + 1`` contiguous bands. Pigeonhole: two signatures
    differing in ≤ max_hamming bits must agree on at least one of
    max_hamming + 1 disjoint bands, so banded blocking has FULL recall
    at the ``hamming <= max_hamming`` threshold. (The previous fixed
    4-byte layout only guaranteed recall to hamming ≤ 3.)"""
    n_bands = max_hamming + 1
    base, extra = divmod(bits, n_bands)
    widths = [base + 1] * extra + [base] * (n_bands - extra)
    starts, pos = [], 1
    for w in widths:
        starts.append((pos, w))
        pos += w
    return starts


def simhash_near_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 6,
    bits: int = SIMHASH_BITS,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the ``bits`` into max_hamming + 1
    slices; pairs sharing any full band are candidates (pigeonhole —
    see :func:`simhash_bands` — so recall is exact at the threshold),
    then exact hamming ≤ max_hamming.

    Perf shape: the bit string converts to a LONG once per row, so the
    per-candidate hamming is ONE codegen op (``bit_count(a XOR b)``),
    not ``bits`` substring compares, and the dedupe of multi-band hits
    runs AFTER the threshold filter, where survivors are few — the
    wide pre-filter distinct over every band collision was the
    dominant cost (measured 1.4M candidate rows at sf0.1).

    ``max_bucket`` is the same degenerate-bucket skew guard as
    :func:`lsh_candidate_pairs` (a band value shared by millions of
    near-identical signatures makes the self-join quadratic); capped
    buckets drop out of pair generation, their members still pair via
    other bands."""
    lng = F.conv(F.col("simhash"), 2, 10).cast("long")
    bands = sig.select(
        id_col,
        lng.alias("_l"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.substring("simhash", st, w).alias("piece"))
                    for b, (st, w) in enumerate(simhash_bands(max_hamming, bits))
                ]
            )
        ).alias("bp"),
    ).select(id_col, "_l", "bp.band", "bp.piece")
    if max_bucket is not None:
        from pyspark.sql import Window as W

        bucket_n = F.count(F.lit(1)).over(W.partitionBy("band", "piece"))
        bands = bands.withColumn("_bn", bucket_n).filter(F.col("_bn") <= max_bucket).drop("_bn")
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.col("a._l").bitwiseXOR(F.col("b._l")))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.piece") == F.col("b.piece")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# Size-adaptive CC (r12): at or below this many DISTINCT edges the
# component computation collapses to a driver union-find over the
# already-materialized edge list — the iterative star/propagation loops
# cost 2-3 driver actions PER ROUND, which dominates batch-sized CC
# (the mutable-gate mini-graphs, the near-dup cluster queries at local
# SFs). 100k edges collect as a few MB; beyond the bound the exact
# distributed loop runs unchanged, so the 100 TB posture is untouched.
# Same adaptive-above-threshold idiom as jaccard_on_pairs_arrays'
# max_broadcast_pairs. The result is identical either way: every node
# labeled with the MIN id reachable from it (union-find here IS exact,
# not round-bounded).
CC_DRIVER_MAX_EDGES = 100_000


def _cc_driver_labels(rows, ca: str, cb: str) -> list[tuple]:
    """Exact min-label connected components over collected edge rows:
    path-compressed union-find, then per-component min id. Returns
    (node, min_id) tuples for every node present in ``rows``."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    def union(a, b):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    for r in rows:
        union(r[ca], r[cb])
    comp_min: dict = {}
    for n in parent:
        root = find(n)
        m = comp_min.get(root)
        if m is None or n < m:
            comp_min[root] = n
    return [(n, comp_min[find(n)]) for n in parent]


def _cc_labels_frame(pairs: DataFrame, id_type, labeled: list[tuple]) -> DataFrame:
    """(node, component) rows → a DataFrame typed like the input ids."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("node", id_type, True),
            T.StructField("component", id_type, True),
        ]
    )
    return pairs.sparkSession.createDataFrame(labeled, schema)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    driver_max_edges: int = CC_DRIVER_MAX_EDGES,
) -> DataFrame:
    """Cluster near-dup pairs into components: every node gets the MIN
    node id reachable from it — the dedup endgame (keep one
    representative per cluster, drop the rest).

    Iterative min-label propagation: each round, a node's label becomes
    the min of its own and its neighbors' labels; converged when no
    label changes. Rounds = graph diameter (near-dup clusters are
    shallow — a handful), each round one join + one aggregate on the
    edge list, all distributed; the driver sees only the changed-count.
    For adversarial long-chain graphs swap in the large-star/small-star
    contraction (same interface, O(log n) rounds); min-label is the
    right default for the short, dense clusters dedup produces.
    Checkpoint-friendly: each round's labels are a plain DataFrame.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    # edges drive every round — cache once; labels re-cache per round so
    # round i+1 reads round i's RESULT, not its recursively-deepening
    # lineage (without this, round n re-executes all n-1 prior joins —
    # the count() below already materializes each round, so the persist
    # is pure win; at cluster scale swap persist for checkpoint to also
    # bound the plan string)
    edges = edges.persist()
    if driver_max_edges > 0:
        # ONE bounded job decides the path: collecting at most
        # driver_max_edges+1 rows tells whether the whole edge list fits
        # the driver bound — and in the small case those rows ARE the
        # complete edge list, so no second job is needed.
        head = edges.limit(driver_max_edges + 1).collect()
        if len(head) <= driver_max_edges:
            labeled = _cc_driver_labels(head, "src", "dst")
            edges.unpersist()
            return _cc_labels_frame(pairs, edges.schema["src"].dataType, labeled)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("_nmin"))
        )
        # localCheckpoint (eager): labels feed the next round TWICE
        # (probe side + left join), so without lineage truncation the
        # logical plan doubles per round and analysis itself OOMs on
        # high-diameter graphs long before execution does. At cluster
        # scale prefer reliable checkpoint().
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                "label",
                F.least(F.col("label"), F.coalesce(F.col("_nmin"), F.col("label"))).alias("_new"),
            )
        ).localCheckpoint()
        changed = updated.filter(F.col("_new") < F.col("label")).count()
        labels = updated.select("node", F.col("_new").alias("label"))
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("component"))


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
    driver_max_edges: int = CC_DRIVER_MAX_EDGES,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction — same output contract as :func:`connected_components`
    (every node labeled with the MIN id in its component) but O(log n)
    rounds instead of O(diameter): the swap-in for adversarial graphs
    (long chains/paths) where min-label propagation needs one round per
    hop. Each round is two self-free equi-join+aggregate passes over
    the edge list; no step ever materializes a neighborhood larger
    than the input edge set.

    large-star: every node's strictly-larger neighbors re-attach to the
    minimum of its closed neighborhood; small-star: orient edges
    larger→smaller, then each node's smaller neighbors (and itself)
    attach to the neighborhood minimum. The fixed point is a star per
    component centered at the component minimum (the public
    MapReduce-CC formulation of Kiveris et al.), detected here by an
    order-insensitive edge-set signature (count + summed hash).
    """
    # localCheckpoint (eager) rather than persist: each round references
    # the previous round's edges several times (symmetrize, join,
    # aggregate), so the LOGICAL plan grows geometrically per round even
    # when execution reuses the cache — checkpointing truncates the
    # lineage to a leaf, keeping analysis O(1) per round. At cluster
    # scale prefer reliable checkpoint() (localCheckpoint dies with an
    # executor); locally the tradeoff is free. The distinct pair list is
    # materialized ONCE including self-pairs so the same leaf feeds the
    # contraction rounds, the closing singleton anti-join (which
    # previously re-executed the whole upstream pairs plan a second
    # time), and the adaptive size probe.
    p = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .distinct()
        .localCheckpoint()
    )
    if driver_max_edges > 0:
        head = p.limit(driver_max_edges + 1).collect()
        if len(head) <= driver_max_edges:
            return _cc_labels_frame(pairs, p.schema["u"].dataType, _cc_driver_labels(head, "u", "v"))
    e = p.filter(F.col("u") != F.col("v"))

    def _signature(edges: DataFrame) -> tuple:
        row = edges.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(F.greatest("u", "v"), F.least("u", "v")).cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    sig = _signature(e)
    for _ in range(max_iter):
        # large-star over the symmetrized edge list
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        m = F.least(F.col("_mn"), F.col("u"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over larger→smaller oriented edges
        ori = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        omins = ori.groupBy("u").agg(F.min("v").alias("_mn"))
        small = (
            ori.join(omins, "u")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("u"), F.col("_mn").alias("v")),
                        F.struct(F.col("u").alias("u"), F.col("_mn").alias("v")),
                    )
                ).alias("_e")
            )
            .select("_e.u", "_e.v")
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()  # materializes the round, truncates lineage
        )
        new_sig = _signature(small)
        e = small
        if new_sig == sig:
            break
        sig = new_sig
    roots = e.select(F.col("v").alias("node")).distinct().withColumn("component", F.col("node"))
    labeled = (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .unionByName(roots)
        .distinct()
    )
    # Same output contract as connected_components: nodes appearing ONLY
    # in self-pairs (dropped by the u != v edge filter) still get a
    # singleton label. One anti-join over the node set — edge-list
    # sized, and read from the checkpointed pair leaf rather than
    # re-executing the upstream pairs plan.
    all_nodes = (
        p.select(F.explode(F.array(F.col("u"), F.col("v"))).alias("node")).distinct()
    )
    singletons = all_nodes.join(labeled.select("node"), "node", "left_anti").withColumn(
        "component", F.col("node")
    )
    return labeled.unionByName(singletons)


def connected_components_delta(
    labels: DataFrame,
    new_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
    driver_max_edges: int = CC_DRIVER_MAX_EDGES,
) -> DataFrame:
    """Incremental CC maintenance: fold a batch of NEW near-dup edges
    into an existing labeling without re-clustering the corpus graph.

    Prior components enter as star edges (node → component id), which
    are already depth-1, so the star contraction only has to resolve
    chains the delta introduces — O(log |delta-chain|) rounds over
    |labels| + |delta| edges, versus re-running CC over every historic
    pair. The ingest-time invariant (tested):

        cc_delta(cc(base), delta) == cc(base ∪ delta)

    Label ids stay canonical (min id of the merged component) because
    every component id IS the min node id of its members (and a new
    node's id is itself), so the min over merged component ids equals
    the min over all member nodes. This is the clustering companion to
    ``lsh_delta_pairs``: the band index yields the delta edges, this
    folds them into the standing cluster table.

    Scale shape (the round-12 rewrite): the standing label table —
    doc-count-sized at corpus scale — is never fed through the
    contraction loop (the previous formulation re-starred ALL prior
    labels every batch: O(labels) shuffled per contraction round).
    Delta endpoints map to their current component ids (one lookup
    join; unseen nodes map to themselves), the iterative contraction
    runs on the COMPONENT-LEVEL mini-graph — O(delta) edges — and the
    merged roots broadcast-join back onto the standing table. Per
    batch the big table is touched by single-pass joins only.
    """
    # the standing table is referenced four times below (two endpoint
    # lookups, the relabel join, the new-node anti-join) — materialize
    # it ONCE so a caller passing a live plan (e.g. the output of a
    # just-run contraction) doesn't re-execute it per reference; for
    # the ingest path this is one pass over a parquet scan. At cluster
    # scale swap localCheckpoint for reliable checkpoint().
    labels = labels.localCheckpoint()
    la = labels.select(F.col("node").alias(id_a), F.col("component").alias("_ca"))
    lb = labels.select(F.col("node").alias(id_b), F.col("component").alias("_cb"))
    comp_edges = (
        new_pairs.select(F.col(id_a), F.col(id_b))
        .join(la, id_a, "left")
        .join(lb, id_b, "left")
        .select(
            F.coalesce(F.col("_ca"), F.col(id_a)).alias(id_a),
            F.coalesce(F.col("_cb"), F.col(id_b)).alias(id_b),
        )
    )
    mini = connected_components_star(
        comp_edges, id_a=id_a, id_b=id_b, max_iter=max_iter, driver_max_edges=driver_max_edges
    )
    # mini nodes are old component ids ∪ brand-new node ids; its labels
    # are the merged roots. Relabel standing rows via the model-sized
    # remap (broadcast), keep untouched components verbatim ...
    remap = mini.select(F.col("node").alias("component"), F.col("component").alias("_new"))
    updated = labels.join(F.broadcast(remap), "component", "left").select(
        "node", F.coalesce("_new", F.col("component")).alias("component")
    )
    # ... and nodes the standing table has never seen enter with their
    # merged root (old component ids are all in labels.node — each is
    # the min MEMBER — so the anti-join isolates exactly the new nodes)
    new_nodes = mini.join(labels.select("node"), "node", "left_anti")
    return updated.unionByName(new_nodes.select("node", "component"))


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 2,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Eval-set decontamination: flag training docs whose text shares
    >= ``min_overlap`` distinct word n-grams with the eval corpus — the
    standard "remove benchmark leakage before training" pass.

    Output: (id, n_shingles, n_matched, overlap_ratio_fp6, contaminated).

    Scale shape: the eval side collapses to its DISTINCT shingle set
    before the join — eval corpora are orders of magnitude smaller than
    the training corpus, so with ``broadcast_eval`` the probe is a
    broadcast hash join and the 100 TB train side never shuffles for
    the match; both per-doc counts are hash aggregates with map-side
    partial combine. Set ``broadcast_eval=False`` when the eval shingle
    set exceeds broadcast size (falls back to a shuffle equi-join on
    the shingle hash). No cross product anywhere.
    """
    from ..sources.tables import ensure_parallelism

    tr_sh = shingles(ensure_parallelism(train), id_col, text_col, n)
    ev_sh = shingles(eval_docs, id_col, text_col, n).select("shingle").distinct().withColumn(
        "_hit", F.lit(1)
    )
    if broadcast_eval:
        ev_sh = F.broadcast(ev_sh)
    # ONE pass over the train shingles: the broadcast left join marks
    # eval hits in-flight, and a single hash aggregate yields both the
    # total and the matched count (the totals-join-matched formulation
    # would scan + shuffle the corpus shingles twice)
    marked = tr_sh.join(ev_sh, "shingle", "left")
    agg = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce("_hit", F.lit(0))).alias("n_matched"),
    )
    return agg.select(
        id_col,
        "n_shingles",
        "n_matched",
        F.expr("(n_matched * 1000000) DIV n_shingles").alias("overlap_ratio_fp6"),
        (F.col("n_matched") >= min_overlap).alias("contaminated"),
    )


def decontaminate_bloom(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 2,
    m_bits: int | None = None,
    k: int | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """:func:`decontaminate` with a Bloom prefilter on the probe side —
    bit-identical output (the Bloom has no false negatives; false
    positives are removed by the exact join), different physical shape
    for the case where the eval shingle set is too large to broadcast
    as raw keys: the finished ``m/8``-byte bitmap is a constant-folded
    literal, so bloom-negative shingles get a NULL join key and never
    enter the exact match join (a hash join does not probe null keys).
    With ``broadcast_eval=False`` the exact join becomes a shuffle
    equi-join whose probe volume the Bloom has already cut to the
    positives — the 100 TB configuration."""
    from . import bloom as B

    if m_bits is None:
        m_bits = B.BLOOM_M_BITS
    if k is None:
        k = B.BLOOM_K
    from ..sources.tables import ensure_parallelism

    tr_sh = shingles(ensure_parallelism(train), id_col, text_col, n)
    ev_sh = shingles(eval_docs, id_col, text_col, n).select("shingle").distinct()
    dense = B.bloom_dense(B.bloom_build(ev_sh, "shingle", m_bits, k), m_bits)
    maybe = B.bloom_contains(F.col("shingle"), dense, m_bits, k)
    ev_hit = ev_sh.select(F.col("shingle").alias("_k"), F.lit(1).alias("_hit"))
    if broadcast_eval:
        ev_hit = F.broadcast(ev_hit)
    marked = tr_sh.withColumn("_k", F.when(maybe, F.col("shingle"))).join(ev_hit, "_k", "left")
    agg = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce("_hit", F.lit(0))).alias("n_matched"),
    )
    return agg.select(
        id_col,
        "n_shingles",
        "n_matched",
        F.expr("(n_matched * 1000000) DIV n_shingles").alias("overlap_ratio_fp6"),
        (F.col("n_matched") >= min_overlap).alias("contaminated"),
    )


def containment_on_pairs(
    pairs: DataFrame, sh: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Asymmetric containment for given (id_a, id_b) pairs:
    |A∩B| / |A| and |A∩B| / |B| — the measure that catches a short
    document QUOTED INSIDE a long one, which symmetric Jaccard dilutes
    below any threshold (∩/|A∪B| → 0 as |B| grows while ∩/|A| stays 1).
    The max of the two is the dedup signal.

    ALL-integer arithmetic INCLUDING the scores: containment_fp6 =
    (inter·10^6) DIV n — round(inter/n, 6) of an exact rational can
    land ON a 6dp half-boundary (whenever n | 2·10^6·inter) where the
    engines' double rounds split (the round-7 driver lesson). Same
    inverted-index shape (and broadcast economics) as
    :func:`jaccard_on_pairs`."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        F.broadcast(pairs)
        .join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    c_a = F.expr("(inter * 1000000) DIV na")
    c_b = F.expr("(inter * 1000000) DIV nb")
    # broadcast the candidate-sized inter, never the per-doc sizes
    return (
        F.broadcast(inter).join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("inter"),
            c_a.alias("containment_a_fp6"),
            c_b.alias("containment_b_fp6"),
            F.greatest(c_a, c_b).alias("containment_fp6"),
        )
    )


def tfidf_cosine_on_pairs(
    pairs: DataFrame, sh: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Rarity-weighted similarity for given (id_a, id_b) pairs: binary-tf
    TF-IDF cosine over the shingle sets. Shared BOILERPLATE shingles
    (high document frequency → idf ≈ min) contribute almost nothing,
    so two docs sharing only a common header score near 0 where raw
    Jaccard would flag them — the complement of containment's recall.

    idf = round(ln((N+1)/(df+1)) + 1, 6) — smooth, strictly positive,
    and ROUNDED BEFORE use: engines' ln() may differ in the last ulp,
    rounding pins the weight so downstream sums agree. N = count of
    docs with shingles (computed from ``sh``, same on both sides).

    Scale shape: df is one (shingle) aggregate over the inverted index;
    norms one (doc) aggregate; the pair scoring joins the broadcast
    candidates onto the weighted index — identical economics to
    jaccard_on_pairs, plus two map-side-combined aggregates."""
    n_docs = sh.select(id_col).distinct().count()
    w = F.round(F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1, 6)
    weighted = (
        sh.join(sh.groupBy("shingle").agg(F.countDistinct(id_col).alias("df")), "shingle")
        .select(id_col, "shingle", w.alias("w"))
    )
    norms = weighted.groupBy(id_col).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    wa = weighted.select(F.col(id_col).alias("id_a"), "shingle", F.col("w").alias("wa"))
    wb = weighted.select(F.col(id_col).alias("id_b"), "shingle", F.col("w").alias("wb"))
    dots = (
        F.broadcast(pairs)
        .join(wa, "id_a")
        .join(wb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("norm").alias("na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("norm").alias("nb"))
    # broadcast the candidate-sized dots, never the per-doc norms
    return (
        F.broadcast(dots).join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("tfidf_cosine"),
        )
    )


def span_occurrences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
) -> DataFrame:
    """Every ``width``-token span occurrence: (id, start, h) with h =
    md5 of the span text and 1-based token start. Docs shorter than one
    span emit nothing. The span *hash* (16 bytes) is what flows into
    the global count — never the span text — so the shuffle is
    O(corpus tokens × 16 B) regardless of span width."""
    toks = tokenize(df, text_col).select(id_col, "tokens", F.size("tokens").alias("_n"))
    # sequence(1, 0) in Spark would COUNT DOWN ([1, 0]); guard short docs
    starts = F.when(
        F.col("_n") >= width, F.expr(f"sequence(1, _n - {width} + 1)")
    ).otherwise(F.expr("array()"))
    sp = toks.select(id_col, "tokens", F.explode(starts).alias("s"))
    h = F.md5(F.expr(f"concat_ws(' ', slice(tokens, s, {width}))").cast("binary"))
    return sp.select(id_col, "s", h.alias("h"))


def mask_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """ExactSubstr-style dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): remove every token covered by
    a ``width``-token span that occurs ``min_count``+ times in the
    corpus, keeping the rest of each document intact — the span-level
    counterpart of document-level MinHash (boilerplate, licenses,
    templated headers repeat at span granularity while their documents
    differ).

    Output: (id, clean_text, n_tokens, n_removed). Documents fully
    covered by duplicated spans survive with ``clean_text = ''`` (the
    caller decides whether empties are dropped).

    Scale shape — the distributed stand-in for the paper's monolithic
    suffix array: one explode to span hashes, one map-side-combined
    count to find hot spans, a semi-join back (hash-only traffic), and
    a per-doc covered-positions array folded back onto the ORIGINAL
    row with an indexed array filter — the token payload itself is
    never shuffled, and per-doc state is bounded by document length.
    Hot-span skew is bounded: a span occurring millions of times is
    one counter cell, and coverage stays per-occurrence."""
    occ = span_occurrences(df, id_col, text_col, width)
    hot = (
        occ.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("h")
    )
    dup_occ = occ.join(hot, "h", "left_semi")
    cov = (
        dup_occ.select(id_col, F.explode(F.expr(f"sequence(s, s + {width} - 1)")).alias("p"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("p")).alias("_cov"))
    )
    toks = tokenize(df, text_col).select(id_col, "tokens")
    out = toks.join(cov, id_col, "left")
    keep = F.filter(
        "tokens", lambda x, i: ~F.array_contains(F.coalesce(F.col("_cov"), F.expr("array()")), i + 1)
    )
    return out.select(
        id_col,
        F.array_join(keep, " ").alias("clean_text"),
        F.size("tokens").alias("n_tokens"),
        F.when(F.col("_cov").isNull(), F.lit(0)).otherwise(F.size("_cov")).alias("n_removed"),
    )


def lsh_delta_pairs(
    sig_base: DataFrame,
    sig_new: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental LSH maintenance — the IVM shape of near-dup
    detection: when a batch of NEW documents joins the corpus, the
    candidate pairs *added* are exactly (new bands) ⋈ (base ∪ new
    bands). The base×base work is never redone, so per-batch cost is
    O(|new| × bands) probes against the band index instead of
    re-pairing the whole corpus — the difference between an
    ingest-time dedup gate and a nightly full recompute at 100 TB.

    Invariant (tested): pairs(base) ∪ delta_pairs(base, new) ==
    pairs(base ∪ new). ``max_bucket`` caps index-side buckets exactly
    as in :func:`lsh_candidate_pairs` (a degenerate bucket would
    otherwise make every future batch pay its size)."""
    bands_new = _lsh_bands(sig_new, id_col, num_hashes, band_size)
    bands_all = _lsh_bands(sig_base, id_col, num_hashes, band_size).unionByName(bands_new)
    if max_bucket is not None:
        from pyspark.sql import Window as W

        bucket_n = F.count(F.lit(1)).over(W.partitionBy("band", "sig"))
        bands_all = bands_all.withColumn("_bn", bucket_n).filter(F.col("_bn") <= max_bucket).drop("_bn")
    n, a = bands_new.alias("n"), bands_all.alias("a")
    lo = F.least(F.col(f"n.{id_col}"), F.col(f"a.{id_col}"))
    hi = F.greatest(F.col(f"n.{id_col}"), F.col(f"a.{id_col}"))
    return (
        n.join(a, (F.col("n.band") == F.col("a.band")) & (F.col("n.sig") == F.col("a.sig")))
        .filter(F.col(f"n.{id_col}") != F.col(f"a.{id_col}"))
        .select(lo.alias("id_a"), hi.alias("id_b"))
        .distinct()
    )


def _probe_band_pairs(bands_probe: DataFrame, bands_index: DataFrame, id_col: str) -> DataFrame:
    """Distinct unordered pairs from (probe bands) ⋈ (index bands) —
    the shared kernel of the incremental LSH paths."""
    n, a = bands_probe.alias("n"), bands_index.alias("a")
    lo = F.least(F.col(f"n.{id_col}"), F.col(f"a.{id_col}"))
    hi = F.greatest(F.col(f"n.{id_col}"), F.col(f"a.{id_col}"))
    return (
        n.join(a, (F.col("n.band") == F.col("a.band")) & (F.col("n.sig") == F.col("a.sig")))
        .filter(F.col(f"n.{id_col}") != F.col(f"a.{id_col}"))
        .select(lo.alias("id_a"), hi.alias("id_b"))
        .distinct()
    )


def _cap_buckets(bands: DataFrame, max_bucket: int | None) -> DataFrame:
    if max_bucket is None:
        return bands
    from pyspark.sql import Window as W

    bucket_n = F.count(F.lit(1)).over(W.partitionBy("band", "sig"))
    return bands.withColumn("_bn", bucket_n).filter(F.col("_bn") <= max_bucket).drop("_bn")


def lsh_edit_delta_pairs(
    sig_base: DataFrame,
    sig_edits: DataFrame,
    removed_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental LSH maintenance under EDITS and DELETES — the full
    delta-space (±multiplicity) generalization of
    :func:`lsh_delta_pairs`, mirroring the reference's signed-delta
    collection semantics (src/flow.rs:129-146: every change is
    (record, ±mult), retraction included).

    State transition: B' = (B \\ affected) ∪ edits, where affected =
    edited ∪ removed ids. Output: (id_a, id_b, mult) with mult = +1
    for candidate pairs that exist in B' but not B, −1 for pairs that
    existed in B but not B'. Pairs untouched by the edit cancel (they
    appear in both probes) — consolidation is the engine's
    net-multiplicity rule (delta.py). Invariant (tested):
    apply(pairs(B), delta) == pairs(B').

    Cost: both probes are O(|affected| × bands) against a band index —
    base×base is never re-paired. Recomputing the full new-state band
    table here is a formulation convenience; a deployed index applies
    (delete affected rows, insert edit rows) to a persisted band table
    exactly as streaming/ingest.py maintains its indexes."""
    affected = sig_edits.select(id_col)
    if removed_ids is not None:
        affected = affected.unionByName(removed_ids.select(id_col))
    affected = affected.distinct()

    bands_old = _cap_buckets(_lsh_bands(sig_base, id_col, num_hashes, band_size), max_bucket)
    rem = _probe_band_pairs(bands_old.join(affected, id_col, "left_semi"), bands_old, id_col)

    sig_new_state = sig_base.join(affected, id_col, "left_anti").unionByName(sig_edits)
    bands_new = _cap_buckets(_lsh_bands(sig_new_state, id_col, num_hashes, band_size), max_bucket)
    add = _probe_band_pairs(
        bands_new.join(sig_edits.select(id_col).distinct(), id_col, "left_semi"),
        bands_new,
        id_col,
    )
    delta = add.withColumn("mult", F.lit(1)).unionByName(rem.withColumn("mult", F.lit(-1)))
    return (
        delta.groupBy("id_a", "id_b")
        .agg(F.sum("mult").cast("int").alias("mult"))
        .filter(F.col("mult") != 0)
    )


def _prefix_table(
    sh: DataFrame,
    dfreq: DataFrame,
    threshold_num: int,
    threshold_den: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut each document's prefix under the rarity order given by
    ``dfreq(shingle, _df)``: sort by (df asc, shingle), keep the first
    ``n - ceil(t·n) + 1`` tokens. Shingles absent from ``dfreq`` rank
    rarest (df 0) — that is what lets a STORED df table order a new
    batch's shingles: the order stays total over the union vocabulary,
    and a base document's own prefix is stable under vocabulary
    extension (inserting unseen shingles never reorders the shingles a
    base doc actually has). Returns (id, _n, shingle) prefix rows."""
    a, b = threshold_num, threshold_den
    ranked = sh.join(dfreq, "shingle", "left").select(
        id_col,
        F.struct(
            F.coalesce(F.col("_df"), F.lit(0).cast("long")).alias("_df"),
            F.col("shingle"),
        ).alias("_t"),
    )
    lists = ranked.groupBy(id_col).agg(
        F.array_sort(F.collect_list("_t")).alias("_arr"),
        F.count(F.lit(1)).alias("_n"),
    )
    p = F.col("_n") - F.expr(f"({a} * _n + {b} - 1) DIV {b}") + 1
    return (
        lists.withColumn("_p", p.cast("int"))
        .select(id_col, "_n", F.explode(F.slice("_arr", F.lit(1), F.col("_p"))).alias("_t"))
        .select(id_col, "_n", F.col("_t.shingle").alias("shingle"))
    )


def prefix_filter_delta_probe(
    prefix_base: DataFrame,
    df_base: DataFrame,
    sh_new: DataFrame,
    threshold_num: int,
    threshold_den: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental prefix filtering against a STORED index — the
    steady-state form of :func:`prefix_filter_delta_candidates`: the
    base corpus's prefix table and df counters are read from storage
    (never re-derived), the batch's shingles are cut under the SAME
    stored rarity order (unseen shingles rank rarest; see
    :func:`_prefix_table` for why the stored base prefixes stay valid
    under vocabulary extension — the prefix-filter lemma needs only a
    total order both sides share), and the probe joins batch prefixes
    against (stored ∪ batch) prefixes. Per-batch cost: tokenize the
    batch + one df lookup join + the probe — the base corpus is
    touched only as stored files. Exact recall of the delta slice is
    inherited from the lemma and proven by the registered row's
    order-independent ground-truth oracle."""
    a, b = threshold_num, threshold_den
    pnew = _prefix_table(sh_new, df_base, a, b, id_col)
    index = prefix_base.select(id_col, "_n", "shingle").unionByName(pnew)
    pa = pnew.select(F.col(id_col).alias("_pid"), F.col("_n").alias("_pn"), "shingle")
    pb = index.select(F.col(id_col).alias("_iid"), F.col("_n").alias("_in"), "shingle")
    lo = F.least(F.col("_pid"), F.col("_iid"))
    hi = F.greatest(F.col("_pid"), F.col("_iid"))
    return (
        pa.join(pb, "shingle")
        .filter(F.col("_pid") != F.col("_iid"))
        .filter(a * F.greatest("_pn", "_in") <= b * F.least("_pn", "_in"))
        .select(lo.alias("id_a"), hi.alias("id_b"))
        .distinct()
    )


def prefix_filter_delta_candidates(
    sh: DataFrame,
    new_ids: DataFrame,
    threshold_num: int,
    threshold_den: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental prefix filtering — the IVM shape of the exact
    AllPairs/PPJoin similarity join (:func:`prefix_filter_candidates`):
    when an ingest batch lands, only the BATCH's prefixes probe the
    persisted prefix index (base ∪ batch); base×base prefixes are never
    re-joined, so per-batch probe cost is O(|batch prefixes|) index
    lookups — the same economics as :func:`lsh_delta_pairs`, with the
    prefix filter's exact-recall guarantee intact.

    Ordering note: the rarity order uses document frequency over the
    POST-BATCH corpus (the persisted index's df counters after the
    batch appends — exactly what an ingest-time index maintains). The
    prefix-filter lemma holds for ANY total order both sides share, so
    the df snapshot affects prefix LENGTH ECONOMICS only, never recall;
    the delta output is exactly pairs(all) restricted to pairs touching
    a batch doc (invariant tested; the registered query's oracle is
    order-independent ground truth).

    Returns distinct unordered candidate (id_a < id_b) pairs with at
    least one batch-side endpoint, length-filtered."""
    a, b = threshold_num, threshold_den
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    ranked = sh.join(dfreq, "shingle").select(
        id_col, F.struct(F.col("_df"), F.col("shingle")).alias("_t")
    )
    lists = ranked.groupBy(id_col).agg(
        F.array_sort(F.collect_list("_t")).alias("_arr"),
        F.count(F.lit(1)).alias("_n"),
    )
    p = F.col("_n") - F.expr(f"({a} * _n + {b} - 1) DIV {b}") + 1
    prefix = (
        lists.withColumn("_p", p.cast("int"))
        .select(id_col, "_n", F.explode(F.slice("_arr", F.lit(1), F.col("_p"))).alias("_t"))
        .select(id_col, "_n", F.col("_t.shingle").alias("shingle"))
    )
    # probe side: the batch's prefixes only (left-semi against the
    # broadcast batch id list); index side: ALL prefixes
    pnew = prefix.join(F.broadcast(new_ids.select(id_col)), id_col, "left_semi")
    pa = pnew.select(F.col(id_col).alias("_pid"), F.col("_n").alias("_pn"), "shingle")
    pb = prefix.select(F.col(id_col).alias("_iid"), F.col("_n").alias("_in"), "shingle")
    lo = F.least(F.col("_pid"), F.col("_iid"))
    hi = F.greatest(F.col("_pid"), F.col("_iid"))
    return (
        pa.join(pb, "shingle")
        .filter(F.col("_pid") != F.col("_iid"))
        .filter(
            a * F.greatest("_pn", "_in") <= b * F.least("_pn", "_in")
        )
        .select(lo.alias("id_a"), hi.alias("id_b"))
        .distinct()
    )


def prefix_filter_candidates(
    sh: DataFrame,
    threshold_num: int,
    threshold_den: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard-threshold candidate pairs via PREFIX FILTERING
    (the AllPairs/PPJoin family) — the deterministic, exact-recall
    alternative to MinHash banding for high thresholds.

    Every document's shingle set is sorted by one global rarity order
    (ascending document frequency, shingle text as tie-break — a total
    order both engines can reproduce, no rank assignment needed); only
    the first ``n - ceil(t·n) + 1`` tokens are indexed. Prefix-filter
    lemma: if ``|A∩B| >= o`` then the first ``|A|-o+1`` tokens of A and
    the first ``|B|-o+1`` of B share at least one token under any
    common total order (else the intersection fits inside the two
    suffixes, which have only ``o-1`` slots on each side). With
    ``J(A,B) >= t`` we get ``o = ceil(t·max(na,nb)) >= ceil(t·n_x)``,
    so these prefixes are long enough on both sides. Candidates also
    pass the length filter ``t·max(na,nb) <= min(na,nb)`` (necessary:
    the union is at least the larger set). Threshold is a rational
    ``threshold_num/threshold_den`` so every bound stays in exact
    integer arithmetic — ``ceil(t·n) = (a·n + b - 1) DIV b``.

    Scale shape: the self-join runs on the PREFIX table — per document
    ``(1-t)·n + 1`` tokens instead of n (t=0.7 → ~30% of the inverted
    index), and rare-first ordering puts the LOWEST-df shingles in
    prefixes, so per-shingle bucket sizes in the join are the smallest
    the corpus offers (boilerplate trigrams never enter a prefix).
    Downstream exact verification sees only candidates. Per-doc sort
    cost is one JVM array_sort over doc-sized arrays — no global
    window, no rank table.
    """
    a, b = threshold_num, threshold_den
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    ranked = sh.join(dfreq, "shingle").select(
        id_col, F.struct(F.col("_df"), F.col("shingle")).alias("_t")
    )
    lists = ranked.groupBy(id_col).agg(
        F.array_sort(F.collect_list("_t")).alias("_arr"),
        F.count(F.lit(1)).alias("_n"),
    )
    # prefix length p = n - ceil(a*n/b) + 1, integer-exact (DIV, no doubles)
    p = F.col("_n") - F.expr(f"({a} * _n + {b} - 1) DIV {b}") + 1
    prefix = (
        lists.withColumn("_p", p.cast("int"))
        .select(id_col, "_n", F.explode(F.slice("_arr", F.lit(1), F.col("_p"))).alias("_t"))
        .select(id_col, "_n", F.col("_t.shingle").alias("shingle"))
    )
    pa = prefix.select(
        F.col(id_col).alias("id_a"), F.col("_n").alias("_na"), "shingle"
    )
    pb = prefix.select(
        F.col(id_col).alias("id_b"), F.col("_n").alias("_nb"), "shingle"
    )
    return (
        pa.join(pb, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            a * F.greatest("_na", "_nb") <= b * F.least("_na", "_nb")
        )
        .select("id_a", "id_b")
        .distinct()
    )
