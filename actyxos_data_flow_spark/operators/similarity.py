"""Similarity search over embedding columns (``array<float>``).

Two physical strategies:

- :func:`cosine_topk` — brute-force: query set × corpus with a JVM-side
  dot product (``zip_with`` + ``aggregate`` higher-order functions — no
  Python in the hot path, stays inside whole-stage codegen). The
  baseline, exact at any scale where |queries| × |corpus| is affordable;
  queries are broadcast so the corpus never shuffles.
- :func:`ivf_topk` — IVF-style pruned search: restrict each query to
  corpus rows in the same coarse partition (here the pretrained ``label``
  assignment plays the role of the IVF centroid id; in a full system the
  assignment comes from a k-means fit). Probing only matching partitions
  cuts the scanned corpus by the partition fan-out — the standard ANN
  scale path; the equi-join on the partition id co-locates work.

All arithmetic is promoted float→double elementwise before multiplying
(exact: 24-bit mantissa products fit in 53 bits) and summed
left-to-right, which DuckDB's sum-over-unnest reproduces bit-for-bit
(verified empirically — see plans/similarity.py oracles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import cache
from pyspark.sql import Window as W


def _matrix_lit(rows: list[list[float]]) -> Column:
    """A [n][m] double matrix as ONE plan node: ``from_json`` of a
    constant string is constant-folded by the optimizer into a single
    nested-array literal, so neither analysis nor executors ever see
    n×m separate literal expressions (verified: the optimized plan
    contains the folded literal, no ``from_json``). Building the same
    matrix from ``F.array(*[F.lit(x) ...])`` costs O(n·m) tree nodes
    per optimizer rule pass — measurably seconds of driver CPU at
    16×64. json.dumps emits shortest-round-trip reprs, so parsed
    doubles are bit-identical to the Python floats."""
    import json

    return F.from_json(F.lit(json.dumps(rows)), "array<array<double>>")


def _vector_lit(xs: list, tpe: str = "double") -> Column:
    """1-D constant-folded array literal, same trick as _matrix_lit."""
    import json

    return F.from_json(F.lit(json.dumps(xs)), f"array<{tpe}>")


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda s, x: s + x))


def _dot9(a: Column, b: Column) -> Column:
    """Dot product as an EXACT 1e-9 fixed-point BIGINT: per-term
    floor(x·y·1e9 + 0.5), order-free integer sum — the same contract as
    the classifier's scoring chain. A plain double fold is
    association-sensitive (a sequential Spark fold vs DuckDB's
    unordered GROUP BY sum can differ an ulp, and a downstream
    round(·, 9) can split engines at a half-boundary)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(1e9) + F.lit(0.5)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _sq9(a: Column) -> Column:
    """Σ floor(x²·1e9 + 0.5) — the squared-norm companion of _dot9."""
    return F.aggregate(
        F.transform(
            a,
            lambda x: F.floor(
                x.cast("double") * x.cast("double") * F.lit(1e9) + F.lit(0.5)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_scores(queries: DataFrame, corpus: DataFrame, qid: str = "qid", cid: str = "vec_id") -> DataFrame:
    """All (query, corpus) cosine scores. ``queries``: (qid, qe array),
    ``corpus``: (vec_id, embedding array). Queries broadcast."""
    pairs = corpus.crossJoin(F.broadcast(queries))
    cos = _dot(F.col("qe"), F.col("embedding")) / (_norm(F.col("qe")) * _norm(F.col("embedding")))
    return pairs.select(F.col(qid), F.col(cid), cos.alias("cosine"))


def topk(scores: DataFrame, k: int, qid: str = "qid", cid: str = "vec_id") -> DataFrame:
    """Deterministic top-k per query: rank by (cosine desc, id asc)."""
    w = W.partitionBy(qid).orderBy(F.col("cosine").desc(), F.col(cid).asc())
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid, cid, "rank", F.round("cosine", 6).alias("cosine"))
    )


def cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 10, max_query_rows: int = 65536
) -> DataFrame:
    """Brute-force exact top-k, fused scoring + per-partition pruning.

    The query matrix is collected once (it plays the broadcast-dim role)
    and shipped inside a ``mapInPandas`` closure. Each Arrow batch of the
    corpus is scored against ALL queries with one vectorized numpy pass,
    and only the per-batch top-k per query survives, so the shuffle into
    the final ranking carries ≤ batches × |Q| × k rows instead of
    |corpus| × |Q|. This is the standard distributed brute-force kNN
    shape: corpus never shuffles, score+prune is embarrassingly parallel,
    the final merge is tiny.

    Driver guard: a query set larger than ``max_query_rows`` would
    silently OOM the driver collect (and bloat every task's closure), so
    it is split into ``ceil(n/max)`` deterministic hash-chunks of qids
    and scored in multiple broadcast passes, unioned. Per-query top-k is
    independent, so the union IS the answer — no cross-chunk merge. The
    corpus is scanned once per chunk; if that's the regime you're in,
    IVF (:func:`ivf_topk`) is the right operator — the guard keeps
    brute-force *correct*, not optimal.

    Numeric parity: float32 inputs are promoted to float64 (products
    exact); dot products run through BLAS matmul (``E @ Q.T``). Summation
    order differs from the oracle's in-order fold only below the 6-dp
    rounding applied after ranking, and ranking tie-breaks on ``vec_id``,
    so the compared output is stable (hash-verified at sf0.01).
    """
    import numpy as np
    import pandas as pd

    n_q = queries.count()
    if n_q > max_query_rows:
        from functools import reduce

        n_chunks = -(-n_q // max_query_rows)
        outs = [
            cosine_topk(
                queries.filter(F.pmod(F.xxhash64("qid"), F.lit(n_chunks)) == i),
                corpus,
                k,
                # chunks are hash-balanced, not exact; don't recurse again
                max_query_rows=n_q,
            )
            for i in range(n_chunks)
        ]
        return reduce(DataFrame.unionByName, outs)

    qpdf = queries.toPandas()
    if len(qpdf) == 0:  # possible under hash-chunking
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("qid", queries.schema["qid"].dataType),
                T.StructField("vec_id", corpus.schema["vec_id"].dataType),
                T.StructField("rank", T.IntegerType()),
                T.StructField("cosine", T.DoubleType()),
            ]
        )
        return corpus.sparkSession.createDataFrame([], schema)
    Q = np.stack(qpdf["qe"].to_numpy()).astype("float64")  # (q, dim)
    qids = qpdf["qid"].to_numpy()
    qnorm = np.sqrt(np.einsum("ij,ij->i", Q, Q))

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype("float64")  # (B, dim)
            ids = pdf["vec_id"].to_numpy()
            dots = E @ Q.T  # (B, q) — BLAS, no (B, q, dim) intermediate
            enorm = np.sqrt(np.einsum("ij,ij->i", E, E))
            cos = dots / (enorm[:, None] * qnorm[None, :])
            kk = min(k, len(pdf))
            out_q, out_id, out_cos = [], [], []
            for j in range(len(qids)):
                order = np.lexsort((ids, -cos[:, j]))[:kk]  # (cos desc, id asc)
                out_q.append(np.full(kk, qids[j]))
                out_id.append(ids[order])
                out_cos.append(cos[order, j])
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_id),
                    "cosine": np.concatenate(out_cos),
                }
            )

    pruned = corpus.mapInPandas(score, schema="qid long, vec_id long, cosine double")
    return topk(pruned, k)


def sq8_quantize(corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 scalar quantization (the FAISS-SQ8
    shape): ``scale = max(|x_i|)/127``; ``q_i = clamp(floor(x_i/scale +
    0.5), ±127)`` stored as ``array<tinyint>`` — ONE byte per dimension,
    a 4× scan-bandwidth cut versus float32, which is the lever that
    matters when a 100 TB embedding store is memory-bandwidth-bound.
    Dequantized value = ``q_i * scale``. Every step (max, IEEE divide,
    floor, clamp) is deterministic and engine-reproducible — no
    rounding-mode ambiguity (floor(x+0.5) instead of round()) — so a
    SQL oracle derives bit-identical codes. Zero vectors quantize to
    zeros (scale 0 guard). Pure projection: quantization happens
    in-scan, nothing shuffles."""
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(xd, lambda x: F.abs(x))) / F.lit(127.0)
    out = corpus.withColumn("sq_scale", scale)
    q = F.transform(
        F.col(vec_col),
        lambda x: F.when(F.col("sq_scale") == 0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x.cast("double") / F.col("sq_scale") + F.lit(0.5))),
            )
        )
        .cast("tinyint"),
    )
    return out.withColumn("sq_q", q)


def sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    rerank: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over the int8-quantized corpus: approximate scores
    ``scale · Σ q_i·y_i`` against the full-precision query (rounded to
    9dp before ranking so ulp noise can't flip candidate order), keep a
    ``k·rerank`` candidate pool per query, then exact-cosine rerank on
    the (few) candidates — recall loss shows only where quantization
    error exceeds the pool margin.

    Scale shape: quantized scoring is a projection over the corpus with
    queries broadcast; candidate selection is the two-phase top-R
    (per-partition prune via a (qid, partition) window — bounded sorts
    — then a global top-R over ≤ partitions×|Q|×R survivors), so the
    corpus never shuffles and the rerank join touches candidates only."""
    r_pool = k * rerank
    qz = sq8_quantize(corpus, vec_col)
    adot = F.round(F.col("sq_scale") * _dot(F.col("sq_q"), F.col("qe")), 9)
    scored = (
        qz.crossJoin(F.broadcast(queries))
        .select("qid", id_col, adot.alias("_adot"), F.spark_partition_id().alias("_pid"))
    )
    w1 = W.partitionBy("qid", "_pid").orderBy(F.col("_adot").desc(), F.col(id_col).asc())
    pruned = scored.withColumn("_r1", F.row_number().over(w1)).filter(F.col("_r1") <= r_pool)
    w2 = W.partitionBy("qid").orderBy(F.col("_adot").desc(), F.col(id_col).asc())
    cand = (
        pruned.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= r_pool)
        .select("qid", id_col)
    )
    rer = cand.join(F.broadcast(queries), "qid").join(corpus.select(id_col, vec_col), id_col)
    cos = _dot(F.col("qe"), F.col(vec_col)) / (_norm(F.col("qe")) * _norm(F.col(vec_col)))
    return topk(rer.select("qid", id_col, cos.alias("cosine")), k)


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int = 10, partition_col: str = "label") -> DataFrame:
    """IVF-pruned top-k: only corpus rows whose coarse partition matches
    the query's (nprobe=1). Equi-join on the partition id replaces the
    cross join — at 100 TB this is a co-partitioned hash join and each
    query scans ~1/nlist of the corpus."""
    pairs = corpus.join(F.broadcast(queries), on=partition_col, how="inner")
    cos = _dot(F.col("qe"), F.col("embedding")) / (_norm(F.col("qe")) * _norm(F.col("embedding")))
    scores = pairs.select("qid", "vec_id", cos.alias("cosine"))
    return topk(scores, k)


def ivf_probe_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    partition_col: str = "label",
    probe_round: int | None = None,
) -> DataFrame:
    """IVF top-k with nprobe > 1: each query scores every coarse centroid
    (``centroids``: (partition_col, ce array) — nlist rows, broadcast),
    keeps its ``nprobe`` nearest cells (tie-break on the cell id for
    determinism), and scans only corpus rows in those cells.

    Scale shape: the centroid table is nlist rows regardless of corpus
    size, so probing is a broadcast cross join over |Q| x nlist; the
    probe set (|Q| x nprobe rows) broadcasts into the corpus equi-join —
    the corpus itself never shuffles, and the scanned fraction is
    nprobe/nlist. Recall improves monotonically with nprobe at linear
    scan cost — the standard IVF recall/latency dial (nprobe=nlist
    degenerates to brute force)."""
    ccos = _dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe")) * _norm(F.col("ce")))
    if probe_round is not None:
        ccos = F.round(ccos, probe_round)
    pw = W.partitionBy("qid").orderBy(F.col("_ccos").desc(), F.col(partition_col).asc())
    probe = (
        queries.crossJoin(F.broadcast(centroids))
        .select("qid", "qe", partition_col, ccos.alias("_ccos"))
        .withColumn("_prk", F.row_number().over(pw))
        .filter(F.col("_prk") <= nprobe)
        .select("qid", "qe", partition_col)
    )
    pairs = corpus.join(F.broadcast(probe), on=partition_col)
    cos = _dot(F.col("qe"), F.col("embedding")) / (_norm(F.col("qe")) * _norm(F.col("embedding")))
    return topk(pairs.select("qid", "vec_id", cos.alias("cosine")), k)


# -- random-hyperplane LSH (signature + banded blocking) --------------------
#
# The label-free ANN/near-dup scale path: P signed projections give a
# P-bit signature (cos(θ) concentration: P(bit equal) = 1 − θ/π); banding
# the bits turns "probably similar" into an equi-join, exactly like the
# MinHash/SimHash text paths (operators/dedup.py). Hyperplanes are
# DERANDOMIZED — component (p, d) is ±1 from a seeded md5 — so DuckDB
# oracles replicate the whole pipeline bit-for-bit and results are
# reproducible across runs and cluster topologies.


def hyperplane_signs(planes: int, dim: int, seed: int = 1) -> list[list[float]]:
    """±1 hyperplane matrix [planes][dim], derived from md5(seed:p:d)
    (d 1-based). Shared verbatim by the Spark plan and the SQL oracle."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[0], 16) >= 8
            else -1.0
            for d in range(1, dim + 1)
        ]
        for p in range(planes)
    ]


def hyperplane_signature(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 16,
    seed: int = 1,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """P-bit signature string per vector: bit p = sign of vec · h_p.
    Pure JVM column expressions (zip_with + aggregate fold, same exact
    float→double arithmetic as the cosine kernels) — no Python, no
    shuffle. The sign matrix enters the plan as ONE folded literal
    (:func:`_matrix_lit`) and the dot-product lambda is built once and
    mapped over its rows, so plan size is O(dot) rather than
    O(planes × dot) — that difference is several seconds of per-query
    analysis time at 16×64 and grows with planes×dim."""
    mat = _matrix_lit(hyperplane_signs(planes, dim, seed))
    projs = F.transform(mat, lambda row: _dot(F.col(vec_col), row))
    hsig = F.concat_ws("", F.transform(projs, lambda p: F.when(p > 0, "1").otherwise("0")))
    return df.select(id_col, *keep, hsig.alias("hsig"))


def hyperplane_bands(planes: int, n_bands: int) -> list[tuple[int, int]]:
    """(start, width) 1-based slices splitting the P bits into n_bands
    contiguous bands (same layout rule as dedup.simhash_bands)."""
    base, extra = divmod(planes, n_bands)
    widths = [base + 1] * extra + [base] * (n_bands - extra)
    out, pos = [], 1
    for w in widths:
        out.append((pos, w))
        pos += w
    return out


def _banded(sig: DataFrame, id_col: str, planes: int, n_bands: int, extra: tuple[str, ...] = ()) -> DataFrame:
    return sig.select(
        id_col,
        *extra,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.substring("hsig", st, w).alias("piece"))
                    for b, (st, w) in enumerate(hyperplane_bands(planes, n_bands))
                ]
            )
        ).alias("bp"),
    ).select(id_col, *extra, "bp.band", "bp.piece")


def hyperplane_near_pairs(
    sig: DataFrame, id_col: str = "vec_id", planes: int = 16, n_bands: int = 4
) -> DataFrame:
    """Unordered candidate pairs sharing any band of the hyperplane
    signature — the equi-join blocking step; verify with exact cosine on
    the (few) candidates."""
    bands = _banded(sig, id_col, planes, n_bands)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.piece") == F.col("b.piece")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def hyperplane_delta_pairs(
    sig_base: DataFrame,
    sig_new: DataFrame,
    id_col: str = "vec_id",
    planes: int = 16,
    n_bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental hyperplane-LSH maintenance — the embedding twin of
    ``dedup.lsh_delta_pairs``: when a batch of NEW vectors joins the
    corpus, the candidate pairs *added* are exactly (new bands) ⋈
    (base ∪ new bands); base×base work is never redone, so a streaming
    ingest gate pays O(|batch| × bands) probes per batch instead of
    re-pairing the corpus. Invariant (tested):
    pairs(base) ∪ delta_pairs(base, new) == pairs(base ∪ new).
    ``max_bucket`` drops degenerate signature buckets (e.g. the
    all-zeros region) exactly like the MinHash cap."""
    bands_new = _banded(sig_new, id_col, planes, n_bands)
    bands_all = _banded(sig_base, id_col, planes, n_bands).unionByName(bands_new)
    if max_bucket is not None:
        from pyspark.sql import Window as W2

        bucket_n = F.count(F.lit(1)).over(W2.partitionBy("band", "piece"))
        bands_all = (
            bands_all.withColumn("_bn", bucket_n).filter(F.col("_bn") <= max_bucket).drop("_bn")
        )
    n, a = bands_new.alias("n"), bands_all.alias("a")
    lo = F.least(F.col(f"n.{id_col}"), F.col(f"a.{id_col}"))
    hi = F.greatest(F.col(f"n.{id_col}"), F.col(f"a.{id_col}"))
    return (
        n.join(
            a,
            (F.col("n.band") == F.col("a.band")) & (F.col("n.piece") == F.col("a.piece")),
        )
        .filter(F.col(f"n.{id_col}") != F.col(f"a.{id_col}"))
        .select(lo.alias("id_a"), hi.alias("id_b"))
        .distinct()
    )


def hyperplane_edit_delta_pairs(
    sig_base: DataFrame,
    sig_edits: DataFrame,
    removed_ids: DataFrame | None = None,
    id_col: str = "vec_id",
    planes: int = 16,
    n_bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Signed candidate-pair delta under vector EDITS (re-embeddings)
    and DELETES — the embedding twin of ``dedup.lsh_edit_delta_pairs``
    and the retraction-aware generalization of
    :func:`hyperplane_delta_pairs`. State: B' = (B \\ affected) ∪
    edits; output (id_a, id_b, mult) with +1 = pair exists only in B',
    −1 = existed only in B; unaffected-pair probes cancel under the
    net-multiplicity consolidation. Both probes are
    O(|affected| × bands) against the band index. Invariant (tested):
    apply(pairs(B), delta) == pairs(B')."""

    def _cap(bands: DataFrame) -> DataFrame:
        if max_bucket is None:
            return bands
        from pyspark.sql import Window as W2

        bn = F.count(F.lit(1)).over(W2.partitionBy("band", "piece"))
        return bands.withColumn("_bn", bn).filter(F.col("_bn") <= max_bucket).drop("_bn")

    def _probe(probe: DataFrame, index: DataFrame) -> DataFrame:
        n, a = probe.alias("n"), index.alias("a")
        lo = F.least(F.col(f"n.{id_col}"), F.col(f"a.{id_col}"))
        hi = F.greatest(F.col(f"n.{id_col}"), F.col(f"a.{id_col}"))
        return (
            n.join(
                a,
                (F.col("n.band") == F.col("a.band")) & (F.col("n.piece") == F.col("a.piece")),
            )
            .filter(F.col(f"n.{id_col}") != F.col(f"a.{id_col}"))
            .select(lo.alias("id_a"), hi.alias("id_b"))
            .distinct()
        )

    affected = sig_edits.select(id_col)
    if removed_ids is not None:
        affected = affected.unionByName(removed_ids.select(id_col))
    affected = affected.distinct()

    bands_old = _cap(_banded(sig_base, id_col, planes, n_bands))
    rem = _probe(bands_old.join(affected, id_col, "left_semi"), bands_old)

    sig_new_state = sig_base.join(affected, id_col, "left_anti").unionByName(sig_edits)
    bands_new = _cap(_banded(sig_new_state, id_col, planes, n_bands))
    add = _probe(bands_new.join(sig_edits.select(id_col).distinct(), id_col, "left_semi"), bands_new)

    delta = add.withColumn("mult", F.lit(1)).unionByName(rem.withColumn("mult", F.lit(-1)))
    return (
        delta.groupBy("id_a", "id_b")
        .agg(F.sum("mult").cast("int").alias("mult"))
        .filter(F.col("mult") != 0)
    )


def hyperplane_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 16,
    n_bands: int = 4,
    seed: int = 1,
) -> DataFrame:
    """ANN top-k via hyperplane-band candidate generation + exact cosine
    rerank. ``queries``: (qid, qe), ``corpus``: (vec_id, embedding).

    Scale shape: both sides get signatures in-scan (no shuffle), the
    band equi-join replaces the cross join — the scanned fraction is the
    band collision rate, tunable by (planes, n_bands) — and the rerank
    touches candidates only. Recall < 1 by construction (a true
    neighbor sharing no band is missed); raise n_bands or lower planes
    for recall, the inverse for speed."""
    qs = hyperplane_signature(
        queries.withColumnRenamed("qe", "embedding"), dim, id_col="qid", planes=planes, seed=seed
    ).withColumnRenamed("hsig", "qsig")
    cs = hyperplane_signature(corpus, dim, planes=planes, seed=seed)
    qb = _banded(qs.withColumnRenamed("qsig", "hsig"), "qid", planes, n_bands)
    cb = _banded(cs, "vec_id", planes, n_bands)
    cand = (
        F.broadcast(qb)
        .join(cb, ["band", "piece"])
        .select("qid", "vec_id")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(queries), "qid")
        .join(corpus, "vec_id")
        .select("qid", "vec_id", (_dot(F.col("qe"), F.col("embedding")) / (_norm(F.col("qe")) * _norm(F.col("embedding")))).alias("cosine"))
    )
    return topk(scored, k)


# -- semantic outlier filtering (label-centroid distance) ------------------

OUTLIER_MIN_COSINE = 0.0


def label_centroids(emb: DataFrame, vec_col: str = "embedding", label_col: str = "label") -> DataFrame:
    """Per-label mean vector, decimal-exact: components are rounded to
    7 decimals (float resolution) and summed as DECIMAL, so the result
    is independent of partial-aggregation order — the property that
    lets a DuckDB oracle (and a re-run on a differently-partitioned
    cluster) reproduce the centroid bit-for-bit. The posexplode
    shuffles only (label, pos) partial sums (map-side combine), not
    the vectors themselves."""
    ex = emb.select(label_col, F.posexplode(vec_col).alias("pos", "val"))
    d = F.expr("CAST(round(CAST(val AS DOUBLE), 7) AS DECIMAL(12,7))")
    comp = ex.groupBy(label_col, "pos").agg(
        (F.sum(d).cast("double") / F.count(F.lit(1))).alias("c")
    )
    return comp.groupBy(label_col).agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]).alias(
            "centroid"
        )
    )


def centroid_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    min_cosine: float = OUTLIER_MIN_COSINE,
) -> DataFrame:
    """Semantic outlier scoring: cosine of every vector to its OWN
    label's centroid; rows under ``min_cosine`` flag as outliers —
    the embedding-space quality filter (mislabeled / off-topic docs sit
    far from their cluster center).

    Scale shape: centroids are |labels| rows — broadcast; the corpus
    never shuffles (the only exchange is the tiny partial-sum agg
    inside label_centroids). Cosine is the same zip_with/aggregate
    JVM fold as the ANN operators."""
    cent = F.broadcast(label_centroids(emb, vec_col, label_col))
    j = emb.join(cent, label_col)
    cos = _dot(F.col(vec_col), F.col("centroid")) / (
        _norm(F.col(vec_col)) * _norm(F.col("centroid"))
    )
    return j.select(
        id_col,
        label_col,
        F.round(cos, 6).alias("centroid_cosine"),
        (F.round(cos, 6) < min_cosine).alias("outlier"),
    )


# -- k-means coarse quantizer (trained IVF) --------------------------------

KMEANS_K = 8
KMEANS_ITERS = 2


def _nearest_cell_expr(cents: list[tuple[int, list[float]]], vec_col: str):
    """Column expression computing the nearest-centroid cell id for one
    vector: squared-L2 to each centroid, distances rounded to 9
    decimals, argmin with cell-id tie-break via lexicographic struct
    min. A PURE PROJECTION — no explode, no join, no shuffle. The
    centroid matrix and cell-id vector enter the plan as two folded
    literals (:func:`_matrix_lit`) so the distance lambda is built once
    and mapped — plan size O(dot), not O(k × dot)."""
    ordered = sorted(cents)
    mat = _matrix_lit([[float(x) for x in ce] for _, ce in ordered])
    cells = _vector_lit([int(c) for c, _ in ordered], "int")
    d2 = lambda ce: F.aggregate(  # noqa: E731
        F.zip_with(
            F.col(vec_col),
            ce,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    cands = F.zip_with(
        mat,
        cells,
        lambda ce, cell: F.struct(F.round(d2(ce), 9).alias("d"), cell.alias("cell")),
    )
    return F.array_min(cands)["cell"]


# Above this k the inlined-literal projection stops being the right
# physical shape: the expression tree itself (k×dim literals) dominates
# analysis/codegen time, so assignment switches to a vectorized
# mapInPandas with the centroid matrix shipped in the closure.
KMEANS_INLINE_MAX_K = 1024


def _assign_cells_pandas(
    emb: DataFrame,
    cents: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
    keep_vec: bool = False,
) -> DataFrame:
    """Large-k nearest-centroid assignment: one numpy matmul per Arrow
    batch against the (k, dim) centroid matrix. Same contract as
    :func:`_nearest_cell_expr` — squared-L2 rounded to 9 decimals via
    floor(x·1e9 + 0.5) (HALF_UP, matching Spark's round()), ties to the
    lowest cell id (centroids sorted by cell, argmin takes the first
    minimum). Still a projection over the corpus scan: no join, no
    shuffle, no corpus replication."""
    import numpy as np
    import pandas as pd

    ordered = sorted(cents)
    cells = np.array([c for c, _ in ordered], dtype=np.int64)
    C = np.array([v for _, v in ordered], dtype=np.float64)  # (k, dim)
    cnorm2 = np.einsum("ij,ij->i", C, C)
    id_type = emb.schema[id_col].dataType.simpleString()

    vec_type = emb.schema[vec_col].dataType.simpleString()

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = np.einsum("ij,ij->i", X, X)[:, None] - 2.0 * (X @ C.T) + cnorm2[None, :]
            d2 = np.floor(d2 * 1e9 + 0.5) / 1e9
            idx = np.argmin(d2, axis=1)
            out = {id_col: pdf[id_col].to_numpy(), "cell": cells[idx].astype("int32")}
            if keep_vec:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    schema = f"{id_col} {id_type}, cell int"
    if keep_vec:
        schema += f", {vec_col} {vec_type}"
    return emb.select(id_col, vec_col).mapInPandas(run, schema=schema)


def kmeans_assign(
    emb: DataFrame,
    cent: DataFrame | list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_inline_k: int = KMEANS_INLINE_MAX_K,
) -> DataFrame:
    """Nearest-centroid assignment. Centroids are nlist×dim MODEL
    PARAMETERS, not data. At coarse-quantizer sizes (k ≤
    ``max_inline_k``) they inline into the plan as literals
    (:func:`_nearest_cell_expr`), so assignment is a projection over
    the corpus — the corpus is neither replicated nlist× (the old
    broadcast cross join) nor shuffled on id (the old per-id argmin
    aggregate). Above ``max_inline_k`` the literal expression tree
    would dominate analysis time, so the same assignment runs as a
    vectorized Arrow-batched matmul (:func:`_assign_cells_pandas`) —
    identical results (same rounding and tie rules; pinned by test).
    Distances round to 9 decimals before the argmin so the choice is
    identical under any summation order."""
    from pyspark.sql import Row

    rows = cent.collect() if isinstance(cent, DataFrame) else list(cent)
    # Row subclasses tuple, so test Row FIRST: collected rows normalize
    # by field name (any column order); plain tuples are (cell, vector)
    cents = [
        (int(r["cell"]), list(r["ce"])) if isinstance(r, Row) else (int(r[0]), list(r[1]))
        for r in rows
    ]
    if len(cents) > max_inline_k:
        return _assign_cells_pandas(emb, cents, id_col, vec_col)
    return emb.select(id_col, _nearest_cell_expr(cents, vec_col).alias("cell"))


def kmeans_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer —
    replaces the seed-vector stand-in with actually-trained centroids
    while keeping every run / topology / SQL-oracle bit-identical:

    - init: the k smallest-id vectors (no RNG);
    - assign: squared-L2 argmin, distances rounded to 9dp, ties to the
      lower cell id;
    - update: per-(cell, pos) DECIMAL-exact mean (same convention as
      label_centroids) — summation-order-free; empty cells keep their
      previous centroid.

    Returns (centroids(cell, ce), assignments(id, cell)).

    Scale shape: each iteration is ONE job — scan + inline-projection
    assignment (:func:`_nearest_cell_expr`, centroids are plan
    literals) + posexplode + (cell, pos) partial-sum aggregate whose
    shuffle carries nlist×dim partials per task, never the corpus. The
    corpus is not replicated, joined, or shuffled at any point;
    between iterations only the k×dim model crosses the driver, which
    also cuts the lineage so pass i+1 never re-runs pass i's DAG.
    Iterations are a fixed small count (coarse quantizers converge in
    a few passes; this is not the fine index). Cache the corpus before
    calling at scale — each pass rescans the source."""
    # seed model: the k smallest-id vectors (no RNG)
    seed_rows = (
        emb.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("ce"))
        .collect()
    )
    cents: list[tuple[int, list[float]]] = [
        (i, [float(x) for x in r["ce"]]) for i, r in enumerate(seed_rows)
    ]
    for _ in range(iters):
        # two selects, one stage: putting the struct-field extraction in
        # the same projection as the posexplode generator trips an
        # analyzer quirk (struct field names resolve as col1/col2);
        # Catalyst collapses the projections anyway. Same inline-vs-
        # vectorized switch as kmeans_assign at large k.
        if len(cents) > KMEANS_INLINE_MAX_K:
            assigned = _assign_cells_pandas(emb, cents, id_col, vec_col, keep_vec=True)
        else:
            assigned = emb.select(
                _nearest_cell_expr(cents, vec_col).alias("cell"), F.col(vec_col)
            )
        ex = assigned.select("cell", F.posexplode(vec_col).alias("pos", "val"))
        d = F.expr("CAST(round(CAST(val AS DOUBLE), 7) AS DECIMAL(12,7))")
        comp = ex.groupBy("cell", "pos").agg(
            (F.sum(d).cast("double") / F.count(F.lit(1))).alias("c")
        )
        new = {
            int(r["cell"]): [float(x) for x in r["ce"]]
            for r in comp.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
                ).alias("ce")
            )
            .collect()
        }
        # empty cells keep their previous centroid
        cents = [(c, new.get(c, old)) for c, old in cents]
    cent = emb.sparkSession.createDataFrame(cents, "cell int, ce array<double>")
    return cent, kmeans_assign(emb, cents, id_col, vec_col)


def hard_negatives(queries: DataFrame, corpus: DataFrame, k: int = 5) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor query,
    the top-k most-cosine-similar corpus vectors whose label DIFFERS
    from the anchor's — the near-miss negatives that make embedding
    models learn boundaries (easy random negatives carry no gradient).

    ``queries``: (qid, qe, qlabel); ``corpus``: (vec_id, embedding,
    label). Output: (qid, vec_id, rank, cosine).

    Scale shape: anchors broadcast (they play the small-dim role), so
    the corpus is scanned once with the label-mismatch predicate
    applied in-scan — a broadcast nested-loop by Catalyst's choice,
    which is exactly right for |anchors| ≪ |corpus|; scoring is the
    JVM zip_with/aggregate fold (whole-stage codegen, no Python). For
    very large anchor sets, swap in the IVF probe to pre-prune cells
    before the mismatch filter."""
    pairs = corpus.join(F.broadcast(queries), F.col("label") != F.col("qlabel"))
    cos = _dot(F.col("qe"), F.col("embedding")) / (_norm(F.col("qe")) * _norm(F.col("embedding")))
    return topk(pairs.select("qid", "vec_id", cos.alias("cosine")), k)

# -- product quantization (PQ codes + ADC search) ---------------------------
#
# The compression step beyond SQ8: instead of 1 byte PER DIMENSION, PQ
# stores 1 byte PER SUBSPACE — the 64-dim corpus here compresses 256 B
# (float32) -> 4 B (m=4 codes), the 64x shrink that lets a 100 TB
# embedding store's index live in cluster memory. Training is per-
# subspace Lloyd's k-means with the same determinism contract as
# kmeans_fit (smallest-id seeding, decimal-exact means, 9dp-rounded
# argmin, empty cells keep their codeword), so a DuckDB oracle unrolls
# the fit and reproduces codes bit-for-bit.

PQ_M = 4  # subspaces
PQ_KSUB = 16  # codewords per subspace (1 byte would allow 256)
PQ_ITERS = 1  # Lloyd refinement passes over the smallest-id init


def _nearest_code_expr(codewords: list[list[float]], sub: Column) -> Column:
    """Argmin codeword id for ONE subvector column: squared-L2 rounded
    to 9dp, ties to the lower code. Same folded-literal projection shape
    as :func:`_nearest_cell_expr` (plan size O(dot), not O(ksub x dot))."""
    mat = _matrix_lit([[float(x) for x in cw] for cw in codewords])
    codes = _vector_lit(list(range(len(codewords))), "int")
    d2 = lambda cw: F.aggregate(  # noqa: E731
        F.zip_with(sub, cw, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    cands = F.zip_with(
        mat, codes, lambda cw, c: F.struct(F.round(d2(cw), 9).alias("d"), c.alias("code"))
    )
    return F.array_min(cands)["code"]


def _pq_codes_expr(books: list[list[list[float]]], vec_col: str) -> Column:
    """array<int> of per-subspace nearest-codeword ids (m entries) — a
    pure projection; the m codebooks enter the plan as folded literals."""
    dsub = len(books[0][0])
    return F.array(
        *(
            _nearest_code_expr(books[s], F.slice(F.col(vec_col), s * dsub + 1, dsub))
            for s in range(len(books))
        )
    )


def pq_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
) -> list[list[list[float]]]:
    """Deterministic per-subspace Lloyd's k-means -> PQ codebooks
    ``books[sub][code] = codeword (dsub floats)``.

    - init: codeword (s, j) = subspace-s slice of the j-th smallest-id
      vector (no RNG);
    - assign: per-subspace squared-L2 argmin, distances rounded to 9dp,
      ties to the lower code;
    - update: per-(sub, code, pos) DECIMAL-exact mean (order-free);
      empty cells keep their previous codeword.

    Scale shape: ALL m subspaces train in one job per pass — assignment
    is a single projection emitting the m-code array, the update is one
    posexplode + (sub, code, pos) partial-sum aggregate whose shuffle
    carries m x ksub x dsub partials per task (the model, never the
    corpus). Only the m x ksub x dsub model crosses the driver between
    passes. Cache the corpus before calling at scale."""
    seed_rows = (
        emb.orderBy(F.col(id_col).asc())
        .limit(ksub)
        .select(F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("ce"))
        .collect()
    )
    dim = len(seed_rows[0]["ce"])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    dsub = dim // m
    books: list[list[list[float]]] = [
        [[float(x) for x in r["ce"][s * dsub : (s + 1) * dsub]] for r in seed_rows]
        for s in range(m)
    ]
    for _ in range(iters):
        # two selects, one stage: sharing a projection with the
        # posexplode generator trips the same analyzer quirk noted in
        # kmeans_fit (struct fields resolve as col1/col2); Catalyst
        # collapses the projections anyway.
        coded = emb.select(
            _pq_codes_expr(books, vec_col).alias("_codes"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_vd"),
        ).select("_codes", F.posexplode("_vd").alias("pos", "val"))
        sub = (F.col("pos") / dsub).cast("int")
        d = F.expr("CAST(round(val, 7) AS DECIMAL(12,7))")
        comp = (
            coded.select(
                sub.alias("sub"),
                F.element_at("_codes", sub + 1).alias("code"),
                "pos",
                "val",
            )
            .groupBy("sub", "code", "pos")
            .agg((F.sum(d).cast("double") / F.count(F.lit(1))).alias("c"))
        )
        new: dict[tuple[int, int], list[float]] = {
            (int(r["sub"]), int(r["code"])): [float(x) for x in r["cw"]]
            for r in comp.groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
                ).alias("cw")
            )
            .collect()
        }
        books = [
            [new.get((s, j), books[s][j]) for j in range(ksub)] for s in range(m)
        ]
    return books


def pq_encode(
    emb: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pq_codes array<tinyint>) — m bytes per vector (vs 4 x dim
    for float32: a dim/m compression, 64x here). Pure projection, no
    shuffle; the codebooks are plan literals."""
    return emb.select(
        id_col,
        F.transform(_pq_codes_expr(books, vec_col), lambda c: c.cast("tinyint")).alias(
            "pq_codes"
        ),
    )


def _pq_reconstruct_expr(books: list[list[list[float]]], codes_col: str) -> Column:
    """Decoded vector (concat of the m looked-up codewords) — the ADC
    estimate dot(q, recon) equals the classic per-subspace LUT sum, just
    unfactored; expressing it as one reconstructed array keeps scoring
    on the same JVM fold as every other kernel here."""
    return F.flatten(
        F.array(
            *(
                F.element_at(
                    _matrix_lit([[float(x) for x in cw] for cw in books[s]]),
                    F.element_at(F.col(codes_col), s + 1).cast("int") + 1,
                )
                for s in range(len(books))
            )
        )
    )


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    rerank: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
) -> DataFrame:
    """PQ-ADC ANN top-k: train codebooks on the corpus (:func:`pq_fit`),
    encode to m-byte codes, score approximately via the asymmetric
    distance estimate ``dot(q, reconstruct(codes))`` rounded to 9dp,
    keep a k x rerank candidate pool per query (two-phase top-R: per-
    partition window prune, then global — the corpus never shuffles),
    and exact-cosine rerank the candidates only.

    Scale shape: the scored scan reads m-byte codes instead of 4 x dim
    float payloads (the bandwidth win that makes PQ the 100 TB index
    format); queries broadcast; the rerank join touches only
    |Q| x k x rerank rows of the full-precision corpus."""
    r_pool = k * rerank
    books = pq_fit(corpus, id_col=id_col, vec_col=vec_col, m=m, ksub=ksub, iters=iters)
    codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)
    # materialize the reconstructed vector ONCE per corpus row BELOW the
    # query crossJoin — the codebook lookups amortize over all |Q|
    # queries instead of re-evaluating per (query, row); the dot fold
    # above is unchanged (same elementwise order), so scores are
    # bit-identical to the inline form
    recon = codes.select(
        id_col, _pq_reconstruct_expr(books, "pq_codes").alias("_rec")
    )
    adot = F.round(_dot(F.col("qe"), F.col("_rec")), 9)
    scored = recon.crossJoin(F.broadcast(queries)).select(
        "qid", id_col, adot.alias("_adot"), F.spark_partition_id().alias("_pid")
    )
    w1 = W.partitionBy("qid", "_pid").orderBy(F.col("_adot").desc(), F.col(id_col).asc())
    pruned = scored.withColumn("_r1", F.row_number().over(w1)).filter(F.col("_r1") <= r_pool)
    w2 = W.partitionBy("qid").orderBy(F.col("_adot").desc(), F.col(id_col).asc())
    cand = (
        pruned.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= r_pool)
        .select("qid", id_col)
    )
    rer = cand.join(F.broadcast(queries), "qid").join(corpus.select(id_col, vec_col), id_col)
    cos = _dot(F.col("qe"), F.col(vec_col)) / (_norm(F.col("qe")) * _norm(F.col(vec_col)))
    return topk(rer.select("qid", id_col, cos.alias("cosine")), k)


def ivfpq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    assign: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    rerank: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    probe_round: int = 9,
    books: list | None = None,
) -> DataFrame:
    """Composed IVF-PQ ANN top-k — the standard billion-scale index
    pairing: the trained coarse quantizer (``centroids``/``assign``
    from :func:`kmeans_fit`) routes each query to its ``nprobe``
    nearest cells, PQ-ADC scores ONLY the routed cells' m-byte codes,
    and the k×rerank pool reranks with exact cosine.

    Against its two parents: vs :func:`ivf_probe_topk` the probed scan
    reads m-byte codes instead of 4×dim float payloads (the bandwidth
    term shrinks dim·4/m×); vs :func:`pq_adc_topk` the ADC scan covers
    nprobe/nlist of the corpus instead of all of it. Total scanned
    bytes drop by the PRODUCT of the two ratios — at 100 TB that is
    the difference between an index and a scan.

    Deviation from classic residual IVF-PQ (Jégou et al.): codebooks
    train on RAW vectors, not cell residuals — residual training
    couples the two fits, and the raw-vector form keeps each stage's
    SQL-oracle replay independent and bit-exact (the recall cost at
    nlist=8 coarse cells is small and visible in ann_recall_report).

    Scale shape: probing is |Q|×nlist against a broadcast model table;
    the probe set broadcasts into the cell equi-join so the corpus
    never shuffles; reconstruction materializes once per ROUTED corpus
    row below the query join; the two-phase top-R prune keeps window
    state per (qid, partition); the rerank join touches |Q|×k×rerank
    full-precision rows."""
    r_pool = k * rerank
    if books is None:  # else: the stored index artifact (same deterministic fit, cached)
        books = pq_fit(corpus, id_col=id_col, vec_col=vec_col, m=m, ksub=ksub, iters=iters)
    codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)
    recon = codes.select(
        id_col, _pq_reconstruct_expr(books, "pq_codes").alias("_rec")
    ).join(assign, id_col)
    # coarse-probe score: EXACT fp9 integer dot over the centroid,
    # divided by the centroid norm derived from an exact integer too —
    # identical doubles on any engine build, so the probe ranking needs
    # no round() at all (the query norm is constant per qid and drops
    # out of the per-qid ordering)
    ccos = _dot9(F.col("qe"), F.col("ce")).cast("double") / F.sqrt(
        _sq9(F.col("ce")).cast("double")
    )
    pw = W.partitionBy("qid").orderBy(F.col("_ccos").desc(), F.col("cell").asc())
    probe = (
        queries.crossJoin(F.broadcast(centroids))
        .select("qid", "qe", "cell", ccos.alias("_ccos"))
        .withColumn("_prk", F.row_number().over(pw))
        .filter(F.col("_prk") <= nprobe)
        .select("qid", "qe", "cell")
    )
    pairs = recon.join(F.broadcast(probe), "cell")
    # ADC score: pure fp9 BIGINT — the candidate ordering is integer
    adot = _dot9(F.col("qe"), F.col("_rec"))
    scored = pairs.select(
        "qid", id_col, adot.alias("_adot"), F.spark_partition_id().alias("_pid")
    )
    w1 = W.partitionBy("qid", "_pid").orderBy(F.col("_adot").desc(), F.col(id_col).asc())
    pruned = scored.withColumn("_r1", F.row_number().over(w1)).filter(F.col("_r1") <= r_pool)
    w2 = W.partitionBy("qid").orderBy(F.col("_adot").desc(), F.col(id_col).asc())
    cand = (
        pruned.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= r_pool)
        .select("qid", id_col)
    )
    rer = cand.join(F.broadcast(queries.select("qid", "qe")), "qid").join(
        corpus.select(id_col, vec_col), id_col
    )
    cos = _dot(F.col("qe"), F.col(vec_col)) / (_norm(F.col("qe")) * _norm(F.col(vec_col)))
    return topk(rer.select("qid", id_col, cos.alias("cosine")), k)


SEMDEDUP_SCALE = 1_000_000_000  # 9dp fixed-point quantization


def semantic_near_pairs(
    emb: DataFrame,
    assign: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Within-cell cosine-threshold edges for SemDeDup: explode vectors
    to (cell, id, pos, a), self-join on (cell, pos), and sum per-element
    products quantized to 9dp fixed-point BIGINTs — ``floor(v·1e9 + 0.5)``
    is the engine-portable quantization (identical in Spark, DuckDB, and
    numpy; no round() half-mode disagreement), and integer sums are
    exact and order-free, so the edge set is invariant to partitioning
    and engine. The whole computation stays in whole-stage codegen
    (no higher-order-function folds: measured 4.5x faster than the
    zip_with/aggregate decimal form at sf0.1).

    Scale: the joined row count is Σ_cell |cell|² · dim — bounded by the
    largest cell, linear in N while cells are held at ~constant size
    (k grows with N, the SemDeDup recipe)."""
    vx = (
        assign.join(emb.select(id_col, vec_col), id_col)
        .select(
            "cell",
            id_col,
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "_a"),
        )
    )
    vx = cache.pin(vx)
    qp = F.floor(F.col("_xa") * F.col("_xb") * F.lit(float(SEMDEDUP_SCALE)) + F.lit(0.5)).cast(
        "long"
    )
    qn = F.floor(F.col("_a") * F.col("_a") * F.lit(float(SEMDEDUP_SCALE)) + F.lit(0.5)).cast(
        "long"
    )
    a = vx.select("cell", F.col(id_col).alias("ia"), "pos", F.col("_a").alias("_xa"))
    b = vx.select("cell", F.col(id_col).alias("ib"), "pos", F.col("_a").alias("_xb"))
    dots = (
        a.join(b, ["cell", "pos"])
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.sum(qp).alias("_dq"))
    )
    norms = vx.groupBy(id_col).agg(F.sum(qn).alias("_nq"))
    sc = F.lit(float(SEMDEDUP_SCALE))
    cos = F.round(
        (F.col("_dq").cast("double") / sc)
        / (
            F.sqrt(F.col("_na").cast("double") / sc)
            * F.sqrt(F.col("_nb").cast("double") / sc)
        ),
        9,
    )
    return (
        dots.join(norms.select(F.col(id_col).alias("ia"), F.col("_nq").alias("_na")), "ia")
        .join(norms.select(F.col(id_col).alias("ib"), F.col("_nq").alias("_nb")), "ib")
        .select("ia", "ib", cos.alias("cosine"))
        .filter(F.col("cosine") >= tau)
    )
