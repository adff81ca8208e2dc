"""100x spot-probe: do the O(batch) ingest paths stay flat when the
standing corpus grows 100x, while their from-scratch siblings grow
linearly?

Round-11 directive #8. Three families with the strongest incremental
claims, probed at 1x (sf0.01) and 100x (.scratch/sf1bench/main — the
sf1-scale corpus, 100x the sf0.01 row count):

- MinHash/LSH dedup: ``dedup_minhash_pairs`` (full banded self-join)
  vs the ingest-gate delta path — a FIXED ~330-doc batch is shingled
  and signed (O(batch)), band-probes the persisted signature index
  (``lsh_delta_pairs`` — the index side is scanned but never
  self-joined), and candidates verify by the signature-agreement
  estimator, exactly the shape ``CorpusIngestor._near_dup_gate`` runs
  per micro-batch.
- DSIR selection: ``dsir_select`` (refit + score everything) vs
  scoring the same fixed batch under a FROZEN 4096-row model
  (``dsir_score_topk`` — one broadcast join, strictly O(batch)).
- BM25 retrieval: ``bm25_search_topk`` (re-tokenize + rebuild) vs the
  segment-merge path — ``build_postings`` on the fixed batch, union
  with the persisted base segments, score from the merged index
  (term-filtered contributions; df/N/Σdl are doc-count-sized monoid
  aggregates).

The batch is the SAME rows at both scales (sf0.01's doc_id % 5 == 0
slice), so per-family growth of ``delta_batch_sec`` isolates the
standing-index dependence of the ingest path; ``from_scratch_sec`` is
the registered full-recompute row at that scale. Each timing is the
min of 2 cache-cleared passes after one untimed JIT pass (the sf1
probe's methodology). Output: one JSON line, merged into the round's
BENCH_FULL artifact as the ``scale100`` block.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _timeit(spark, fn, passes: int = 2):
    """One untimed pass (JIT/codegen), then min of ``passes``
    cache-cleared timed passes — bench's probe methodology."""
    from bench import _clear_spark_caches

    fn()
    best = None
    for _ in range(passes):
        _clear_spark_caches(spark)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _ensure_big_corpus(spark, path: str, n: int = 500_000) -> None:
    """A 500k-doc corpus (100x sf0.1) in the DRIVER's shape: same
    synthetic token model as bench._synth_documents but with the real
    testdata's src0..src19 source naming, so the DSIR family has a real
    target slice. Content-deterministic; built once."""
    if os.path.isdir(os.path.join(path, "documents.parquet")):
        return
    base = spark.range(n).withColumnRenamed("id", "doc_id")
    lang = F.when(F.pmod("doc_id", 20) < 17, F.lit("en")).otherwise(
        F.element_at(
            F.array(F.lit("de"), F.lit("fr"), F.lit("es")),
            (F.pmod("doc_id", 3) + 1).cast("int"),
        )
    )
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), (F.lit(60) + F.pmod("doc_id", 60)).cast("int")),
            lambda j: F.concat(F.lit("w"), F.pmod(F.hash(F.col("doc_id") * 131 + j), 8000)),
        ),
    )
    base.select(
        "doc_id",
        text.alias("text"),
        lang.alias("lang"),
        F.concat(F.lit("src"), F.pmod("doc_id", 20)).alias("source"),
        F.length(text).alias("n_chars"),
    ).coalesce(16).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default=".scratch/scale100/main")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from bench import get_spark
    from actyxos_data_flow_spark.operators import dedup as D
    from actyxos_data_flow_spark.operators import retrieval as R
    from actyxos_data_flow_spark.operators import text as X
    from actyxos_data_flow_spark.plans import load_all
    from actyxos_data_flow_spark.plans.dedup import BAND_SIZE, NUM_HASHES
    from actyxos_data_flow_spark.plans.retrieval import BM25_K, BM25_TERMS
    from actyxos_data_flow_spark.plans.text import DSIR_TARGET
    from actyxos_data_flow_spark.sources import load_table

    spark = get_spark("scale100-probe")
    registry = load_all()
    spark.range(1000).selectExpr("sum(id)").collect()
    _ensure_big_corpus(spark, args.big)

    # the FIXED ingest batch: identical rows at both scales
    batch = (
        load_table(spark, args.base, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .localCheckpoint()
    )
    n_batch = batch.count()

    out = {
        "note": (
            "fixed {}-doc batch ({} doc_id%5==0 slice) ingested against a "
            "1x vs 100x standing corpus; delta_batch_sec = the O(batch) ingest "
            "path against the persisted index (built untimed, as ingest "
            "amortizes it); from_scratch_sec = the registered full-recompute "
            "row at that scale; min of 2 cache-cleared passes after an untimed "
            "JIT pass, one fresh JVM".format(n_batch, args.base)
        ),
        "batch_docs": n_batch,
        "families": {},
    }

    tmp = tempfile.mkdtemp(prefix="scale100_")
    for label, d in (("1x", args.base), ("100x", args.big)):
        docs = load_table(spark, d, "documents")
        n_docs = docs.count()

        # ---- MinHash/LSH -------------------------------------------------
        sig_path = os.path.join(tmp, f"sigs_{label}")
        D.minhash_signatures(D.shingles(docs), num_hashes=NUM_HASHES).write.mode(
            "overwrite"
        ).parquet(sig_path)

        def mh_delta():
            idx = spark.read.parquet(sig_path)
            sig_new = D.minhash_signatures(D.shingles(batch), num_hashes=NUM_HASHES)
            cand = D.lsh_delta_pairs(
                idx, sig_new, num_hashes=NUM_HASHES, band_size=BAND_SIZE, max_bucket=100_000
            )
            all_sigs = idx.unionByName(sig_new)
            sa = all_sigs.select(
                F.col("doc_id").alias("id_a"),
                *[F.col(f"h{s}").alias(f"a{s}") for s in range(NUM_HASHES)],
            )
            sb = all_sigs.select(
                F.col("doc_id").alias("id_b"),
                *[F.col(f"h{s}").alias(f"b{s}") for s in range(NUM_HASHES)],
            )
            est = sum(
                (F.col(f"a{s}") == F.col(f"b{s}")).cast("int") for s in range(NUM_HASHES)
            ) / F.lit(float(NUM_HASHES))
            (
                F.broadcast(cand)
                .join(sa, "id_a")
                .join(sb, "id_b")
                .filter(est >= 0.5)
                .write.mode("overwrite")
                .format("noop")
                .save()
            )

        # ---- DSIR --------------------------------------------------------
        raw = docs.filter(F.col("source") != DSIR_TARGET)
        target = docs.filter(F.col("source") == DSIR_TARGET)
        bkt, kc = X.dsir_model(raw, target)
        bkt = bkt.localCheckpoint()  # the frozen model: 4096 rows

        def dsir_delta():
            X.dsir_score_topk(batch, bkt, kc).write.mode("overwrite").format(
                "noop"
            ).save()

        # ---- BM25 --------------------------------------------------------
        post_path = os.path.join(tmp, f"post_{label}")
        dl_path = os.path.join(tmp, f"dl_{label}")
        post_b, dl_b = R.build_postings(docs)
        post_b.write.mode("overwrite").parquet(post_path)
        dl_b.write.mode("overwrite").parquet(dl_path)

        def bm25_delta():
            post_new, dl_new = R.build_postings(batch)
            postings = spark.read.parquet(post_path).unionByName(post_new)
            doclen = spark.read.parquet(dl_path).unionByName(dl_new)
            R.bm25_from_index(postings, doclen, list(BM25_TERMS), k=BM25_K).write.mode(
                "overwrite"
            ).format("noop").save()

        fams = {
            "dedup_minhash": ("dedup_minhash_pairs", mh_delta),
            "dsir": ("dsir_select", dsir_delta),
            "bm25": ("bm25_search_topk", bm25_delta),
        }
        for fam, (scratch_row, delta_fn) in fams.items():
            rec = out["families"].setdefault(fam, {"from_scratch_row": scratch_row})
            rec[f"corpus_docs_{label}"] = n_docs
            rec[f"delta_batch_sec_{label}"] = _timeit(spark, delta_fn)
            rec[f"from_scratch_sec_{label}"] = _timeit(
                spark,
                lambda: registry[scratch_row]
                .fn(spark, d)
                .write.mode("overwrite")
                .format("noop")
                .save(),
            )

    for fam, rec in out["families"].items():
        if rec.get("delta_batch_sec_1x") and rec.get("from_scratch_sec_1x"):
            rec["delta_growth_100x"] = round(
                rec["delta_batch_sec_100x"] / rec["delta_batch_sec_1x"], 2
            )
            rec["from_scratch_growth_100x"] = round(
                rec["from_scratch_sec_100x"] / rec["from_scratch_sec_1x"], 2
            )

    line = json.dumps(out)
    if args.out:
        from artifacts import atomic_write

        atomic_write(args.out, line + "\n")
    print(line)


if __name__ == "__main__":
    main()
