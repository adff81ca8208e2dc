"""Continuous corpus ingestion: the training-data pipeline's streaming
front door. Each micro-batch of raw documents is quality-gated,
deduplicated WITHIN the batch, deduplicated AGAINST everything already
ingested, and appended to a parquet corpus — so the corpus is
exact-dedup-clean at every commit point.

Scale shape per batch (the part that must stay O(batch), not O(corpus)):

- the quality gate and digest computation are per-row JVM expressions on
  the incoming batch only;
- cross-history dedup is an anti-join of the batch's digests against a
  digest INDEX (digest, doc_id) — a narrow two-column table, not the
  corpus payloads. The index side streams from parquet and the join
  shuffles only digests; at 100 TB, register the index as a bucketed
  table (``df.write.bucketBy(n, "digest").sortBy("digest")
  .saveAsTable(...)``) so the probe's shuffle disappears on the index
  side and only the batch exchanges;
- accepted rows append to the corpus in one write, their digests to the
  index in a second. Ordering (corpus first, index last) makes a crash
  between the two REPLAY-safe: a digest missing from the index lets a
  duplicate in on retry, a digest present without its row would drop
  data — so the index is committed only after its rows (same
  mirror-pointer reasoning as streaming/runner.IncrementalAggRunner).

Used either directly (``CorpusIngestor.ingest_batch`` per epoch) or as
the foreachBatch of a Structured Streaming file/Kafka source
(:func:`run_ingest_stream` — availableNow drain or live trigger).

Reference parity: this is the reference's ingest-dedupe-materialize
lifecycle (src/runner.rs replay/catch-up/live) instantiated for a
document corpus instead of a SQL mirror.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import text as X

DIGEST_SCHEMA = "digest string, doc_id long"


class CorpusIngestor:
    def __init__(
        self,
        spark: SparkSession,
        corpus_dir: str,
        quality_min: float = 0.5,
        id_col: str = "doc_id",
        text_col: str = "text",
        near_dup: bool = False,
        num_hashes: int = 8,
        band_size: int = 2,
        sim_threshold: float = 0.5,
    ) -> None:
        self.spark = spark
        self.docs_path = os.path.join(corpus_dir, "docs")
        self.index_path = os.path.join(corpus_dir, "digests")
        self.sigs_path = os.path.join(corpus_dir, "sigs")
        self.clusters_path = os.path.join(corpus_dir, "clusters")
        self.quality_min = quality_min
        self.id_col = id_col
        self.text_col = text_col
        self.near_dup = near_dup
        self.num_hashes = num_hashes
        self.band_size = band_size
        self.sim_threshold = sim_threshold

    def _read_or_empty(self, path: str, schema: str) -> DataFrame:
        """Empty frame ONLY for a genuinely absent/empty index. A
        corrupt or unreadable index must raise: silently treating it as
        empty would disable dedup for the batch and pollute the corpus
        with re-ingested duplicates."""
        if os.path.isdir(path):
            import glob

            if glob.glob(os.path.join(path, "*.parquet")) or glob.glob(
                os.path.join(path, "part-*")
            ):
                return self.spark.read.parquet(path)
        return self.spark.createDataFrame([], schema)

    def _index(self) -> DataFrame:
        return self._read_or_empty(self.index_path, DIGEST_SCHEMA)

    def _sig_schema(self) -> str:
        hs = ", ".join(f"h{s} long" for s in range(self.num_hashes))
        return f"{self.id_col} long, {hs}"

    def _sigs(self) -> DataFrame:
        return self._read_or_empty(self.sigs_path, self._sig_schema())

    # -- incremental cluster labels (near_dup mode) ---------------------
    #
    # The labels table (node, component) covers every doc that reached
    # the near-dup stage — including REJECTED near-dups, whose label is
    # their provenance ("this arrival belongs to cluster X"); exact-dup
    # arrivals never reach it (their cluster is their digest-twin's).
    # Merges can relabel HISTORIC nodes, so each batch commits a full
    # new labeling. Crash safety uses the mirror-pointer pattern
    # (sinks/writer.py): labels land in an epoch directory keyed by the
    # batch fingerprint, then a pointer file swaps atomically
    # (os.replace) — a crash mid-write leaves the pointer on the old,
    # complete epoch; a replayed batch maps to the same epoch directory
    # and overwrites it. At corpus scale this table is two longs per
    # ingested doc — doc-count-sized metadata, not corpus-sized data.

    def _clusters_current(self) -> str | None:
        try:
            with open(os.path.join(self.clusters_path, "_CURRENT")) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def clusters(self) -> DataFrame:
        """The committed (node, component) labeling."""
        epoch = self._clusters_current()
        if epoch is None:
            return self.spark.createDataFrame([], "node long, component long")
        return self.spark.read.parquet(os.path.join(self.clusters_path, epoch))

    def _commit_clusters(self, labels: DataFrame, epoch: str) -> None:
        target = os.path.join(self.clusters_path, epoch)
        labels.write.mode("overwrite").parquet(target)
        os.makedirs(self.clusters_path, exist_ok=True)
        tmp = os.path.join(self.clusters_path, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(epoch)
        os.replace(tmp, os.path.join(self.clusters_path, "_CURRENT"))
        # prune superseded epochs (best-effort; pointer already moved)
        import shutil

        for d in os.listdir(self.clusters_path):
            if d not in (epoch, "_CURRENT") and not d.startswith("_CURRENT"):
                shutil.rmtree(os.path.join(self.clusters_path, d), ignore_errors=True)

    def _maintain_clusters(self, batch_nodes: DataFrame, near_pairs: DataFrame) -> str:
        """Fold this batch's verified near-dup edges into the standing
        labeling (operators.dedup.connected_components_delta — prior
        labels enter as depth-1 star edges, so only delta chains need
        contracting). Batch docs with no partner enter as self-pairs and
        come out singletons. Returns the committed epoch key."""
        from ..operators.dedup import connected_components_delta

        ids = batch_nodes.select(F.col(self.id_col).cast("long").alias("_id"))
        fp = ids.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.min("_id"), F.lit(0)).alias("lo"),
            F.coalesce(F.max("_id"), F.lit(0)).alias("hi"),
            F.coalesce(F.sum("_id"), F.lit(0)).alias("s"),
        ).first()
        epoch = f"n{fp['n']}_lo{fp['lo']}_hi{fp['hi']}_s{fp['s']}"
        selfs = ids.select(F.col("_id").alias("id_a"), F.col("_id").alias("id_b"))
        edges = near_pairs.select("id_a", "id_b").unionByName(selfs)
        new_labels = connected_components_delta(self.clusters(), edges)
        # localCheckpoint: materialize BEFORE the write so the plan no
        # longer references the previous epoch's files (and CC's
        # iterative lineage is cut); checkpoint() on a real cluster
        self._commit_clusters(new_labels.localCheckpoint(), epoch)
        return epoch

    def _near_dup_gate(self, fresh: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
        """MinHash-LSH near-dup gate for one ingest batch: signatures of
        the batch band-probe the persisted signature INDEX plus the
        batch itself (the :func:`..dedup.lsh_delta_pairs` shape — the
        index side is never self-joined), and candidate similarity is
        the MinHash ESTIMATOR (fraction of agreeing signature
        components) — so history shingles are never stored; the index
        is (id, k longs), O(corpus docs), not O(corpus tokens).

        A batch doc drops if it near-matches history, or near-matches a
        smaller-id batch doc. Returns (accepted, accepted_sigs,
        near_pairs) — the verified pairs feed incremental cluster
        maintenance."""
        sig_new = D.minhash_signatures(
            D.shingles(fresh, self.id_col, self.text_col), self.id_col, self.num_hashes
        )
        pairs = D.lsh_delta_pairs(
            self._sigs(), sig_new, self.id_col, self.num_hashes, self.band_size
        )
        both = F.broadcast(pairs)
        all_sigs = self._sigs().unionByName(sig_new)
        sa = all_sigs.select(F.col(self.id_col).alias("id_a"), *[F.col(f"h{s}").alias(f"a{s}") for s in range(self.num_hashes)])
        sb = all_sigs.select(F.col(self.id_col).alias("id_b"), *[F.col(f"h{s}").alias(f"b{s}") for s in range(self.num_hashes)])
        est = sum(
            (F.col(f"a{s}") == F.col(f"b{s}")).cast("int") for s in range(self.num_hashes)
        ) / F.lit(float(self.num_hashes))
        near = (
            both.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b", est.alias("est"))
            .filter(F.col("est") >= self.sim_threshold)
        )
        directed = near.select(F.col("id_a").alias("x"), F.col("id_b").alias("p")).unionByName(
            near.select(F.col("id_b").alias("x"), F.col("id_a").alias("p"))
        )
        batch_ids = fresh.select(F.col(self.id_col).alias("x"))
        partner_in_batch = fresh.select(F.col(self.id_col).alias("p"), F.lit(1).alias("_pb"))
        drops = (
            directed.join(batch_ids, "x", "left_semi")
            .join(partner_in_batch, "p", "left")
            .filter(F.col("_pb").isNull() | (F.col("p") < F.col("x")))
            .select(F.col("x").alias(self.id_col))
            .distinct()
        )
        accepted = fresh.join(drops, self.id_col, "left_anti")
        return accepted, sig_new.join(drops, self.id_col, "left_anti"), near

    def ingest_batch(self, docs: DataFrame) -> dict:
        """Gate, dedup (intra-batch then vs history), append. Returns
        counts {'arrived', 'gated', 'accepted'} for observability."""
        arrived = docs.count()
        scored = X.quality_score(docs, self.id_col, self.text_col).select(
            self.id_col, "quality"
        )
        gated = docs.join(
            scored.filter(F.col("quality") >= self.quality_min), self.id_col
        )
        with_digest = gated.withColumn(
            "digest", F.md5(F.col(self.text_col).cast("binary"))
        )
        # intra-batch dedup: keep the whole smallest-id row per digest
        # (hash aggregate — no window sort)
        rec = F.struct(*[F.col(c) for c in with_digest.columns])
        in_batch = (
            with_digest.groupBy("digest")
            .agg(F.min_by(rec, F.col(self.id_col)).alias("_rec"))
            .select("_rec.*")
        )
        # cross-history dedup: anti-join on the digest index only
        fresh = in_batch.join(self._index(), "digest", "left_anti")
        sigs = None
        near = None
        pre_gate = None
        if self.near_dup:
            pre_gate = fresh.persist()  # nodes entering the near-dup stage
            fresh, sigs, near = self._near_dup_gate(pre_gate)
            sigs = sigs.persist()
            # pin the edge set AS OF the pre-append signature index:
            # `near` is a lazy plan over the sigs parquet, and cluster
            # maintenance runs AFTER this batch's sigs are appended —
            # without materializing, the re-evaluation would see the
            # batch's own signatures in the index (duplicate edges;
            # CC-idempotent, but nondeterministic plan inputs)
            near = near.localCheckpoint()
        # Write order = corpus → signatures → clusters → digest index.
        # The digest index is the ADMISSION GATE (the anti-join), so it
        # commits LAST: a crash anywhere earlier re-admits the batch on
        # replay (at-least-once duplicates, recoverable) — whereas
        # committing the digest before the sigs/clusters would gate the
        # docs out forever with their signatures permanently missing
        # from the near-dup index (silent recall loss, unrecoverable).
        # Cluster maintenance runs even when accepted == 0: a batch of
        # pure near-dup rejects still merges its arrivals' labels.
        out = fresh.persist()
        try:
            accepted = out.count()
            if accepted:
                out.drop("digest").write.mode("append").parquet(self.docs_path)
                if sigs is not None:
                    sigs.write.mode("append").parquet(self.sigs_path)
            if pre_gate is not None and pre_gate.limit(1).count():
                self._maintain_clusters(pre_gate, near)
            if accepted:
                out.select(
                    "digest", F.col(self.id_col).cast("long").alias("doc_id")
                ).write.mode("append").parquet(self.index_path)
        finally:
            out.unpersist()
            if sigs is not None:
                sigs.unpersist()
            if pre_gate is not None:
                pre_gate.unpersist()
        return {"arrived": arrived, "gated": gated.count(), "accepted": accepted}

    def corpus(self) -> DataFrame:
        return self.spark.read.parquet(self.docs_path)


def run_ingest_stream(
    spark: SparkSession,
    src_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string, lang string, source string",
    quality_min: float = 0.5,
    near_dup: bool = False,
) -> list[dict]:
    """Drive CorpusIngestor from a Structured Streaming file source
    (availableNow drain — the catch-up phase; swap the trigger for
    processingTime to run live). Each micro-batch commits through
    ingest_batch; per-batch stats are collected for assertion/metrics."""
    ing = CorpusIngestor(spark, corpus_dir, quality_min=quality_min, near_dup=near_dup)
    stats: list[dict] = []

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        stats.append(ing.ingest_batch(batch_df))

    q = (
        spark.readStream.schema(schema)
        .json(src_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats


def run_ingest_live(
    spark: SparkSession,
    src_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string, lang string, source string",
    quality_min: float = 0.5,
    tick: str = "1 second",
    on_batch=None,
    near_dup: bool = False,
):
    """Live ingest: same per-batch commit protocol as
    :func:`run_ingest_stream` but on a ``processingTime`` tick — files
    landing while the query runs are gated/deduped/appended within a
    tick (the corpus front door's steady state; the reference's live
    phase, src/runner.rs:322-355, for documents). Returns the running
    StreamingQuery — caller stops it. Restarting with the same
    checkpoint resumes; the digest index makes replays idempotent."""
    ing = CorpusIngestor(spark, corpus_dir, quality_min=quality_min, near_dup=near_dup)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        stats = ing.ingest_batch(batch_df)
        if on_batch is not None:
            on_batch(stats)

    return (
        spark.readStream.schema(schema)
        .json(src_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=tick)
        .start()
    )
