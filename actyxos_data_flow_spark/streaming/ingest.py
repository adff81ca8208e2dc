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
  shuffles only digests; at 100 TB the index is bucketed by digest so
  the probe co-locates (see sinks/bucketed.py for the writer);
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

    def _near_dup_gate(self, fresh: DataFrame) -> tuple[DataFrame, DataFrame]:
        """MinHash-LSH near-dup gate for one ingest batch: signatures of
        the batch band-probe the persisted signature INDEX plus the
        batch itself (the :func:`..dedup.lsh_delta_pairs` shape — the
        index side is never self-joined), and candidate similarity is
        the MinHash ESTIMATOR (fraction of agreeing signature
        components) — so history shingles are never stored; the index
        is (id, k longs), O(corpus docs), not O(corpus tokens).

        A batch doc drops if it near-matches history, or near-matches a
        smaller-id batch doc. Returns (accepted, accepted_sigs)."""
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
        return accepted, sig_new.join(drops, self.id_col, "left_anti")

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
        if self.near_dup:
            fresh, sigs = self._near_dup_gate(fresh)
            sigs = sigs.persist()
        # Write order = corpus → signatures → digest index. The digest
        # index is the ADMISSION GATE (the anti-join), so it commits
        # LAST: a crash anywhere earlier re-admits the batch on replay
        # (at-least-once duplicates, recoverable) — whereas committing
        # the digest before the sigs would gate the docs out forever
        # with their signatures permanently missing from the near-dup
        # index (silent recall loss, unrecoverable).
        out = fresh.persist()
        try:
            accepted = out.count()
            if accepted:
                out.drop("digest").write.mode("append").parquet(self.docs_path)
                if sigs is not None:
                    sigs.write.mode("append").parquet(self.sigs_path)
                out.select(
                    "digest", F.col(self.id_col).cast("long").alias("doc_id")
                ).write.mode("append").parquet(self.index_path)
        finally:
            out.unpersist()
            if sigs is not None:
                sigs.unpersist()
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
