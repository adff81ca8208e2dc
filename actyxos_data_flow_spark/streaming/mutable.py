"""Mutable corpus ingestion: retract and upsert on top of the streaming
front door.

:class:`.ingest.CorpusIngestor` is append-only — the right default for
an event-sourced corpus, and the reference's own lifecycle (replay /
catch-up / live over an append-only log). Real training corpora also
receive RETRACTIONS (takedowns, license changes) and UPSERTS
(re-crawls). This module extends the gate with both, using the
engine's signed-delta semantics (retraction = the −1 side of the
reference's (record, ±mult) contract, src/flow.rs:129-146) and plain
parquet — no table format dependency.

Mechanics — one atomic visibility switch instead of three rewrites:

- every written row (corpus, digest index, signature index, near-dup
  edge) is stamped with a monotone batch sequence ``_seq``;
- a retraction appends ``(doc_id, upto_seq)`` tombstones; EVERY reader
  (corpus view, admission gate, near-dup index, edge set) filters
  ``_seq > max(upto_seq)`` per id. Because all readers consult the
  same tombstone table, one append retracts a document everywhere at
  once — there is no window where the corpus still shows a row whose
  digest has stopped gating duplicates;
- an upsert is retract-then-ingest: the new version re-enters through
  the full quality/exact/near-dup gate like any arrival (its digest
  row is invisible post-retraction, so identical re-adds are admitted
  deliberately, and changed content re-pairs against the index);
- cluster labels are re-derived for AFFECTED COMPONENTS ONLY: deleting
  a node can split its component (incremental union-find cannot
  un-merge), so the retract path recomputes CC on the surviving edges
  of the components that contained removed nodes — O(affected
  subgraphs), never the whole labeling — and keeps every other
  component's labels verbatim. Verified near-dup edges are persisted
  per batch (doc-count-sized metadata) precisely to make this
  possible.

Replay safety: tombstone appends are idempotent under max() semantics,
the cluster commit reuses the mirror-pointer epoch swap, and the
sequence pointer advances with os.replace — a replayed batch re-stamps
the same rows (duplicate rows in storage, invisible-or-identical to
readers; compaction reclaims them).

Storage note: retracted rows stay in parquet until compacted
(``sources.compact_write`` over the visible view). At 100 TB the
tombstone table is retraction-count-sized and broadcast-joins against
every reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import text as X
from .ingest import DIGEST_SCHEMA, CorpusIngestor, VectorIngestor, _cosine_ge, _directed_drops

TOMB_SCHEMA = "tomb_id long, upto_seq long"
EDGE_SCHEMA = "id_a long, id_b long, _seq long"


class _TombstoneStore:
    """Seq-pointer + tombstone machinery shared by the mutable document
    and vector gates. Requires ``self.tombs_path``, ``self.seq_path``
    and ``self._read_or_empty`` on the host class."""

    def _current_seq(self) -> int:
        try:
            with open(self.seq_path) as f:
                return int(f.read().strip() or 0)
        except FileNotFoundError:
            return 0

    def _advance_seq(self) -> int:
        nxt = self._current_seq() + 1
        os.makedirs(os.path.dirname(self.seq_path), exist_ok=True)
        tmp = self.seq_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, self.seq_path)
        return nxt

    def _tomb_max(self) -> DataFrame:
        t = self._read_or_empty(self.tombs_path, TOMB_SCHEMA)
        return t.groupBy("tomb_id").agg(F.max("upto_seq").alias("_upto"))

    def _visible(self, df: DataFrame, id_field: str) -> DataFrame:
        t = self._tomb_max().withColumnRenamed("tomb_id", id_field)
        return (
            df.join(t, id_field, "left")
            .filter(F.col("_seq") > F.coalesce(F.col("_upto"), F.lit(-1)))
            .drop("_upto")
        )

    def _append_tombstones(self, ids: DataFrame, id_field: str) -> int:
        """One atomic visibility switch: every reader consults this
        table, so a single append retracts the ids everywhere."""
        seq = self._current_seq()
        # localCheckpoint: the count below and the write after it must see
        # the SAME id set even when ``ids`` is a lazy plan over the very
        # stores this append hides rows from.
        t = (
            ids.select(F.col(id_field).cast("long").alias("tomb_id"))
            .distinct()
            .localCheckpoint()
        )
        n = t.count()
        if n:
            t.withColumn("upto_seq", F.lit(seq).cast("long")).write.mode("append").parquet(
                self.tombs_path
            )
        return n


class MutableCorpusIngestor(_TombstoneStore, CorpusIngestor):
    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        base = os.path.dirname(self.docs_path)
        self.tombs_path = os.path.join(base, "tombstones")
        self.edges_path = os.path.join(base, "edges")
        self.seq_path = os.path.join(base, "_SEQ")

    def _index(self) -> DataFrame:
        raw = self._read_or_empty(self.index_path, DIGEST_SCHEMA + ", _seq long")
        return self._visible(raw, "doc_id").select("digest", "doc_id")

    def _sigs(self) -> DataFrame:
        raw = self._read_or_empty(self.sigs_path, self._sig_schema() + ", _seq long")
        return self._visible(raw, self.id_col).drop("_seq")

    def _edges_visible(self) -> DataFrame:
        """Persisted near-dup edges whose BOTH endpoints are alive at
        the edge's seq (an endpoint retracted after the edge was drawn
        kills the edge; a later re-add does not resurrect it — the new
        version re-pairs on ingest)."""
        raw = self._read_or_empty(self.edges_path, EDGE_SCHEMA)
        va = self._visible(raw.withColumnRenamed("id_a", "doc_id"), "doc_id").withColumnRenamed(
            "doc_id", "id_a"
        )
        return self._visible(va.withColumnRenamed("id_b", "doc_id"), "doc_id").withColumnRenamed(
            "doc_id", "id_b"
        )

    def corpus(self) -> DataFrame:
        raw = self.spark.read.parquet(self.docs_path)
        return self._visible(raw, self.id_col).drop("_seq")

    # -- write hooks ---------------------------------------------------

    def _maintain_clusters(self, batch_nodes: DataFrame, near_pairs: DataFrame) -> str:
        near_pairs.select(
            "id_a", "id_b", F.lit(self._batch_seq).cast("long").alias("_seq")
        ).write.mode("append").parquet(self.edges_path)
        return super()._maintain_clusters(batch_nodes, near_pairs)

    def ingest_batch(self, docs: DataFrame) -> dict:
        """Base gate/dedup/append lifecycle with every written row
        stamped by this batch's sequence number (same commit order:
        corpus → sigs → clusters/edges → digest index)."""
        self._batch_seq = self._advance_seq()
        seq = F.lit(self._batch_seq).cast("long")
        scored = X.quality_score(docs, self.id_col, self.text_col).select(self.id_col, "quality_fp6")
        # one aggregate for both observability counts (quality_score is
        # a pure projection — one row per doc), same as the base gate
        _counts = scored.agg(
            F.count(F.lit(1)).alias("_arrived"),
            F.sum((F.col("quality_fp6") >= self.quality_min_fp6).cast("long")).alias("_gated"),
        ).first()
        arrived, n_gated = _counts["_arrived"], int(_counts["_gated"] or 0)
        gated = docs.join(scored.filter(F.col("quality_fp6") >= self.quality_min_fp6), self.id_col)
        with_digest = gated.withColumn("digest", F.md5(F.col(self.text_col).cast("binary")))
        rec = F.struct(*[F.col(c) for c in with_digest.columns])
        in_batch = (
            with_digest.groupBy("digest")
            .agg(F.min_by(rec, F.col(self.id_col)).alias("_rec"))
            .select("_rec.*")
        )
        fresh = in_batch.join(self._index(), "digest", "left_anti")
        sigs = None
        near = None
        pre_gate = None
        if self.near_dup:
            pre_gate = fresh.persist()
            # sigs/near come back checkpointed from the gate (see
            # ingest._near_dup_gate's materialization discipline)
            fresh, sigs, near = self._near_dup_gate(pre_gate)
        out = fresh.persist()
        try:
            accepted = out.count()
            if accepted:
                out.drop("digest").withColumn("_seq", seq).write.mode("append").parquet(
                    self.docs_path
                )
                if sigs is not None:
                    sigs.withColumn("_seq", seq).write.mode("append").parquet(self.sigs_path)
            if pre_gate is not None and pre_gate.limit(1).count():
                self._maintain_clusters(pre_gate, near)
            if accepted:
                out.select(
                    "digest", F.col(self.id_col).cast("long").alias("doc_id")
                ).withColumn("_seq", seq).write.mode("append").parquet(self.index_path)
        finally:
            out.unpersist()
            if pre_gate is not None:
                pre_gate.unpersist()
        return {"arrived": arrived, "gated": n_gated, "accepted": accepted}

    # -- retract / upsert ----------------------------------------------

    def retract_batch(self, removed_ids: DataFrame) -> dict:
        """Retract documents by id: one tombstone append switches them
        off for every reader (corpus view, admission gate, signature
        index, edge set), then cluster labels are recomputed for the
        affected components only. Idempotent on replay."""
        # Pin the id set BEFORE the tombstone append: callers (upsert_batch)
        # pass plans derived from the stores this method MUTATES — e.g.
        # ``existing`` reads the digest index through the tombstone filter,
        # so once the tombstones land, re-evaluating the lazy plan yields a
        # different (empty) id set and the relabel silently drops labels.
        ids = (
            removed_ids.select(F.col(self.id_col).cast("long").alias("doc_id"))
            .distinct()
            .localCheckpoint()
        )
        n = self._append_tombstones(ids, "doc_id")
        if n == 0:
            return {"retracted": 0, "relabeled_components": 0}
        relabeled = self._relabel_after_retract(ids)
        return {"retracted": n, "relabeled_components": relabeled}

    def _relabel_after_retract(self, removed: DataFrame) -> int:
        """Deleting nodes can SPLIT a component — un-mergeable
        incrementally — so recompute CC on the surviving edges of the
        components that contained removed nodes; every other
        component's labels are kept verbatim."""
        labels = self.clusters()
        if labels.limit(1).count() == 0:
            return 0
        rm = removed.select(F.col("doc_id").alias("node"))
        hit = labels.join(rm, "node", "left_semi").select("component").distinct()
        n_hit = hit.count()
        if n_hit == 0:
            return 0
        keep = labels.join(hit, "component", "left_anti")
        sub_nodes = (
            labels.join(F.broadcast(hit), "component", "left_semi")
            .join(rm, "node", "left_anti")
            .select("node")
        )
        edges = self._edges_visible().select("id_a", "id_b")
        sub_edges = (
            edges.join(sub_nodes.withColumnRenamed("node", "id_a"), "id_a", "left_semi")
            .join(sub_nodes.withColumnRenamed("node", "id_b"), "id_b", "left_semi")
        )
        selfs = sub_nodes.select(F.col("node").alias("id_a"), F.col("node").alias("id_b"))
        relab = D.connected_components(sub_edges.unionByName(selfs).distinct())
        new_labels = keep.unionByName(relab.select("node", "component"))
        fp = removed.agg(
            F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("doc_id"), F.lit(0)).alias("s")
        ).first()
        epoch = f"retract_s{self._current_seq()}_n{fp['n']}_x{fp['s']}"
        self._commit_clusters(new_labels.localCheckpoint(), epoch)
        return n_hit

    def compact(self) -> None:
        """Reclaim retracted rows: rewrite every store to its visible
        rows (keeping the _seq stamps) and clear the tombstones. Safe
        to crash at any point — see :func:`_compact_store`."""
        raw_docs = self.spark.read.parquet(self.docs_path)
        docs_v = self._visible(raw_docs, self.id_col)
        sigs_v = self._visible(
            self._read_or_empty(self.sigs_path, self._sig_schema() + ", _seq long"),
            self.id_col,
        )
        idx_v = self._visible(
            self._read_or_empty(self.index_path, DIGEST_SCHEMA + ", _seq long"), "doc_id"
        )
        edges_v = self._edges_visible().select("id_a", "id_b", "_seq")
        _compact_store(
            self.spark,
            [
                (self.docs_path, docs_v),
                (self.sigs_path, sigs_v),
                (self.index_path, idx_v),
                (self.edges_path, edges_v),
            ],
            self.tombs_path,
        )

    def upsert_batch(self, docs: DataFrame) -> dict:
        """Retract the ids that already exist (visible anywhere in the
        gate), then ingest the batch through the full front door — the
        new versions re-gate, re-dedup, and re-pair like any arrival."""
        existing = (
            docs.select(F.col(self.id_col).cast("long").alias("doc_id"))
            .join(
                self._index().select("doc_id").distinct(),
                "doc_id",
                "left_semi",
            )
        )
        r = self.retract_batch(existing)
        stats = self.ingest_batch(docs)
        stats["retracted"] = r["retracted"]
        return stats


class MutableVectorIngestor(_TombstoneStore, VectorIngestor):
    """Retract/upsert for the embedding gate — the vector twin of
    :class:`MutableCorpusIngestor` (no cluster state to maintain, so a
    retraction is purely the tombstone switch: the vector leaves the
    store view, its value digest stops gating exact dups, and its
    signature rows stop producing band candidates, all at once).
    Upsert = retract-then-ingest: a re-embedded vector re-pairs against
    the index through the normal near-dup gate."""

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        base = os.path.dirname(self.vectors_path)
        self.tombs_path = os.path.join(base, "tombstones")
        self.seq_path = os.path.join(base, "_SEQ")

    def _hsigs(self) -> DataFrame:
        raw = self._read_or_empty(self.hsigs_path, f"{self.id_col} long, hsig string, _seq long")
        return self._visible(raw, self.id_col).drop("_seq")

    def _digests(self) -> DataFrame:
        raw = self._read_or_empty(self.index_path, f"digest string, {self.id_col} long, _seq long")
        return self._visible(raw, self.id_col).drop("_seq")

    def vectors(self) -> DataFrame:
        raw = self.spark.read.parquet(self.vectors_path)
        return self._visible(raw, self.id_col).drop("_seq")

    def ingest_batch(self, vecs: DataFrame) -> dict:
        from ..operators import similarity as S

        seq = F.lit(self._advance_seq()).cast("long")
        arrived = vecs.count()
        digest = F.md5(
            F.concat_ws(",", F.transform(F.col(self.vec_col), lambda x: x.cast("string")))
        )
        with_digest = vecs.withColumn("digest", digest)
        rec = F.struct(*[F.col(c) for c in with_digest.columns])
        in_batch = (
            with_digest.groupBy("digest")
            .agg(F.min_by(rec, F.col(self.id_col)).alias("_rec"))
            .select("_rec.*")
        )
        fresh = in_batch.join(self._digests(), "digest", "left_anti").persist()
        try:
            # signatures and verified pairs each materialize ONCE (same
            # discipline as the document gate — see ingest._near_dup_gate)
            sig_new = S.hyperplane_signature(
                fresh, self.dim, self.vec_col, self.id_col, planes=self.planes
            ).localCheckpoint()
            cand = S.hyperplane_delta_pairs(
                self._hsigs(), sig_new, self.id_col, self.planes, self.n_bands
            )
            all_vecs = self.history_vectors().unionByName(
                fresh.select(self.id_col, self.vec_col)
            )
            va = all_vecs.select(F.col(self.id_col).alias("id_a"), F.col(self.vec_col).alias("_ea"))
            vb = all_vecs.select(F.col(self.id_col).alias("id_b"), F.col(self.vec_col).alias("_eb"))
            near = (
                F.broadcast(cand)
                .join(va, "id_a")
                .join(vb, "id_b")
                .filter(_cosine_ge(F.col("_ea"), F.col("_eb"), self.cosine_threshold))
                .select("id_a", "id_b")
                .localCheckpoint()
            )
            drops = _directed_drops(near, fresh.select(self.id_col), self.id_col)
            accepted_df = fresh.join(drops, self.id_col, "left_anti").persist()
            accepted = accepted_df.count()
            if accepted:
                accepted_df.drop("digest").withColumn("_seq", seq).write.mode("append").parquet(
                    self.vectors_path
                )
                sig_new.join(drops, self.id_col, "left_anti").withColumn(
                    "_seq", seq
                ).write.mode("append").parquet(self.hsigs_path)
                accepted_df.select(
                    "digest", F.col(self.id_col).cast("long").alias(self.id_col)
                ).withColumn("_seq", seq).write.mode("append").parquet(self.index_path)
            accepted_df.unpersist()
        finally:
            fresh.unpersist()
        return {"arrived": arrived, "accepted": accepted}

    def history_vectors(self) -> DataFrame:
        """Visible (id, vector) history for the verify join."""
        raw = self._read_or_empty(
            self.vectors_path, f"{self.id_col} long, {self.vec_col} array<double>, _seq long"
        )
        return self._visible(raw, self.id_col).select(self.id_col, self.vec_col)

    def retract_batch(self, removed_ids: DataFrame) -> dict:
        return {"retracted": self._append_tombstones(removed_ids, self.id_col)}

    def compact(self) -> None:
        """Reclaim retracted vectors: rewrite the three stores to their
        visible rows, clear tombstones last (see :func:`_compact_store`)."""
        vec_raw = self.spark.read.parquet(self.vectors_path)
        _compact_store(
            self.spark,
            [
                (self.vectors_path, self._visible(vec_raw, self.id_col)),
                (
                    self.hsigs_path,
                    self._visible(
                        self._read_or_empty(
                            self.hsigs_path, f"{self.id_col} long, hsig string, _seq long"
                        ),
                        self.id_col,
                    ),
                ),
                (
                    self.index_path,
                    self._visible(
                        self._read_or_empty(
                            self.index_path,
                            f"digest string, {self.id_col} long, _seq long",
                        ),
                        self.id_col,
                    ),
                ),
            ],
            self.tombs_path,
        )

    def upsert_batch(self, vecs: DataFrame) -> dict:
        existing = vecs.select(F.col(self.id_col).cast("long").alias(self.id_col)).join(
            self._digests().select(self.id_col).distinct(), self.id_col, "left_semi"
        )
        r = self.retract_batch(existing)
        stats = self.ingest_batch(vecs)
        stats["retracted"] = r["retracted"]
        return stats


def _compact_store(spark, paths_and_views: list[tuple[str, DataFrame]], tombs_path: str) -> None:
    """Rewrite each store to its visible rows, then clear tombstones.

    Crash-safe ORDER, not atomicity: every intermediate state reads
    identically. A store that is already compacted has no dead rows, so
    the (still present) tombstones filter nothing from it; stores not
    yet rewritten still carry dead rows, which the tombstones still
    hide. Tombstones are cleared LAST — a crash anywhere earlier
    leaves a state that is merely un-reclaimed, never wrong. Each
    store's own swap is made effectively atomic by materializing the
    visible view (localCheckpoint — the read plan must not reference
    the files being replaced), writing a sibling directory, and
    os.replace'ing it over the live name."""
    import shutil

    for path, view in paths_and_views:
        if not os.path.isdir(path):
            continue
        snap = view.localCheckpoint()
        tmp = path + ".compact"
        snap.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path)
        os.replace(tmp, path)
    if os.path.isdir(tombs_path):
        shutil.rmtree(tombs_path)


def run_cdc_ingest_stream(
    spark,
    src_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string, lang string, source string, op string",
    quality_min_fp6: int = 500_000,
    near_dup: bool = False,
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> list[dict]:
    """Change-data-capture front door: a Structured Streaming file
    source whose rows carry an ``op`` column — ``'u'`` (upsert: insert
    or replace by id) or ``'d'`` (delete). Each micro-batch applies
    deletes first, then upserts, through :class:`MutableCorpusIngestor`
    — so a batch carrying both a delete and a re-add of the same id
    lands in the re-added state, and replays are idempotent (tombstone
    max() + digest gate). Per-batch stats are returned for assertions/
    metrics; swap the trigger for processingTime to run live.
    ``max_files_per_trigger=1`` makes each dropped file its own
    micro-batch in arrival (mtime) order — availableNow honors it, so a
    scripted file sequence replays as the scripted batch sequence."""
    ing = MutableCorpusIngestor(spark, corpus_dir, quality_min_fp6=quality_min_fp6, near_dup=near_dup)
    stats: list[dict] = []

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            dels = batch_df.filter(F.col("op") == "d").select(ing.id_col)
            ups = batch_df.filter(F.col("op") == "u").drop("op")
            out = {"batch": batch_id}
            out.update({f"del_{k}": v for k, v in ing.retract_batch(dels).items()})
            if ups.limit(1).count():
                out.update(ing.upsert_batch(ups))
            stats.append(out)
        finally:
            batch_df.unpersist()

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    writer = (
        reader.json(src_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return stats
    return writer.trigger(processingTime="1 second").start()


def run_cdc_vector_stream(
    spark,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    dim: int,
    schema: str = "vec_id long, embedding array<double>, op string",
    cosine_threshold: float = 0.98,
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> list[dict]:
    """CDC front door for the vector store — the embedding twin of
    :func:`run_cdc_ingest_stream`: rows carry op = 'u' (upsert) or 'd'
    (delete); deletes apply first, then upserts re-embed through the
    near-dup gate. Replay-idempotent for the same reasons;
    ``max_files_per_trigger=1`` replays a scripted file sequence as the
    scripted batch sequence."""
    ing = MutableVectorIngestor(spark, store_dir, dim=dim, cosine_threshold=cosine_threshold)
    stats: list[dict] = []

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            dels = batch_df.filter(F.col("op") == "d").select(ing.id_col)
            ups = batch_df.filter(F.col("op") == "u").drop("op")
            out = {"batch": batch_id}
            out.update({f"del_{k}": v for k, v in ing.retract_batch(dels).items()})
            if ups.limit(1).count():
                out.update(ing.upsert_batch(ups))
            stats.append(out)
        finally:
            batch_df.unpersist()

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    writer = (
        reader.json(src_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return stats
    return writer.trigger(processingTime="1 second").start()
