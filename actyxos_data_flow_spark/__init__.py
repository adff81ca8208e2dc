"""actyxos_data_flow_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of Actyx/actyxos_data_flow.

The reference (/root/reference, Rust, differential-dataflow based) is an
incremental-view-maintenance pipeline: subscribe to an append-only event
log, run filter/map/group/join/reduce dataflow logic, and materialize the
continuously-updated result into a SQL database with exactly-once offsets.

This package re-expresses that surface Spark-first:

- ``flow.Flow`` / ``grouped.Grouped``   — the reference's fluent operator
  surface (src/flow.rs) as a paper-thin facade over DataFrame; the
  DataFrame IS the logical plan, Catalyst is the optimizer.
- ``delta``                             — signed-multiplicity (retraction)
  semantics: consolidation and snapshot-diff (src/coll.rs, src/flow.rs:129-146).
- ``sinks``                             — transactional SQL materialization
  with an offsets table committed in the same transaction (src/db/).
- ``streaming``                         — micro-batch (epoch) runner mirroring
  replay/catch-up/live (src/runner.rs).
- ``operators``                         — scale extensions: dedup (exact /
  minhash-LSH / simhash / jaccard), similarity search, text analysis,
  multimodal plumbing.
- ``plans``                             — the named query registry consumed by
  __spark_entry__ (queries + DuckDB oracle SQL).
"""

__version__ = "0.1.0"
