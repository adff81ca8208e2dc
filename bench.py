"""Benchmark harness: runs the headline queries (registry entries with
bench=True) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "sf1": {...}}

Each query executes to a noop sink (full plan runs, no driver
materialization cost). One JVM, queries timed after a small session
warm-up so per-query numbers reflect plan execution, not JVM start.

The ``sf1`` section is the SCALE PROBE: the most expensive headline
queries re-run once against a 10× corpus (synthetic, deterministic,
cached under .scratch/sf1bench — the driver testdata tops out at
sf0.1), plus a deliberately lang-skewed documents variant at 1× and
10× so the packing/minhash shapes can be checked for linearity
(sequence packing must not degrade when one shard dominates). Texts
are freshly synthesized rather than replicated — replicating would
manufacture quadratic near-dup clusters and fake a blowup. Disable
with --no-sf1 or SPARK_GRAFT_SF1=0; --passes N overrides the
min-of-3 headline timing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from actyxos_data_flow_spark.plans import load_all
from actyxos_data_flow_spark.session import get_spark

SCRATCH = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scratch", "sf1bench")

# the round-3 plan-audit top-5 plus one relational representative
SF1_QUERIES = (
    "pipeline_training_batches",
    "pipeline_clean_corpus",
    "kmeans_cells",
    "ann_hyperplane_topk",
    "dedup_minhash_pairs",
    "q1_pricing_summary",
    "dedup_span_mask",
    "decontaminate_bloom",
    "pipeline_bpe_batches",
    # late round-4 families: index build + BM25 at 10x docs, PQ fit +
    # ADC at 10x vectors, PageRank at 10x edges
    "bm25_search_topk",
    "ann_pq_topk",
    "graph_pagerank_trade",
    # sketch + motif families: the HLL build must stay linear (model-
    # sized shuffle) and the degree-ordered triangle census must hold
    # its O(sqrt m) wedge bound at 10x edges
    "sketch_hll_cardinality",
    "graph_triangles_supplier",
    # iterative-CC tail: label-prop/star contraction and the delta fold
    # are the rounds-based families where superlinear blowups would hide
    "dedup_clusters_star",
    "dedup_clusters_delta",
    # late round-5: the prefix-filter similarity join — its claim is
    # that prefixes shrink the inverted-index self-join enough to stay
    # near-linear at 10x docs (rare-first ordering keeps bucket sizes
    # at the corpus minimum)
    "dedup_prefix_filter_pairs",
    # round-7 (round-6 judge directive #2): the last heavy flagship
    # without a composed probe — clean -> schedule -> chunk -> per-epoch
    # bins in ONE plan at 10x docs
    "pipeline_mix_batches",
    # behavior family at 10x users (events replicated with shifted
    # user_id, per-user histories constant): the conditional
    # min-aggregate cascade and the cohort min-aggregate must scale
    # with users, not histories
    "funnel_conversion",
    "cohort_retention",
    # bounded iterative graph rows: first scale evidence for the
    # round-6 frontier-delta Bellman-Ford relax join and the BFS
    # frontier/anti-join skeleton (+ their convergence early-exits)
    "graph_shortest_paths",
    "graph_bfs_reach",
    # the src-bucketed edge-mirror variants: same values as their plain
    # rows, zero edge-side Exchange — the probes price the layout's
    # payoff at 10x edges (mirror write lands in pass 1; min-of-2 reads
    # the amortized number, like every bucketed row)
    "graph_pagerank_bucketed",
    "graph_bfs_bucketed",
    "graph_shortest_paths_bucketed",
    # round-7 incremental/composed rows: the delta probes must stay
    # BATCH-shaped at 10x (an ingest batch's cost scales with the
    # batch + index lookups, not the corpus), the composed IVF-PQ scan
    # must track its nprobe/nlist x m/(4 dim) byte fraction, and the
    # Selinger row prices three 2KB sketch builds over 10x keys
    "dedup_prefix_delta_pairs",
    "bm25_index_delta_topk",
    "ann_ivfpq_topk",
    "join_selinger_applied",
    # round-8: first scale evidence for the streaming ingest family —
    # the replay's per-batch cost must scale with batch volume (gate +
    # digest + near-dup probe against the standing index), not with
    # history; and the bitmask-DP Selinger row prices FOUR sketch
    # builds + an 11-cell DP over 10x keys
    "mutable_corpus_replay",
    "join_selinger_dp",
    # round-9 second wave: DSIR scans the corpus twice and broadcasts a
    # 4096-row model — must stay linear; the two sampling synopses are
    # scan + k-row tournament top-k (sublinear tails); the layout
    # compare's file cuts run on the bounded distinct-key table, so the
    # probe prices the three keyed scans, not a sort
    "dsir_select",
    "sketch_priority_sample",
    "sketch_kmv_setops",
    "layout_prune_compare",
)
SKEW_QUERIES = ("pack_training_bins", "dedup_minhash_pairs", "mix_epoch_schedule")
# viral-ITEM rater skew (one item rated by ~every user at 1x and at 10x
# users): the agreement matrix's max_bucket rater cap must keep the
# item self-join O(cap^2) per item — growth @skew10x vs @skew1x should
# track the linear latest-verdict aggregate, never raters^2
SKEW_EV_QUERIES = ("pref_agreement_matrix", "pref_agreement_kappa")
# hub-skewed co-occurrence (one supplier on ~30% of lineitems): the
# degree-ordered orientation must keep the census near-linear when one
# node's raw degree explodes
SKEW_LI_QUERIES = ("graph_triangles_supplier", "graph_pagerank_trade")


def _synth_documents(spark, n: int, skew: bool):
    """Deterministic synthetic corpus: 60–120 pseudo-random tokens from
    an 8k vocab per doc (hash-derived, no RNG state). ``skew=True``
    forces ~95% of docs into one lang shard — the packing stress
    shape."""
    from pyspark.sql import functions as F

    base = spark.range(n).withColumnRenamed("id", "doc_id")
    if skew:
        lang = F.when(F.pmod("doc_id", 20) < 19, F.lit("en")).otherwise(
            F.element_at(F.array(F.lit("de"), F.lit("fr")), (F.pmod("doc_id", 2) + 1).cast("int"))
        )
    else:
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
            lambda j: F.concat(
                F.lit("w"), F.pmod(F.hash(F.col("doc_id") * 131 + j), 8000)
            ),
        ),
    )
    if skew:
        # hot DOMAIN too (95% one source): the mixing-schedule probe
        # must show the two-level prefix sum holds when one domain
        # dominates (a plain per-domain window would serialize it)
        source = F.when(F.pmod("doc_id", 20) < 19, F.lit("s0")).otherwise(
            F.concat(F.lit("s"), (F.pmod("doc_id", 6) + 1).cast("int"))
        )
    else:
        source = F.concat(F.lit("s"), F.pmod("doc_id", 7))
    return base.select(
        "doc_id",
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
        F.length(text).alias("n_chars"),
    )


def ensure_sf1_data(spark, base_dir: str) -> None:
    """Build (once; content-deterministic, cached) the 10× probe data:
    main/ = synthetic 10× documents + 10 shifted replicas of the sf0.1
    embeddings and lineitem; skew01/ and skew1/ = lang-skewed documents
    at 1× and 10×."""
    from pyspark.sql import functions as F

    marker = os.path.join(SCRATCH, "_DONE_v12")  # bump to regenerate (v10: events.ts as TIMESTAMP micros — the driver testdata's physical form — so event-time oracles typed for TIMESTAMP run against the probe; v11: region verbatim so the region-joining tpch shapes probe at 10x; v12: viral-item events in skew01/skew1 for the agreement rater-cap probe)
    if os.path.exists(marker):
        return
    main, s01, s1 = (os.path.join(SCRATCH, d) for d in ("main", "skew01", "skew1"))
    _synth_documents(spark, 50_000, skew=False).coalesce(8).write.mode(
        "overwrite"
    ).parquet(os.path.join(main, "documents.parquet"))
    _synth_documents(spark, 5_000, skew=True).coalesce(2).write.mode(
        "overwrite"
    ).parquet(os.path.join(s01, "documents.parquet"))
    _synth_documents(spark, 50_000, skew=True).coalesce(8).write.mode(
        "overwrite"
    ).parquet(os.path.join(s1, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    reps = spark.range(10).withColumnRenamed("id", "_rep")
    emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("_rep") * 10_000_000).alias("vec_id"),
        "embedding",
        "label",
    ).coalesce(8).write.mode("overwrite").parquet(os.path.join(main, "embeddings.parquet"))

    # suppkeys shift in lockstep too: a TRUE 10x graph has 10x supplier
    # nodes at constant density. Leaving suppkeys unshifted would
    # DENSIFY the co-occurrence graph instead (same 1k nodes, 10x
    # edges — wedge growth ~m^1.5 makes the triangle probe read as
    # super-linear when the operator is actually scaling fine)
    li = spark.read.parquet(os.path.join(base_dir, "lineitem.parquet"))
    li.crossJoin(reps).select(
        (F.col("l_orderkey") + F.col("_rep") * 100_000_000).alias("l_orderkey"),
        (F.col("l_suppkey") + F.col("_rep") * 10_000_000).alias("l_suppkey"),
        *[c for c in li.columns if c not in ("l_orderkey", "l_suppkey")],
    ).write.mode("overwrite").parquet(os.path.join(main, "lineitem.parquet"))
    # orders, shifted in lockstep with lineitem's orderkey so the
    # pagerank trade graph (orders ⋈ lineitem) still joins; custkeys
    # shift too so the 10x graph has 10x customer nodes
    orders = spark.read.parquet(os.path.join(base_dir, "orders.parquet"))
    orders.crossJoin(reps).select(
        (F.col("o_orderkey") + F.col("_rep") * 100_000_000).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("_rep") * 10_000_000).alias("o_custkey"),
        *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
    ).coalesce(8).write.mode("overwrite").parquet(os.path.join(main, "orders.parquet"))
    # hub-skewed lineitem for the triangle-census probe: ~30% of items
    # re-point at supplier 1, so one node's raw co-occurrence degree is
    # corpus-sized at both 1x (skew01) and 10x (skew1)
    hub = F.when(F.pmod("l_orderkey", 10) < 3, F.lit(1)).otherwise(F.col("l_suppkey"))
    li.select(
        "l_orderkey", hub.cast(li.schema["l_suppkey"].dataType).alias("l_suppkey"),
        *[c for c in li.columns if c not in ("l_orderkey", "l_suppkey")],
    ).coalesce(4).write.mode("overwrite").parquet(os.path.join(s01, "lineitem.parquet"))
    li.crossJoin(reps).select(
        (F.col("l_orderkey") + F.col("_rep") * 100_000_000).alias("l_orderkey"),
        F.when(F.pmod("l_orderkey", 10) < 3, F.lit(1))
        .otherwise(F.col("l_suppkey") + F.col("_rep") * 10_000_000)
        .cast(li.schema["l_suppkey"].dataType)
        .alias("l_suppkey"),
        *[c for c in li.columns if c not in ("l_orderkey", "l_suppkey")],
    ).write.mode("overwrite").parquet(os.path.join(s1, "lineitem.parquet"))
    # orders for the skew dirs, so the hub-supplier probe can build the
    # customer->supplier trade graph (orders join lineitem): skew01 =
    # the base orders verbatim; skew1 = the same 10x shifted replicas
    # as main (keys line up with skew1's shifted lineitem)
    orders.coalesce(2).write.mode("overwrite").parquet(
        os.path.join(s01, "orders.parquet")
    )
    spark.read.parquet(os.path.join(main, "orders.parquet")).coalesce(8).write.mode(
        "overwrite"
    ).parquet(os.path.join(s1, "orders.parquet"))
    # customer shifted in lockstep with orders' custkeys: the BFS probe
    # seeds from nation-0 customers, so a TRUE 10x graph has 10x seeds
    # reaching 10x disjoint components (constant density per replica)
    cust = spark.read.parquet(os.path.join(base_dir, "customer.parquet"))
    cust.crossJoin(reps).select(
        (F.col("c_custkey") + F.col("_rep") * 10_000_000).alias("c_custkey"),
        *[c for c in cust.columns if c != "c_custkey"],
    ).coalesce(4).write.mode("overwrite").parquet(os.path.join(main, "customer.parquet"))
    # part verbatim (lineitem replicas keep their partkeys, so a TRUE
    # 10x fact has 10x rows per part); supplier shifted in lockstep
    # with lineitem's suppkeys (10x supplier nodes at constant density)
    spark.read.parquet(os.path.join(base_dir, "part.parquet")).coalesce(2).write.mode(
        "overwrite"
    ).parquet(os.path.join(main, "part.parquet"))
    # nation + region verbatim (25/5 rows; the DP probe joins nation
    # through supplier — shifted suppkeys keep their original
    # s_nationkey, so density per nation grows 10x exactly like the
    # fact; region completes the dim closure for q5/q8/q2-shaped
    # probes)
    spark.read.parquet(os.path.join(base_dir, "nation.parquet")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(main, "nation.parquet"))
    spark.read.parquet(os.path.join(base_dir, "region.parquet")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(main, "region.parquet"))
    supp = spark.read.parquet(os.path.join(base_dir, "supplier.parquet"))
    supp.crossJoin(reps).select(
        (F.col("s_suppkey") + F.col("_rep") * 10_000_000).alias("s_suppkey"),
        *[c for c in supp.columns if c != "s_suppkey"],
    ).coalesce(2).write.mode("overwrite").parquet(os.path.join(main, "supplier.parquet"))
    # events at 10x USERS (shifted user_id/event_id, per-user histories
    # verbatim): the funnel/cohort cascades key on user_id, so the
    # honest linear scale-up multiplies users, not history depth.
    # load_table normalizes ts to LONG nanos; the probe file writes it
    # BACK as TIMESTAMP micros — the driver testdata's physical form —
    # so oracle texts typed for TIMESTAMP (event-time streaming
    # replays: date_trunc, ± INTERVAL) run against the probe unchanged
    # and the Spark-side reader re-normalizes on load as usual.
    from actyxos_data_flow_spark.sources import load_table as _lt

    ev = _lt(spark, base_dir, "events")
    ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("_rep") * 100_000_000).alias("event_id"),
        (F.col("user_id") + F.col("_rep") * 10_000_000).alias("user_id"),
        *[
            F.expr("timestamp_micros(ts DIV 1000)").alias("ts") if c == "ts" else F.col(c)
            for c in ev.columns
            if c not in ("event_id", "user_id")
        ],
    ).coalesce(8).write.mode("overwrite").parquet(os.path.join(main, "events.parquet"))
    # viral-ITEM events for the agreement-matrix rater-cap probe: ~30%
    # of events re-point props.k at item 1, so one item's rater set is
    # ~the whole user population at BOTH skew levels (skew01 = base
    # users, skew1 = 10x users). Without the max_bucket rater cap the
    # pair join would grow ~(10x)^2 = 100x between the two; with it the
    # viral item is a constant cap^2 term and growth tracks the linear
    # latest-verdict aggregate. ts written back as TIMESTAMP micros —
    # same physical form as main/ (see the events comment above).
    hot_props = F.when(
        F.pmod("event_id", 10) < 3, F.to_json(F.struct(F.lit(1).alias("k")))
    ).otherwise(F.col("props"))
    ev.select(
        "event_id",
        "user_id",
        *[
            F.expr("timestamp_micros(ts DIV 1000)").alias("ts") if c == "ts"
            else hot_props.alias("props") if c == "props"
            else F.col(c)
            for c in ev.columns
            if c not in ("event_id", "user_id")
        ],
    ).coalesce(2).write.mode("overwrite").parquet(os.path.join(s01, "events.parquet"))
    ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("_rep") * 100_000_000).alias("event_id"),
        (F.col("user_id") + F.col("_rep") * 10_000_000).alias("user_id"),
        *[
            F.expr("timestamp_micros(ts DIV 1000)").alias("ts") if c == "ts"
            else hot_props.alias("props") if c == "props"
            else F.col(c)
            for c in ev.columns
            if c not in ("event_id", "user_id")
        ],
    ).coalesce(8).write.mode("overwrite").parquet(os.path.join(s1, "events.parquet"))
    with open(marker, "w") as f:
        f.write("ok")


def _timed(registry, spark, name: str, sf_dir: str, times: dict, errors: dict, key=None):
    key = key or name
    t0 = time.perf_counter()
    try:
        df = registry[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
    except Exception as ex:  # noqa: BLE001 — one row, not the round
        errors[key] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
        return
    times[key] = round(time.perf_counter() - t0, 3)


def _clear_spark_caches(spark) -> None:
    """Drop every Spark-level reuse channel between cold timings: the
    CacheManager's persisted plans and the module-level checkpoint memos
    (plans/pipeline._CLEAN_IDS, plans/graph._STRONG_TIES). OS page cache
    and JIT stay warm — cold here means 'no query-result reuse', not
    'cold machine'."""
    from actyxos_data_flow_spark.plans import graph as _gr
    from actyxos_data_flow_spark.plans import pipeline as _pl

    spark.catalog.clearCache()
    _pl._CLEAN_IDS.clear()
    _gr._STRONG_TIES.clear()


# cache-cleared passes per cold row; the metric string derives from
# this same constant so the artifact can never misdescribe its own
# methodology again (ADVICE r11: loop said 3, string said 2)
COLD_PASSES = 3


def run_cold_sweep(spark, registry, sf_dir: str) -> dict:
    """The COLD section, in its own fresh JVM (the --cold-only
    subprocess): after the parent's warm sweep an aged JVM's code-cache
    and old-gen pressure made cold totals ±20% noise across same-code
    runs (round-10 finding #5: 108.7 vs 128.6). Per query: one UNTIMED
    pass first (JIT/codegen compile — cold means 'no query-result
    reuse', never 'first janino compile'; folding first-compile into
    cold was the round-4-8 artifact), then min of 3 cache-cleared timed
    passes (2 left sub-second rows ±30% on scheduler noise) — the same
    fresh-JVM discipline the 10× probes already use."""
    headline = {k: v for k, v in registry.items() if v.bench}
    spark.range(1000).selectExpr("sum(id)").collect()
    cold: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in headline:
        warm: dict[str, float] = {}
        _timed(registry, spark, name, sf_dir, warm, errors)  # untimed-for-output JIT pass
        if name in errors:
            continue
        for _ in range(COLD_PASSES):
            _clear_spark_caches(spark)
            t1: dict[str, float] = {}
            _timed(registry, spark, name, sf_dir, t1, errors)
            if name in t1:
                cold[name] = min(cold.get(name, t1[name]), t1[name])
    out = {"queries_cold": cold, "value_cold": round(sum(cold.values()), 3)}
    if errors:
        out["errors_cold"] = errors
    return out


def run_scale_probe(spark, registry, sf_dir: str) -> dict:
    """The sf1 + skew probe sections. Run in a FRESH JVM (the
    --scale-only subprocess): after ~3000 stages of headline passes the
    shared JVM's code cache and old-gen inflate the heavy interpreted
    scans 2-9x (measured: ann_pq_topk 10.9s fresh vs 97s in the aged
    JVM) — numbers from an aged JVM measure the session, not the
    plan."""
    sf1: dict = {}
    sf1_err: dict[str, str] = {}
    try:
        t0 = time.perf_counter()
        ensure_sf1_data(spark, sf_dir)
        sf1["gen_sec"] = round(time.perf_counter() - t0, 3)
        def cold_min(name: str, d: str, dest: dict, key: str | None = None) -> None:
            # min of 2 cache-cleared passes: "cold" means zero
            # query-result reuse, NOT cold JIT — single-pass numbers
            # at this size swing 2x on codegen compile timing, and the
            # probe prices the plan
            for _ in range(2):
                _clear_spark_caches(spark)
                t1: dict[str, float] = {}
                _timed(registry, spark, name, d, t1, sf1_err, key=key or name)
                k = key or name
                if k in t1:
                    dest[k] = min(dest.get(k, t1[k]), t1[k])

        q: dict[str, float] = {}
        for name in SF1_QUERIES:
            cold_min(name, os.path.join(SCRATCH, "main"), q)
        sf1["queries"] = q
        skew: dict[str, float] = {}
        for name in SKEW_QUERIES + SKEW_LI_QUERIES + SKEW_EV_QUERIES:
            cold_min(name, os.path.join(SCRATCH, "skew01"), skew, key=f"{name}@skew1x")
            cold_min(name, os.path.join(SCRATCH, "skew1"), skew, key=f"{name}@skew10x")
        sf1["skew"] = skew
        sf1["note"] = (
            "single COLD pass at 10x corpus (synthetic, .scratch/"
            "sf1bench; per row: min of 2 cache-cleared passes; own fresh JVM "
            "via --scale-only so headline-suite JVM aging cannot "
            "inflate the probes); compare queries vs the sf0.1 "
            "headline queries_cold and @skew10x vs @skew1x — linear "
            "shapes should grow ~10x or less"
        )
    except Exception as ex:  # noqa: BLE001 — probe must never kill the bench
        sf1_err["_setup"] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
    if sf1_err:
        sf1["errors"] = sf1_err
    return sf1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3, help="headline timing passes (min kept)")
    ap.add_argument("--no-sf1", action="store_true", help="skip the 10x scale probe")
    ap.add_argument(
        "--scale-only",
        action="store_true",
        help="run ONLY the sf1/skew probes and print their JSON (used by the main run as a fresh-JVM subprocess)",
    )
    ap.add_argument(
        "--cold-only",
        action="store_true",
        help="run ONLY the cold sweep and print its JSON (used by the main run as a fresh-JVM subprocess)",
    )
    args = ap.parse_args()
    run_sf1 = not args.no_sf1 and os.environ.get("SPARK_GRAFT_SF1", "1") != "0"

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    if args.scale_only:
        spark = get_spark("bench-scale")
        registry = load_all()
        spark.range(1000).selectExpr("sum(id)").collect()
        print(json.dumps(run_scale_probe(spark, registry, sf_dir)))
        return
    if args.cold_only:
        spark = get_spark("bench-cold")
        registry = load_all()
        print(json.dumps(run_cold_sweep(spark, registry, sf_dir)))
        return
    spark = get_spark("bench")

    registry = load_all()
    headline = {k: v for k, v in registry.items() if v.bench}
    # session warm-up (JVM/codegen): trivial job, not timed
    spark.range(1000).selectExpr("sum(id)").collect()

    # N passes, keep the per-query MIN: single-pass numbers swing
    # ±2s (sometimes 2×) on the heavy queries from GC / page-cache
    # timing (measured: the same pipeline query 4.8s vs 13.9s across
    # runs); the min reflects the plan's cost, which is what
    # round-over-round comparison needs. Passes run CONSECUTIVELY per
    # query (not query-sweeps): plan-internal pins now release through
    # cache.py's small retirement window, so a repeated run only hits
    # the still-warm CacheManager entry if it happens within a couple
    # of queries — grouping passes per query measures "the plan, warm"
    # instead of the sweep-order eviction accident (and keeps warm
    # numbers comparable with rounds where caches never released).
    # A failing query must cost ONE row, not the round's whole perf
    # signal (round-2 lesson: the first query erroring aborted the run
    # and BENCH_r02.json recorded nothing).
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in headline:
        for _pass in range(max(args.passes, 1)):
            t1: dict[str, float] = {}
            _timed(registry, spark, name, sf_dir, t1, errors)
            if name in t1:
                times[name] = min(times.get(name, t1[name]), t1[name])
            else:
                times.pop(name, None)
                break
    out = {
        "metric": (
            "headline = COLD query wall-clock (noop sink): per-query "
            f"min of {COLD_PASSES} cache-cleared passes in a FRESH JVM "
            "(--cold-only subprocess) after one untimed JIT pass — "
            "same-code reproducible to <1%, the number to hold against "
            "the baseline bar. queries_warm/value_warm = per-query min "
            f"of {max(args.passes, 1)} warm passes in the aged sweep "
            "JVM (directed-probe use only: same-code warm totals "
            "drifted 24% in round 11, so warm is no longer a headline)"
        ),
        "value_warm": round(sum(times.values()), 3),
        "unit": "sec",
        "queries_warm": times,
        "sf": sf,
    }

    # COLD sweep in its OWN fresh JVM (round-10 directive #5): after
    # ~3000 warm-sweep stages this JVM's code cache and old-gen inflate
    # cold rows unpredictably (same-code cold totals 108.7 vs 128.6 in
    # round 10); the 10x probes already solved this with a --scale-only
    # subprocess, so cold adopts the same discipline. Parent session
    # stops FIRST — a resident local[32] JVM with a populated heap was
    # measured to distort a child 3-7x (shared page cache and CPU).
    import subprocess

    spark.stop()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cold-only"],
            capture_output=True, text=True, timeout=4800,
            env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
        )
        out.update(json.loads(proc.stdout.strip().splitlines()[-1]))
    except Exception as ex:  # noqa: BLE001 — fall back to a fresh in-process session
        spark = get_spark("bench-cold-fallback")
        out.update(run_cold_sweep(spark, registry, sf_dir))
        out["cold_fallback"] = f"{type(ex).__name__}: in-process fresh-session numbers"
        spark.stop()
    # the driver contract's value/queries carry the reproducible COLD
    # numbers (round-12 directive: warm's 24% same-code drift retired
    # it as a headline); queries_cold/value_cold stay as aliases so
    # round-over-round tooling keeps working
    out["value"] = out.get("value_cold", out["value_warm"])
    out["queries"] = out.get("queries_cold", out["queries_warm"])

    if run_sf1:
        # fresh-JVM subprocess, same rationale as the cold sweep
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scale-only"],
                capture_output=True, text=True, timeout=3000,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            )
            out["sf1"] = json.loads(proc.stdout.strip().splitlines()[-1])
        except Exception as ex:  # noqa: BLE001 — fall back to in-process
            spark = get_spark("bench-fallback")
            out["sf1"] = run_scale_probe(spark, registry, sf_dir)
            out["sf1"]["subprocess_fallback"] = (
                f"{type(ex).__name__}: in-process numbers (fresh fallback session)"
            )

    out["notes"] = (
        "cold sweep AND sf1/skew probes each run in their own fresh JVM "
        "(--cold-only / --scale-only subprocesses) because headline-"
        "suite JVM aging was measured to inflate heavy rows 2-9x and "
        "made same-code cold totals ±20% noise (the aged number "
        "measures the session, not the plan). queries_cold is the "
        "honest per-query number to hold against the baseline bar; the "
        "warm min is for round-over-round comparison. Round-specific "
        "narration lives in the committed BENCH_FULL_r{N}.json "
        "artifact, not here."
    )
    if errors:
        out["errors"] = errors
    # the JSON line is the bench CONTRACT: sole stdout line (Spark
    # progress bars are disabled in get_spark), duplicated to a file so
    # the artifact survives any stdout mangling driver-side
    line = json.dumps(out)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from artifacts import atomic_write  # temp+rename: never a partial artifact

    atomic_write(os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"), line + "\n")
    print(line)


if __name__ == "__main__":
    main()
