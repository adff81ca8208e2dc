"""Unit tests for the scale-extension operators (dedup / similarity /
text) on tiny in-line corpora — pipeline semantics, not oracle parity
(oracle parity is tools/check.py's job)."""

from __future__ import annotations

from pyspark.sql import functions as F

from actyxos_data_flow_spark.operators import dedup as D
from actyxos_data_flow_spark.operators import similarity as S
from actyxos_data_flow_spark.operators import text as X
from tests.conftest import rows


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (3, "completely different words entirely here now friend"),
            (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        ],
        "doc_id long, text string",
    )


def test_exact_dedup(spark):
    got = {r.representative: r.n_copies for r in D.exact_dedup(_docs(spark)).collect()}
    assert got == {1: 2, 2: 1, 3: 1}


def test_shingles_count(spark):
    sh = D.shingles(_docs(spark))
    per_doc = {r.doc_id: r["count"] for r in sh.groupBy("doc_id").count().collect()}
    assert per_doc[1] == 7  # 9 tokens → 7 trigrams, all distinct
    assert per_doc[3] == 5


def test_shingle_sig_table_matches_split_operators(spark):
    """The fused (passthrough, _sh, h*) table must reproduce
    shingle_arrays + minhash_signatures_arrays exactly: same row set
    after the _sh IS NOT NULL filter (docs under n tokens NULL out but
    keep their passthrough columns), identical arrays, identical
    signature longs."""
    docs = _docs(spark).union(
        spark.createDataFrame([(9, "too short")], "doc_id long, text string")
    )
    fused = D.shingle_sig_table(docs, num_hashes=4, keep_cols=("text",))
    rows = {r.doc_id: r for r in fused.collect()}
    assert rows[9]["_sh"] is None and rows[9]["h0"] is None
    assert rows[9]["text"] == "too short"  # passthrough survives the NULL row
    sets = {r.doc_id: r["_sh"] for r in D.shingle_arrays(docs).collect()}
    sig = {r.doc_id: r for r in D.minhash_signatures_arrays(
        D.shingle_arrays(docs), num_hashes=4).collect()}
    assert set(sets) == {k for k, v in rows.items() if v["_sh"] is not None}
    for k in sets:
        assert rows[k]["_sh"] == sets[k]
        for s in range(4):
            assert rows[k][f"h{s}"] == sig[k][f"h{s}"]


def test_minhash_lsh_finds_near_dup(spark):
    docs = _docs(spark)
    sh = D.shingles(docs)
    sig = D.minhash_signatures(sh)
    cand = D.lsh_candidate_pairs(sig)
    verified = D.jaccard_on_pairs(cand, sh).filter(F.col("jaccard") >= 0.5)
    got = {(r.id_a, r.id_b) for r in verified.collect()}
    assert (1, 4) in got  # exact dup: jaccard 1.0
    assert (1, 2) in got and (2, 4) in got  # near-dups
    assert not any(3 in p for p in got)


def test_simhash_near_pairs(spark):
    sig = D.simhash(_docs(spark))
    pairs = D.simhash_near_pairs(sig, max_hamming=6)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 4)] == 0  # identical docs → identical simhash
    # every reported pair respects the threshold; ground-truth hamming
    # computed from the signatures themselves
    sigs = {r.doc_id: r.simhash for r in sig.collect()}
    for (a, b), h in got.items():
        true_h = sum(x != y for x, y in zip(sigs[a], sigs[b]))
        assert h == true_h <= 6


def test_cosine_topk_self_is_rank1(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    got = rows(S.cosine_topk(q, emb, k=2), "qid", "vec_id", "rank")
    assert got == [(0, 0, 1), (0, 1, 2)]


def test_lang_id_picks_en(spark):
    df = spark.createDataFrame([(1, "the cat is on the mat and a dog")], "doc_id long, text string")
    assert X.lang_id(df).collect()[0].lang_pred == "en"


def test_quality_score_bounds(spark):
    out = X.quality_score(_docs(spark)).collect()
    assert all(0 <= r.quality_fp6 <= 10**6 for r in out)


def test_fingerprint_equal_for_exact_dups(spark):
    fp = {r.doc_id: r.fingerprint for r in X.fingerprint(_docs(spark)).collect()}
    assert fp[1] == fp[4]
    assert fp[1] != fp[3]


def test_lsh_bucket_cap_drops_degenerate_bucket(spark):
    """A signature bucket over the cap is excluded from pair generation
    (the 100 TB skew guard); its members still pair through other
    bands. With every doc identical, ALL buckets are degenerate, so a
    cap below the corpus size must yield zero pairs — and the companion
    accounting plan must name the dropped buckets."""
    clones = spark.createDataFrame(
        [(i, "same same same same same") for i in range(1, 7)],
        "doc_id long, text string",
    )
    sig = D.minhash_signatures(D.shingles(clones))
    assert D.lsh_candidate_pairs(sig, max_bucket=5).count() == 0
    dropped = D.lsh_oversized_buckets(sig, max_bucket=5).collect()
    assert dropped and all(r.size == 6 for r in dropped)
    # cap above the bucket size: identical to uncapped
    uncapped = {(r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sig).collect()}
    capped = {(r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sig, max_bucket=6).collect()}
    assert capped == uncapped == {(a, b) for a in range(1, 7) for b in range(1, 7) if a < b}


def test_lsh_capped_path_counts_before_collecting(spark):
    """r13 (r12 verdict #1): the capped path must bound the
    collect_list AGGREGATION BUFFER, not just pair emission — the plan
    pre-filters (band, sig) buckets with a COUNT aggregate and
    semi-joins the bands onto the survivors BEFORE any id list is
    collected, so a degenerate bucket's membership never materializes
    in one buffer. Pinned structurally: the capped plan carries a
    LeftSemi join between the count aggregate and the collect_list
    aggregate; the uncapped plan has neither."""
    clones = spark.createDataFrame(
        [(i, "same same same same same") for i in range(1, 7)],
        "doc_id long, text string",
    )
    sig = D.minhash_signatures(D.shingles(clones))
    capped = D.lsh_candidate_pairs(sig, max_bucket=5)
    plan = capped._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan
    assert "collect_list" in plan
    # the size-of-collected-output CAP filter is gone: the only cap
    # compare runs on the count aggregate, upstream of the collect (a
    # catalyst-inferred `size(_ids) > 0` non-empty guard may remain)
    import re

    assert not re.search(r"size\(_ids[^\n]*<=", plan), plan
    uncapped_plan = (
        D.lsh_candidate_pairs(sig)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "LeftSemi" not in uncapped_plan and "collect_list" not in uncapped_plan


def test_simhash_banding_full_recall_at_threshold(spark):
    """Pigeonhole guarantee: with max_hamming + 1 bands, EVERY pair with
    true hamming <= max_hamming must be emitted (the fixed 4-byte layout
    this replaced missed pairs whose 4-6 diffs spread across all four
    bytes). Brute-force ground truth over all signature pairs."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate([
            "alpha beta gamma delta epsilon zeta",
            "alpha beta gamma delta epsilon eta",
            "alpha beta gamma delta theta iota",
            "totally different content over here",
            "alpha beta gamma delta epsilon zeta extra",
            "more words that share nothing at all",
        ])],
        "doc_id long, text string",
    )
    sig = D.simhash(docs)
    sigs = {r.doc_id: r.simhash for r in sig.collect()}
    truth = {
        (a, b)
        for a in sigs
        for b in sigs
        if a < b and sum(x != y for x, y in zip(sigs[a], sigs[b])) <= 6
    }
    got = {(r.id_a, r.id_b) for r in D.simhash_near_pairs(sig, max_hamming=6).collect()}
    assert got == truth


def test_simhash_bands_layout():
    bands = D.simhash_bands(6)
    assert len(bands) == 7  # max_hamming + 1
    assert sum(w for _, w in bands) == D.SIMHASH_BITS
    assert bands[0] == (1, 5) and bands[-1] == (29, 4)


def test_hyperplane_lsh_recall_on_near_dups(spark):
    """Identical vectors share all bands (always candidates, cosine 1);
    orthogonal-ish random vectors are not near-dups. Signature is
    deterministic across runs (seeded hyperplanes)."""
    import random

    rnd = random.Random(7)
    base = [rnd.uniform(-1, 1) for _ in range(16)]
    rows = [
        (1, base),
        (2, list(base)),  # exact dup
        (3, [x + rnd.uniform(-0.01, 0.01) for x in base]),  # near dup
        (4, [rnd.uniform(-1, 1) for _ in range(16)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sig = S.hyperplane_signature(df, 16, planes=16)
    sigs = {r.vec_id: r.hsig for r in sig.collect()}
    assert sigs[1] == sigs[2] and len(sigs[1]) == 16
    assert sig.collect() == S.hyperplane_signature(df, 16, planes=16).collect()
    pairs = {(r.id_a, r.id_b) for r in S.hyperplane_near_pairs(sig).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs


def test_ivf_nprobe_full_equals_brute_force(spark):
    """nprobe = nlist probes every cell, so ivf_probe_topk must return
    exactly the brute-force ranking (the IVF recall dial's endpoint)."""
    import random

    rng = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(30)],
        "vec_id long, embedding array<double>, label long",
    )
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    seeds = emb.groupBy("label").agg(F.min("vec_id").alias("_cid"))
    cent = seeds.join(
        emb.select(F.col("vec_id").alias("_cid"), F.col("embedding").alias("ce")), "_cid"
    ).select("label", "ce")
    full = S.ivf_probe_topk(queries, emb, cent, k=5, nprobe=3)
    brute = S.cosine_topk(queries, emb.select("vec_id", "embedding"), k=5)
    assert rows(full, "qid", "vec_id", "rank", "cosine") == rows(brute, "qid", "vec_id", "rank", "cosine")


def test_ivf_nprobe_scans_only_probed_cells(spark):
    """nprobe=1 must never return a vector from an unprobed cell: every
    hit shares the query's nearest centroid's label."""
    emb = spark.createDataFrame(
        [(i, [float(i % 3 == j) for j in range(3)], i % 3) for i in range(12)],
        "vec_id long, embedding array<double>, label long",
    )
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    seeds = emb.groupBy("label").agg(F.min("vec_id").alias("_cid"))
    cent = seeds.join(
        emb.select(F.col("vec_id").alias("_cid"), F.col("embedding").alias("ce")), "_cid"
    ).select("label", "ce")
    got = S.ivf_probe_topk(queries, emb, cent, k=12, nprobe=1).collect()
    assert got and all(r.vec_id % 3 == 0 for r in got)


def test_salted_join_matches_plain_join(spark):
    from actyxos_data_flow_spark.operators import skew as SK

    left = spark.createDataFrame(
        [(i, i % 3) for i in range(50)] + [(100 + i, 0) for i in range(50)],  # key 0 is hot
        "id long, k long",
    )
    right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (9, "z")], "rk long, v string")
    got = SK.salted_join(left, right, "k", "rk", n=4)
    want = left.join(right, left.k == right.rk)
    assert rows(got, "id", "k", "rk", "v") == rows(want, "id", "k", "rk", "v")
    # left join keeps unmatched left rows exactly once
    l2 = left.union(spark.createDataFrame([(999, 7)], "id long, k long"))
    got_l = SK.salted_join(l2, right, "k", "rk", n=4, how="left")
    want_l = l2.join(right, l2.k == right.rk, "left")
    assert rows(got_l, "id", "k", "rk", "v") == rows(want_l, "id", "k", "rk", "v")


def test_salted_count_distinct_exact(spark):
    from actyxos_data_flow_spark.operators import skew as SK

    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i) for i in range(25)],
        "g string, u long",
    )
    got = rows(SK.salted_count_distinct(df, ["g"], "u", n=5, out="d"), "g", "d")
    assert got == [("a", 7), ("b", 25)]


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or call +1 (415) 555-0199."),
            (2, "server at 10.0.42.7 went down"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.scrubbed_text, r.n_redacted) for r in X.scrub_pii(df).collect()}
    assert "<EMAIL>" in got[1][0] and "<PHONE>" in got[1][0] and got[1][1] == 2
    assert "jane" not in got[1][0] and "555" not in got[1][0]
    assert got[2] == ("server at <IP> went down", 1)
    assert got[3] == ("nothing sensitive here", 0)


def test_connected_components_chain_and_singleton_pair(spark):
    """A 4-node chain collapses to one component (needs >1 propagation
    round — labels cross the chain); a disjoint pair keeps its own."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = rows(D.connected_components(pairs), "node", "component")
    # rows() sorts lexicographically by str: 1 < 10 < 11 < 2 < 3 < 4
    assert got == [(1, 1), (10, 10), (11, 10), (2, 1), (3, 1), (4, 1)]


def test_decontaminate_flags_overlap_and_keeps_clean(spark):
    """Doc 1 shares two distinct 3-grams with the eval set (flagged);
    doc 2 shares one (below min_overlap=2); doc 3 shares none."""
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high today"),
            (2, "the quick brown cat sleeps all day"),
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps far")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_matched, r.contaminated)
        for r in D.decontaminate(train, ev, min_overlap=2).collect()
    }
    # doc 1: "the quick brown", "quick brown fox", "brown fox jumps" = 3
    assert got[1] == (3, True)
    assert got[2] == (1, False)
    assert got[3] == (0, False)


def test_repetition_stats_flags_loops_not_prose(spark):
    """A generation-loop doc is flagged (top bigram dominates, trigrams
    repeat); normal prose with all-distinct bigrams is NOT flagged even
    though its top-bigram *ratio* clears the threshold (count must be
    >= 2); docs under 3 tokens drop out."""
    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "a b"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in X.repetition_stats(df).collect()}
    assert set(got) == {1, 2}
    assert got[1].repetitive and got[1].dup_trigram_frac_fp6 > 500_000
    assert not got[2].repetitive and got[2].dup_trigram_frac_fp6 == 0
    assert got[2].top_unigram_frac_fp6 == 2 * 10**6 // 9  # "the" twice


def test_centroid_outliers_flags_opposed_vector(spark):
    """Three aligned vectors and one pointing the opposite way in the
    same label: the opposed one scores negative cosine to the centroid
    and flags; a second label's centroid is its own single vector
    (cosine 1)."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.1], 0),
            (1, [0.9, 0.0], 0),
            (2, [1.0, -0.1], 0),
            (3, [-1.0, 0.0], 0),
            (4, [0.0, 1.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r.vec_id: r for r in S.centroid_outliers(emb).collect()}
    assert not got[0].outlier and got[0].centroid_cosine > 0.9
    assert got[3].outlier and got[3].centroid_cosine < 0
    assert got[4].centroid_cosine == 1.0 and not got[4].outlier


def test_profile_exact_and_approx_same_shape(spark):
    from actyxos_data_flow_spark.operators import profile as P

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (2, "b", None)],
        "k long, s string, v double",
    )
    exact = {r.col_name: r for r in P.profile(df).collect()}
    assert exact["k"].n_distinct == 2 and exact["k"].n_nulls == 0
    assert exact["s"].n_nulls == 1 and exact["s"].min_num is None
    assert exact["v"].min_num == 1.5 and exact["v"].max_num == 2.5
    assert exact["v"].null_frac_fp6 == 333_333  # (1*1e6) DIV 3
    approx = P.profile(df, exact=False)
    assert approx.columns == P.profile(df).columns
    assert {r.col_name for r in approx.collect()} == {"k", "s", "v"}


def test_weighted_sample_monotone_and_deterministic(spark):
    """Same ids, higher weights => superset survival; two runs agree
    row-for-row (hash decision, no RNG)."""
    lo = spark.createDataFrame([(i, 50_000) for i in range(200)], "doc_id long, w long")
    hi = spark.createDataFrame([(i, 950_000) for i in range(200)], "doc_id long, w long")
    keep_lo = {r.doc_id for r in X.weighted_sample(lo, "w").collect()}
    keep_hi = {r.doc_id for r in X.weighted_sample(hi, "w").collect()}
    assert keep_lo <= keep_hi
    assert 150 < len(keep_hi) <= 200 and len(keep_lo) < 40
    assert keep_hi == {r.doc_id for r in X.weighted_sample(hi, "w").collect()}


def test_chunk_windows_and_tail(spark):
    """10 tokens, size 4, overlap 1 (stride 3): starts 1,4,7 — last
    chunk covers the tail; a 2-token doc yields one short chunk."""
    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2, "a b")],
        "doc_id long, text string",
    )
    got = {}
    for r in X.chunk(df, size=4, overlap=1).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text, r.chunk_tokens))
    assert sorted(got[1]) == [
        (0, "t1 t2 t3 t4", 4),
        (1, "t4 t5 t6 t7", 4),
        (2, "t7 t8 t9 t10", 4),
    ]
    assert got[2] == [(0, "a b", 2)]


def test_pack_sequences_bins_and_offsets(spark):
    """Budget 10: docs of 4+4 fill bin 0; the 5-token doc STARTS at
    offset 8 of bin 0 (streaming pack overflows rather than splits);
    next doc starts a fresh span at 13 -> bin 1."""
    df = spark.createDataFrame(
        [("en", 1, 4), ("en", 2, 4), ("en", 3, 5), ("en", 4, 2), ("de", 9, 3)],
        "lang string, doc_id long, n_tokens long",
    )
    got = {r.doc_id: (r.bin_id, r.bin_offset) for r in X.pack_sequences(df, budget=10).collect()}
    assert got[1] == (0, 0) and got[2] == (0, 4)
    assert got[3] == (0, 8)
    assert got[4] == (1, 3)
    assert got[9] == (0, 0)


def test_kmeans_converges_to_obvious_clusters(spark):
    """Two tight blobs, k=2: the fit must recover them regardless of
    which blob the seeds land in; rerun is bit-identical."""
    pts = [(i, [10.0 + 0.1 * i, 0.0]) for i in range(4)] + [
        (10 + i, [-10.0 - 0.1 * i, 0.5]) for i in range(4)
    ]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    cent, assign = S.kmeans_fit(emb, k=2, iters=2)
    cells = {r.vec_id: r.cell for r in assign.collect()}
    blob_a = {cells[i] for i in range(4)}
    blob_b = {cells[10 + i] for i in range(4)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    again = {r.vec_id: r.cell for r in S.kmeans_fit(emb, k=2, iters=2)[1].collect()}
    assert again == cells


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    """Seeds 0 and 1 both sit in one blob: after the first assignment
    one cell may go empty — the fit must not crash and must still
    produce k centroid rows."""
    pts = [(0, [1.0, 1.0]), (1, [1.1, 1.0]), (2, [1.05, 1.0]), (3, [1.02, 1.0])]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    cent, assign = S.kmeans_fit(emb, k=2, iters=2)
    assert cent.count() == 2
    assert assign.count() == 4


def test_containment_catches_short_inside_long(spark):
    """Doc 2 is a verbatim span of doc 1 plus nothing else: containment_b
    = 1.0 even though Jaccard is diluted by doc 1's extra length."""
    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    short = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(1, long.strip()), (2, short)], "doc_id long, text string"
    )
    sh = D.shingles(df)
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    got = D.containment_on_pairs(pairs, sh).collect()[0]
    assert got.containment_b_fp6 == 1_000_000 and got.containment_fp6 == 1_000_000
    jac = D.jaccard_on_pairs(pairs, sh).collect()[0].jaccard
    assert jac < 0.5  # symmetric measure dilutes the duplication signal


def test_tfidf_discounts_boilerplate_overlap(spark):
    """Docs 1/2 share only a boilerplate header that EVERY doc carries
    (df = N → idf = min); docs 3/4 share a rare phrase. The rare-phrase
    pair must score far higher than the boilerplate pair."""
    header = "standard corporate disclaimer header text"
    df = spark.createDataFrame(
        [
            (1, header + " apples oranges pears"),
            (2, header + " cars trucks planes"),
            (3, header + " unique quantum flux capacitor theory x y z"),
            (4, header + " unique quantum flux capacitor theory p q r"),
        ],
        "doc_id long, text string",
    )
    sh = D.shingles(df)
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    got = {(r.id_a, r.id_b): r.tfidf_cosine for r in D.tfidf_cosine_on_pairs(pairs, sh).collect()}
    assert got[(3, 4)] > 2 * got[(1, 2)]


def test_sample_exact_k_budget_and_stability(spark):
    """Exactly k per stratum; the carve-out is stable under corpus
    growth (original members only swap out if a new id hashes lower)."""
    base = [(i, "en" if i % 2 else "de") for i in range(100)]
    df = spark.createDataFrame(base, "doc_id long, lang string")
    got = X.sample_exact_k(df, "lang", 5).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by_lang["en"]) == 5 and len(by_lang["de"]) == 5
    # append more rows: each stratum still has exactly 5; the union of
    # old and new picks can only shrink the old set, never reshuffle it
    bigger = spark.createDataFrame(base + [(i, "en") for i in range(100, 140)], "doc_id long, lang string")
    got2 = {r.doc_id for r in X.sample_exact_k(bigger, "lang", 5).collect() if r.lang == "en"}
    assert len(got2) == 5
    assert got2 <= by_lang["en"] | set(range(100, 140))


def test_pmi_ranks_collocation_above_filler(spark):
    """'new york' (always adjacent) must out-score 'a a' (frequent but
    independent filler); pairs under min_count drop."""
    df = spark.createDataFrame(
        [(i, "new york is big and new york is busy while a a a a fills space") for i in range(3)],
        "doc_id long, text string",
    )
    got = {(r.x, r.y): r.pmi for r in X.pmi_collocations(df, min_count=3).collect()}
    assert got[("new", "york")] > got[("a", "a")]
    assert ("space", "new") not in got  # bigrams never cross doc boundaries


def test_lm_score_flags_off_distribution_doc(spark):
    """A doc of corpus-frequent tokens scores higher (closer to 0) than
    a doc of singletons; token counts are exact."""
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ran to the mat"),
            (3, "zyx wvu tsr qpo nml kji"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in X.lm_score(df).collect()}
    assert got[1].n_tokens == 6 and got[3].n_tokens == 6
    assert got[1].mean_logp > got[3].mean_logp
    assert got[2].mean_logp > got[3].mean_logp


def test_mask_duplicate_spans(spark):
    # spans of width 3; "a b c d" appears in docs 1 and 2 → spans
    # "a b c" and "b c d" are hot; doc 3 shares no 3-token span
    docs = spark.createDataFrame(
        [
            (1, "a b c d x y z"),
            (2, "p q a b c d"),
            (3, "a b x c d y"),
            (4, "xx"),  # shorter than one span: passes through
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in D.mask_duplicate_spans(docs, width=3, min_count=2).collect()}
    assert out[1].clean_text == "x y z" and out[1].n_removed == 4
    assert out[2].clean_text == "p q" and out[2].n_removed == 4
    assert out[3].clean_text == "a b x c d y" and out[3].n_removed == 0
    assert out[4].clean_text == "xx" and out[4].n_removed == 0 and out[4].n_tokens == 1
    assert all(r.n_tokens == len(r.clean_text.split()) + r.n_removed if r.clean_text else True for r in out.values())


def test_mask_duplicate_spans_full_coverage(spark):
    # both docs are one hot span — fully masked, survive as empty text
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in D.mask_duplicate_spans(docs, width=3, min_count=2).collect()}
    assert out[1].clean_text == "" and out[1].n_removed == 3 and out[1].n_tokens == 3
    assert out[2].clean_text == "" and out[2].n_removed == 3


def test_lsh_delta_pairs_union_invariant(spark):
    # pairs(base) ∪ delta_pairs(base, new) == pairs(base ∪ new)
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now friend"),
            (4, "the quick brown fox jumps over the lazy dog"),  # new
            (5, "completely different words entirely here now pal"),  # new
        ],
        "doc_id long, text string",
    )
    sh = D.shingles(docs)
    sig = D.minhash_signatures(sh)
    is_new = F.col("doc_id") >= 4
    base_pairs = {
        (r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sig.filter(~is_new)).collect()
    }
    delta = {
        (r.id_a, r.id_b)
        for r in D.lsh_delta_pairs(sig.filter(~is_new), sig.filter(is_new)).collect()
    }
    full = {(r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sig).collect()}
    assert base_pairs | delta == full
    assert all(a >= 4 or b >= 4 for a, b in delta)
    assert base_pairs.isdisjoint(delta)


def test_lsh_edit_delta_apply_invariant(spark):
    """apply(pairs(B), edit_delta) == pairs(B') for a batch mixing an
    edit (doc 2 rewritten away from its near-dup), a delete (doc 4),
    and an insert (doc 6 near-dupping doc 1) — retractions as mult=-1,
    additions as mult=+1, untouched pairs absent from the delta."""
    old = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now friend"),
            (4, "the quick brown fox jumps over the lazy dog"),
            (5, "completely different words entirely here now pal"),
        ],
        "doc_id long, text string",
    )
    edited = spark.createDataFrame(
        [(2, "utterly unrelated replacement sentence with fresh tokens")],
        "doc_id long, text string",
    )
    inserted = spark.createDataFrame(
        [(6, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    removed = spark.createDataFrame([(4,)], "doc_id long")
    new = (
        old.filter("doc_id not in (2, 4)")
        .unionByName(edited)
        .unionByName(inserted)
    )
    sig_old = D.minhash_signatures(D.shingles(old))
    sig_new_docs = D.minhash_signatures(D.shingles(edited.unionByName(inserted)))
    old_pairs = {(r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sig_old).collect()}
    new_pairs = {
        (r.id_a, r.id_b)
        for r in D.lsh_candidate_pairs(D.minhash_signatures(D.shingles(new))).collect()
    }
    delta = {
        (r.id_a, r.id_b): r.mult
        for r in D.lsh_edit_delta_pairs(sig_old, sig_new_docs, removed).collect()
    }
    assert set(delta.values()) <= {1, -1}
    applied = (old_pairs | {p for p, m in delta.items() if m == 1}) - {
        p for p, m in delta.items() if m == -1
    }
    assert applied == new_pairs
    # the edit and the delete both retract, the insert adds
    assert any(m == -1 for m in delta.values())
    assert any(m == 1 for m in delta.values())
    # untouched pairs (3,5) never enter the delta
    assert (3, 5) not in delta


def test_lsh_edit_delta_insert_only_matches_delta_pairs(spark):
    """With no edits-of-existing and no deletes, the signed delta
    degenerates to lsh_delta_pairs with every mult = +1."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now friend"),
            (4, "the quick brown fox jumps over the lazy dog"),
            (5, "completely different words entirely here now pal"),
        ],
        "doc_id long, text string",
    )
    sig = D.minhash_signatures(D.shingles(docs))
    is_new = F.col("doc_id") >= 4
    plain = {
        (r.id_a, r.id_b)
        for r in D.lsh_delta_pairs(sig.filter(~is_new), sig.filter(is_new)).collect()
    }
    signed = {
        (r.id_a, r.id_b): r.mult
        for r in D.lsh_edit_delta_pairs(sig.filter(~is_new), sig.filter(is_new)).collect()
    }
    assert set(signed) == plain
    assert all(m == 1 for m in signed.values())


def test_assign_splits_frozen_under_append(spark):
    import pytest

    d1 = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    d2 = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id: r.split for r in X.assign_splits(d1).collect()}
    s2 = {r.doc_id: r.split for r in X.assign_splits(d2).collect()}
    assert all(s2[k] == v for k, v in s1.items())  # append never reassigns
    assert set(s2.values()) == {"train", "val", "test"}
    with pytest.raises(ValueError):
        X.assign_splits(d1, splits=(("a", 0.5), ("b", 0.2)))


def test_vocab_coverage_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a z q")], "doc_id long, text string"
    )
    # vocab_size=2 → vocab {a, b} (a:3, b:1, tie z/q broken asc → b wins by count)
    got = {r.doc_id: r for r in X.vocab_coverage(docs, vocab_size=2).collect()}
    assert got[1].n_oov == 0 and got[1].oov_frac_fp6 == 0
    assert got[2].n_oov == 2 and got[2].n_tokens == 3


def test_simhash_bucket_cap_drops_degenerate_band(spark):
    # three identical signatures (a degenerate bucket in EVERY band)
    # plus one distinct: cap=2 suppresses the identical trio's pairs
    sig = spark.createDataFrame(
        [(1, "1" * 32), (2, "1" * 32), (3, "1" * 32), (4, "0" * 32)],
        "doc_id long, simhash string",
    )
    uncapped = D.simhash_near_pairs(sig, max_hamming=2)
    assert {(r.id_a, r.id_b) for r in uncapped.collect()} == {(1, 2), (1, 3), (2, 3)}
    capped = D.simhash_near_pairs(sig, max_hamming=2, max_bucket=2)
    assert capped.count() == 0


def test_connected_components_star_equals_propagation(spark):
    """large-star/small-star must agree with min-label propagation (and
    ground truth) on adversarial shapes: a long chain (diameter >> log
    rounds), a cycle, a star, two separate components, and a seeded
    random graph."""
    import random

    from actyxos_data_flow_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    def truth(edges):
        # union-find ground truth
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return sorted((n, find(n)) for n in parent)

    rng = random.Random(7)
    graphs = {
        "chain": [(i, i + 1) for i in range(60)],
        "cycle": [(i, (i + 1) % 40) for i in range(40)],
        "star": [(100, 100 + i) for i in range(1, 20)],
        # (9, 9): a node appearing ONLY as a self-pair must come back
        # as its own singleton component from both implementations
        "two_comps": [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (9, 9)],
        "random": [(rng.randrange(50), rng.randrange(50)) for _ in range(80)],
    }
    for name, edges in graphs.items():
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        want = truth(edges)
        # driver_max_edges=0 forces the DISTRIBUTED loops (the adaptive
        # driver union-find would otherwise absorb these tiny graphs)
        got_star = sorted(
            (r["node"], r["component"])
            for r in connected_components_star(df, driver_max_edges=0).collect()
        )
        assert got_star == want, f"star CC wrong on {name}"
        # propagation needs diameter rounds; bump max_iter for the chain
        got_prop = sorted(
            (r["node"], r["component"])
            for r in connected_components(df, max_iter=70, driver_max_edges=0).collect()
        )
        assert got_prop == want, f"propagation CC wrong on {name}"


def test_connected_components_driver_path_equals_distributed(spark):
    """The size-adaptive driver union-find (edge list under
    driver_max_edges collects to one union-find pass) must produce the
    exact distributed result — same min-label contract, same singleton
    handling — in both CC variants and in the delta maintenance, and
    the cutover must fall back to the distributed loop when the edge
    list exceeds the bound."""
    import random

    from actyxos_data_flow_spark.operators.dedup import (
        connected_components,
        connected_components_delta,
        connected_components_star,
    )

    rng = random.Random(29)
    edges = (
        [(i, i + 1) for i in range(25)]
        + [(rng.randrange(60), rng.randrange(60)) for _ in range(40)]
        + [(9, 9), (200, 200)]  # self-pair-only nodes -> singletons
    )
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    want = sorted(
        (r["node"], r["component"])
        for r in connected_components_star(df, driver_max_edges=0).collect()
    )
    for fn in (connected_components, connected_components_star):
        got = sorted((r["node"], r["component"]) for r in fn(df).collect())
        assert got == want, f"driver path diverges in {fn.__name__}"
        # bound smaller than the edge list -> distributed fallback, same rows
        got_fb = sorted(
            (r["node"], r["component"])
            for r in fn(df, max_iter=70, driver_max_edges=5).collect()
        )
        assert got_fb == want, f"fallback path diverges in {fn.__name__}"
    # delta maintenance with the driver-path mini-graph
    base = edges[:30]
    delta = edges[30:]
    got_delta = sorted(
        (r["node"], r["component"])
        for r in connected_components_delta(
            connected_components_star(spark.createDataFrame(base, "id_a long, id_b long")),
            spark.createDataFrame(delta, "id_a long, id_b long"),
        ).collect()
    )
    assert got_delta == want


def test_connected_components_delta_invariant(spark):
    """cc_delta(cc(base), delta) == cc(base ∪ delta) on seeded random
    graphs, including deltas that MERGE previously separate components
    and deltas introducing brand-new nodes."""
    import random

    from actyxos_data_flow_spark.operators.dedup import (
        connected_components_delta,
        connected_components_star,
    )

    rng = random.Random(13)
    for trial in range(3):
        # (77, 77): a standing SINGLETON cluster with no delta edge —
        # the maintenance step must not lose it
        base = [(rng.randrange(40), rng.randrange(40)) for _ in range(30)] + [(77, 77)]
        # delta: random edges + a bridge between low and high id ranges
        # + edges over fresh nodes 100..110
        delta = (
            [(rng.randrange(40), rng.randrange(40)) for _ in range(10)]
            + [(rng.randrange(20), 100 + rng.randrange(10)) for _ in range(3)]
            + [(100 + i, 100 + i + 1) for i in range(9)]
        )
        delta = [(a, b) for a, b in delta if a != b]
        bdf = spark.createDataFrame(base, "id_a long, id_b long")
        ddf = spark.createDataFrame(delta, "id_a long, id_b long")
        fdf = spark.createDataFrame(base + delta, "id_a long, id_b long")

        # driver_max_edges=0 keeps this test on the DISTRIBUTED star
        # contraction; the driver union-find path has its own
        # equivalence test above
        got = sorted(
            (r["node"], r["component"])
            for r in connected_components_delta(
                connected_components_star(bdf, driver_max_edges=0), ddf, driver_max_edges=0
            ).collect()
        )
        want = sorted(
            (r["node"], r["component"])
            for r in connected_components_star(fdf, driver_max_edges=0).collect()
        )
        assert got == want, f"trial {trial}"


def test_sq8_quantize_codes_and_edges(spark):
    """int8 quantizer: codes stored as tinyint (1 byte/dim), max
    element hits ±127 exactly, zero vectors quantize to zeros, and
    dequantization error is bounded by scale/2 per element."""
    from actyxos_data_flow_spark.operators.similarity import sq8_quantize

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),       # zero vector -> scale 0
        (3, [-2.0, 2.0, 1.0, -1.0]),     # symmetric extremes
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in sq8_quantize(df).collect()}

    assert dict(sq8_quantize(df).dtypes)["sq_q"] == "array<tinyint>"
    # floor(x/scale + 0.5) is round-half-UP: -63.5 rounds to -63
    assert out[1]["sq_q"][0] == 127 and out[1]["sq_q"][1] == -63
    assert out[2]["sq_scale"] == 0.0 and out[2]["sq_q"] == [0, 0, 0, 0]
    assert out[3]["sq_q"] == [-127, 127, 64, -63]
    for r in out.values():
        s = r["sq_scale"]
        for x, q in zip(r["embedding"], r["sq_q"]):
            assert abs(x - q * s) <= s / 2 + 1e-12


def test_cosine_topk_chunked_matches_single_pass(spark):
    """The max_query_rows driver guard splits the query set into hash
    chunks scored in separate broadcast passes; the union must be
    row-identical to the single-pass answer (per-query top-k is
    chunk-independent)."""
    from actyxos_data_flow_spark.operators.similarity import cosine_topk
    from actyxos_data_flow_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.select("vec_id", "embedding")
    queries = emb.limit(7).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    single = cosine_topk(queries, corpus, k=5)
    chunked = cosine_topk(queries, corpus, k=5, max_query_rows=2)
    assert sorted(map(tuple, single.collect())) == sorted(map(tuple, chunked.collect()))


def test_kmeans_assign_pandas_path_matches_inline_literals(spark):
    """The large-k vectorized assignment must be row-identical to the
    inlined-literal projection (same 9dp HALF_UP rounding, same
    lowest-cell tie rule), and the switch threshold is pinned so a
    coarse quantizer keeps the pure-projection plan."""
    from actyxos_data_flow_spark.operators import similarity as S
    from actyxos_data_flow_spark.sources import load_table

    assert S.KMEANS_INLINE_MAX_K == 1024

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cent, _ = S.kmeans_fit(emb, k=8, iters=1)
    inline = S.kmeans_assign(emb, cent)  # 8 <= 1024: literal projection
    vectorized = S.kmeans_assign(emb, cent, max_inline_k=0)  # force pandas path
    a = sorted(map(tuple, inline.collect()))
    b = sorted(map(tuple, vectorized.collect()))
    assert a == b and len(a) > 0
    # forced-pandas FIT (threshold patched to 0) must converge to the
    # same model as the literal fit
    import unittest.mock as mock

    with mock.patch.object(S, "KMEANS_INLINE_MAX_K", 0):
        cent2, _ = S.kmeans_fit(emb, k=8, iters=1)
    assert sorted(map(tuple, cent.collect())) == sorted(map(tuple, cent2.collect()))


def test_ann_recall_bounds(spark):
    """Retrieval quality, not just determinism: the reranked/multi-probe
    methods must recover most of the exact top-k. Bounds are loose
    floors (data-dependent), pinned so a silent quality regression in
    banding/quantization/probing fails the suite."""
    from actyxos_data_flow_spark.plans.similarity import ann_recall_report

    got = {r["method"]: r["recall_at_k_fp6"] / 1e6 for r in ann_recall_report(spark, "/root/testdata/sf0.001").collect()}
    assert set(got) == {
        "ivf_nprobe1", "ivf_nprobe3", "ivf_kmeans", "sq8_rerank",
        "hyperplane", "pq_adc", "ivfpq",
    }
    assert got["ivf_kmeans"] >= 0.2  # trained quantizer, nprobe=2 floor
    assert got["sq8_rerank"] >= 0.9  # quantize+rerank ≈ exact (1.0 here)
    assert got["pq_adc"] >= 0.5  # m-byte codes + 3x rerank pool floor
    assert got["ivfpq"] >= 0.4  # routed ADC floor (0.61 here: the cell
    # restriction prunes ADC distractors, so it tracks pq_adc closely)
    assert got["ivf_nprobe3"] >= got["ivf_nprobe1"]  # more probes, more recall
    assert got["ivf_nprobe3"] >= 0.25  # loose floor: sf0.001 cells are coarse
    assert got["hyperplane"] >= 0.3  # 16-plane LSH floor
    for v in got.values():
        assert 0.0 <= v <= 1.0


def test_hyperplane_delta_pairs_invariant(spark):
    """IVM invariant for the embedding band index:
    pairs(base) ∪ delta_pairs(base, new) == pairs(base ∪ new)."""
    import random

    rnd = random.Random(3)

    def vec():
        return [rnd.uniform(-1, 1) for _ in range(12)]

    rows = [(i, vec()) for i in range(20)]
    rows[7] = (7, [x * 1.001 for x in rows[3][1]])   # near-dup inside base
    rows[15] = (15, [x * 1.001 for x in rows[4][1]])  # new near-dups base
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.filter(F.col("vec_id") < 10)
    new = df.filter(F.col("vec_id") >= 10)

    sig_base = S.hyperplane_signature(base, 12)
    sig_new = S.hyperplane_signature(new, 12)
    sig_all = S.hyperplane_signature(df, 12)

    p_base = {(r.id_a, r.id_b) for r in S.hyperplane_near_pairs(sig_base).collect()}
    p_all = {(r.id_a, r.id_b) for r in S.hyperplane_near_pairs(sig_all).collect()}
    delta = {(r.id_a, r.id_b) for r in S.hyperplane_delta_pairs(sig_base, sig_new).collect()}
    assert p_base | delta == p_all
    assert all(p not in p_base for p in delta)  # delta is genuinely new


def test_hyperplane_edit_delta_apply_invariant(spark):
    """apply(pairs(B), edit_delta) == pairs(B') for a re-embedding
    batch mixing edits, a delete, and an insert — the vector twin of
    the minhash edit-delta invariant."""
    from actyxos_data_flow_spark.operators import similarity as S
    from actyxos_data_flow_spark.sources import load_table

    emb = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .select("vec_id", "embedding")
        .filter("vec_id < 120")
    )
    edited = emb.filter("vec_id % 17 = 3").withColumn(
        "embedding",
        F.concat(F.array(-F.element_at("embedding", 1)), F.slice("embedding", 2, 63)),
    )
    inserted = emb.filter("vec_id < 5").select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    removed = emb.filter("vec_id % 29 = 11").select("vec_id")
    new_state = (
        emb.join(edited.select("vec_id"), "vec_id", "left_anti")
        .join(removed, "vec_id", "left_anti")
        .unionByName(edited)
        .unionByName(inserted)
    )
    sig = lambda df: S.hyperplane_signature(df, 64)  # noqa: E731
    old_pairs = {(r.id_a, r.id_b) for r in S.hyperplane_near_pairs(sig(emb)).collect()}
    new_pairs = {
        (r.id_a, r.id_b) for r in S.hyperplane_near_pairs(sig(new_state)).collect()
    }
    delta = {
        (r.id_a, r.id_b): r.mult
        for r in S.hyperplane_edit_delta_pairs(
            sig(emb), sig(edited.unionByName(inserted)), removed
        ).collect()
    }
    applied = (old_pairs | {p for p, m in delta.items() if m == 1}) - {
        p for p, m in delta.items() if m == -1
    }
    assert applied == new_pairs
    assert any(m == -1 for m in delta.values()) and any(m == 1 for m in delta.values())


def test_pq_fit_encode_properties(spark):
    """PQ codebooks/codes: m tinyint codes per vector (the dim/m
    compression), every code in [0, ksub), encoding is deterministic
    under repartitioning, and a vector equal to a seed vector encodes
    to that seed's codewords after 0 refinement passes."""
    from actyxos_data_flow_spark.operators.similarity import pq_encode, pq_fit

    rows = [(i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    books = pq_fit(df, m=2, ksub=4, iters=1)
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    assert all(len(cw) == 4 for b in books for cw in b)

    codes = pq_encode(df, books)
    assert dict(codes.dtypes)["pq_codes"] == "array<tinyint>"
    got = {r["vec_id"]: list(r["pq_codes"]) for r in codes.collect()}
    assert all(len(c) == 2 and all(0 <= x < 4 for x in c) for c in got.values())

    # determinism under physical layout changes
    got2 = {
        r["vec_id"]: list(r["pq_codes"])
        for r in pq_encode(df.repartition(7), books).collect()
    }
    assert got == got2

    # iters=0: seed vector j encodes to (j, j) exactly (zero distance)
    books0 = pq_fit(df, m=2, ksub=4, iters=0)
    g0 = {r["vec_id"]: list(r["pq_codes"]) for r in pq_encode(df, books0).collect()}
    for j in range(4):
        assert g0[j] == [j, j]


def test_bm25_hand_computed(spark):
    """BM25 on a 3-doc corpus against hand-derived scores: the doc with
    more query-term occurrences and shorter length ranks first; docs
    without any query term are absent; n_terms counts matched terms."""
    import math

    rows = [
        (1, "cat dog cat"),
        (2, "cat mouse mouse mouse"),
        (3, "bird bird"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from actyxos_data_flow_spark.operators.retrieval import bm25_topk

    got = {r["doc_id"]: r for r in bm25_topk(docs, ["cat", "dog"], k=3).collect()}
    assert set(got) == {1, 2}  # doc 3 matches nothing
    assert got[1]["rank"] == 1 and got[2]["rank"] == 2
    assert got[1]["n_terms"] == 2 and got[2]["n_terms"] == 1

    # replicate doc 1's score: N=3, avgdl = 9/3 = 3, dl=3 -> dl/avgdl = 1
    # (HALF_UP 6dp rounding, matching Spark's round(); Python round()
    # is banker's and can differ by 1e-6)
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    k1, b = 1.2, 0.75
    def idf(df):
        return r6(math.log((3 - df + 0.5) / (df + 0.5) + 1))
    def term(tf, idf6):
        return r6(idf6 * tf * (k1 + 1) / (tf + k1 * (1 - b + b * 1.0)))
    expect = term(2, idf(2)) + term(1, idf(1))  # cat tf=2 (df=2), dog tf=1 (df=1)
    assert abs(got[1]["bm25"] - expect) < 1e-9


def test_bm25_null_and_empty_text(spark):
    """NULL/empty text contributes dl=0 rows (still counted in N and
    avgdl) and never crashes the tokenizer."""
    rows = [(1, "cat cat"), (2, None), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from actyxos_data_flow_spark.operators.retrieval import bm25_topk, build_postings

    _, doclen = build_postings(docs)
    dls = {r["doc_id"]: r["dl"] for r in doclen.collect()}
    assert dls == {1: 2, 2: 0, 3: 0}
    out = bm25_topk(docs, ["cat"], k=5).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1


def test_zorder_key_locality_and_determinism(spark):
    """Morton keys: integer-exact, layout-independent, and local — a
    rectangle predicate's rows concentrate in few bins, the property
    that makes min/max file-skipping work on both dimensions."""
    from actyxos_data_flow_spark.operators.layout import zorder_key, zorder_prune_report

    rows = [(a, b) for a in range(0, 64) for b in range(0, 64)]
    df = spark.createDataFrame(rows, "a long, b long")
    keyed = {(r["a"], r["b"]): r["zkey"] for r in zorder_key(df, "a", "b", bits=6).collect()}
    # bijective on a full 6-bit grid, range exactly [0, 4096)
    assert len(set(keyed.values())) == 64 * 64
    assert min(keyed.values()) == 0 and max(keyed.values()) == 4095
    # interleave pins the origin and the corners
    assert keyed[(0, 0)] == 0 and keyed[(63, 63)] == 4095
    # determinism under physical layout
    keyed2 = {
        (r["a"], r["b"]): r["zkey"]
        for r in zorder_key(df.repartition(13), "a", "b", bits=6).collect()
    }
    assert keyed == keyed2

    # pruning: a 16x16 rectangle in a 64x64 grid must scan a small
    # fraction of the 64 bins (z-order locality), and scanned >= matched
    rep = zorder_prune_report(df, "a", "b", 16, 31, 16, 31, bits=6, bin_bits=6).collect()[0]
    assert rep["total_bins"] == 64
    assert rep["matched_rows"] == 256
    assert rep["scanned_rows"] >= rep["matched_rows"]
    assert rep["hit_bins"] <= 16  # rectangle touches few z-regions
    assert rep["scan_fraction_fp6"] <= 300_000


def test_logreg_learns_separable_labels(spark):
    """The distributed GD trainer must actually LEARN when the label is
    learnable: English-stopword-rich docs labeled via lang='en' vs
    stopword-free docs — after 3 passes accuracy is high and the
    predicted probabilities separate the classes."""
    from actyxos_data_flow_spark.operators.classifier import (
        feature_vector,
        logreg_fit,
        logreg_metrics,
    )

    en = [(i, "the cat is in the hat and the dog is a friend of the bird", "en")
          for i in range(20)]
    xx = [(100 + i, "zyx wvu tsr qpo nml kji hgf edc ba zz yy xx ww vv uu tt", "xx")
          for i in range(20)]
    docs = spark.createDataFrame(en + xx, "doc_id long, text string, lang string")
    feats = feature_vector(docs).persist()
    traj = logreg_fit(feats)
    assert len(traj) == 3 and all(len(w) == 5 for w in traj)
    # stop_ratio (index 2) must carry positive weight — it's the signal
    assert traj[-1][2] > 0
    m = logreg_metrics(feats, traj[-1]).collect()[0]
    assert m["n_docs"] == 40
    assert m["n_correct"] / m["n_docs"] >= 0.95
    # metrics are exact BIGINTs (count, fp7 sum) — means are reader quotients
    mean_p_pos = m["sum_p_pos_fp7"] / 1e7 / m["n_pos"]
    mean_p_neg = m["sum_p_neg_fp7"] / 1e7 / m["n_neg"]
    assert mean_p_pos > mean_p_neg + 0.05  # 3 passes, lr=1: clear but early separation
    feats.unpersist()


def test_classifier_fixed_point_contract(spark):
    """The classifier scoring chain is EXACT integer arithmetic:
    p_fp7 equals the Python replay — z15 = Σ x_fp6·w_fp9 (BIGINT),
    z_mils = tdiv(z15, 1e12), p = floor(1e7/(1+exp(-z_mils/1000))+0.5)
    — bit-for-bit, independent of fold order or engine. This replaced
    the round-7 round(exp-derived, 7) that split in the driver's
    environment while matching locally at every scale factor."""
    from actyxos_data_flow_spark.operators.classifier import (
        _p_fp7,
        _tdiv,
        sigmoid_fp7,
    )

    w = [-166034676, -85926560, -10648173, -86217646, -74695660]
    xs = [
        [1000000, 920000, 65217, 293478, 466304],
        [1000000, 400000, 25000, 550000, 435000],
        [1000000, 1000000, 0, 1000000, 100000],
    ]
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x array<long>")
    got = {r["i"]: r["p"] for r in df.select("i", _p_fp7(w).alias("p")).collect()}
    for i, x in enumerate(xs):
        z15 = sum(xi * wi for xi, wi in zip(x, w))
        expect = sigmoid_fp7(_tdiv(z15, 10**12))
        assert got[i] == expect, (i, got[i], expect)


def test_sigmoid_grid_half_boundary_margin():
    """EXHAUSTIVE scan of the sigmoid's finite input grid: for every
    z_mils in [-SIG_SCAN_MILS, SIG_SCAN_MILS], the floor argument
    1e7/(1+exp(-z/1000)) + 0.5 must sit ≥ 1e-7 from any integer —
    ~1000× the worst cross-libm exp() drift (a few ulps ≈ 3e-9 in
    these units), so floor() is engine-independent. Outside the
    scanned range σ saturates: 1e7·min(σ, 1−σ) < 1e7·e^(−19) ≈ 0.056,
    so the argument is ≥ 0.444 from the nearest integer analytically.
    This is the ONLY transcendental any hashed classifier column can
    see; the margin here is what makes it portable."""
    import math

    from actyxos_data_flow_spark.operators.classifier import SIG_SCAN_MILS

    worst = 1.0
    for m in range(-SIG_SCAN_MILS, SIG_SCAN_MILS + 1):
        v = 1e7 / (1.0 + math.exp(-(m / 1000.0))) + 0.5
        d = abs(v - round(v))
        if d < worst:
            worst = d
    assert worst > 1e-7, worst  # observed: 3.04e-6 at z_mils = -9848


def test_tdiv_matches_engines(spark):
    """Driver-side _tdiv must match Spark DIV (and DuckDB //):
    truncation toward zero, including negatives."""
    import duckdb

    from actyxos_data_flow_spark.operators.classifier import _tdiv

    cases = [(-7, 2), (7, 2), (-7, -2), (1, 3), (-1, 3), (-1000000000001, 10**12)]
    got_spark = spark.sql(
        "SELECT " + ", ".join(f"CAST({n} AS BIGINT) DIV {d} AS c{i}" for i, (n, d) in enumerate(cases))
    ).collect()[0]
    got_duck = duckdb.sql(
        "SELECT " + ", ".join(f"{n}::BIGINT // {d} AS c{i}" for i, (n, d) in enumerate(cases))
    ).fetchone()
    for i, (n, d) in enumerate(cases):
        assert _tdiv(n, d) == got_spark[f"c{i}"] == got_duck[i], (n, d)


def test_logreg_deterministic_under_repartition(spark):
    """Weight trajectories are bit-identical regardless of physical
    layout (decimal-exact gradient sums; rounded sigmoid)."""
    from actyxos_data_flow_spark.operators.classifier import feature_vector, logreg_fit

    docs = spark.createDataFrame(
        [(i, f"w{i} the and is of to {'x' * (i % 7)}", "en" if i % 3 == 0 else "de")
         for i in range(30)],
        "doc_id long, text string, lang string",
    )
    t1 = logreg_fit(feature_vector(docs))
    t2 = logreg_fit(feature_vector(docs.repartition(11)))
    assert t1 == t2


def test_pagerank_properties(spark):
    """PageRank invariants on a hand-built graph: ranks sum to ~1
    (dangling mass redistributed), a node cited by everyone outranks
    the rest, and the fit is layout-deterministic."""
    from actyxos_data_flow_spark.operators.graph import pagerank

    # star: 1,2,3 all point at 4; 4 points nowhere (dangling); 5 isolated-ish
    edges = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (5, 1)], "src long, dst long"
    )
    pr = {r["node"]: r["pr_fp9"] for r in pagerank(edges, iters=3).collect()}
    assert set(pr) == {1, 2, 3, 4, 5}
    # mass conserved up to integer-truncation loss (< ~1 fp9 unit per
    # node per DIV, a handful of passes): within 100 nano-units of 1.0
    assert abs(sum(pr.values()) - 10**9) < 100
    assert pr[4] == max(pr.values())  # the hub wins
    assert pr[5] == min(pr.values())  # nothing points at 5

    pr2 = {
        r["node"]: r["pr_fp9"]
        for r in pagerank(edges.repartition(7), iters=3).collect()
    }
    assert pr == pr2

    # duplicate edges must not double-count
    dup = edges.unionByName(spark.createDataFrame([(1, 4)], "src long, dst long"))
    pr3 = {r["node"]: r["pr_fp9"] for r in pagerank(dup, iters=3).collect()}
    assert pr3 == pr


def test_zorder_write_file_rectangles(spark, tmp_path):
    """The physical z-order write must land small per-file bounding
    rectangles: every parquet file's (a, b) spans are a fraction of the
    full domain, so footer min/max prunes on either column. Compare
    against a row-major (sorted-by-a-only) layout where every file
    spans the whole b domain."""
    import glob

    from actyxos_data_flow_spark.operators.layout import zorder_write

    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    zpath = str(tmp_path / "zordered")
    zorder_write(df, zpath, "a", "b", n_files=16, bits=6)

    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(zpath + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins = {"a": 1 << 60, "b": 1 << 60}
        maxs = {"a": -1, "b": -1}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    mins[name] = min(mins[name], col.statistics.min)
                    maxs[name] = max(maxs[name], col.statistics.max)
        spans.append((maxs["a"] - mins["a"], maxs["b"] - mins["b"]))
    assert len(spans) >= 8  # the range partitioner actually split
    # z-order: every file's rectangle is narrow in BOTH dims (≤ half
    # the domain); a single-column sort would span b fully (63) in
    # every file
    assert all(sa <= 32 and sb <= 32 for sa, sb in spans), spans


def test_cms_never_underestimates(spark):
    """Count-min invariant: est >= exact for EVERY item, equality when
    no collisions; deterministic under repartition; weighted build from
    pre-aggregated counts equals the raw one-row-per-item build."""
    from actyxos_data_flow_spark.operators.cms import cms_build, cms_estimate

    rows = [(f"t{i % 13}",) for i in range(200)]
    items = spark.createDataFrame(rows, "term string")
    sk = cms_build(items)
    cand = items.distinct()
    est = {r["term"]: r["est"] for r in cms_estimate(sk, cand).collect()}
    exact = {f"t{j}": len([1 for i in range(200) if i % 13 == j]) for j in range(13)}
    assert set(est) == set(exact)
    for t, e in est.items():
        assert e >= exact[t]

    est2 = {
        r["term"]: r["est"]
        for r in cms_estimate(cms_build(items.repartition(9)), cand).collect()
    }
    assert est == est2

    weighted = spark.createDataFrame(list({(t, c) for t, c in exact.items()}), "term string, cnt long")
    sk_w = cms_build(weighted, weight_col="cnt")
    assert sorted(map(tuple, sk.collect())) == sorted(map(tuple, sk_w.collect()))


def test_drift_jsd_bounds_and_extremes(spark):
    """JSD properties: 0 for identical corpora, ln(2) for disjoint
    vocabularies, symmetric, and layout-deterministic."""
    import math

    from actyxos_data_flow_spark.operators.drift import drift_report, term_dist

    a = spark.createDataFrame([(1, "x y z x")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "x y z x")], "doc_id long, text string")
    c = spark.createDataFrame([(3, "p q r s")], "doc_id long, text string")

    same, _ = drift_report(term_dist(a), term_dist(b))
    assert same.collect()[0]["jsd"] == 0.0

    disj, _ = drift_report(term_dist(a), term_dist(c))
    assert abs(disj.collect()[0]["jsd"] - math.log(2)) < 1e-5

    ab, _ = drift_report(term_dist(a), term_dist(c))
    ba, _ = drift_report(term_dist(c), term_dist(a))
    assert ab.collect()[0]["jsd"] == ba.collect()[0]["jsd"]  # symmetric

    r1, _ = drift_report(term_dist(a.repartition(5)), term_dist(c.repartition(3)))
    assert r1.collect()[0]["jsd"] == disj.collect()[0]["jsd"]


def test_hll_merge_equals_whole_and_accuracy(spark):
    """HLL properties: (1) sketch of a union == merge of shard
    sketches (the mergeability contract), (2) estimate within 3
    standard errors of exact, (3) layout-deterministic, (4) the
    linear-counting small-range branch engages for tiny cardinalities
    and is near-exact there."""
    from actyxos_data_flow_spark.operators.hll import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    items = spark.createDataFrame(
        [(f"g{i % 2}", f"item-{i % 500}") for i in range(3000)],
        "g string, item string",
    )
    whole = hll_registers(items, "item", "g")
    half_a = hll_registers(items.filter("substr(item, -1) IN ('0','1','2','3','4')"), "item", "g")
    half_b = hll_registers(items.filter("substr(item, -1) NOT IN ('0','1','2','3','4')"), "item", "g")
    merged = hll_merge(half_a, half_b, group_cols=("g",))
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))

    est = {r["g"]: r["hll_est"] for r in hll_estimate(whole, "g").collect()}
    exact = {r["g"]: r["n"] for r in items.groupBy("g").agg(
        __import__("pyspark.sql.functions", fromlist=["countDistinct"]).countDistinct("item").alias("n")
    ).collect()}
    for g, n in exact.items():
        assert abs(est[g] - n) <= 0.39 * n, (g, est[g], n)

    est2 = {r["g"]: r["hll_est"] for r in hll_estimate(
        hll_registers(items.repartition(7), "item", "g"), "g"
    ).collect()}
    assert est == est2

    tiny = spark.createDataFrame([("a", "x"), ("a", "y"), ("a", "z")], "g string, item string")
    tiny_est = hll_estimate(hll_registers(tiny, "item", "g"), "g").collect()[0]["hll_est"]
    assert abs(tiny_est - 3) < 0.2  # linear counting is near-exact here


def test_triangle_stats_known_graphs(spark):
    """K4 has 4 triangles; a star has none (skew case: one hub,
    orientation keeps the wedge join bounded); duplicated/reversed
    edges canonicalize away."""
    from actyxos_data_flow_spark.operators.graph import triangle_stats

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + k4  # dup + reversed
    df = spark.createDataFrame(noisy, "src long, dst long")
    r = triangle_stats(df).collect()[0]
    assert (r["nodes"], r["edges"], r["triangles"]) == (4, 6, 4)
    assert r["wedges"] == 12  # 4 nodes of degree 3 -> 4*C(3,2)
    assert r["clustering_fp6"] == 1_000_000

    star = spark.createDataFrame([(0, i) for i in range(1, 50)], "src long, dst long")
    s = triangle_stats(star).collect()[0]
    assert (s["triangles"], s["clustering_fp6"]) == (0, 0)
    assert s["wedges"] == 49 * 48 // 2


def test_hdr_quantile_sketch_properties(spark):
    """HDR sketch: merge == whole, estimate <= exact and within the
    2^-k relative bound at every probed quantile, layout-deterministic,
    and exact for values small enough to fit one bucket each."""
    from actyxos_data_flow_spark.operators.quantiles import (
        HDR_K,
        hdr_build,
        hdr_merge,
        hdr_quantiles,
    )

    vals = [(("a" if i % 3 else "b"), (i * 7919) % 100000 + 1) for i in range(5000)]
    df = spark.createDataFrame(vals, "g string, v long")
    whole = hdr_build(df, "v", "g")
    merged = hdr_merge(
        hdr_build(df.filter("v % 2 = 0"), "v", "g"),
        hdr_build(df.filter("v % 2 = 1"), "v", "g"),
        group_cols=("g",),
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))

    qs = [0.5, 0.9, 0.99]
    est = {(r["g"], r["q"]): r["est"] for r in hdr_quantiles(whole, qs, "g").collect()}
    import math

    by_g = {}
    for g, v in vals:
        by_g.setdefault(g, []).append(v)
    for g, xs in by_g.items():
        xs.sort()
        for q in qs:
            exact = xs[math.ceil(q * len(xs)) - 1]
            e = est[(g, q)]
            assert e <= exact
            assert (exact - e) * (1 << HDR_K) <= exact, (g, q, e, exact)

    est2 = {
        (r["g"], r["q"]): r["est"]
        for r in hdr_quantiles(hdr_build(df.repartition(9), "v", "g"), qs, "g").collect()
    }
    assert est == est2

    tiny = spark.createDataFrame([("t", v) for v in (1, 2, 3, 40)], "g string, v long")
    te = {r["q"]: r["est"] for r in hdr_quantiles(hdr_build(tiny, "v", "g"), [0.5, 0.99], "g").collect()}
    assert te[0.5] == 2 and te[0.99] == 40  # small values: bucket == value


def test_validation_rules_count_injected_violations(spark):
    """Each rule counts exactly the violations planted in the fixture;
    pass flips accordingly; NULL fks count as referential orphans."""
    from actyxos_data_flow_spark.operators.validate import Check, validation_report

    facts = spark.createDataFrame(
        [
            (1, 10, "A", 5.0),
            (1, 20, "A", -1.0),   # dup id, negative price
            (2, None, "X", 2.0),  # null fk, bad code
            (3, 99, "B", 0.0),    # orphan fk, zero price
        ],
        "id long, fk long, code string, price double",
    )
    dim = spark.createDataFrame([(10,), (20,)], "k long")
    from pyspark.sql import functions as F

    rep = {
        r["rule"]: (r["violations"], r["total"], r["pass"])
        for r in validation_report(
            Check(facts, "facts")
            .not_null("fk")
            .in_set("code", ["A", "B"])
            .satisfies("positive_price", F.col("price") > 0)
            .unique("id")
            .references("fk", dim, "k")
        ).collect()
    }
    assert rep["not_null(fk)"] == (1, 4, False)
    assert rep["in_set(code)"] == (1, 4, False)  # only 'X' violates
    assert rep["satisfies(positive_price)"] == (2, 4, False)  # -1.0 and 0.0
    assert rep["unique(id)"] == (1, 4, False)  # one surplus row for id=1
    assert rep["references(fk)"] == (2, 4, False)  # NULL fk + orphan 99


def test_validation_row_rules_single_scan(spark):
    """The row-local checklist compiles to ONE scan and one 1-row
    combine — no per-rule jobs, no extra shuffles."""
    from actyxos_data_flow_spark.operators.validate import Check
    from pyspark.sql import functions as F

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    rep = (
        Check(df, "lineitem")
        .in_range("l_quantity", 1, 50)
        .not_null("l_returnflag")
        .satisfies("positive_price", F.col("l_extendedprice") > 0)
        .report()
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange") <= 2  # partial->final combine only


def test_cms_join_estimate_one_sided(spark):
    """Inner-product join estimate never undershoots the exact join
    size, is layout-deterministic, and is exactly 0 for disjoint key
    sets that share no buckets... (collisions may still add mass, so
    only >= 0 is guaranteed there)."""
    from actyxos_data_flow_spark.operators.cms import cms_build, cms_join_estimate

    a = spark.createDataFrame([(str(i % 50),) for i in range(600)], "term string")
    b = spark.createDataFrame([(str(i % 80),) for i in range(400)], "term string")
    exact = a.join(b, "term").count()
    est = cms_join_estimate(cms_build(a), cms_build(b)).collect()[0]["est_pairs"]
    assert est >= exact

    est2 = cms_join_estimate(
        cms_build(a.repartition(7)), cms_build(b.repartition(3))
    ).collect()[0]["est_pairs"]
    assert est == est2


def test_hdr_weighted_build_equals_expanded(spark):
    """A weighted build over the pre-aggregated value distribution
    equals the unweighted build over the expanded rows (the cms_build
    weight contract carried over)."""
    from actyxos_data_flow_spark.operators.quantiles import hdr_build

    expanded = spark.createDataFrame(
        [("g", v) for v, n in [(7, 3), (100, 2), (5000, 4)] for _ in range(n)],
        "g string, v long",
    )
    weighted = spark.createDataFrame(
        [("g", 7, 3), ("g", 100, 2), ("g", 5000, 4)], "g string, v long, n long"
    )
    a = sorted(map(tuple, hdr_build(expanded, "v", "g").collect()))
    b = sorted(map(tuple, hdr_build(weighted, "v", "g", weight_col="n").collect()))
    assert a == b


def test_phrase_search_consecutive_only(spark):
    """Phrase matching requires CONSECUTIVE tokens in order: scattered
    or reversed occurrences don't match; multiple occurrences in one
    doc count individually; 3-term phrases chain the adjacency join."""
    from actyxos_data_flow_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "quick the brown fox"),       # reversed pair
            (3, "the slow quick brown thing"),  # "quick brown" present
            (4, "quick brown quick brown"),   # two occurrences
            (5, "quick stop brown"),          # scattered
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: (x["n_hits"], x["rank"]) for x in phrase_search(docs, ["quick", "brown"]).collect()}
    assert r == {4: (2, 1), 1: (1, 2), 3: (1, 3)}

    r3 = {x["doc_id"]: x["n_hits"] for x in phrase_search(docs, ["the", "quick", "brown"]).collect()}
    assert r3 == {1: 1}


def test_proximity_search_window_semantics(spark):
    """NEAR/k: order-free, gap-bounded, pair-counted; the same
    position never pairs with itself."""
    from actyxos_data_flow_spark.operators.retrieval import proximity_search

    docs = spark.createDataFrame(
        [
            (1, "alpha x x beta"),        # gap 3 -> within 5
            (2, "beta x x x x x alpha"),  # gap 6 -> outside
            (3, "alpha beta alpha"),      # pairs: (0,1) and (2,1) -> 2
            (4, "alpha only here"),
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x["n_pairs"] for x in proximity_search(docs, "alpha", "beta", window=5).collect()}
    assert r == {1: 1, 3: 2}


def test_epoch_schedule_budget_and_determinism(spark):
    """The mixing schedule's invariants: per-domain scheduled token mass
    lands within one document of the domain budget; epochs are dense
    0..n_epochs-1; the plan is identical under repartitioning."""
    import pyspark.sql.functions as F

    from actyxos_data_flow_spark.operators.text import epoch_schedule, mix_weights

    docs = spark.createDataFrame(
        [(i, f"d{i % 3}", 50 + (i * 37) % 120) for i in range(60)],
        "doc_id long, source string, n_chars long",
    )
    out = epoch_schedule(docs, group_col="source", size_col="n_chars").cache()
    # deterministic under partitioning
    out2 = epoch_schedule(docs.repartition(7), group_col="source", size_col="n_chars")
    assert rows(out) == rows(out2)
    # per-domain scheduled mass ~ budget: within one max-doc of the target
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    budget = total * 17 // 10
    w = {r["source"]: r["mix_weight_fp6"] / 1e6 for r in mix_weights(docs, "source").collect()}
    sched = {
        r["source"]: r["mass"]
        for r in out.groupBy("source").agg(F.sum("n_chars").alias("mass")).collect()
    }
    maxdoc = docs.agg(F.max("n_chars")).collect()[0][0]
    for s, mass in sched.items():
        dom_budget = int(budget * w[s] + 0.5)
        assert dom_budget - maxdoc <= mass <= dom_budget + maxdoc, (s, mass, dom_budget)
    # epochs dense per doc: every (doc, e) for e < n_epochs present exactly once
    per = out.groupBy("doc_id", "n_epochs").agg(
        F.count(F.lit(1)).alias("k"), F.countDistinct("epoch").alias("kd"),
        F.min("epoch").alias("lo"), F.max("epoch").alias("hi"),
    )
    bad = per.filter(
        (F.col("k") != F.col("n_epochs")) | (F.col("kd") != F.col("n_epochs"))
        | (F.col("lo") != 0) | (F.col("hi") != F.col("n_epochs") - 1)
    )
    assert bad.count() == 0
    out.unpersist()


def test_semantic_dedup_keeps_one_per_group(spark):
    """dedup_semantic contract on a hand-built corpus: near-identical
    vectors in one k-means cell collapse to the min-id representative;
    distant vectors survive; every group keeps exactly one."""
    import pyspark.sql.functions as F

    from actyxos_data_flow_spark.plans.similarity import SEMDEDUP_TAU
    from actyxos_data_flow_spark.operators.similarity import kmeans_fit
    from actyxos_data_flow_spark.operators.dedup import connected_components_star

    # 3 tight bundles of 3 + 3 loners, 8-dim
    import math

    def unit(seed, jitter):
        vals = [math.sin(seed * 7.3 + i) + jitter * math.cos(i * 3.1 + seed) for i in range(8)]
        n = math.sqrt(sum(v * v for v in vals))
        return [v / n for v in vals]

    # kmeans_fit seeds k=8 cells from the first 8 ids, so each bundle
    # must contain exactly ONE seed id: bundle A = {0, 8, 9}, bundle
    # B = {1, 10, 11}; ids 2..7 are loner seeds.
    data = [(0, unit(0, 0.0), 0), (1, unit(1, 0.0), 1)]
    for vid in range(2, 8):
        data.append((vid, unit(10 + 5 * vid, 0.0), vid))
    data += [(8, unit(0, 0.02), 0), (9, unit(0, 0.04), 0)]
    data += [(10, unit(1, 0.02), 1), (11, unit(1, 0.04), 1)]
    emb = spark.createDataFrame(data, "vec_id long, embedding array<double>, label int")

    # run the composed row's logic at its real threshold
    from actyxos_data_flow_spark.operators.similarity import semantic_near_pairs

    _, assign = kmeans_fit(emb)
    edges = semantic_near_pairs(emb, assign, tau=SEMDEDUP_TAU).select(
        F.col("ia").alias("id_a"), F.col("ib").alias("id_b")
    )
    comp = connected_components_star(edges)
    rep = F.coalesce(F.col("component"), F.col("vec_id"))
    out = assign.join(comp, assign["vec_id"] == comp["node"], "left").select(
        "vec_id", rep.alias("representative"), (rep == F.col("vec_id")).alias("is_kept")
    )
    got = {r["vec_id"]: (r["representative"], r["is_kept"]) for r in out.collect()}
    # bundle members share a representative = min id of their bundle,
    # and exactly one member survives per semantic group
    for base, members in ((0, (0, 8, 9)), (1, (1, 10, 11))):
        reps = {got[m][0] for m in members}
        assert reps == {base}, reps
        kept = [m for m in members if got[m][1]]
        assert kept == [base]
    # loners keep themselves
    for v in range(2, 8):
        assert got[v] == (v, True)


def test_jaccard_arrays_matches_exploded_and_falls_back(spark):
    """jaccard_on_pairs_arrays == jaccard_on_pairs on the same pairs
    (both formulations of exact set Jaccard), including through the
    above-threshold fallback path."""
    import pyspark.sql.functions as F
    from actyxos_data_flow_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    sh = D.shingles(docs)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 4)], "id_a long, id_b long"
    )
    base = D.jaccard_on_pairs(pairs, sh)
    sets = D.shingle_sets(sh)
    fast = D.jaccard_on_pairs_arrays(pairs, sets)
    fallback = D.jaccard_on_pairs_arrays(pairs, sets, max_broadcast_pairs=2)
    key = lambda df: sorted(  # noqa: E731
        (r.id_a, r.id_b, round(r.jaccard, 9)) for r in df.collect()
    )
    assert key(base) == key(fast) == key(fallback)
    # identical duplicates verify at jaccard 1.0
    j14 = dict(((r.id_a, r.id_b), r.jaccard) for r in fast.collect())[(1, 4)]
    assert j14 == 1.0


# -- prefix-filter similarity join (operators/dedup.py) --------------------


def test_prefix_filter_candidates_complete_and_tight(spark):
    from itertools import combinations

    from actyxos_data_flow_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # shares 4-shingle run with 2
            (2, "a b c d e g"),
            (3, "x y z w v u"),          # disjoint
            (4, "a b c d e f"),          # identical to 1
            (5, "p q r"),                # single shingle
            (6, "p q r"),                # identical to 5
        ],
        "doc_id long, text string",
    )
    sh = D.shingles(docs)
    got = set(
        tuple(r) for r in D.prefix_filter_candidates(sh, 7, 10).collect()
    )
    # brute-force truth at J >= 0.7 over the same shingle sets
    sets = {r["doc_id"]: set() for r in sh.select("doc_id").distinct().collect()}
    for r in sh.collect():
        sets[r["doc_id"]].add(r["shingle"])
    truth = set()
    for i, j in combinations(sorted(sets), 2):
        inter = len(sets[i] & sets[j])
        uni = len(sets[i] | sets[j])
        if 10 * inter >= 7 * uni:
            truth.add((i, j))
    assert truth <= got, f"prefix filter lost true pairs: {truth - got}"
    # the filter must also do real work: disjoint docs never pair
    assert all(3 not in p for p in got)


# -- bounded-depth BFS (operators/graph.py) --------------------------------


def test_bfs_distances_min_depth_and_isolated(spark):
    from actyxos_data_flow_spark.operators import graph as G

    # path 1-2-3-4-5 plus a shortcut 1-4; seed {1, 99} (99 isolated)
    fwd = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)], "src long, dst long"
    )
    edges = fwd.union(fwd.selectExpr("dst as src", "src as dst"))
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    got = {r.node: r.dist for r in G.bfs_distances(edges, seeds, 2).collect()}
    # min distance wins (4 via the shortcut, not the 3-hop path);
    # depth 2 excludes nothing here except nothing: 5 is 2 hops via 4
    assert got == {1: 0, 99: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    # depth 1 cuts the frontier
    got1 = {r.node: r.dist for r in G.bfs_distances(edges, seeds, 1).collect()}
    assert got1 == {1: 0, 99: 0, 2: 1, 4: 1}


# -- association-rule mining (operators/mining.py) -------------------------


def test_pair_rules_counts_and_basket_cap(spark):
    from actyxos_data_flow_spark.operators import mining as M

    tx = spark.createDataFrame(
        [
            (1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "b"),
            (4, "c"),
            (5, "x"), (5, "y"), (5, "z"),  # dropped by max_basket=2
            (1, "a"),                       # duplicate line, same basket
        ],
        "basket_id long, item string",
    )
    rules = {
        (r.item_a, r.item_b): r
        for r in M.pair_rules(tx, min_support=2, max_basket=2).collect()
    }
    # basket 1 (3 items) and basket 5 exceed the cap; only baskets
    # 2,3,4 survive -> N=3, a:2 b:2 c:1, pair (a,b) sup 2
    assert set(rules) == {("a", "b")}
    r = rules[("a", "b")]
    assert (r.sup_ab, r.sup_a, r.sup_b) == (2, 2, 2)
    assert r.conf_a_b_fp6 == 1_000_000 and r.conf_b_a_fp6 == 1_000_000
    assert r.lift_fp6 == 2 * 3 * 10**6 // (2 * 2)

    # without the cap, basket 1 pairs and min_support keeps {a,b},{a,c},{b,c}
    full = {
        (r.item_a, r.item_b): r.sup_ab
        for r in M.pair_rules(tx, min_support=2, max_basket=64).collect()
    }
    assert full == {("a", "b"): 3}


def test_prefix_filter_complete_on_random_corpus(spark):
    """Seeded-random completeness check: on 40 docs with overlapping
    vocabulary, the prefix filter must surface EVERY true >= 0.7-Jaccard
    pair (exact recall is the algorithm's whole claim vs MinHash)."""
    import random
    from itertools import combinations

    from actyxos_data_flow_spark.operators import dedup as D

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    base = [rng.choice(vocab) for _ in range(30)]
    for i in range(40):
        if i % 4 == 0:
            # near-copy of the base doc with light edits
            toks = list(base)
            for _ in range(rng.randrange(0, 4)):
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
        else:
            toks = [rng.choice(vocab) for _ in range(rng.randrange(8, 40))]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = D.shingles(docs)
    got = set(tuple(r) for r in D.prefix_filter_candidates(sh, 7, 10).collect())
    sets = {}
    for r in sh.collect():
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    truth = {
        (i, j)
        for i, j in combinations(sorted(sets), 2)
        if 10 * len(sets[i] & sets[j]) >= 7 * len(sets[i] | sets[j])
    }
    assert truth, "seed produced no true pairs — test would be vacuous"
    assert truth <= got, f"lost true pairs: {truth - got}"


def test_prefix_delta_invariant(spark):
    """IVM contract of the incremental prefix filter: candidates(base)
    restricted to base pairs, UNIONED with delta(batch), must cover
    exactly the true >= 0.7 pairs of the full corpus — i.e. the batch
    probe loses nothing and the base x base work never needed redoing.
    Same seeded corpus as the completeness test; batch = doc_id % 5."""
    import random
    from itertools import combinations

    from actyxos_data_flow_spark.operators import dedup as D

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    base_doc = [rng.choice(vocab) for _ in range(30)]
    for i in range(40):
        if i % 4 == 0:
            toks = list(base_doc)
            for _ in range(rng.randrange(0, 4)):
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
        else:
            toks = [rng.choice(vocab) for _ in range(rng.randrange(8, 40))]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = D.shingles(docs)
    new_ids = docs.filter("doc_id % 5 = 0").select("doc_id")
    delta = set(
        tuple(r) for r in D.prefix_filter_delta_candidates(sh, new_ids, 7, 10).collect()
    )
    # every delta candidate touches a batch doc
    assert all(i % 5 == 0 or j % 5 == 0 for i, j in delta)
    # exact recall of the delta slice: every TRUE >= 0.7 pair with a
    # batch endpoint is among the candidates
    sets = {}
    for r in sh.collect():
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    truth_delta = {
        (i, j)
        for i, j in combinations(sorted(sets), 2)
        if (i % 5 == 0 or j % 5 == 0)
        and 10 * len(sets[i] & sets[j]) >= 7 * len(sets[i] | sets[j])
    }
    assert truth_delta, "seed produced no true delta pairs — vacuous"
    assert truth_delta <= delta, f"delta probe lost pairs: {truth_delta - delta}"
    # and base-only candidates ∪ delta == full-corpus candidates' truth
    base_sh = D.shingles(docs.filter("doc_id % 5 != 0"))
    base_cand = set(
        tuple(r) for r in D.prefix_filter_candidates(base_sh, 7, 10).collect()
    )
    truth_all = {
        (i, j)
        for i, j in combinations(sorted(sets), 2)
        if 10 * len(sets[i] & sets[j]) >= 7 * len(sets[i] | sets[j])
    }
    assert truth_all <= (base_cand | delta)


def test_prefix_delta_probe_stored_order(spark):
    """The STORED-index probe (prefix_filter_delta_probe) keeps exact
    recall when the batch's prefixes are cut under the BASE corpus's
    rarity order — the any-shared-total-order property of the prefix
    lemma, including unseen batch shingles ranking rarest (df 0)."""
    import random
    from itertools import combinations

    from pyspark.sql import functions as F

    from actyxos_data_flow_spark.operators import dedup as D

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    base_doc = [rng.choice(vocab) for _ in range(30)]
    for i in range(40):
        if i % 4 == 0:
            toks = list(base_doc)
            for _ in range(rng.randrange(0, 4)):
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
        else:
            toks = [rng.choice(vocab) for _ in range(rng.randrange(8, 40))]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh_base = D.shingles(docs.filter("doc_id % 5 != 0"))
    sh_new = D.shingles(docs.filter("doc_id % 5 = 0"))
    df_base = sh_base.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    prefix_base = D._prefix_table(sh_base, df_base, 7, 10)
    delta = set(
        tuple(r)
        for r in D.prefix_filter_delta_probe(prefix_base, df_base, sh_new, 7, 10).collect()
    )
    assert all(i % 5 == 0 or j % 5 == 0 for i, j in delta)
    sets = {}
    for r in D.shingles(docs).collect():
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    truth_delta = {
        (i, j)
        for i, j in combinations(sorted(sets), 2)
        if (i % 5 == 0 or j % 5 == 0)
        and 10 * len(sets[i] & sets[j]) >= 7 * len(sets[i] | sets[j])
    }
    assert truth_delta, "seed produced no true delta pairs — vacuous"
    assert truth_delta <= delta, f"stored-order probe lost pairs: {truth_delta - delta}"


# -- label propagation (operators/graph.py) --------------------------------


def test_label_propagation_two_cliques(spark):
    from actyxos_data_flow_spark.operators import graph as G

    # two disjoint triangles: each settles to its min id (sync LPA can
    # legitimately oscillate across bridges — determinism, not
    # convergence, is the operator's contract)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "src long, dst long",
    )
    got = {r.node: r.community for r in G.label_propagation(edges, iters=3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}
    # deterministic: a second run reproduces the labeling exactly
    again = {r.node: r.community for r in G.label_propagation(edges, iters=3).collect()}
    assert again == got


def test_bounded_min_plus_relaxation(spark):
    from actyxos_data_flow_spark.operators import graph as G

    # 1 -5-> 2 -1-> 3 ; 1 -10-> 3 ; 3 -1-> 4: two rounds find 1->3 via
    # the cheap 2-hop path; the direct edge wins after ONE round only
    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 1), (1, 3, 10), (3, 4, 1)],
        "src long, dst long, cost long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    one = {r.node: r.cost for r in G.bounded_min_plus(edges, seeds, 1).collect()}
    assert one == {1: 0, 2: 5, 3: 10}
    two = {r.node: r.cost for r in G.bounded_min_plus(edges, seeds, 2).collect()}
    assert two == {1: 0, 2: 5, 3: 6, 4: 11}
    three = {r.node: r.cost for r in G.bounded_min_plus(edges, seeds, 3).collect()}
    assert three == {1: 0, 2: 5, 3: 6, 4: 7}


def test_kcore_prune_peels_tail(spark):
    from actyxos_data_flow_spark.operators import graph as G

    # a 4-clique with a pendant path 4-5-6: the path peels off in two
    # rounds, the clique (every degree 3) survives k=3 intact
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        "src long, dst long",
    )
    got = {r.node: r.deg for r in G.kcore_prune(edges, k=3, rounds=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # k=4: nothing has degree 4 -> empty
    assert G.kcore_prune(edges, k=4, rounds=3).count() == 0


# -- convergence early-exit (operators/graph.py, round-6) -------------------


def test_graph_convergence_early_exit(spark):
    """Bounded iterative ops stop at the fixpoint and report it, and the
    early-exited result equals the full-round bounded result."""
    from actyxos_data_flow_spark.operators import graph as G

    fwd = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    edges = fwd.union(fwd.selectExpr("dst as src", "src as dst"))
    seeds = spark.createDataFrame([(1,)], "node long")

    # BFS: graph exhausts after 3 hops; depth 10 must converge early
    info = {}
    d10 = {r.node: r.dist for r in G.bfs_distances(edges, seeds, 10, info=info).collect()}
    assert info["converged"] and info["rounds_run"] == 3
    d3 = {r.node: r.dist for r in G.bfs_distances(edges, seeds, 3).collect()}
    assert d10 == d3 == {1: 0, 2: 1, 3: 2, 4: 3}

    # Bellman-Ford: path costs settle after 3 relaxations
    we = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 1), (1, 3, 10), (3, 4, 1)],
        "src long, dst long, cost long",
    )
    info = {}
    c10 = {r.node: r.cost for r in G.bounded_min_plus(we, seeds, 10, info=info).collect()}
    assert info["converged"]
    assert c10 == {1: 0, 2: 5, 3: 6, 4: 7}
    # frontier-delta trajectory matches full relaxation at every bound
    for rounds in (1, 2, 3):
        got = {r.node: r.cost for r in G.bounded_min_plus(we, seeds, rounds).collect()}
        exp = {1: {1: 0, 2: 5, 3: 10}, 2: {1: 0, 2: 5, 3: 6, 4: 11},
               3: {1: 0, 2: 5, 3: 6, 4: 7}}[rounds]
        assert got == exp

    # LPA: two triangles settle in <= 2 rounds; iters=10 converges early
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "src long, dst long",
    )
    info = {}
    lab = {r.node: r.community for r in G.label_propagation(tri, iters=10, info=info).collect()}
    assert info["converged"]
    assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}

    # k-core: clique+pendant peels in 2 rounds; rounds=10 converges early
    kc = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        "src long, dst long",
    )
    info = {}
    core = {r.node: r.deg for r in G.kcore_prune(kc, k=3, rounds=10, info=info).collect()}
    assert info["converged"] and info["rounds_run"] <= 2
    assert core == {1: 3, 2: 3, 3: 3, 4: 3}


def test_hilbert_key_matches_classic_walk(spark):
    """hilbert_key replays the classic iterative xy2d walk exactly:
    bijective on a full grid, matches a plain-Python reference cell for
    cell, and is layout-independent."""
    from actyxos_data_flow_spark.operators.layout import hilbert_key

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    bits, n = 5, 32
    rows = [(a, b) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(rows, "a long, b long")
    keyed = {(r["a"], r["b"]): r["hkey"] for r in hilbert_key(df, "a", "b", bits=bits).collect()}
    assert keyed == {(a, b): xy2d(n, a, b) for a, b in rows}
    assert sorted(keyed.values()) == list(range(n * n))  # bijective
    keyed2 = {
        (r["a"], r["b"]): r["hkey"]
        for r in hilbert_key(df.repartition(7), "a", "b", bits=bits).collect()
    }
    assert keyed == keyed2


def test_hilbert_adjacency(spark):
    """The property Morton lacks: consecutive Hilbert indexes are
    ALWAYS grid neighbours (|Δa| + |Δb| = 1), so equal-size file cuts
    cover connected regions with tight bounding boxes."""
    from actyxos_data_flow_spark.operators.layout import hilbert_key

    bits, n = 4, 16
    rows = [(a, b) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(rows, "a long, b long")
    bykey = {r["hkey"]: (r["a"], r["b"]) for r in hilbert_key(df, "a", "b", bits=bits).collect()}
    for d in range(n * n - 1):
        (a1, b1), (a2, b2) = bykey[d], bykey[d + 1]
        assert abs(a1 - a2) + abs(b1 - b2) == 1, (d, bykey[d], bykey[d + 1])


def test_file_cut_stats_equal_files_and_invariance(spark):
    """file_cut_stats: whole key-groups never split, file sizes are
    balanced within a key-group's size, totals are preserved, and the
    assignment is independent of physical partitioning."""
    from actyxos_data_flow_spark.operators.layout import file_cut_stats, zorder_key

    rows = [(a % 50, (a * 7) % 40) for a in range(2000)]
    df = spark.createDataFrame(rows, "a long, b long")
    keyed = zorder_key(df, "a", "b", bits=6)
    st = file_cut_stats(keyed, "zkey", "a", "b", 8).collect()
    assert sum(r["cnt"] for r in st) == 2000
    assert len(st) <= 8 and len({r["file"] for r in st}) == len(st)
    st2 = file_cut_stats(zorder_key(df.repartition(11), "a", "b", bits=6), "zkey", "a", "b", 8).collect()
    assert sorted(map(tuple, st)) == sorted(map(tuple, st2))


def test_kmv_sketch_merge_and_estimate(spark):
    """KMV closure under union-of-sketches, exactness below k, and the
    estimator's 3-sigma envelope on a set larger than k."""
    from actyxos_data_flow_spark.operators.kmv import kmv_estimate, kmv_sketch

    small = spark.createDataFrame([(i,) for i in range(50)], "v long")
    sk = kmv_sketch(small, "v", k=256)
    est = kmv_estimate(sk, k=256).collect()[0]
    assert est["n_sk"] == 50 and est["est"] == 50  # below k: sketch IS the set

    big = spark.createDataFrame([(i,) for i in range(20000)], "v long")
    e = kmv_estimate(kmv_sketch(big, "v", k=256), k=256).collect()[0]
    assert abs(e["est"] - 20000) <= 3 * 20000 / (254 ** 0.5)

    # merge closure: k smallest of (sketch_A union sketch_B) equals the
    # sketch of (A union B)
    a = spark.createDataFrame([(i,) for i in range(0, 3000)], "v long")
    b = spark.createDataFrame([(i,) for i in range(1500, 4500)], "v long")
    from pyspark.sql import functions as F

    merged = (
        kmv_sketch(a, "v", k=64)
        .union(kmv_sketch(b, "v", k=64))
        .distinct()
        .orderBy(F.col("h").asc())
        .limit(64)
    )
    direct = kmv_sketch(a.union(b), "v", k=64)
    assert [r["h"] for r in merged.collect()] == [r["h"] for r in direct.collect()]


def test_priority_sample_estimates(spark):
    """Priority sampling: exact totals preserved, below-k degenerates
    to the exact answer (tau = 0 when the (k+1)-th priority does not
    exist), estimates deterministic across layouts."""
    from pyspark.sql import functions as F

    from actyxos_data_flow_spark.operators.kmv import priority_sample_estimates

    rows = [(i, "A" if i % 3 else "B", 100 + (i * 37) % 500) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, g string, w long")
    out = {
        r["g"]: r
        for r in priority_sample_estimates(
            df, "g", F.col("w"), ["id", "w"], k=256
        ).collect()
    }
    exact = {"A": sum(w for i, g, w in rows if g == "A"), "B": sum(w for i, g, w in rows if g == "B")}
    tot = sum(exact.values())
    for g, r in out.items():
        assert r["exact_cents"] == exact[g]
        # Szegedy 3-sigma bound, same cross-mult the query hashes
        assert (r["est_cents"] - exact[g]) ** 2 * 255 <= 9 * exact[g] * tot
        assert r["within_3se"]
    out2 = {
        r["g"]: r["est_cents"]
        for r in priority_sample_estimates(
            df.repartition(13), "g", F.col("w"), ["id", "w"], k=256
        ).collect()
    }
    assert out2 == {g: r["est_cents"] for g, r in out.items()}

    # below-k: 10 rows against k=256 -> the sample IS the population,
    # tau = 0, every subset estimate EXACT
    small = spark.createDataFrame(
        [(i, "A" if i % 2 else "B", 50 + i) for i in range(10)], "id long, g string, w long"
    )
    outs = {
        r["g"]: r
        for r in priority_sample_estimates(small, "g", F.col("w"), ["id", "w"], k=256).collect()
    }
    for g, r in outs.items():
        assert r["est_cents"] == r["exact_cents"], (g, r)
        assert r["within_3se"]


def test_priority_sample_overflow_guard_fires_once_per_group(spark):
    """The 2^33-cent envelope guard moved from a per-row CASE in the
    hot pri projection to a once-per-group aggregate assertion (r10
    warm-drift finding): it must still FAIL LOUDLY on any out-of-
    envelope weight, and leave in-envelope results untouched. Under
    ANSI mode (Spark 4 default) the w*2^30 multiply itself throws
    ARITHMETIC_OVERFLOW before the guard is reached — also loud; the
    aggregate guard is what protects NON-ANSI sessions where long math
    silently wraps."""
    import pytest
    from pyspark.sql import functions as F

    from actyxos_data_flow_spark.operators.kmv import priority_sample_estimates

    bad = spark.createDataFrame(
        [(1, "A", 10), (2, "A", (1 << 33) + 5), (3, "B", 20)],
        "id long, g string, w long",
    )
    with pytest.raises(Exception, match="(?i)overflow"):
        priority_sample_estimates(bad, "g", F.col("w"), ["id", "w"], k=8).collect()
    ok = spark.createDataFrame(
        [(1, "A", 10), (2, "A", (1 << 33) - 1), (3, "B", 20)],
        "id long, g string, w long",
    )
    got = {
        r["g"]: r["exact_cents"]
        for r in priority_sample_estimates(ok, "g", F.col("w"), ["id", "w"], k=8).collect()
    }
    assert got == {"A": 10 + (1 << 33) - 1, "B": 20}


def test_priority_sample_guard_survives_column_pruning(spark):
    """ADVICE r11: the guard used to ride only exact_cents, so a
    consumer selecting just est_cents (or n_in_sample, or within_3se)
    let Catalyst prune the guarded column and the wrapped pri silently
    corrupted the estimate. Every numeric output column now carries its
    own guard — any single-column projection still fails loudly."""
    import pytest
    from pyspark.sql import functions as F

    from actyxos_data_flow_spark.operators.kmv import priority_sample_estimates

    bad = spark.createDataFrame(
        [(1, "A", 10), (2, "A", (1 << 33) + 5), (3, "B", 20)],
        "id long, g string, w long",
    )
    out = priority_sample_estimates(bad, "g", F.col("w"), ["id", "w"], k=8)
    for col in ("est_cents", "n_in_sample", "within_3se", "exact_cents"):
        with pytest.raises(Exception, match="(?i)overflow"):
            out.select(col).collect()


def test_modularity_two_cliques(spark):
    """Newman Q computed by the graph_modularity algebra on a known
    graph: two 4-cliques joined by one bridge — LPA finds the cliques
    and Q matches the hand computation."""
    from pyspark.sql import functions as F

    from actyxos_data_flow_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a + 10, b + 10) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(c1 + c2 + [(0, 10)], "src long, dst long")
    labels = label_propagation(edges, iters=3)
    und = (
        edges.select(F.col("src").alias("s"), F.col("dst").alias("p"))
        .unionByName(edges.select(F.col("dst").alias("s"), F.col("src").alias("p")))
        .distinct()
    )
    M = und.count()            # 2m = 26
    la = {r["node"]: r["community"] for r in labels.collect()}
    assert len(set(la.values())) == 2  # the two cliques
    ic = sum(
        1
        for r in und.collect()
        if la[r["s"]] == la[r["p"]]
    )
    deg = {r["s"]: r["cnt"] for r in und.groupBy("s").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    from collections import defaultdict

    dc = defaultdict(int)
    for n, d in deg.items():
        dc[la[n]] += d
    num = M * ic - sum(v * v for v in dc.values())
    q = num / (M * M)
    # two equal cliques with one bridge: Q = 24/26 - 2*(13/26)^2 = 0.4231
    assert abs(q - (ic / M - sum((v / M) ** 2 for v in dc.values()))) < 1e-12
    assert 0.40 < q < 0.45
