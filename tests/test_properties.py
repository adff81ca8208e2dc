"""Property-based invariants (hypothesis) for the operators whose
correctness is algebraic rather than example-shaped: chunk coverage /
reconstruction, packing arithmetic, and the delta algebra's diff/apply
roundtrip. Examples are kept small — each one runs real Spark jobs."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from actyxos_data_flow_spark import delta as DL
from actyxos_data_flow_spark.operators import text as X

SET = settings(max_examples=12, deadline=None)


@given(
    n=st.integers(3, 40),
    size=st.integers(2, 12),
    data=st.data(),
)
@SET
def test_chunk_covers_every_token_and_overlaps_exactly(spark, n, size, data):
    overlap = data.draw(st.integers(0, size - 1))
    toks = [f"w{i}" for i in range(1, n + 1)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        (r.chunk_id, r.chunk_text.split(" "))
        for r in X.chunk(df, size=size, overlap=overlap).collect()
    )
    stride = size - overlap
    # every chunk is the expected slice
    for cid, chunk_toks in rows:
        start = cid * stride
        assert chunk_toks == toks[start : start + size]
    # coverage: every token appears in some chunk
    covered = {t for _, ct in rows for t in ct}
    assert covered == set(toks)
    # reconstruction: first chunk + each successor minus its overlap
    rebuilt = list(rows[0][1])
    for _, ct in rows[1:]:
        rebuilt.extend(ct[overlap:])
    assert rebuilt == toks


@given(
    lengths=st.lists(st.integers(1, 50), min_size=1, max_size=12),
    budget=st.integers(4, 64),
)
@SET
def test_pack_matches_arithmetic_replica(spark, lengths, budget):
    df = spark.createDataFrame(
        [("s", i, ln) for i, ln in enumerate(lengths)],
        "lang string, doc_id long, n_tokens long",
    )
    got = {
        r.doc_id: (r.bin_id, r.bin_offset)
        for r in X.pack_sequences(df, budget=budget).collect()
    }
    start = 0
    for i, ln in enumerate(lengths):
        assert got[i] == (start // budget, start % budget)
        assert 0 <= got[i][1] < budget
        start += ln


@given(
    old=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 2)), max_size=10),
    new=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 2)), max_size=10),
)
@SET
def test_snapshot_diff_apply_roundtrip(spark, old, new):
    """apply_delta(old, snapshot_diff(old, new)) == new as MULTISETS —
    the identity the whole IVM loop rests on, for arbitrary overlap."""
    schema = "k int, v int"
    old_df = spark.createDataFrame(old, schema) if old else spark.createDataFrame([], schema)
    new_df = spark.createDataFrame(new, schema) if new else spark.createDataFrame([], schema)
    d = DL.snapshot_diff(old_df, new_df)
    applied = DL.apply_delta(old_df, d)
    assert Counter(map(tuple, applied.collect())) == Counter(map(tuple, new))
    # and the diff of identical snapshots is empty
    assert DL.snapshot_diff(new_df, new_df).count() == 0


# hypothesis corpora for the LSH edit-delta invariant: small docs from a
# tiny vocabulary force plenty of band collisions, edits/deletes/inserts
# drawn adversarially
_WORDS = [f"p{i}" for i in range(8)]
_doc_text = st.lists(st.sampled_from(_WORDS), min_size=3, max_size=8).map(" ".join)


@given(
    base=st.dictionaries(st.integers(1, 8), _doc_text, min_size=2, max_size=6),
    data=st.data(),
)
@SET
def test_lsh_edit_delta_apply_invariant_property(spark, base, data):
    """For ANY base corpus and ANY mix of edits/deletes/inserts:
    apply(pairs(B), edit_delta) == pairs(B') and the delta never
    mentions a pair of two unaffected docs."""
    from actyxos_data_flow_spark.operators import dedup as D

    ids = sorted(base)
    edit_ids = data.draw(st.sets(st.sampled_from(ids), max_size=2))
    del_ids = data.draw(st.sets(st.sampled_from(ids), max_size=2)) - edit_ids
    ins = data.draw(st.dictionaries(st.integers(100, 104), _doc_text, max_size=2))
    edits = {i: data.draw(_doc_text) for i in edit_ids}
    edits.update(ins)

    mk = lambda d: spark.createDataFrame(  # noqa: E731
        sorted(d.items()), "doc_id long, text string"
    )
    new_state = {i: t for i, t in base.items() if i not in del_ids}
    new_state.update(edits)

    sig = lambda d: D.minhash_signatures(D.shingles(mk(d)))  # noqa: E731
    pairs = lambda d: {  # noqa: E731
        (r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sig(d)).collect()
    }
    old_pairs, new_pairs = pairs(base), pairs(new_state)
    removed_df = spark.createDataFrame([(i,) for i in sorted(del_ids)] or [(None,)], "doc_id long").dropna()
    delta = {
        (r.id_a, r.id_b): r.mult
        for r in D.lsh_edit_delta_pairs(sig(base), sig(edits) if edits else sig({}), removed_df).collect()
    }
    applied = (old_pairs | {p for p, m in delta.items() if m == 1}) - {
        p for p, m in delta.items() if m == -1
    }
    assert applied == new_pairs
    affected = set(edits) | del_ids
    for a, b in delta:
        assert a in affected or b in affected


@given(keys=st.sets(st.text(min_size=1, max_size=12), min_size=1, max_size=30))
@SET
def test_bloom_never_false_negative_property(spark, keys):
    """For ANY key set: every inserted key tests positive (the
    guarantee the verified consumers depend on for bit-identical
    results)."""
    from actyxos_data_flow_spark.operators import bloom as B

    df = spark.createDataFrame([(k,) for k in sorted(keys)], "shingle string")
    dense = B.bloom_dense(B.bloom_build(df, "shingle", 1 << 12, 3), 1 << 12)
    assert df.filter(~B.bloom_contains(F.col("shingle"), dense, 1 << 12, 3)).count() == 0
