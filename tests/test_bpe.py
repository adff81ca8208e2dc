"""BPE trainer/encoder unit tests (operators/bpe.py). The oracle gate
(bpe_merges / bpe_token_stats) certifies the training trajectory against
DuckDB's independent window-arithmetic formulation; these tests pin the
fold semantics against a plain-Python reference and the operator-level
contracts."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from actyxos_data_flow_spark.operators import bpe as B


def _py_merge(syms: list[str], l: str, r: str) -> list[str]:
    """Reference leftmost-nonoverlapping merge."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_merge_fold_matches_reference_cases(spark):
    cases = [
        (["e", "r", "r", "o", "r"], "e", "r"),
        (["h", "e", "r", "r"], "e", "r"),
        (["a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a", "a"], "a", "a"),
        (["c", "a", "t"], "x", "y"),
        (["x"], "x", "y"),
        ([], "x", "y"),
        (["ab", "b", "ab", "b"], "ab", "b"),
    ]
    df = spark.createDataFrame(
        [(i, syms, l, r) for i, (syms, l, r) in enumerate(cases)],
        "i int, syms array<string>, l string, r string",
    )
    got = {
        row["i"]: list(row["m"])
        for row in df.select(
            "i", B.merge_fold(F.col("syms"), F.col("l"), F.col("r")).alias("m")
        ).collect()
    }
    for i, (syms, l, r) in enumerate(cases):
        assert got[i] == _py_merge(syms, l, r), (syms, l, r, got[i])


@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab"]), max_size=12),
    pair=st.tuples(st.sampled_from(["a", "b", "ab"]), st.sampled_from(["a", "b", "ab"])),
)
@settings(max_examples=15, deadline=None)
def test_merge_fold_matches_reference_property(spark, syms, pair):
    l, r = pair
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    got = list(df.select(B.merge_fold(F.col("syms"), l, r).alias("m")).collect()[0]["m"])
    assert got == _py_merge(syms, l, r)


def test_bpe_train_learns_expected_merge(spark):
    """'aa' dominating the corpus: first merge must be (a, a) with the
    exact weighted pair count, and re-running training is identical."""
    docs = spark.createDataFrame(
        [(1, "aaa aaa bb"), (2, "aaa bb cc")],
        "doc_id long, text string",
    )
    merges = B.bpe_train(docs, n_merges=2)
    # 'aaa' freq 3 contributes 2 (a,a) pairs each → 6
    assert merges[0][1:] == ("a", "a", 6)
    assert merges == B.bpe_train(docs, n_merges=2)


def test_bpe_encode_words_applies_ranked_merges(spark):
    docs = spark.createDataFrame([(1, "abab abab abab")], "doc_id long, text string")
    merges = B.bpe_train(docs, n_merges=3)
    enc = B.bpe_encode_words(spark.createDataFrame([("abab",)], "word string"), merges)
    row = enc.collect()[0]
    # 'abab' + sentinel collapses under 3 merges learned from itself
    assert row["n_bpe"] <= 3
    assert row["bpe_syms"][-1].endswith(B.END_MARK) or row["bpe_syms"][-1] == B.END_MARK


def test_corpus_stats_consistency(spark):
    """bpe_tokens is bounded by chars + words (no merges can expand)
    and ws_tokens/chars match direct computation."""
    docs = spark.createDataFrame(
        [(1, "the cat sat", "en"), (2, "le chat", "fr")],
        "doc_id long, text string, lang string",
    )
    merges = B.bpe_train(docs, n_merges=2)
    out = {r["lang"]: r for r in B.bpe_corpus_stats(docs, merges).collect()}
    assert out["en"]["ws_tokens"] == 3 and out["fr"]["ws_tokens"] == 2
    assert out["en"]["chars"] == len("thecatsat")
    for r in out.values():
        assert r["bpe_tokens"] <= r["chars"] + r["ws_tokens"]
        assert r["bpe_tokens"] >= r["ws_tokens"]  # ≥ one symbol per word


def test_bpe_train_empty_and_degenerate_corpora(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert B.bpe_train(empty, n_merges=3) == []
    # single 1-char word: only pair is (char, sentinel)
    one = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    merges = B.bpe_train(one, n_merges=3)
    assert merges[0][1:] == ("a", B.END_MARK, 1)
    enc = B.bpe_encode_words(spark.createDataFrame([("a",)], "word string"), merges)
    assert enc.collect()[0]["n_bpe"] == 1


def test_bpe_train_topr_r1_degenerates_to_classic(spark):
    """With r=1 the batched trainer IS the classic sequential trainer —
    same candidates, same tie rule, one accept per round."""
    docs = spark.createDataFrame(
        [(1, "abc abc abd xy xy xy xy"), (2, "abc xy abd abd")],
        "doc_id long, text string",
    )
    assert B.bpe_train_topr(docs, n_merges=4, r=1) == B.bpe_train(docs, n_merges=4)


def test_bpe_train_topr_accepts_disjoint_batches(spark):
    """Top-R fills the merge budget in ceil(n/r) rounds when the top
    pairs are symbol-disjoint, and each accepted pair's recorded count
    is its true pre-round count (disjoint merges cannot create, destroy
    or shift each other's occurrences)."""
    docs = spark.createDataFrame(
        [(1, "ab ab ab cd cd ef")], "doc_id long, text string"
    )
    m = B.bpe_train_topr(docs, n_merges=3, r=3)
    assert [(r, l_, rt) for r, l_, rt, _ in m][:3] == [(0, "a", "b"), (1, "c", "d"), (2, "e", "f")]
    assert [c for *_, c in m] == [3, 2, 1]


# -- WordPiece -------------------------------------------------------------


def _py_wordpiece(texts: list[str], n_merges: int) -> list[tuple]:
    """Plain-Python reference of the WordPiece trajectory: word-type
    freqs, per-round weighted symbol/pair counts, exact integer score
    (c*10^9)//nl//nr, winner by (score DESC, c DESC, l, r)."""
    from collections import Counter

    wf = Counter(w for t in texts for w in t.split(" ") if w)
    syms = {w: list(w) + [B.END_MARK] for w in wf}
    out = []
    for rank in range(n_merges):
        sc: Counter = Counter()
        pc: Counter = Counter()
        for w, f in wf.items():
            s = syms[w]
            for x in s:
                sc[x] += f
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        scored = [
            ((c * B.WP_SCORE_SCALE) // sc[l] // sc[r], c, l, r)
            for (l, r), c in pc.items()
        ]
        # ties on (score, c) break to the SMALLEST (l, r)
        best_sc = max((t[0], t[1]) for t in scored)
        score, c, l, r = min((t for t in scored if (t[0], t[1]) == best_sc), key=lambda t: (t[2], t[3]))
        out.append((rank, l, r, c, score))
        for w in syms:
            syms[w] = _py_merge(syms[w], l, r)
    return out


def test_wordpiece_matches_python_reference(spark):
    texts = ["the cat sat on the mat", "a cat and a rat", "the bat", "zz zz qx"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = B.wordpiece_train(docs, n_merges=5)
    assert got == _py_wordpiece(texts, 5)


def test_wordpiece_prefers_associated_over_frequent(spark):
    """'ab' is the most FREQUENT pair, but q/x appear ONLY together —
    BPE's first merge is (a,b); WordPiece's likelihood score picks the
    perfectly-associated rare pair (q,x) first."""
    docs = spark.createDataFrame(
        [(1, "ab ab ab ab ab ab ab ab qx qx")], "doc_id long, text string"
    )
    bpe0 = B.bpe_train(docs, n_merges=1)[0]
    wp0 = B.wordpiece_train(docs, n_merges=1)[0]
    assert (bpe0[1], bpe0[2]) == ("a", "b")
    assert (wp0[1], wp0[2]) == ("q", "x")


def test_wordpiece_deterministic_and_encodable(spark):
    docs = spark.createDataFrame(
        [(1, "abab abab cdcd"), (2, "abab cdcd cdcd xy")],
        "doc_id long, text string",
    )
    m1 = B.wordpiece_train(docs, n_merges=4)
    assert m1 == B.wordpiece_train(docs, n_merges=4)
    enc = B.bpe_encode_words(spark.createDataFrame([("abab",), ("cdcd",)], "word string"), m1)
    rows = {r["word"]: r["n_bpe"] for r in enc.collect()}
    assert all(1 <= n <= 5 for n in rows.values())


# -- Unigram LM (SentencePiece-style) ---------------------------------------


def test_unigram_viterbi_matches_python_reference(spark):
    """ulm_train's full trajectory (seed counts, integer lp, Viterbi
    paths, usage counts) equals a plain-Python re-derivation."""
    from collections import Counter

    from actyxos_data_flow_spark.functions.intlog import py_ilog2_fp20
    from actyxos_data_flow_spark.operators import unigram as U

    texts = ["the theme thesis", "he she the the", "seesaw sea sea see"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    wf = Counter(w for t in texts for w in t.split(" ") if w and len(w) <= U.ULM_MAX_WORD)
    pc: Counter = Counter()
    for w, f in wf.items():
        for s in range(len(w)):
            for l in range(1, U.ULM_MAX_PIECE + 1):
                if s + l <= len(w):
                    pc[w[s : s + l]] += f
    top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[: U.ULM_SEED_TOP]
    voc = dict(top)
    voc.update({p: c for p, c in pc.items() if len(p) == 1})
    total = sum(voc.values())
    lp = {p: py_ilog2_fp20(c, total) for p, c in voc.items()}

    def viterbi(w):
        best = {0: 0}
        for j in range(1, len(w) + 1):
            cands = []
            for i in range(max(0, j - U.ULM_MAX_PIECE), j):
                piece = w[i:j]
                if piece in voc and i in best:
                    cands.append((best[i] + lp[piece], i, piece))
            # (score DESC, frm ASC)
            sc, i, piece = sorted(cands, key=lambda t: (-t[0], t[1]))[0]
            best[j] = sc
        # backtrack with the same tie rule
        pieces, pos = [], len(w)
        while pos > 0:
            cands = []
            for i in range(max(0, pos - U.ULM_MAX_PIECE), pos):
                piece = w[i:pos]
                if piece in voc and i in best:
                    cands.append((best[i] + lp[piece], i, piece))
            _, i, piece = sorted(cands, key=lambda t: (-t[0], t[1]))[0]
            pieces.append(piece)
            pos = i
        return pieces

    used: Counter = Counter()
    for w, f in wf.items():
        for p in viterbi(w):
            used[p] += f

    expect = sorted(
        ((p, voc[p], used.get(p, 0), lp[p]) for p in voc),
        key=lambda t: (-t[2], t[0]),
    )[: U.ULM_VOCAB_TOP]
    got = [
        (r["piece"], r["seed_cnt"], r["used_cnt"], r["lp_fp20"])
        for r in U.ulm_train(docs).orderBy("rank").collect()
    ]
    assert got == expect


def test_unigram_single_chars_guarantee_coverage(spark):
    """A word made of rare characters still segments (single-char
    pieces are always in the vocabulary), and total used piece length
    reconstructs every word exactly."""
    from actyxos_data_flow_spark.operators import unigram as U

    docs = spark.createDataFrame(
        [(1, "zzzz qqq xyxy xyxy common common common")], "doc_id long, text string"
    )
    wf = U.ulm_word_freqs(docs)
    voc, _ = U.ulm_vocab(wf)
    seg = U.ulm_segment(wf, voc)
    from pyspark.sql import functions as F

    rec = (
        seg.groupBy("word")
        .agg(F.sum(F.length("piece")).alias("plen"))
        .join(wf, "word")
        .filter(F.col("plen") != F.length("word"))
    )
    assert rec.count() == 0
