"""Content-defined chunking (operators/text.cdc_chunks): boundary
re-synchronization — the property exact digests and shingles both lack
— plus reconstruction and edge cases."""

from __future__ import annotations

from actyxos_data_flow_spark.operators.text import CDC_WINDOW, cdc_chunks


def _chunks(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in cdc_chunks(df).collect():
        out.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"], r["chunk_digest"]))
    return {k: [c for _, c, _ in sorted(v)] for k, v in out.items()}, {
        k: [d for _, _, d in sorted(v)] for k, v in out.items()
    }


def test_chunks_reconstruct_and_short_texts(spark):
    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [(1, base), (2, "ab"), (3, "x" * (CDC_WINDOW - 1)), (4, "y" * CDC_WINDOW)]
    chunks, _ = _chunks(spark, rows)
    assert "".join(chunks[1]) == base  # lossless split
    assert chunks[2] == ["ab"] and chunks[3] == ["x" * (CDC_WINDOW - 1)]
    assert "".join(chunks[4]) == "y" * CDC_WINDOW


def test_boundaries_resynchronize_after_prefix_edit(spark):
    """Insert text at the FRONT of a document: offset-based chunking
    would shift every boundary; content-defined boundaries re-align, so
    the edited copy shares most chunk digests with the original."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 30
    edited = "INSERTED PREFIX >> " + base
    chunks, digests = _chunks(spark, [(1, base), (2, edited)])
    assert len(chunks[1]) >= 5, "corpus text too short to exercise chunking"
    shared = set(digests[1]) & set(digests[2])
    # everything after the first re-synchronized boundary is shared
    assert len(shared) >= len(set(digests[1])) - 2, (
        len(shared), len(set(digests[1])), len(set(digests[2]))
    )
