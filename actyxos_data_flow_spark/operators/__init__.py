"""Scale-extension operators beyond the reference's own surface:
deduplication, similarity search, text analysis, multimodal plumbing.

These are first-class components of the engine (BASELINE.json north
star): the operations a large-scale training-data pipeline needs,
designed for 100 TB inputs (inverted-index joins instead of cross
products, LSH banding instead of pairwise comparison, broadcast of
candidate sets, no driver-side loops).
"""

from . import (  # noqa: F401, E402
    bloom,
    bpe,
    classifier,
    cms,
    codecs,
    dedup,
    drift,
    graph,
    hll,
    layout,
    multimodal,
    profile,
    quantiles,
    retrieval,
    similarity,
    skew,
    temporal,
    text,
    validate,
)

__all__ = [
    "bloom", "bpe", "classifier", "cms", "codecs", "dedup", "drift",
    "graph", "hll", "layout", "multimodal", "profile", "quantiles",
    "retrieval", "similarity", "skew", "temporal", "text", "validate",
]
