#!/usr/bin/env python
"""Mechanized numeric-hazard lint over the oracle registry.

Round 7 lesson: ``round(double, k)`` inside a HASHED column is not
portable across engine builds. Two sub-classes, by how reachable the
half-boundary is:

- ``rational`` — round() over a quotient of exact integers (counts,
  sums of decimals). The argument can land EXACTLY on a k-dp
  half-boundary (e.g. i/u with u | 2·10^k), where the two engines'
  double-round implementations legitimately disagree. This is the
  class that failed in the round-7 driver run (dedup_source_matrix)
  and it is ALWAYS convertible to integer fixed-point
  ((i·10^k) DIV u). Policy: convert; allow-listing needs a proof the
  boundary is unreachable or the value is not hashed.
- ``libm`` — round() over exp/ln/pow/sqrt-derived values. The argument
  is irrational ⇒ never exactly ON a boundary, but a few-ulp libm
  difference can cross one when the true value is within ~1e-16 of
  it. Unprovable in general; allow-listed individually with the
  empirical margin argument (and converted where a finite input grid
  makes a scan possible — see operators/classifier.py's sigmoid).

This tool scans every registered oracle's SQL (and the final SELECT of
the Spark plan can be assumed symmetric — the repo's convention is
shared formula text), reports findings, and exits non-zero if any
finding is not covered by ALLOWLIST. tests/test_lint_numeric.py runs
it in pytest, so a new query with an unjustified hazard fails CI.

Usage: python tools/lint_numeric.py [--json]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_LIBM = re.compile(r"\b(exp|ln|log|log2|log10|pow|sqrt)\s*\(", re.I)


def _balanced_arg(sql: str, open_paren: int) -> str:
    """Return the text inside the paren opening at ``open_paren``."""
    depth = 0
    for i in range(open_paren, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return sql[open_paren + 1 : i]
    return sql[open_paren + 1 :]


def scan_sql(sql: str) -> list[dict]:
    """All round(...) sites in ``sql``, classified."""
    out = []
    for m in re.finditer(r"\bround\s*\(", sql, re.I):
        arg = _balanced_arg(sql, m.end() - 1)
        # strip the trailing ", k" digit count if present
        body = arg.rsplit(",", 1)[0] if re.search(r",\s*\d+\s*$", arg) else arg
        if _LIBM.search(body):
            kind = "libm"
        elif "/" in body:
            kind = "rational"
        else:
            # round of a product/sum of already-fixed-dp decimals —
            # exact values CAN sit on half-boundaries too
            kind = "decimal-arith"
        snippet = " ".join(body.split())[:90]
        out.append({"kind": kind, "snippet": snippet})
    return out


# Rule-based allowlist: (query_regex, snippet_regex, justification).
# Every finding must match a rule; anything else fails the lint. Rules
# are deliberately NARROW — a new query that introduces a round() site
# must either convert to fixed-point or add a rule with a margin
# argument the reviewer can check.
#
# Standing justifications used below:
# [libm]     the rounded value is irrational (ln/exp/pow/sqrt in its
#            lineage) — never exactly ON a k-dp half-boundary; a split
#            needs the true value within ~1e-16 of one AND a libm build
#            divergence at that input. Empirically stable across both
#            observed environments for 8 rounds; not provable, watched.
# [sqrt-norm] cosine = dot/(sqrt(na)·sqrt(nb)): the denominator is
#            sqrt-derived, so the quotient is irrational → [libm].
# [assoc]    an unordered double sum feeds the round (engines may
#            associate differently). For 64-dim unit-scale embeddings
#            the association error is ≲1e-13 while 6dp half-boundaries
#            are ≥5e-7 away for irrational sums → same watch class.
# [on-grid]  the argument is exactly ON the k-dp grid (integer cents /
#            100 at 2dp; a DECIMAL(·,7) exact sum re-rendered at 7dp):
#            nearest-boundary distance is a half-grid-step, ≫ any ulp
#            drift, so round() is an exact re-rendering — safe.
ALLOWLIST: list[tuple[str, str, str]] = [
    # ANN family: shared cosine / k-means-distance / ADC kernels
    (r"^(ann_|kmeans_cells|dedup_embedding|dedup_crossmodal|embedding_centroid|dedup_semantic|retrieval_eval_ndcg)",
     r"cosine|dot\s*/|dq /|sum\(\(v\.a - c\.c\)|sum\(q\.a \* c\.c\)|sum\(x\.a \* c\.c\)",
     "[sqrt-norm]+[assoc] cosine/centroid-distance kernels"),
    (r"^(ann_|kmeans_cells|dedup_semantic|dedup_embedding|embedding_centroid)",
     r"^v\.a$|unnest\(embedding\)|max\(scale\) \* sum\(a\*b\)|sum\(x\.a \* r\.c\)",
     "[assoc] quantizer reconstruction / SQ8-scaled / ADC dots: 6dp round of double products"),
    # BM25: idf is ln-derived upstream, the whole score is [libm]
    (r"^(bm25_|hybrid_rrf|index_postings_stats)",
     r"ln\(\(.*df \+ 0\.5\)|i\.idf \* q\.tf",
     "[libm] BM25 idf = ln of half-integer ratio; tf·idf inherits it"),
    # LM / PMI / Zipf / link prediction / JSD: ln-derived scores
    (r"^(text_lm_score|text_lm_score_bigram|text_pmi_collocations|text_zipf_fit|graph_link_prediction)",
     r"ln\(", "[libm] ln-derived score, per-item rounded into exact integer/DECIMAL sums"),
    (r"^corpus_drift", r"ln\(|0\.5 \* \(CASE WHEN cb > 0",
     "[libm] JSD contribution x·ln(x/m)"),
    (r"^corpus_drift_jsd", r"^contrib$|CAST\(sum\(CAST\(round\(contrib",
     "[on-grid] re-render of the exact DECIMAL(20,7) contribution sum"),
    # decay / RMS / mixing temperature: exp/sqrt/pow
    (r"^events_decay_score", r"exp\(-|^value$",
     "[libm] exp decay weight rounded 7dp per item, then exact DECIMAL sum"),
    (r"^rolling_hourly_avg", r"^value$",
     "[on-grid] 2dp source value re-rendered at input rounding"),
    (r"^mm_audio_rms", r"sqrt\(", "[libm] RMS sqrt"),
    (r"^(source_mix_weights|mix_epoch_schedule|pipeline_mix_batches)", r"pow\(",
     "[libm] share^alpha rounded 6dp then carried as fp6 INTEGER (only pow touches doubles)"),
    # TF-IDF: idf ln-derived; cosine norms sqrt-derived
    (r"^dedup_tfidf_cosine", r"ln\(|d\.dot / \(na\.norm \* nb\.norm\)",
     "[libm]+[sqrt-norm] idf and norm-quotient"),
    # HLL estimator: range-correction branches (ln) + bias constants
    (r"^(sketch_hll_cardinality|table_stats_ndv|windowed_distinct_hll_replay)",
     r"3\.3481578363545783e\+21|abs\(e\.hll_est",
     "[libm] HLL harmonic estimate / linear-counting ln branch; error column is |int-int|"),
    # HDR quantiles: integer cents re-rendered at 2dp
    (r"^sketch_hdr_quantiles", r"/ 100\.0|l_extendedprice \* 100",
     "[on-grid] integer cents / 100 sits exactly ON the 2dp grid"),
]

_RULES = [(re.compile(q), re.compile(sn, re.I), j) for q, sn, j in ALLOWLIST]


def _allowed(query: str, snippet: str) -> bool:
    return any(qr.search(query) and sr.search(snippet) for qr, sr, _ in _RULES)


def run() -> tuple[list[dict], list[dict]]:
    from actyxos_data_flow_spark.plans import load_all

    findings, violations = [], []
    specs = {n: s.oracle for n, s in load_all().items() if s.oracle}
    for name, sql in sorted(specs.items()):
        for f in scan_sql(sql):
            f = {"query": name, **f}
            findings.append(f)
            if not _allowed(name, f["snippet"]):
                violations.append(f)
    return findings, violations


def main() -> int:
    findings, violations = run()
    if "--json" in sys.argv:
        print(json.dumps({"findings": findings, "violations": violations}, indent=1))
    else:
        print(f"{len(findings)} round() sites in oracle SQL; "
              f"{len(violations)} NOT allow-listed")
        for v in violations:
            print(f"  VIOLATION {v['query']} [{v['kind']}]: {v['snippet']}")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
