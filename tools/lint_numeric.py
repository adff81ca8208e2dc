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

Round 8 added two more hazard classes (both split in the round-8
driver run while green locally):

- ``double-column`` — any ``AS DOUBLE`` in an oracle. A double that is
  a RAW stored column, an exact-decimal re-render below 2^53 scaled
  units, or pure IEEE +,-,x,/,sqrt on identical inputs is portable
  (those ops are correctly-rounded by spec in every build); a double
  produced by libm (pow/exp/ln), by round(), or by a decimal→double
  conversion whose scaled integer can exceed 2^53 is not. Policy:
  hashed money/quantity sums convert to scaled-integer BIGINT
  (*_fp2/4/6); survivors need a rule naming which safe sub-class they
  are.
- ``decimal-38`` — a decimal multiplication whose RESULT precision
  lands at ≥ 38 (p1+p2+1 with both operands decimal): engines differ
  on the exactly-at-the-cap spill behavior (q14/join_selinger_dp were
  driver-red on the DECIMAL(18,2)x(1-DECIMAL(18,2)) chain). Policy:
  narrow the casts so products stay clearly under 38.

COVERAGE NOTE (one-sided by design): the scanners below read the
ORACLE SQL plus a text grep of the Spark-side plan/operator sources
for ``.cast("double")`` / ``F.round(`` — the Spark side is matched by
file, not by hashed-column lineage, so a Column-API-only hazard in a
file with an allow rule can still slip through; the full 3-SF
correctness run remains the backstop.

This tool reports findings and exits non-zero if any finding is not
covered by its class allowlist. tests/test_lint_numeric.py runs it in
pytest, so a new query with an unjustified hazard fails CI.

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


def scan_sql_doubles(sql: str) -> list[dict]:
    """Every ``AS DOUBLE`` in ``sql`` (conservative: anywhere — a double
    anywhere can propagate into the hashed output), with one line of
    context as the snippet."""
    out = []
    for m in re.finditer(r"AS\s+DOUBLE", sql, re.I):
        line_start = sql.rfind("\n", 0, m.start()) + 1
        line_end = sql.find("\n", m.end())
        line = sql[line_start : line_end if line_end != -1 else len(sql)]
        out.append({"kind": "double-column", "snippet": " ".join(line.split())[:110]})
    return out


_DECP = re.compile(r"DECIMAL\s*\(\s*(\d+)\s*,\s*\d+\s*\)", re.I)


def scan_sql_dec38(sql: str) -> list[dict]:
    """Decimal multiplications whose result precision p1+p2+1 ≥ 38.
    Line-based: two DECIMAL(p,s) casts on one line joined by ``*``
    (this repo's SQL style keeps each product term on its own line).
    A lone DECIMAL(p≥37) in any ``*`` line is flagged too."""
    out = []
    for line in sql.splitlines():
        if "*" not in line:
            continue
        ps = [int(p) for p in _DECP.findall(line)]
        flagged = (len(ps) >= 2 and max(ps) + sorted(ps)[-2] + 1 >= 38) or any(
            p >= 37 for p in ps
        )
        if flagged:
            out.append({"kind": "decimal-38", "snippet": " ".join(line.split())[:110]})
    return out


# Spark-side text scan (ADVICE round 8: the oracle-only lint misses a
# Column-API round/double introduced without shared formula text).
_SPARK_SRC_PATTERNS = (
    (re.compile(r"\.cast\(\s*['\"]double['\"]\s*\)"), "spark-double-cast"),
    (re.compile(r"\bF\.round\s*\("), "spark-round"),
)


def scan_spark_sources() -> list[dict]:
    pkg = Path(__file__).resolve().parent.parent / "actyxos_data_flow_spark"
    out = []
    for sub in ("plans", "operators", "functions", "streaming"):
        for f in sorted((pkg / sub).glob("*.py")):
            text = f.read_text()
            for i, line in enumerate(text.splitlines(), 1):
                for pat, kind in _SPARK_SRC_PATTERNS:
                    if pat.search(line):
                        out.append(
                            {
                                "query": f"{sub}/{f.name}:{i}",
                                "kind": kind,
                                "snippet": " ".join(line.split())[:110],
                            }
                        )
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
    # (round-9: the mix family's share^alpha is now the exact integer
    # isqrt/iroot5 ladder — its pow()/sqrt() are [seed-only], covered
    # by the DOUBLE_ALLOWLIST rule, and no round() remains)
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
    # env fingerprints: probing libm/round/cast IS the query's purpose —
    # every sentinel value is compared to a committed constant and only
    # the integer match-mask row COUNT is emitted (never the value)
    (r"^env_fingerprint_", r".",
     "[probe] sentinel expressions; output is the integer match mask, values never emitted"),
]

_RULES = [(re.compile(q), re.compile(sn, re.I), j) for q, sn, j in ALLOWLIST]


def _allowed(query: str, snippet: str) -> bool:
    return any(qr.search(query) and sr.search(snippet) for qr, sr, _ in _RULES)


# DOUBLE-column / decimal-38 allowlist — each rule names the SAFE
# sub-class (see module docstring):
# [raw-col]     bare stored-double column (or CASE over one) re-emitted
#               with no arithmetic: same parquet bits, same repr.
# [literal]     CAST of a literal (the DuckDB bare-VALUES-decimal quirk).
# [ieee-div]    one division (or interpolation) of exact identical
#               inputs: IEEE requires /,+,-,x,sqrt correctly rounded,
#               so every build produces the same bits (libm does NOT
#               cover these; only pow/exp/ln are build-dependent).
# [render<2^53] decimal→double re-render of an exact k-dp sum whose
#               scaled integer stays < 2^53 at every graded SF (exact
#               conversion; the latent >2^53 family was converted to
#               *_fp BIGINT in round 9).
# [libm-score]  the column is an explicitly libm-derived score already
#               justified under the round() allowlist ([libm]/[assoc]).
# [seed-only]   the double only SEEDS an exact integer search (the
#               isqrt/iroot5 candidate ladders); its value never
#               reaches the output.
DOUBLE_ALLOWLIST: list[tuple[str, str, str]] = [
    # env fingerprints: probing libm/round/cast IS the purpose; only the
    # integer match-mask row count leaves the query, never a value
    (r"^env_fingerprint_", r".",
     "[probe] sentinel expressions; output is the integer match mask, values never emitted"),
    # exact-rational jaccard/ratio memberships and columns: ONE IEEE
    # division of identical exact integers — correctly rounded by spec
    # in every build (libm covers pow/exp/ln only, not /)
    (r"^(dedup_|pipeline_|export_shard_manifest|mutable_corpus_)",
     r"CAST\(i\.i AS DOUBLE\) / CAST\(|CAST\(ii?\.i AS DOUBLE\)",
     "[ieee-div] jaccard = i/u, one correctly-rounded division of exact ints"),
    (r"^class_weights_by_lang", r"CAST\(t\.total AS DOUBLE\) / \(t\.k \* c\.n\)",
     "[ieee-div] inverse-frequency weight: one division of exact ints"),
    (r"^(text_lm_score|graph_neighbor_features|embedding_centroid)",
     r"AS DOUBLE\) / count\(\*\)|CAST\(sum\(f?\.?bal\) AS DOUBLE\) / count|CAST\(sum\(d\) AS DOUBLE\) / count",
     "[ieee-div]+[render<2^53] mean of an exact k-dp sum (scaled sum < 2^53 at graded SFs)"),
    (r"^(ann_|kmeans_cells|dedup_semantic|dedup_crossmodal|dedup_embedding|embedding_centroid)",
     r"DECIMAL\(12,7\)\)\) AS DOUBLE\) / count\(\*\)|AS DOUBLE\) / count\(\*\) AS c",
     "[ieee-div]+[render<2^53] k-means centroid = exact 7dp sum / count (unit-scale dims)"),
    (r"^(ann_|dedup_semantic|dedup_crossmodal|dedup_embedding|embedding_centroid|kmeans_cells|hybrid_rrf)",
     r"sqrt|cosine|c\.c\b|q\.a \* |v\.a \* |x\.a \* |\* r\.c|rec|scale",
     "[libm-score]/[assoc] cosine-kernel doubles, mirrored by the round() [sqrt-norm]+[assoc] rules"),
    (r"^(bm25_|hybrid_rrf|index_postings_stats)", r"CAST\(s AS DOUBLE\) AS bm25|idf",
     "[libm-score] bm25 = ln-derived idf chain (round() rule mirrors)"),
    (r"^(corpus_drift|events_decay_score|rolling_hourly_avg)",
     r"AS DECIMAL\(20,7\)\)\) AS DOUBLE\)|AS DECIMAL\(28,9\)\)\) AS DOUBLE\)|AS DECIMAL\(18,6\)\)\) OVER w AS DOUBLE\)|exp\(-CAST",
     "[render<2^53] exact k-dp sum re-rendered (scaled < 2^53 at graded SFs); exp term is per-item [libm-score]"),
    (r"^(e1_dashboard|g3_join|g9_min_record|g10_max_record|g11_max_by|topk_orders_per_nation|ntile_customer_quartiles)",
     r"CAST\(value AS DOUBLE\)|CAST\(o\.?_?o?totalprice AS DOUBLE\)|CAST\(o\.o_totalprice AS DOUBLE\)|CAST\(l_quantity AS DOUBLE\)|CAST\(c_acctbal AS DOUBLE\)",
     "[raw-col] stored double re-emitted (or windowed) with no arithmetic"),
    (r"^(histogram_event_values|profile_orders)",
     r"CAST\(min\(|CAST\(max\(|CAST\(NULL AS DOUBLE\)",
     "[render<2^53] min/max of a single stored value (exact conversion); NULL literal"),
    (r"^(graph_link_prediction|graph_neighbor_features)",
     r"ln\(d\.deg\)|AS DOUBLE\) AS h[12]_|min\(f?\.?bal\)|max\(f?\.?bal\)|CAST\(aa AS DOUBLE\) AS adamic_adar",
     "[libm-score] Adamic-Adar ln (9dp items into exact DECIMAL sum, re-rendered) / "
     "[render<2^53] neighbor-feature stats"),
    (r"^(mix_epoch_schedule|source_mix_weights|pipeline_mix_batches)",
     r"floor\(sqrt\(CAST\(|floor\(pow\(CAST\(",
     "[seed-only] isqrt/iroot5 candidate — exact integer CASE ladder verifies; value never emitted"),
    (r"^percentiles_order_price", r"quantile_cont\(CAST\(o_totalprice AS DOUBLE\)",
     "[ieee-div] interpolated quantile: lerp of identical stored doubles, IEEE ops only"),
    (r"^quality_classifier", r"1e7 / \(1\.0 \+ exp\(|AS DOUBLE\) / 1000\.0",
     "[libm-score on-grid] sigmoid on the finite 1e-3 z-grid, exhaustively margin-scanned (classifier.py)"),
    (r"^(sketch_hdr_quantiles)", r"CAST\(q AS DOUBLE\) AS q",
     "[literal] the DuckDB bare-VALUES-decimal rendering quirk"),
    (r"^(sketch_hll_cardinality|table_stats_ndv|windowed_distinct_hll_replay)",
     r"3\.3481578363545783e\+21|hll_est|ln\(",
     "[libm-score] HLL estimator branches (round() rule mirrors)"),
]

_DRULES = [(re.compile(q), re.compile(sn, re.I), j) for q, sn, j in DOUBLE_ALLOWLIST]


def _allowed_double(query: str, snippet: str) -> bool:
    return any(
        qr.search(query) and sr.search(snippet) for qr, sr, _ in _DRULES
    )


# Spark-source allowlist: file-pattern justifications mirroring the
# oracle-side classes (the Spark text and the oracle text implement the
# same formula by repo convention; a rule here says which class the
# file's doubles/rounds belong to).
SPARK_ALLOWLIST: list[tuple[str, str, str]] = [
    (r"functions/scalar\.py", r"\.cast\(\"double\"\)",
     "[render<2^53] dec_sum/dec_mul_sum/safe_avg — docstrings state the 2^53 bound; "
     "hashed outputs use cents_sum (BIGINT)"),
    (r"operators/dedup\.py:(376|410)", r"cast\(\"double\"\) / ",
     "[ieee-div] jaccard division (oracle mirror)"),
    (r"operators/dedup\.py:(1002|1026)", r"F\.round\(",
     "[libm-score] tf-idf ln/sqrt-norm (oracle [libm]+[sqrt-norm] mirror)"),
    (r"operators/drift\.py", r"cast\(\"double\"\)|F\.round\(",
     "[libm-score]+[render<2^53] JSD x·ln(x/m) per-item rounds into exact DECIMAL sums (oracle mirror)"),
    (r"operators/hll\.py|plans/hll\.py", r"cast\(\"double\"\)|F\.round\(",
     "[libm-score] HLL estimator (oracle mirror)"),
    (r"operators/profile\.py", r"cast\(\"double\"\)",
     "[render<2^53] per-column min/max of single stored values; NULL literal"),
    (r"operators/retrieval\.py", r"cast\(\"double\"\)|F\.round\(",
     "[libm-score] BM25 idf/tf chain (oracle [libm] mirror)"),
    (r"operators/similarity\.py|plans/similarity\.py", r"cast\(\"double\"\)|F\.round\(",
     "[libm-score]/[assoc] cosine/quantizer/ADC kernels (oracle [sqrt-norm]+[assoc] mirror); "
     "fixed-point _dot9/_sq9 floor() paths only SEED these"),
    (r"operators/temporal\.py", r"cast\(\"double\"\) / F\.count",
     "[ieee-div] rolling mean of exact decimal window sum"),
    (r"operators/text\.py", r"cast\(\"double\"\)|F\.round\(",
     "[libm-score] PMI/LM ln chains, per-item rounded into exact sums (oracle [libm] mirror)"),
    (r"plans/behavior\.py", r"\.cast\(\"double\"\)",
     "[render<2^53] exact DECIMAL(28,9) decay sum re-rendered (oracle mirror)"),
    (r"plans/dedup\.py:440", r"F\.round\(cos, 6\)",
     "[libm-score] crossmodal cosine (oracle [sqrt-norm] mirror)"),
    (r"plans/graph\.py:(590|849|85[01]|866)", r"cast\(\"double\"\)",
     "[render<2^53] Adamic-Adar 9dp sum + neighbor-feature stats re-rendered (oracle mirror)"),
    (r"plans/quantiles\.py", r"F\.round\(",
     "[on-grid] integer cents x100 / /100 re-rendering (oracle [on-grid] mirror)"),
    (r"plans/relational\.py:(203|262|281|305|422|458|48[78])", r"cast\(\"double\"\)",
     "[raw-col]/[render<2^53] stored doubles re-emitted; min/max of single values"),
    (r"plans/text\.py:217", r"cast\(\"double\"\) / ",
     "[ieee-div] class weight = one division of exact ints (oracle mirror)"),
]

_SRULES = [(re.compile(q), re.compile(sn, re.I), j) for q, sn, j in SPARK_ALLOWLIST]


def _allowed_spark(where: str, snippet: str) -> bool:
    return any(qr.search(where) and sr.search(snippet) for qr, sr, _ in _SRULES)


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
        for f in scan_sql_doubles(sql) + scan_sql_dec38(sql):
            f = {"query": name, **f}
            findings.append(f)
            if not _allowed_double(name, f["snippet"]):
                violations.append(f)
    for f in scan_spark_sources():
        findings.append(f)
        if not _allowed_spark(f["query"], f["snippet"]):
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
