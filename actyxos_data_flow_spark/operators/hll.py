"""HyperLogLog cardinality sketch: mergeable distinct-count estimation.

At 100 TB "how many distinct tokens / users / urls per shard" is a
first-class pipeline question, and the exact answer (count(distinct))
is a vocabulary-sized shuffle. A HyperLogLog sketch answers it from a
fixed m-register model (here m=64 longs = 512 bytes per group) with
~1.04/sqrt(m) = 13% standard error, and — unlike approx_count_distinct,
whose HLL++ registers Spark keeps opaque — the register TABLE here is
the public model: build per shard, union, ``groupBy(idx).max(r)`` to
merge, estimate from the merged table. That mergeability is what makes
it the streaming/partitioned companion of the count-min sketch in
:mod:`.cms`.

Determinism (the oracle contract): register index and rank both derive
from the two 60-bit md5 pieces shared with the MinHash/CMS families —
``idx = p1 mod m`` and ``rho = 61 - bit_length(p2)`` (bit_length via
base-2 string length, exact on both engines: Spark ``conv(p2,10,2)``,
DuckDB ``bin(p2)``). The harmonic sum is kept EXACT in integer space —
``sum(1 << (60 - rho))`` scaled by 2^60 — so the only floating-point
steps are one literal/bigint division and the small-range ``ln``, both
rounded to 6 dp on both engines.

Reference: Flajolet et al., "HyperLogLog: the analysis of a near-
optimal cardinality estimation algorithm" (AofA 2007). The reference
repo has no sketch surface; this is builder-brief extension surface
(same posture as operators/cms.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_M = 64  # registers (b=6); std error 1.04/sqrt(64) ~= 13%
HLL_ALPHA = 0.709  # Flajolet's alpha_64 constant
# numerator of the raw estimate alpha*m^2 / sum(2^-r): computed ONCE in
# Python so both engines consume the identical double literal
HLL_NUMER = HLL_ALPHA * HLL_M * HLL_M * float(1 << 60)
_POW60 = 1 << 60  # rho scale: weight(r) = 2^(60-r), an exact long


def _md5_piece(col, start: int):
    """60-bit unsigned long from 15 hex chars of md5 (shared convention
    with operators/dedup.py and operators/cms.py — exact in Spark
    conv() and DuckDB ('0x'||h)::BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), start, 15), 16, 10).cast("long")


def hll_registers(
    items: DataFrame, item_col: str, *group_cols: str, m: int = HLL_M
) -> DataFrame:
    """The sketch build: one narrow projection + one map-side-combined
    max aggregate. Output (group..., idx, r) — at most m rows per
    group cross the shuffle per task regardless of item count.

    idx = p1 mod m; rho = 61 - bit_length(p2) = leading zeros of the
    60-bit p2 plus one (p2=0 -> bit_length 1 -> rho 60 on both engines
    — a 2^-60 event, pinned identically rather than special-cased)."""
    idx, rho = hll_proj_cols(item_col, m)
    proj = items.select(*group_cols, idx, rho)
    return proj.groupBy(*group_cols, "idx").agg(F.max("rho").alias("r"))


def hll_proj_cols(item_col: str, m: int = HLL_M):
    """The (idx, rho) projection columns of one item — shared by the
    batch build above and the streaming windowed build
    (streaming/windows.windowed_distinct_hll)."""
    p1 = _md5_piece(F.col(item_col), 1)
    p2 = _md5_piece(F.col(item_col), 17)
    rho = F.lit(61) - F.length(F.conv(p2, 10, 2))
    return F.pmod(p1, F.lit(m)).alias("idx"), rho.alias("rho")


def hll_merge(*register_tables: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Union register tables built over disjoint (or overlapping —
    max is idempotent) item sets; the merged sketch is exactly the
    sketch of the union. This is the property that lets shards /
    micro-batches sketch independently and combine model-sized state."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy(*group_cols, "idx").agg(F.max("r").alias("r"))


def hll_estimate(
    registers: DataFrame, *group_cols: str, m: int = HLL_M
) -> DataFrame:
    """Per-group cardinality estimate from a register table.

    Harmonic sum in exact integer space: present registers contribute
    2^(60-r), absent ones (V of them) 2^60 each; raw estimate is the
    shared HLL_NUMER literal over that bigint. Small-range correction
    (raw <= 2.5m and V > 0) switches to linear counting m*ln(m/V).
    Both branches round to 6 dp — the only inexact steps."""
    # the scaled harmonic sum can reach m * 2^60 = 2^66 — past int64,
    # so it accumulates in DECIMAL (Spark) / HUGEINT (DuckDB oracle)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(
            F.expr("CAST(shiftleft(1L, CAST(60 - r AS INT)) AS DECIMAL(20,0))")
        ).alias("_s"),
    )
    v = F.lit(m) - F.col("_cnt")
    s_scaled = F.col("_s") + v.cast("decimal(3,0)") * F.lit(_POW60).cast("decimal(19,0)")
    raw = F.lit(HLL_NUMER) / s_scaled.cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0), linear).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 6).alias("hll_est"))


def hll_oracle_cte(item_sql: str, m: int = HLL_M) -> str:
    """DuckDB CTE chain replaying the sketch bit-for-bit: ``item_sql``
    must be a relation with columns (g, item); yields relation ``hest``
    with (g, hll_est). Group-free sketches pass a constant g."""
    return f"""
hitems AS ({item_sql}),
hproj AS (
  SELECT g,
         ('0x' || substr(md5(item), 1, 15))::BIGINT % {m} AS idx,
         61 - length(bin(('0x' || substr(md5(item), 17, 15))::BIGINT)) AS rho
  FROM hitems
),
hreg AS (SELECT g, idx, max(rho) AS r FROM hproj GROUP BY 1, 2),
hagg AS (
  SELECT g, count(*) AS cnt,
         sum((1::BIGINT << CAST(60 - r AS INT))) AS s
  FROM hreg GROUP BY 1
),
hest AS (
  SELECT g,
         round(CASE WHEN {HLL_NUMER!r} / CAST(s + ({m} - cnt)::HUGEINT * {_POW60} AS DOUBLE) <= {2.5 * m}
                     AND ({m} - cnt) > 0
                    THEN {float(m)} * ln({float(m)} / CAST({m} - cnt AS DOUBLE))
                    ELSE {HLL_NUMER!r} / CAST(s + ({m} - cnt)::HUGEINT * {_POW60} AS DOUBLE)
               END, 6) AS hll_est
  FROM hagg
)"""
