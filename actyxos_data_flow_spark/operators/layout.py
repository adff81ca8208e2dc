"""Z-order (Morton-curve) data layout: multi-dimensional clustering so
file-level min/max statistics prune scans on EITHER dimension.

At 100 TB the dominant cost is the scan, and the dominant scan saver is
skipping files. Range-partitioning on one column prunes that column
only; interleaving the bits of two (or more) columns into one Morton
key and range-partitioning on THAT gives every file a small bounding
rectangle in (a, b) space — a predicate on either column skips most
files. This is what ``OPTIMIZE ZORDER BY`` does in lakehouse engines;
here it's expressed as plain DataFrame ops so the engine can lay out
any table the same way:

- :func:`zorder_key` — the Morton key as a pure integer projection
  (min-max scale to ``bits`` bits via exact integer DIV, then a fixed
  shift/mask interleave tree). No floats anywhere, so every engine
  derives bit-identical keys and a SQL oracle replays the layout.
- :func:`zorder_bin_stats` — per-bin (top ``bin_bits`` of the key;
  stand-ins for files) row count + per-dimension min/max: the bounding
  rectangles a file-skipping planner would read from parquet footers.
- :func:`zorder_prune_report` — the payoff, quantified: for a
  rectangle predicate, how many bins survive min/max pruning and how
  many rows those bins hold vs the full table (the I/O fraction a
  z-ordered layout would scan).

Cluster shape: the key is a projection; the physical re-layout is ONE
``repartitionByRange(zkey)`` + ``sortWithinPartitions`` write (the
standard compaction job); the stats/prune queries are one hash
aggregate over bin ids. Nothing here is corpus-shuffled beyond the
single layout shuffle the operation IS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 8  # bits per dimension (256 strips per dim)
Z_BIN_BITS = 6  # bins = top 6 bits of the interleaved key (64 "files")


def _scale_expr(col: str, min_col: str, max_col: str, bits: int) -> Column:
    """Exact integer min-max scale to [0, 2^bits): ((v - min) * (2^bits
    - 1)) DIV (max - min), constant-range guard -> 0. Integer products
    stay well inside BIGINT, so there is no float rounding to diverge
    between engines."""
    top = (1 << bits) - 1
    return F.when(F.col(max_col) == F.col(min_col), F.lit(0)).otherwise(
        F.expr(f"(({col} - {min_col}) * {top}) DIV ({max_col} - {min_col})")
    )


def _scale_lit(col: str, mn: int, mx: int, bits: int) -> Column:
    """:func:`_scale_expr` with the bounds folded as INTEGER LITERALS
    (r12): same `((v - min) * top) DIV (max - min)` SQL arithmetic, so
    values are bit-identical to the broadcast-bounds form — but the
    projection carries no join, letting a caller that already knows the
    bounds (one model-sized collect) key N layouts from one scan."""
    top = (1 << bits) - 1
    if mx == mn:
        return F.lit(0).cast("long")
    return F.expr(f"(({col} - {mn}) * {top}) DIV ({mx} - {mn})")


def _interleave_expr(a: Column, b: Column, bits: int) -> Column:
    """Morton interleave: bit i of ``a`` lands at 2i, of ``b`` at 2i+1.
    A fixed 2×bits-term shift/mask tree — pure integer JVM ops inside
    whole-stage codegen."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def zorder_key(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = Z_BITS,
    bounds: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """Attach ``zkey``: the Morton interleave of the two columns'
    ``bits``-bit min-max-scaled ranks. The min/max bounds are a 1-row
    broadcast; the key itself is a projection. Pass ``bounds``
    (min_a, max_a, min_b, max_b) to fold them as literals instead —
    one shared bounds collect then keys any number of layouts without
    re-aggregating the corpus (r12, guide §2.2)."""
    if bounds is not None:
        mna, mxa, mnb, mxb = bounds
        sa = _scale_lit(col_a, mna, mxa, bits)
        sb = _scale_lit(col_b, mnb, mxb, bits)
        return df.withColumn("zkey", _interleave_expr(sa, sb, bits))
    bounds_df = df.agg(
        F.min(col_a).alias("_min_a"),
        F.max(col_a).alias("_max_a"),
        F.min(col_b).alias("_min_b"),
        F.max(col_b).alias("_max_b"),
    )
    sa = _scale_expr(col_a, "_min_a", "_max_a", bits)
    sb = _scale_expr(col_b, "_min_b", "_max_b", bits)
    return (
        df.crossJoin(F.broadcast(bounds_df))
        .withColumn("zkey", _interleave_expr(sa, sb, bits))
        .drop("_min_a", "_max_a", "_min_b", "_max_b")
    )


def zorder_bin_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = Z_BITS,
    bin_bits: int = Z_BIN_BITS,
) -> DataFrame:
    """Per-bin layout statistics (bin = top ``bin_bits`` of zkey — the
    file a range-partitioned writer would put the row in): row count
    and both dimensions' min/max — exactly the footer stats a pruning
    planner consults. Output: (bin, cnt, min_a, max_a, min_b, max_b)."""
    keyed = zorder_key(df, col_a, col_b, bits)
    bin_col = F.shiftright(F.col("zkey"), 2 * bits - bin_bits).alias("bin")
    return (
        keyed.select(bin_col, col_a, col_b)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(col_a).alias("min_a"),
            F.max(col_a).alias("max_a"),
            F.min(col_b).alias("min_b"),
            F.max(col_b).alias("max_b"),
        )
    )


def zorder_prune_report(
    df: DataFrame,
    col_a: str,
    col_b: str,
    a_lo: int,
    a_hi: int,
    b_lo: int,
    b_hi: int,
    bits: int = Z_BITS,
    bin_bits: int = Z_BIN_BITS,
) -> DataFrame:
    """Pruning efficiency of the z-ordered layout for the rectangle
    ``a ∈ [a_lo, a_hi] ∧ b ∈ [b_lo, b_hi]``: a bin survives iff its
    min/max box intersects the rectangle (the file-skipping test);
    ``scanned_rows`` is what a planner would read, ``matched_rows``
    what the predicate keeps. One row: (total_bins, hit_bins,
    total_rows, scanned_rows, matched_rows, scan_fraction_fp6 — the
    fraction as an exact fp6 integer, (scanned·10^6) DIV total)."""
    stats = zorder_bin_stats(df, col_a, col_b, bits, bin_bits)
    hit = (
        (F.col("max_a") >= a_lo)
        & (F.col("min_a") <= a_hi)
        & (F.col("max_b") >= b_lo)
        & (F.col("min_b") <= b_hi)
    )
    matched = (
        df.filter(
            (F.col(col_a) >= a_lo)
            & (F.col(col_a) <= a_hi)
            & (F.col(col_b) >= b_lo)
            & (F.col(col_b) <= b_hi)
        )
        .agg(F.count(F.lit(1)).alias("matched_rows"))
    )
    agg = stats.agg(
        F.count(F.lit(1)).alias("total_bins"),
        F.sum(F.when(hit, 1).otherwise(0)).alias("hit_bins"),
        F.sum("cnt").alias("total_rows"),
        F.sum(F.when(hit, F.col("cnt")).otherwise(0)).alias("scanned_rows"),
    )
    return agg.crossJoin(F.broadcast(matched)).select(
        "total_bins",
        "hit_bins",
        "total_rows",
        "scanned_rows",
        "matched_rows",
        F.expr("(scanned_rows * 1000000) DIV total_rows").cast("long").alias(
            "scan_fraction_fp6"
        ),
    )


def hilbert_steps(bits: int, x: str, y: str, d: str) -> list[tuple[str, str, str]]:
    """Per-level SQL texts for the classic iterative Hilbert xy→d walk
    (quadrant term + rotate/flip), referencing columns ``x``/``y``/``d``:
    returns [(x_next, y_next, d_next), ...] from the top bit down. The
    SAME strings are rendered into Spark ``F.expr`` and the DuckDB
    oracle, so the two engines share the formula verbatim — pure
    integer CASE arithmetic, no xor (DuckDB's ``^`` is power), no
    floats. Level s: d += s²·q with q = ry=1 ? (rx=1 ? 2 : 1) : 3·rx;
    then (x,y) rotates: ry=1 → identity, rx=0 → swap, else flipped
    swap (n-1-y, n-1-x)."""
    n = 1 << bits
    steps = []
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
        q = f"(CASE WHEN {ry} = 1 THEN (CASE WHEN {rx} = 1 THEN 2 ELSE 1 END) ELSE 3 * {rx} END)"
        steps.append(
            (
                f"(CASE WHEN {ry} = 1 THEN {x} WHEN {rx} = 0 THEN {y} ELSE {n - 1} - {y} END)",
                f"(CASE WHEN {ry} = 1 THEN {y} WHEN {rx} = 0 THEN {x} ELSE {n - 1} - {x} END)",
                f"({d} + {s * s} * {q})",
            )
        )
    return steps


def hilbert_key(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = Z_BITS,
    bounds: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """Attach ``hkey``: the Hilbert-curve index of the two columns'
    ``bits``-bit min-max-scaled ranks. Same scale step and same cost
    shape as :func:`zorder_key` (1-row bounds broadcast + a pure
    integer projection, ~4·bits CASE terms inside codegen; or literal
    bounds via ``bounds``, see zorder_key); the Hilbert
    walk preserves locality strictly better than Morton — every curve
    step is an adjacent cell, so bin bounding boxes have no Z-shaped
    jumps across the midline."""
    if bounds is not None:
        mna, mxa, mnb, mxb = bounds
        out = (
            df.withColumn("_hx0", _scale_lit(col_a, mna, mxa, bits).cast("long"))
            .withColumn("_hy0", _scale_lit(col_b, mnb, mxb, bits).cast("long"))
            .withColumn("_hd0", F.lit(0).cast("long"))
        )
    else:
        bounds_df = df.agg(
            F.min(col_a).alias("_min_a"),
            F.max(col_a).alias("_max_a"),
            F.min(col_b).alias("_min_b"),
            F.max(col_b).alias("_max_b"),
        )
        out = (
            df.crossJoin(F.broadcast(bounds_df))
            .withColumn("_hx0", _scale_expr(col_a, "_min_a", "_max_a", bits).cast("long"))
            .withColumn("_hy0", _scale_expr(col_b, "_min_b", "_max_b", bits).cast("long"))
            .withColumn("_hd0", F.lit(0).cast("long"))
        )
    steps = [
        hilbert_steps(bits, x=f"_hx{i}", y=f"_hy{i}", d=f"_hd{i}")[i]
        for i in range(bits)
    ]
    for i, (xs, ys, ds) in enumerate(steps):
        out = out.withColumns(
            {
                f"_hx{i + 1}": F.expr(xs),
                f"_hy{i + 1}": F.expr(ys),
                f"_hd{i + 1}": F.expr(ds),
            }
        )
    drop = ["_min_a", "_max_a", "_min_b", "_max_b"] + [
        c for j in range(bits + 1) for c in (f"_hx{j}", f"_hy{j}", f"_hd{j}")
    ]
    return out.withColumn("hkey", F.col(f"_hd{bits}")).drop(*drop)


def hilbert_bin_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = Z_BITS,
    bin_bits: int = Z_BIN_BITS,
) -> DataFrame:
    """Per-bin footer stats for the Hilbert layout — same contract as
    :func:`zorder_bin_stats` (bin = top ``bin_bits`` of hkey)."""
    keyed = hilbert_key(df, col_a, col_b, bits)
    bin_col = F.shiftright(F.col("hkey"), 2 * bits - bin_bits).alias("bin")
    return (
        keyed.select(bin_col, col_a, col_b)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(col_a).alias("min_a"),
            F.max(col_a).alias("max_a"),
            F.min(col_b).alias("min_b"),
            F.max(col_b).alias("max_b"),
        )
    )


def file_cut_stats(
    keyed: DataFrame,
    key_col: str,
    col_a: str,
    col_b: str,
    n_files: int,
) -> DataFrame:
    """Equal-row-count file simulation over a layout key: cut the key's
    frequency distribution into ``n_files`` files (file = cum_before ·
    n // total, whole key-groups never split) and report each file's
    row count + (a, b) bounding box — the footer stats the written
    files would carry. Quadrant-aligned bins make Morton and Hilbert
    provably identical (top key bits = the same quadtree cell either
    way); EQUAL-SIZE file cuts straddle quadrant boundaries, which is
    where Hilbert's every-step-adjacent walk keeps boxes tight and
    Morton's Z-jumps blow them up — and is also what a real compaction
    writer produces. The running sum is a window over the DISTINCT-KEY
    table, bounded by 4^bits (= 65,536 at bits=8) rows regardless of
    corpus size — model-sized by construction, never a corpus sort."""
    from pyspark.sql import Window as W

    dk = keyed.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(col_a).alias("pmin_a"),
        F.max(col_a).alias("pmax_a"),
        F.min(col_b).alias("pmin_b"),
        F.max(col_b).alias("pmax_b"),
    )
    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)
    tot = dk.agg(F.sum("cnt").alias("tot"))
    cum = (
        dk.withColumn("cum", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .withColumn("file", F.expr(f"(cum * {n_files}) DIV tot"))
    )
    return cum.groupBy("file").agg(
        F.sum("cnt").alias("cnt"),
        F.min("pmin_a").alias("min_a"),
        F.max("pmax_a").alias("max_a"),
        F.min("pmin_b").alias("min_b"),
        F.max("pmax_b").alias("max_b"),
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = Z_BITS,
    mode: str = "overwrite",
) -> None:
    """The physical re-layout: range-partition on the Morton key into
    ``n_files`` write tasks, sort within each, drop the key, write
    parquet. Each output file then covers a contiguous zkey range — a
    small (a, b) bounding rectangle — so its parquet footer min/max on
    BOTH columns enables the pruning :func:`zorder_prune_report`
    simulates (Spark's own parquet filter pushdown does the skipping at
    read time). This is the standard ``OPTIMIZE ZORDER BY`` compaction
    job: one range shuffle, nothing else."""
    keyed = zorder_key(df, col_a, col_b, bits)
    (
        keyed.repartitionByRange(n_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode(mode)
        .parquet(path)
    )
