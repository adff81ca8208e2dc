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
    df: DataFrame, col_a: str, col_b: str, bits: int = Z_BITS
) -> DataFrame:
    """Attach ``zkey``: the Morton interleave of the two columns'
    ``bits``-bit min-max-scaled ranks. The min/max bounds are a 1-row
    broadcast; the key itself is a projection."""
    bounds = df.agg(
        F.min(col_a).alias("_min_a"),
        F.max(col_a).alias("_max_a"),
        F.min(col_b).alias("_min_b"),
        F.max(col_b).alias("_max_b"),
    )
    sa = _scale_expr(col_a, "_min_a", "_max_a", bits)
    sb = _scale_expr(col_b, "_min_b", "_max_b", bits)
    return (
        df.crossJoin(F.broadcast(bounds))
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
