"""``Grouped`` — keyed collections: join / reduce / per-key aggregates.

Reference parity (SURVEY.md §2.5; /root/reference/src/flow.rs:465-596):

=============================  =======================================
reference (src/flow.rs)         here
=============================  =======================================
``join`` (:493)                 ``Grouped.join`` (inner equi, 1:many)
``join_single`` (:504)          ``Grouped.join_single`` (1:1 combiner)
``reduce`` (:522)               ``Grouped.reduce`` (applyInPandas UDAF)
``distinct`` (:536)             ``Grouped.distinct``
``count`` (:541)                ``Grouped.count``
``min``/``max`` (:546/:551)     ``Grouped.min_record``/``max_record``
``max_by`` (:556)               ``Grouped.max_by`` / ``min_by``
``ungroup*`` (:570-585)         implicit (agg output is already flat) /
                                ``Grouped.ungroup`` for keyed rows
``regroup`` (:588)              ``Grouped.regroup``
``threshold`` (:531)            ``Grouped.threshold``
=============================  =======================================

Scale notes:

- The named aggregates (count/min/max/max_by) are native hash aggregates
  with map-side partial combine — one shuffle on the group key, no sort.
  At 100 TB this is the right physical shape; skewed keys are split by
  AQE skew handling.
- ``reduce`` is the general UDAF surface: the reference hands the UDAF
  the group's values *sorted by Ord* (src/flow.rs:472-485 arrangement).
  ``applyInPandas`` reproduces that contract by sorting each group batch
  on the record's field order before applying the user function. This is
  the slow path (Arrow transfer + Python) — every specific instance the
  examples use compiles to native aggs instead.
- ``join`` keeps the equi-join declarative so Catalyst picks
  broadcast-hash vs sort-merge from stats/AQE; pass ``broadcast_right=True``
  to force the small-dim case the planner can't always see.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .flow import DELTA_COL, Flow


class Grouped:
    """A keyed collection (the reference's arranged ``Grouped<K,V>``,
    /root/reference/src/flow.rs:472-485)."""

    def __init__(self, df: DataFrame, keys: Sequence[Column | str], stateful: bool = True):
        # Materialize key columns so downstream ops can reference them by
        # name. str keys name existing columns; computed Column keys must
        # carry an explicit .alias() (resolved via the public
        # ``df.select(col).columns`` path — no py4j internals, so this
        # works identically under Spark Connect).
        self._key_names: list[str] = []
        out = df
        for k in keys:
            if isinstance(k, str):
                if k not in df.columns:
                    raise ValueError(f"unknown group key column {k!r}")
                self._key_names.append(k)
                continue
            name = df.select(k).columns[0]
            if name not in df.columns and not name.isidentifier():
                raise ValueError(
                    f"computed group key {name!r} needs an explicit .alias()"
                )
            # withColumn (not a membership test) so an aliased expression
            # shadowing an existing column groups by the EXPRESSION
            out = out.withColumn(name, k)
            self._key_names.append(name)
        self.df = out
        self.stateful = stateful

    @property
    def keys(self) -> list[str]:
        return list(self._key_names)

    def _value_cols(self) -> list[str]:
        return [c for c in self.df.columns if c not in self._key_names and c != DELTA_COL]

    # -- joins (G3/G4) --------------------------------------------------
    def join(self, other: "Grouped", *out_exprs: Column | str, broadcast_right: bool = False) -> Flow:
        """G3 — inner equi-join on the shared key (the reference's ONLY
        join type; semi/anti/outer come free from Spark, SURVEY.md §2.5).
        The combiner is the projection ``out_exprs`` (1:many via explode
        upstream if needed)."""
        if self.keys != other.keys:
            # alias both sides: when the two Groupeds descend from the
            # same plan (self-join against a derived view), df[a] ==
            # other.df[b] is an ambiguous self-join reference
            left = self.df.alias("_gl")
            right = other.df.alias("_gr")
            if broadcast_right:
                right = F.broadcast(right)
            cond = [
                F.col(f"_gl.{a}") == F.col(f"_gr.{b}")
                for a, b in zip(self.keys, other.keys)
            ]
            joined = left.join(right, cond, "inner")
        else:
            right = F.broadcast(other.df) if broadcast_right else other.df
            joined = self.df.join(right, on=self.keys, how="inner")
        out = joined.select(*[F.col(e) if isinstance(e, str) else e for e in out_exprs]) if out_exprs else joined
        return Flow(out, stateful=True)

    def join_single(self, other: "Grouped", *out_exprs: Column | str, broadcast_right: bool = False) -> Flow:
        """G4 — 1:1-combiner join; same plan as G3 (cardinality is the
        caller's contract, /root/reference/src/flow.rs:504-519)."""
        return self.join(other, *out_exprs, broadcast_right=broadcast_right)

    # -- the general UDAF (G5) ------------------------------------------
    def reduce(self, fn: Callable[[pd.DataFrame], pd.DataFrame], schema, sort_cols: Sequence[str] | None = None) -> Flow:
        """G5 ``reduce`` (/root/reference/src/flow.rs:522-528): per key the
        UDAF sees the full group *sorted by record Ord* and may emit 0..n
        rows. ``fn`` receives the sorted pandas group (keys included) and
        returns a pandas DataFrame matching ``schema``."""
        sort_by = list(sort_cols) if sort_cols else self._value_cols()

        def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
            return fn(pdf.sort_values(sort_by, kind="mergesort").reset_index(drop=True))

        return Flow(self.df.groupBy(*self.keys).applyInPandas(_apply, schema), stateful=True)

    # -- named aggregates (G6-G11) --------------------------------------
    def threshold(self, fn: Callable[[Column], Column]) -> Flow:
        """G6 — per-(key,value) multiplicity rewrite."""
        return Flow(self.df, stateful=True).threshold(fn)

    def _positive_records(self) -> DataFrame:
        """Records with positive NET multiplicity, delta column dropped —
        the materialized view a value-level aggregate must see. A plain
        pass-through when the flow isn't in delta space."""
        if DELTA_COL not in self.df.columns:
            return self.df
        cols = [c for c in self.df.columns if c != DELTA_COL]
        return (
            self.df.groupBy(*cols)
            .agg(F.sum(DELTA_COL).alias("_m"))
            .filter(F.col("_m") > 0)
            .drop("_m")
        )

    def distinct(self) -> Flow:
        """G7 — multiplicity→1 per (key,value); delta-space nets first
        (same contract as Flow.distinct)."""
        return Flow(self.df, stateful=True).distinct()

    def count(self) -> Flow:
        """G8 — per-key count. Delta space: the count is Σ delta per key
        (a retraction row subtracts instead of counting as a row);
        zero-net keys vanish (and so do negative-net keys: net
        multiplicity <= 0 means the key is absent from the view, the
        same net-positive-presence rule _net_counts/distinct use)."""
        if DELTA_COL in self.df.columns:
            out = (
                self.df.groupBy(*self.keys)
                .agg(F.sum(DELTA_COL).cast("long").alias("count"))
                .filter(F.col("count") > 0)
            )
            return Flow(out, stateful=True)
        return Flow(self.df.groupBy(*self.keys).agg(F.count(F.lit(1)).alias("count")), stateful=True)

    def agg(self, *aggs: Column) -> Flow:
        """Native aggregate escape hatch (sum/avg/collect/…)."""
        return Flow(self.df.groupBy(*self.keys).agg(*aggs), stateful=True)

    def min_record(self) -> Flow:
        """G9 — per-key minimum whole record (lexicographic field order ==
        Rust derived Ord; Spark struct comparison matches)."""
        vals = self._value_cols()
        rec = F.struct(*[F.col(c) for c in vals])
        src = self._positive_records()
        return Flow(src.groupBy(*self.keys).agg(F.min(rec).alias("_rec")).select(*self.keys, "_rec.*"), True)

    def max_record(self) -> Flow:
        """G10 — per-key maximum whole record."""
        vals = self._value_cols()
        rec = F.struct(*[F.col(c) for c in vals])
        src = self._positive_records()
        return Flow(src.groupBy(*self.keys).agg(F.max(rec).alias("_rec")).select(*self.keys, "_rec.*"), True)

    def max_by(self, sort_key: Column | str) -> Flow:
        """G11 — per-key argmax by a computed sort key (the flagship E1
        pattern, /root/reference/examples/machine-dashboard/logic.rs:26).
        ``max_by(struct(values), struct(sort_key, values))`` — the
        tie-break on the full record keeps the result deterministic, as in
        the reference where the arrangement's Ord breaks ties."""
        s = F.col(sort_key) if isinstance(sort_key, str) else sort_key
        vals = self._value_cols()
        rec = F.struct(*[F.col(c) for c in vals])
        order = F.struct(s.alias("_s"), *[F.col(c) for c in vals])
        return Flow(
            self._positive_records().groupBy(*self.keys).agg(F.max_by(rec, order).alias("_rec")).select(*self.keys, "_rec.*"),
            True,
        )

    def min_by(self, sort_key: Column | str) -> Flow:
        """G11 dual — per-key argmin (deterministic, full-record tiebreak)."""
        s = F.col(sort_key) if isinstance(sort_key, str) else sort_key
        vals = self._value_cols()
        rec = F.struct(*[F.col(c) for c in vals])
        order = F.struct(s.alias("_s"), *[F.col(c) for c in vals])
        return Flow(
            self._positive_records().groupBy(*self.keys).agg(F.min_by(rec, order).alias("_rec")).select(*self.keys, "_rec.*"),
            True,
        )

    # -- reshaping (G12/G13) --------------------------------------------
    def ungroup(self) -> Flow:
        """G12 — flatten back to a Flow (keys stay as columns; aggregation
        output in Spark is already flat, so this is a marker no-op)."""
        return Flow(self.df, stateful=True)

    def regroup(self, *key_exprs: Column | str) -> "Grouped":
        """G13 — re-key."""
        return Grouped(self.df, list(key_exprs), stateful=True)
