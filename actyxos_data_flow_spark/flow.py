"""``Flow`` — the reference's fluent collection surface over DataFrames.

Reference parity (SURVEY.md §2.2-2.4; /root/reference/src/flow.rs):

=============================  =======================================
reference (src/flow.rs)         here
=============================  =======================================
``Flow::new`` (:215)            ``Flow.source(df)``
``filter`` (:236)               ``Flow.filter`` → native predicate
``map`` (:246)                  ``Flow.map`` → ``select`` of expressions
``map_in_place`` (:259)         ``Flow.map_in_place`` → ``withColumns``
``flat_map`` (:269)             ``Flow.flat_map`` → ``explode``
``negate`` (:364)               ``Flow.negate`` (delta-space sign flip)
``concat`` (:411)               ``Flow.concat`` → ``unionByName``
``concat_many`` (:416)          ``Flow.concat_many``
``distinct`` (:447)             ``Flow.distinct``
``threshold`` (:452)            ``Flow.threshold`` (multiplicity rewrite)
``count`` total (:460)          ``Flow.count_values``
``monotonic_max_by`` (:286)     ``Flow.monotonic_max_by``
``monotonic_representative_by``
(:323)                          ``Flow.monotonic_representative_by``
``group_by`` (:372)             ``Flow.group_by`` → ``Grouped``
``inspect`` (:383)              ``Flow.inspect`` → ``df.observe``/log
``output`` (:401)               ``Flow.df`` / delta layer (delta.py)
=============================  =======================================

Design notes:

- The wrapped DataFrame *is* the logical plan; every method delegates to
  a native DataFrame op so Catalyst sees the whole plan (pushdown,
  pruning, join planning, whole-stage codegen — none of which the
  single-threaded reference engine has, SURVEY.md §4).
- The reference threads a ``Stateless``/``Stateful`` phantom type
  (/root/reference/src/flow.rs:160-177) deciding whether restart must
  replay history; here it is a runtime bool with identical propagation
  rules (any grouped/arranged op or user-stateful closure flips it).
- Multiplicities: a DataFrame is already a multiset, so +N is N copies.
  *Signed* multiplicities (retractions) live in an explicit ``delta``
  column handled by :mod:`.delta`; ``negate``/``threshold`` here operate
  in that delta space when present, else materialized-row space.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from functools import reduce as _reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DELTA_COL = "delta"


class _DictRow:
    """Attribute-access row with ``_asdict()`` — the fallback when
    itertuples would mangle column names."""

    __slots__ = ("_d",)

    def __init__(self, d: dict):
        object.__setattr__(self, "_d", d)

    def __getattr__(self, name):
        try:
            return self._d[name]
        except KeyError:
            raise AttributeError(name) from None

    def _asdict(self) -> dict:
        return dict(self._d)


def _iter_rows(pdf):
    """Row iteration for the stateful fold contract (``fn(state, row)``
    with attribute access + ``row._asdict()``). ``itertuples`` is the
    fast path, but it silently RENAMES columns that start with an
    underscore or aren't valid identifiers (rename=True) — fn's
    ``row._n`` would raise and ``_asdict`` keys would go positional,
    corrupting output columns. Such frames iterate as dict-backed rows
    instead."""
    import keyword

    cols = list(pdf.columns)
    if len(set(cols)) == len(cols) and all(
        isinstance(c, str)
        and c.isidentifier()
        and not c.startswith("_")
        and not keyword.iskeyword(c)
        for c in cols
    ):
        yield from pdf.itertuples(index=False)
        return
    for rec in pdf.to_dict("records"):
        yield _DictRow(rec)


def _cols(exprs: Sequence[Column | str]) -> list[Column]:
    return [F.col(e) if isinstance(e, str) else e for e in exprs]


class Flow:
    """A typed multiset of records evolving over logical time
    (/root/reference/src/flow.rs:179-213), as a thin DataFrame wrapper."""

    def __init__(self, df: DataFrame, stateful: bool = False):
        self.df = df
        self.stateful = stateful

    # -- sources (S1/S2) ------------------------------------------------
    @classmethod
    def source(cls, df: DataFrame) -> "Flow":
        """S1 ``Flow::new`` — wrap a source DataFrame."""
        return cls(df)

    @classmethod
    def source_limited(cls, df: DataFrame, ts_col: str, lookback_expr: str) -> "Flow":
        """S2 ``Flow::new_limited`` (/root/reference/src/flow.rs:222-231):
        bounded look-back — a source-side predicate (partition-prunable),
        e.g. ``lookback_expr='INTERVAL 365 DAYS'`` keeps only events whose
        ts is within the horizon of the max ts."""
        # collision-proof helper names: drop-by-name removes EVERY column
        # with that name, so plain "m"/"cutoff" would silently delete a
        # same-named user column
        horizon = df.select(F.max(ts_col).alias("__sl_m")).withColumn(
            "__sl_cutoff", F.expr(f"__sl_m - {lookback_expr}")
        )
        return cls(
            df.join(F.broadcast(horizon), df[ts_col] >= horizon["__sl_cutoff"], "inner")
            .drop("__sl_m", "__sl_cutoff")
        )

    def _wrap(self, df: DataFrame, stateful: bool | None = None) -> "Flow":
        return Flow(df, self.stateful if stateful is None else stateful)

    # -- stateless row ops (F1-F6) -------------------------------------
    def filter(self, predicate: Column | str) -> "Flow":
        """F1 — native predicate; Catalyst pushes it to the scan."""
        return self._wrap(self.df.filter(predicate))

    def filter_mut(
        self,
        predicate: Column | str | None = None,
        *,
        fn: Callable | None = None,
        keys: Sequence[str] = (),
        order_by: Sequence[str] | None = None,
        init_state=None,
    ) -> "Flow":
        """F2 (/root/reference/src/flow.rs:241-243). Column form: same
        plan as filter but flips the stateful marker. Callable form
        (``fn(state, row) -> (state, keep_bool)``): a REAL stateful
        predicate — per-key ordered fold via :meth:`map_with_state`
        keeping rows where ``keep_bool`` (e.g. 'emit only on change')."""
        if fn is not None:
            def _pred(state, row):
                state, keep = fn(state, row)
                return state, (row._asdict() if keep else None)

            return self.map_with_state(
                list(keys), _pred, self.df.schema, order_by, init_state
            )
        return self._wrap(self.df.filter(predicate), stateful=True)

    def map(self, *exprs: Column | str) -> "Flow":
        """F3 — 1:1, type-changing transform = projection."""
        return self._wrap(self.df.select(*_cols(exprs)))

    def map_mut(
        self,
        *exprs: Column | str,
        fn: Callable | None = None,
        schema=None,
        keys: Sequence[str] = (),
        order_by: Sequence[str] | None = None,
        init_state=None,
    ) -> "Flow":
        """F4 (/root/reference/src/flow.rs:251-256). Expression form:
        stateful-marked projection. Callable form (``fn(state, row) ->
        (state, out_dict)`` + ``schema``): a real stateful 1:1 transform
        via :meth:`map_with_state`."""
        if fn is not None:
            return self.map_with_state(list(keys), fn, schema, order_by, init_state)
        return self._wrap(self.df.select(*_cols(exprs)), stateful=True)

    def map_in_place(self, **named_exprs: Column) -> "Flow":
        """F5 — 1:1 transform keeping the record type (column overwrite)."""
        return self._wrap(self.df.withColumns(named_exprs))

    def flat_map(self, expr: Column, alias: str, keep: Sequence[str] = ()) -> "Flow":
        """F6 — 1:many via explode of an array-producing expression."""
        return self._wrap(self.df.select(*keep, F.explode(expr).alias(alias)))

    def map_in_pandas(self, fn, schema) -> "Flow":
        """F3/F6 escape hatch for non-expressible transforms: Arrow-batched
        ``mapInPandas`` (never row-at-a-time Python UDFs in the hot path)."""
        return self._wrap(self.df.mapInPandas(fn, schema), stateful=True)

    def map_with_state(
        self,
        keys: Sequence[str],
        fn: Callable,
        schema,
        order_by: Sequence[str] | None = None,
        init_state=None,
    ) -> "Flow":
        """The genuinely-stateful closure surface (F2/F4 ``FnMut``,
        /root/reference/src/flow.rs:241-256): a per-key ordered fold with
        mutable state. ``fn(state, row) -> (state, emit)`` sees each
        key's rows in ``order_by`` order (default: all columns — record
        Ord, like Grouped.reduce); ``emit`` is None, a dict for one
        output row, or a list of dicts (e.g. a retract/assert pair).

        Distributed deviation (documented): the reference's FnMut runs
        globally sequential on one thread; on a cluster state is
        per-key. A constant key forces global sequencing at the cost of
        parallelism. In the batch/recompute model state is rebuilt from
        the log prefix every epoch — exact, since the fold replays the
        whole ordered history (SURVEY.md §4). For state that must
        SURVIVE across live micro-batches without replay, use
        :func:`actyxos_data_flow_spark.streaming.stateful.map_with_state`,
        which runs the same ``fn`` under ``applyInPandasWithState``."""
        import pandas as pd

        from pyspark.sql.types import StructType

        order_cols = list(order_by) if order_by else [c for c in self.df.columns]
        out_cols = (
            [f.name for f in schema.fields]
            if isinstance(schema, StructType)
            else [s.strip().split()[0] for s in schema.split(",")]
        )

        def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order_cols, kind="mergesort")
            state = init_state() if callable(init_state) else init_state
            out = []
            for row in _iter_rows(pdf):
                state, emit = fn(state, row)
                if emit is not None:
                    out.extend(emit if isinstance(emit, list) else [emit])
            return pd.DataFrame(out, columns=out_cols)

        return self._wrap(
            self.df.groupBy(*keys).applyInPandas(_apply, schema), stateful=True
        )

    # -- union / set-like (U1-U5, F7) ----------------------------------
    def concat(self, other: "Flow") -> "Flow":
        """U1 — multiset union; multiplicities add."""
        return self._wrap(self.df.unionByName(other.df), stateful=self.stateful or other.stateful)

    def concat_many(self, *others: "Flow") -> "Flow":
        """U2 — n-ary union."""
        return _reduce(lambda a, b: a.concat(b), others, self)

    def negate(self) -> "Flow":
        """F7 — flip multiplicities. Requires delta space: adds a
        ``delta`` column (all −1, or sign-flipped if already present)."""
        if DELTA_COL in self.df.columns:
            return self._wrap(self.df.withColumn(DELTA_COL, -F.col(DELTA_COL)))
        return self._wrap(self.df.withColumn(DELTA_COL, F.lit(-1)))

    def distinct(self) -> "Flow":
        """U3 — multiplicity→1. Delta space: the net multiplicity per
        record decides existence (a +1/−1 retraction pair nets to zero
        and must NOT resurrect the record, which a plain
        ``df.distinct()`` over the delta column would); survivors carry
        delta=1."""
        if DELTA_COL in self.df.columns:
            cols = [c for c in self.df.columns if c != DELTA_COL]
            out = (
                self.df.groupBy(*cols)
                .agg(F.sum(DELTA_COL).alias("_m"))
                .filter(F.col("_m") > 0)
                .select(*cols, F.lit(1).cast("long").alias(DELTA_COL))
            )
            return self._wrap(out, stateful=True)
        return self._wrap(self.df.distinct(), stateful=True)

    def threshold(self, fn: Callable[[Column], Column]) -> "Flow":
        """U4 — arbitrary multiplicity rewrite ``f(mult)->mult``
        (/root/reference/src/flow.rs:452-457).

        Delta space (``delta`` column present): multiplicity is the SIGNED
        NET sum(delta) per distinct record — consolidate first, rewrite
        the net, emit it back into ``delta`` (zero-net records vanish,
        matching the reference's consolidated arrangement).

        Materialized-row space: count copies per value, rewrite, re-expand
        via ``explode(array_repeat)`` — fine for small multiplicities (the
        only use in the wild is distinct-like clipping)."""
        cols = [c for c in self.df.columns if c != DELTA_COL]
        if DELTA_COL in self.df.columns:
            net = (
                self.df.groupBy(*cols)
                .agg(F.sum(DELTA_COL).alias("_m"))
                .filter(F.col("_m") != 0)
            )
            out = net.select(
                *cols, fn(F.col("_m")).cast("long").alias(DELTA_COL)
            ).filter(F.col(DELTA_COL) != 0)
            return self._wrap(out, stateful=True)
        counted = self.df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_mult"))
        rewritten = counted.withColumn("_mult", fn(F.col("_mult")).cast("int")).filter(F.col("_mult") > 0)
        expanded = rewritten.select(*cols, F.explode(F.array_repeat(F.lit(1), F.col("_mult"))).alias("_one")).drop(
            "_one"
        )
        return self._wrap(expanded, stateful=True)

    def count_values(self) -> "Flow":
        """U5 — global per-value count: ``Flow<T> -> Flow<(T, count)>``.
        In delta space the count is the signed net sum(delta) per value
        (consolidated; zero-net values vanish) and each surviving
        (value, count) record carries delta=1 — the count view's snapshot
        as a net multiset."""
        cols = [c for c in self.df.columns if c != DELTA_COL]
        if DELTA_COL in self.df.columns:
            out = (
                self.df.groupBy(*cols)
                .agg(F.sum(DELTA_COL).alias("count"))
                .filter(F.col("count") != 0)
                .withColumn(DELTA_COL, F.lit(1))
            )
            return self._wrap(out, stateful=True)
        return self._wrap(self.df.groupBy(*cols).agg(F.count(F.lit(1)).alias("count")), stateful=True)

    def _net_counts(self, df: DataFrame) -> DataFrame:
        """Net positive multiplicity per distinct record (cols + _m),
        treating a missing delta column as ×1 rows."""
        cols = [c for c in df.columns if c != DELTA_COL]
        m = F.sum(DELTA_COL) if DELTA_COL in df.columns else F.count(F.lit(1))
        return df.groupBy(*cols).agg(m.cast("long").alias("_m")).filter(F.col("_m") > 0)

    def except_all(self, other: "Flow") -> "Flow":
        """Set difference (reference idiom: concat + negate + threshold,
        SURVEY.md §2.3) — native ``exceptAll`` for materialized rows;
        in delta space the truncated difference max(net_a − net_b, 0)
        is computed on NET multiplicities (exceptAll would compare the
        delta column as data and let retraction pairs survive)."""
        if DELTA_COL in self.df.columns or DELTA_COL in other.df.columns:
            a = self._net_counts(self.df)
            b = self._net_counts(other.df).withColumn("_m", -F.col("_m"))
            cols = [c for c in a.columns if c != "_m"]
            out = (
                a.unionByName(b)
                .groupBy(*cols)
                .agg(F.sum("_m").alias("_m"))
                .filter(F.col("_m") > 0)
                .select(*cols, F.col("_m").cast("long").alias(DELTA_COL))
            )
            return self._wrap(out, stateful=True)
        return self._wrap(self.df.exceptAll(other.df), stateful=True)

    def intersect_all(self, other: "Flow") -> "Flow":
        """Multiset intersection — native ``intersectAll`` for
        materialized rows; in delta space min(net_a, net_b) over net
        multiplicities (both sides must be positively present)."""
        if DELTA_COL in self.df.columns or DELTA_COL in other.df.columns:
            a = self._net_counts(self.df).withColumn("_side", F.lit(0))
            b = self._net_counts(other.df).withColumn("_side", F.lit(1))
            cols = [c for c in a.columns if c not in ("_m", "_side")]
            out = (
                a.unionByName(b)
                .groupBy(*cols)
                .agg(
                    F.min("_m").alias("_m"),
                    F.count_distinct("_side").alias("_sides"),
                )
                .filter(F.col("_sides") == 2)
                .select(*cols, F.col("_m").cast("long").alias(DELTA_COL))
            )
            return self._wrap(out, stateful=True)
        return self._wrap(self.df.intersectAll(other.df), stateful=True)

    # -- monotonic ops (M1, M2) ----------------------------------------
    def monotonic_max_by(self, key: Column | str, sort_key: Column | str) -> "Flow":
        """M1 (/root/reference/src/flow.rs:286-321): per key retain the max
        element ever seen. Batch form: ``max_by(struct(all), sort_key)``
        — a hash aggregate with map-side partial combine; no window sort,
        no shuffle beyond the single keyed exchange."""
        k = F.col(key) if isinstance(key, str) else key
        s = F.col(sort_key) if isinstance(sort_key, str) else sort_key
        all_struct = F.struct(*[F.col(c) for c in self.df.columns])
        # order by (sort_key, full record): ties on sort_key resolve by
        # full-record Ord, as the reference's arrangement compare does
        # (and as Grouped.max_by already does)
        out = (
            self.df.groupBy(k.alias("_k"))
            .agg(F.max_by(all_struct, F.struct(s.alias("_s"), all_struct.alias("_r"))).alias("_rec"))
            .select("_rec.*")
        )
        return self._wrap(out, stateful=True)

    def monotonic_representative_by(self, key: Column | str, order_key: Column | str) -> "Flow":
        """M2 (/root/reference/src/flow.rs:323-361): per key keep the first
        element seen. "First seen" is nondeterministic in a distributed
        engine, so (per SURVEY.md §7.4) it is pinned to min-by-order_key
        (lamport) — deterministic and equal to arrival order for an
        ordered log."""
        k = F.col(key) if isinstance(key, str) else key
        o = F.col(order_key) if isinstance(order_key, str) else order_key
        all_struct = F.struct(*[F.col(c) for c in self.df.columns])
        out = (
            self.df.groupBy(k.alias("_k"))
            .agg(F.min_by(all_struct, F.struct(o.alias("_s"), all_struct.alias("_r"))).alias("_rec"))
            .select("_rec.*")
        )
        return self._wrap(out, stateful=True)

    # -- grouping (G1/G2) ----------------------------------------------
    def group_by(self, *key_exprs: Column | str) -> "Grouped":
        """G1 — key the collection; the reference builds a sorted in-memory
        arrangement here (src/flow.rs:372-380); Spark's shuffle exchange is
        the distributed equivalent and Catalyst plans/reuses it."""
        from .grouped import Grouped

        return Grouped(self.df, list(key_exprs), stateful=True)

    # -- diagnostics (F8/F9) -------------------------------------------
    def inspect(self, *metrics: Column) -> "Flow":
        """F8 — side-effect-free observation via ``df.observe`` metrics."""
        return self._wrap(self.df.observe(f"inspect_{id(self)}", *metrics))

    def inspect_triples(self, fn: Callable, limit: int = 100) -> "Flow":
        """F8 at triple granularity — deliver up to ``limit`` ``(data,
        time, mult)`` triples to ``fn``, mirroring the reference's debug
        inspect closure over individual deltas
        (/root/reference/src/flow.rs:383-394).

        Driver-side and bounded BY DESIGN: this is the debug hook the
        reference uses for println-style tracing, not a data path —
        collecting every triple of a 100 TB flow is exactly the
        anti-pattern the engine avoids. Production counters belong in
        :meth:`inspect` (``df.observe`` aggregates, executor-side).
        ``time`` is the ``timestamp`` column when the flow carries one,
        ``mult`` the delta column (+1 in set space)."""
        ts = "timestamp" if "timestamp" in self.df.columns else None
        for row in self.df.limit(limit).collect():
            d = row.asDict()
            mult = d.pop(DELTA_COL, 1)
            fn(d, d.get(ts) if ts else None, mult)
        return self

    def probe(self, name: str = "probe", *metrics: Column):
        """F9 — the reference's ``probe`` reports when the dataflow has
        caught up with an epoch (timely progress tracking,
        /root/reference/src/flow.rs:396-409, used by the runner to know
        a commit unit is complete). Spark-native analog: a named
        ``Observation`` attached to the flow — ``observation.get``
        BLOCKS until the next action over this plan completes, at which
        point the observed metrics (row count by default, any aggregate
        expressions otherwise) are available: "probe passed the epoch"
        == ``get`` returned. In streaming, the same ``observe`` metrics
        surface per micro-batch in every progress event
        (``StreamingQueryProgress.observedMetrics``) — use
        :meth:`inspect` with a string name for that form.

        Returns ``(flow, observation)``; the flow must then be used in
        the action being probed (the observation watches THIS plan)."""
        from pyspark.sql import Observation

        obs = Observation(name)
        cols = metrics or (F.count(F.lit(1)).alias("rows"),)
        return self._wrap(self.df.observe(obs, *cols)), obs
