"""Declarative data-quality constraints: a Deequ-style rule engine
that verifies a table against a checklist and emits one violations row
per rule.

At 100 TB the naive approach — one job per rule — rescans the table N
times. Here every ROW-LOCAL rule (not_null, in_range, in_set, matches,
custom predicate) compiles to a conditional-count column of ONE
aggregate, so the whole row-local checklist costs a single scan with
map-side partial aggregation and no shuffle beyond the final 1-row
combine. Table-level rules cost what they inherently cost and nothing
more: ``unique`` is one hash aggregate (sum of max(cnt-1, 0) — counts
surplus rows, not distinct-key pairs), ``references`` is one LEFT ANTI
join (broadcast when the dimension is small — Catalyst picks it up
from the dimension's size, exactly like every other dim join here).

Public prior: AWS Deequ (Schelter et al., VLDB'18) — verification as
declarative constraints compiled to aggregation queries. The reference
repo has no validation surface; builder-brief extension.

Output schema (stable, hashable): (scope, rule, violations, total,
pass) — ``total`` is the row count the rule was evaluated over, and
``pass`` gates the contract into the value hash of the registry query.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    """A checklist over one table. Row-local rules accumulate into one
    conditional aggregate; table-level rules each contribute one extra
    job. ``report()`` unions every rule's (scope, rule, violations,
    total, pass) row."""

    df: DataFrame
    scope: str
    _row_rules: list[tuple[str, Column]] = field(default_factory=list)
    _table_rules: list[tuple[str, "DataFrame"]] = field(default_factory=list)

    # -- row-local rules: one shared scan --------------------------------
    def not_null(self, col: str) -> "Check":
        self._row_rules.append((f"not_null({col})", F.col(col).isNull()))
        return self

    def in_range(self, col: str, lo, hi) -> "Check":
        c = F.col(col)
        self._row_rules.append(
            (f"in_range({col},{lo},{hi})", c.isNull() | (c < lo) | (c > hi))
        )
        return self

    def in_set(self, col: str, values: list) -> "Check":
        c = F.col(col)
        self._row_rules.append(
            (f"in_set({col})", c.isNull() | ~c.isin(values))
        )
        return self

    def matches(self, col: str, regex: str) -> "Check":
        c = F.col(col)
        self._row_rules.append(
            (f"matches({col})", c.isNull() | ~c.rlike(regex))
        )
        return self

    def satisfies(self, name: str, predicate: Column) -> "Check":
        """Custom row predicate; VIOLATION when predicate is not true
        (null-hostile, like the built-ins)."""
        self._row_rules.append((f"satisfies({name})", ~predicate | predicate.isNull()))
        return self

    # -- table-level rules: one job each ---------------------------------
    def unique(self, *cols: str) -> "Check":
        surplus = (
            self.df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(
                F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)).cast("long").alias("violations")
            )
        )
        self._table_rules.append((f"unique({','.join(cols)})", surplus))
        return self

    def references(self, col: str, dim: DataFrame, dim_col: str) -> "Check":
        """Referential integrity: rows whose ``col`` has no match in
        ``dim.dim_col`` (NULL fk counts as a violation — use not_null
        separately if NULLs should be reported under their own rule).
        LEFT ANTI join; Catalyst broadcasts small dims."""
        orphans = (
            self.df.select(F.col(col).alias("_fk"))
            .join(
                dim.select(F.col(dim_col).alias("_fk")).distinct(),
                "_fk",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        )
        self._table_rules.append((f"references({col})", orphans))
        return self

    # -- evaluation ------------------------------------------------------
    def report(self) -> DataFrame:
        """One row per rule: (scope, rule, violations, total, pass).
        Row-local rules share a single scan (conditional counts in one
        aggregate); total is the table's row count for every rule."""
        aggs = [F.count(F.lit(1)).cast("long").alias("_total")] + [
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias(f"_v{i}")
            for i, (_, bad) in enumerate(self._row_rules)
        ]
        base = self.df.agg(*aggs)
        # ONE aggregate row exploded into one output row per rule — a
        # union of per-rule projections would re-execute the aggregate
        # (and re-scan the table) once per rule
        entries = F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"), F.col(f"_v{i}").alias("violations")
                )
                for i, (name, _) in enumerate(self._row_rules)
            ]
        )
        parts = []
        if self._row_rules:
            parts.append(
                base.select(F.col("_total"), F.explode(entries).alias("_e")).select(
                    F.lit(self.scope).alias("scope"),
                    F.col("_e.rule").alias("rule"),
                    F.col("_e.violations").alias("violations"),
                    F.col("_total").alias("total"),
                )
            )
        if self._table_rules:
            tv = None
            for name, vdf in self._table_rules:
                row = vdf.select(
                    F.lit(name).alias("rule"), F.col("violations")
                )
                tv = row if tv is None else tv.unionByName(row)
            # one crossJoin against the 1-row base for ALL table rules
            # (one extra total-count job, not one per rule)
            parts.append(
                tv.crossJoin(base.select("_total")).select(
                    F.lit(self.scope).alias("scope"),
                    "rule",
                    "violations",
                    F.col("_total").alias("total"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.withColumn("pass", F.col("violations") == 0)


def validation_report(*checks: Check) -> DataFrame:
    """Union the reports of several tables' checklists."""
    out = checks[0].report()
    for c in checks[1:]:
        out = out.unionByName(c.report())
    return out
