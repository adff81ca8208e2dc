"""Named query registry — the driver-facing surface.

Every implemented operator/workload from SURVEY.md §2 registers here as a
named query ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
an equivalent DuckDB oracle SQL string. ``__spark_entry__`` re-exports
this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over views region/nation/.../embeddings
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, bench: bool = False):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all plan modules (side effect: registration)."""
    from . import reference  # noqa: F401
    from . import relational  # noqa: F401
    from . import tpch  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import text  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import pipeline  # noqa: F401
    from . import skew  # noqa: F401
    from . import temporal  # noqa: F401
    from . import profile  # noqa: F401

    return REGISTRY
