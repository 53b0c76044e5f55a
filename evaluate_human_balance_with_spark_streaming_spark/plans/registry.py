"""Query registry: the single source of truth binding each implemented
operator to (a) its Spark implementation and (b) its DuckDB oracle SQL.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry. Register with::

    @register("q_name", oracle="SELECT ...")
    def q_name(spark, sf_dir) -> DataFrame: ...

Rules that keep the driver's order-insensitive value-hash comparison
meaningful (see repo __spark_entry__.py docstring):
- alias every computed column identically in Spark and SQL;
- round floating aggregates to a fixed precision on both sides;
- render timestamps/dates as strings with an explicit format;
- break ties deterministically before any LIMIT.

Queries whose semantics SQL can't express (streaming with state,
pandas-UDF feature extraction) register ``oracle=None`` → the driver
records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import analytics, analytics_ext, stedi_queries  # noqa: F401
    from ..operators import dedup, similarity, text_queries, multimodal  # noqa: F401
    from ..streaming import stream_queries  # noqa: F401
