"""Query registry — the single source of truth for the engine's surface.

Every operator implemented from SURVEY.md §2 registers here as a
``QuerySpec``: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus
(when SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs
on the same parquet tables.  ``__spark_entry__`` re-exports this
registry to the driver; ``tests/test_oracle_parity.py`` replays the
same comparison locally.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query function to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


_PLAN_MODULES = (
    "relational", "relational2", "relational3", "relational4", "json_ops",
    "windows", "incremental", "streaming_plans", "extensions", "dedup_plans",
    "text_plans", "text_plans2", "pandas_ops", "curation_pipeline",
)


def _load_all() -> None:
    """Import every plan module so registration side-effects run."""
    pkg = __name__.rsplit(".", 1)[0]
    for mod in _PLAN_MODULES:
        __import__(f"{pkg}.{mod}")


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
