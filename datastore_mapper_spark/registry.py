"""Query registry backing ``__spark_entry__.py``.

Each SURVEY.md §2.B contract row registers here as a :class:`QuerySpec`:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (for
oracle-checked queries) the equivalent DuckDB SQL.  The driver compares
the two at sf0.01 by row count + schema + order-insensitive value hash,
so every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    category: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does a rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    category: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a contract query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            category=category,
            fn=fn,
            oracle=oracle.strip() if oracle else None,
            description=description or (fn.__doc__ or "").strip(),
            tags=tags,
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect registration) and return them."""
    from . import queries as _queries  # noqa: F401  (registers on import)

    return dict(REGISTRY)
