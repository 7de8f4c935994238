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


def reorder_front(names: list[str]) -> None:
    """Move ``names`` (in the given order) to the front of the registry.

    Registration order is load-bearing: the verification driver grades
    the FIRST 50 registered queries, so the SURVEY §2.B contract rows
    must precede extension queries regardless of module import order.
    Unknown names raise (a typo here would silently un-grade a contract
    row); queries not named keep their existing relative order after
    the front block.
    """
    missing = [n for n in names if n not in REGISTRY]
    if missing:
        raise ValueError(f"reorder_front: unknown queries {missing}")
    front = {n: REGISTRY[n] for n in names}
    rest = {n: s for n, s in REGISTRY.items() if n not in front}
    REGISTRY.clear()
    REGISTRY.update(front)
    REGISTRY.update(rest)


def all_queries() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect registration) and return them."""
    from . import queries as _queries  # noqa: F401  (registers on import)

    return dict(REGISTRY)
