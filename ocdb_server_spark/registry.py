"""Central operator registry.

Every operator from SURVEY.md §2 registers here via the ``@register``
decorator. ``__spark_entry__.py`` exposes the registry to the driver:
``queries()`` returns {name: callable(spark, sf_dir) -> DataFrame} and
``oracle_sql()`` returns {name: ANSI SQL} for the DuckDB hash-match.

Operators whose semantics are approximate / nondeterministic / not
ANSI-expressible register with ``oracle=None`` → the driver records a
weaker rows-only check (SURVEY.md §2, "ROWS" legend).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, Op] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an operator implementation under a stable SURVEY.md §2 key."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate operator key: {name}")
        REGISTRY[name] = Op(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, Op]:
    """Import every operator module (side effect: fills REGISTRY).

    Import order = registry iteration order = the order the driver's
    correctness sweep visits queries. Cheapest families first (pure
    column expressions, single-shuffle aggs/joins) so a wall-clock
    budget certifies the most operators before the expensive iterative
    / streaming / ANN families run — insurance against a repeat of the
    round-1 sweep cutoff at 50/113."""
    from ocdb_server_spark.operators import (  # noqa: F401
        filters,
        sorting,
        setops,
        functions,
        windows,
        scans,
        aggregates,
        joins,
        relational_ext,
        pipeline_r2,
        pipeline_r3,
        udfs,
        northstar,
        pipeline_ext,
        components,
        streaming_batch,
    )

    return REGISTRY
