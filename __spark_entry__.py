"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All operators live in ``ocdb_server_spark`` (one module per SURVEY.md
§2 category); this file just exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ocdb_server_spark.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q5-shaped
    6-table star join (op39) — scan + broadcast joins + agg + exact
    decimal revenue."""
    ops = load_all()
    return ops["op39_join_multiway_star"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: op.fn for name, op in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every hash-checked operator;
    ROWS-only ops (approx/nondeterministic/non-SQL semantics) are
    omitted by design — see SURVEY.md §2's oracle legend."""
    return {name: op.oracle for name, op in load_all().items() if op.oracle is not None}
