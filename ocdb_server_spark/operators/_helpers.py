"""Shared helpers for oracle-deterministic operator implementations.

The driver hash-compares Spark output against DuckDB at sf0.01
(order-insensitive value hash). Floating-point aggregation is
order-dependent, and Spark's partition order is nondeterministic, so
any `SUM(double)` can differ in the last bits run-to-run *and* between
engines. The fix used throughout this package: aggregate in exact
DECIMAL arithmetic (order-independent), then cast the final value to
DOUBLE — bit-identical in Spark and DuckDB. See SURVEY.md §4.2.3
("semantic traps") and §7.3.

At 100 TB this costs nothing: decimal sum is still a map-side partial
aggregate + exchange on the group keys; only the accumulator type
changes.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


# str inputs compile to ONE JVM-parsed F.expr (Column composition costs
# ~5 py4j round trips per helper call — it adds up in 8-aggregate
# builds); Column inputs keep the composable object path. Same tree.


def dec(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    """Cast to exact decimal for order-independent aggregation."""
    if isinstance(col, str):
        return F.expr(f"cast({col} as decimal({prec},{scale}))")
    return col.cast(f"decimal({prec},{scale})")


def dsum(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    """Exact decimal sum, surfaced as double (deterministic both engines)."""
    if isinstance(col, str):
        return F.expr(f"cast(sum(cast({col} as decimal({prec},{scale}))) as double)")
    return F.sum(dec(col, prec, scale)).cast("double")


def davg(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    """Deterministic average: exact decimal sum / count, double division."""
    if isinstance(col, str):
        return F.expr(
            f"cast(sum(cast({col} as decimal({prec},{scale}))) as double)"
            f" / count({col})"
        )
    return F.sum(dec(col, prec, scale)).cast("double") / F.count(col)


# Scaled-int64 sum: for inputs that are fixed-point values stored as
# double (TPC-H money/quantity columns have exactly 2 decimal places),
# summing round(x*100) as BIGINT is exact, order-independent, and runs
# in JVM long arithmetic — measured 19% faster than the decimal
# accumulator on the sf0.1 Q1 shape. Overflow bound: the FINAL per-group
# sum must stay under 2^63/scale ≈ 9.2e16 currency units; TPC-H-shaped
# price sums reach ~4e15/group at sf100k (~100 TB) — 20× headroom.
# PRODUCT sums (revenue, charge) scale as 1e4/1e6 per unit and would
# overflow near sf200, so those stay decimal (see revenue_dec) — use
# isum only for linear fixed-point columns.
def isum(col: str | Column, scale: int = 100) -> Column:
    """Exact fixed-point sum via scaled int64, surfaced as double."""
    if isinstance(col, str):
        return F.expr(
            f"sum(cast(round({col} * {scale}) as bigint)) / cast({scale} as double)"
        )
    return F.sum(F.round(col * scale).cast("bigint")) / float(scale)


def iavg(col: str | Column, scale: int = 100) -> Column:
    """Deterministic average via scaled-int64 sum / count."""
    if isinstance(col, str):
        return F.expr(
            f"sum(cast(round({col} * {scale}) as bigint))"
            f" / cast({scale} as double) / count({col})"
        )
    return F.sum(F.round(col * scale).cast("bigint")) / float(scale) / F.count(col)


def sql_isum(expr: str, scale: int = 100) -> str:
    return f"CAST(SUM(CAST(ROUND({expr} * {scale}) AS BIGINT)) AS DOUBLE) / {scale}.0"


def sql_iavg(expr: str, scale: int = 100) -> str:
    return f"{sql_isum(expr, scale)} / COUNT({expr})"


# DuckDB-side SQL fragments mirroring the helpers above (same names so the
# paired oracle strings are easy to audit next to the Spark code).
def sql_dsum(expr: str, prec: int = 18, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, prec: int = 18, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE) / COUNT({expr})"


# Revenue expression used by several TPC-H-style ops: exact decimal
# product so the sum is order-independent.
#   extendedprice(12,2) * (1 - discount(3,2)) -> decimal(17,4), exact.
def revenue_dec() -> Column:
    return F.expr(
        "cast(l_extendedprice as decimal(12,2))"
        " * (1 - cast(l_discount as decimal(3,2)))"
    )


SQL_REVENUE_DEC = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))"
