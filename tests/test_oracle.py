"""Local mirror of the driver's DuckDB-oracle gate (SURVEY.md §5.2.1).

For every registered operator with an oracle, run the Spark DataFrame
and the DuckDB SQL on the same parquet tables and compare:
row count, column-name set, and order-insensitive values — with
STRICT equality (floats compared exactly after canonical
normalization), which is the most demanding interpretation of the
driver's value-hash. Runs at sf0.001 for speed; set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to mirror the driver
exactly.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pytest

from ocdb_server_spark.registry import load_all

OPS = load_all()
ORACLE_OPS = sorted(name for name, op in OPS.items() if op.oracle is not None)
ROWS_OPS = sorted(name for name, op in OPS.items() if op.oracle is None)


def _norm_cell(v):
    """Canonicalize a cell for strict cross-engine comparison."""
    if v is None:
        return None
    try:
        if v != v:  # NaN (pandas NaT/nan), treat as NULL like the engines' parquet NULLs
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, (int,)):
        return ("i", int(v))
    if isinstance(v, datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if hasattr(v, "isoformat"):  # pandas Timestamp
        return ("t", v.tz_localize(None).isoformat() if getattr(v, "tz", None) else v.isoformat())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bool):
        return ("b", v)
    return v


def _frame_to_rows(df) -> tuple[list[str], list[tuple]]:
    import pandas as pd  # noqa: F401

    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


@pytest.mark.parametrize("name", ORACLE_OPS)
def test_oracle_match(name, spark, duck, sf_dir):
    op = OPS[name]
    spark_pdf = op.fn(spark, sf_dir).toPandas()
    # Arrow fetch keeps DECIMAL as Decimal and DATE as date objects
    # (fetchdf would degrade them to float64/datetime64, masking real
    # type mismatches the driver's hash would catch).
    duck_pdf = duck.execute(op.oracle).arrow().to_pandas()

    s_cols, s_rows = _frame_to_rows(spark_pdf)
    d_cols, d_rows = _frame_to_rows(duck_pdf)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatching rows; first 3: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_OPS)
def test_rows_only_runs(name, spark, sf_dir):
    """ROWS-only ops must at least run and return a stable schema."""
    op = OPS[name]
    df = op.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_math_never_nan(spark, duck, sf_dir):
    """Sanity: no silent NaN/Inf leaking from the decimal-exact paths."""
    pdf = OPS["op17_agg_groupby"].fn(spark, sf_dir).toPandas()
    for col in pdf.columns:
        if pdf[col].dtype.kind == "f":
            assert not pdf[col].map(lambda x: x is not None and (math.isnan(x) or math.isinf(x))).any()
