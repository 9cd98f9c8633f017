"""Gate-shape self-check: simulate the driver canonicalizer's limits.

Round 1 lost certification credit to two representational (not
logical) failures:

- op96/op107 returned array-typed columns → the driver's pandas-based
  canonicalizer crashed with `unhashable type: 'list'` (recorded in
  CORRECTNESS_r01.json). This bites ROWS ops too — the rows-only check
  still canonicalizes the frame.
- op06 returned a DECIMAL column → values matched as multisets but the
  Decimal-vs-float representation hashed differently across pandas.

So the contract for every observable surface in `queries()`:

1. no ArrayType / MapType / StructType output column, ever;
2. no DecimalType output column (surface as DOUBLE or canonical
   VARCHAR instead — see operators/_helpers.dsum and op67);
3. column names unique (pandas canonicalization is name-keyed).

This test builds every registered operator's DataFrame and asserts the
schema obeys all three — a regression here would silently cost a green
CORRECTNESS row next sweep.
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

from ocdb_server_spark.registry import load_all

OPS = load_all()

# Ops whose fn performs eager work at build time (streaming
# availableNow runs, sink roundtrips). Their schemas are still checked —
# they're just slower; nothing is exempt from the shape contract.
ALL_OPS = sorted(OPS)


def test_row_is_green_predicate():
    """Sweep-order regression test (round-3 verdict item 1): a row that
    ERRORED must not count as certified — else a fixed op sorts behind
    every never-swept op and, under the ~50-entry budget, is never
    re-checked (op96/op107 sat on stale r1 crash rows for two rounds)."""
    from ocdb_server_spark.registry import _row_is_green

    green_sql = {
        "rows_match": True, "schema_match": True, "hash_match": True,
        "spark_rows": 10, "oracle_rows": 10, "err": None,
    }
    green_rows_only = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows": 27, "oracle_rows": None, "err": "no_oracle",
    }
    crashed = dict(green_rows_only, spark_rows=None, err="TypeError: boom")
    hash_mismatch = dict(green_sql, hash_match=False)
    no_oracle_no_rows = dict(green_rows_only, spark_rows=None)

    assert _row_is_green(green_sql)
    assert _row_is_green(green_rows_only)
    assert not _row_is_green(crashed)
    assert not _row_is_green(hash_mismatch)
    assert not _row_is_green(no_oracle_no_rows)
    assert not _row_is_green(None)


def test_sweep_order_fronts_errored_ops():
    """With the real CORRECTNESS_r01-r03 files on disk, op96/op107 (whose
    only rows are r1 canonicalizer crashes) must sort in the uncertified
    front group, before any op with a green row."""
    keys = list(OPS)
    certified_example = "op17_agg_groupby"  # hash-green since r2
    for stale in ("op96_dedup_components", "op107_agg_approx_percentile"):
        assert keys.index(stale) < keys.index(certified_example), (
            f"{stale} must re-sweep before already-certified ops"
        )


@pytest.mark.parametrize("name", ALL_OPS)
def test_output_schema_is_canonicalizer_safe(name, spark, sf_dir):
    df = OPS[name].fn(spark, sf_dir)
    seen: set[str] = set()
    for field in df.schema.fields:
        assert field.name not in seen, f"{name}: duplicate output column {field.name!r}"
        seen.add(field.name)
        dt = field.dataType
        assert not isinstance(dt, (ArrayType, MapType, StructType)), (
            f"{name}: column {field.name!r} is {dt.simpleString()} — complex "
            "types crash the driver's canonicalizer (round-1 op96/op107); "
            "stringify with array_join/to_json or emit scalar columns"
        )
        assert not isinstance(dt, DecimalType), (
            f"{name}: column {field.name!r} is {dt.simpleString()} — DECIMAL "
            "hashes ambiguously across pandas (round-1 op06); cast to "
            "double or canonical varchar on BOTH engine and oracle sides"
        )
