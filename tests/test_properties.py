"""Property-based tests (SURVEY.md §5.2.3).

Hypothesis drives the pure-Python surfaces (expr parser round-trip,
header parse) where thousands of examples are free. Spark-side
invariants (paging partition, dedup idempotence, cosine bounds) use
seeded-random data evaluated in ONE batched job per property — a
per-example Spark job would turn a millisecond property into a
minutes-long suite.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ocdb_server_spark.plans.expr_compiler import (
    BinaryOpQuery,
    FieldRangeQuery,
    FieldValueQuery,
    FieldWildcardQuery,
    QueryParser,
    UnaryOpQuery,
)

# ------------------------------------------------- expr parser round-trip

_field = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s.upper() not in ("AND", "OR", "NOT", "TO")
)
_value = st.from_regex(r"[a-zA-Z0-9_.]{1,10}", fullmatch=True).filter(
    lambda s: s.upper() not in ("AND", "OR", "NOT", "TO") and s[0] not in "+-"
)


def _leaf():
    return st.one_of(
        st.builds(FieldValueQuery, _field, _value),
        st.builds(FieldRangeQuery, _field, _value, _value),
        st.builds(
            FieldWildcardQuery,
            _field,
            _value.map(lambda v: f"*{v}?"),
        ),
    )


_query = st.recursive(
    _leaf(),
    lambda children: st.one_of(
        st.builds(UnaryOpQuery, st.just("NOT"), children),
        st.builds(BinaryOpQuery, st.sampled_from(["AND", "OR"]), children, children),
    ),
    max_leaves=8,
)


def _render(q) -> str:
    """Render an AST back to reference syntax with full parenthesization
    (so precedence can't change the tree)."""
    if isinstance(q, FieldValueQuery):
        return f"{q.field}:{q.value}"
    if isinstance(q, FieldRangeQuery):
        return f"{q.field}:[{q.lo} TO {q.hi}]"
    if isinstance(q, FieldWildcardQuery):
        return f"{q.field}:{q.pattern}"
    if isinstance(q, UnaryOpQuery):
        return f"NOT ({_render(q.child)})"
    if isinstance(q, BinaryOpQuery):
        return f"({_render(q.left)}) {q.op} ({_render(q.right)})"
    raise TypeError(type(q))


@given(_query)
@settings(max_examples=300, deadline=None)
def test_parse_render_roundtrip(q):
    assert QueryParser.parse(_render(q)) == q


@given(st.dictionaries(_field, _value, min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_parse_header_roundtrip(kv):
    from ocdb_server_spark.sources.seabass import parse_header

    lines = ["/begin_header"] + [f"/{k}={v}" for k, v in kv.items()] + ["/end_header"]
    assert parse_header(lines) == kv


# ------------------------------------------------------ paging invariants


def test_pagination_partitions_the_result(spark, sf_dir):
    """Pages (deterministic total order) are disjoint and their union is
    the whole filtered set — the reference's offset/count contract
    (`find().skip().limit()` [U], op52)."""
    from ocdb_server_spark.io import load_table

    base = load_table(spark, sf_dir, "orders").filter("o_totalprice > 100000")
    total = base.count()
    ordered = base.orderBy("o_orderkey")
    for page_size in (7, 50, 333):
        seen: list[int] = []
        off = 0
        while off < total:
            page = ordered.offset(off).limit(page_size).select("o_orderkey").collect()
            assert len(page) == min(page_size, total - off)
            seen.extend(r["o_orderkey"] for r in page)
            off += page_size
        assert len(seen) == total
        assert len(set(seen)) == total  # disjoint
        assert seen == sorted(seen)     # ordered union = whole


# --------------------------------------------------- dedup idempotence


def test_dedup_idempotent(spark, sf_dir):
    from ocdb_server_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    once = docs.dropDuplicates(["text"])
    twice = once.dropDuplicates(["text"])
    n1, n2 = once.count(), twice.count()
    assert n1 == n2
    assert n1 <= docs.count()


# ------------------------------------------- cosine symmetry and bounds


def test_cosine_properties_batched(spark):
    """cos(a,b) == cos(b,a), |cos| <= 1, cos(a,a) == 1 — checked for 200
    seeded random vector pairs in one Spark job, against numpy."""
    from ocdb_server_spark.functions.vector import cosine

    rng = np.random.default_rng(42)
    pairs = [
        (i, rng.standard_normal(16).tolist(), rng.standard_normal(16).tolist())
        for i in range(200)
    ]
    df = spark.createDataFrame(pairs, "id int, a array<double>, b array<double>")
    from pyspark.sql import functions as F

    out = df.select(
        "id",
        cosine(F.col("a"), F.col("b")).alias("ab"),
        cosine(F.col("b"), F.col("a")).alias("ba"),
        cosine(F.col("a"), F.col("a")).alias("aa"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    for i, a, b in pairs:
        r = by_id[i]
        expect = float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        )
        assert r["ab"] == pytest.approx(expect, abs=1e-9)
        assert r["ab"] == pytest.approx(r["ba"], abs=1e-12)  # symmetry
        assert -1.0 - 1e-12 <= r["ab"] <= 1.0 + 1e-12        # bounds
        assert r["aa"] == pytest.approx(1.0, abs=1e-12)      # self-similarity


def test_normalize_unit_norm_batched(spark):
    from pyspark.sql import functions as F

    from ocdb_server_spark.functions.vector import l2_norm_d, normalize

    rng = np.random.default_rng(7)
    vecs = [(i, rng.standard_normal(32).tolist()) for i in range(100)]
    df = spark.createDataFrame(vecs, "id int, v array<double>")
    out = df.select(l2_norm_d(normalize(F.col("v"))).alias("n")).collect()
    assert all(r["n"] == pytest.approx(1.0, abs=1e-9) for r in out)
