"""Unit tests for the Lucene-ish expr → Column compiler (SURVEY.md
§7.4; mirrors the reference's parser test habit — golden ASTs plus
error positions, `tests/core/query/test_parser.py` [U])."""

from __future__ import annotations

import pytest

from ocdb_server_spark.plans.expr_compiler import (
    BinaryOpQuery,
    FieldRangeQuery,
    FieldValueQuery,
    FieldWildcardQuery,
    PhraseQuery,
    QueryParser,
    QuerySyntaxError,
    UnaryOpQuery,
    compile_expr,
    tokenize,
)

# ------------------------------------------------------------- tokenizer


def test_tokenize_kinds_and_positions():
    toks = tokenize('name:widget AND size:[1 TO 5] "deep sea"')
    kinds = [t.kind for t in toks]
    assert kinds == [
        "word", "colon", "word",          # name : widget
        "word",                            # AND
        "word", "colon",                   # size :
        "lbrack", "word", "word", "word", "rbrack",  # [ 1 TO 5 ]
        "quoted",                          # "deep sea"
    ]
    assert toks[0].pos == 0
    assert toks[-1].text == '"deep sea"'


# ----------------------------------------------------------- parser ASTs


@pytest.mark.parametrize(
    "expr,ast",
    [
        ("chl", PhraseQuery("chl")),
        ('"deep sea"', PhraseQuery("deep sea")),
        ("name:widget", FieldValueQuery("name", "widget")),
        ('investigators:"Jane Doe"', FieldValueQuery("investigators", "Jane Doe")),
        ("depth:[10 TO 100]", FieldRangeQuery("depth", "10", "100")),
        ("depth:[* TO 100]", FieldRangeQuery("depth", "*", "100")),
        ("name:*widget*", FieldWildcardQuery("name", "*widget*")),
        ("name:?ed*", FieldWildcardQuery("name", "?ed*")),
        ("NOT name:x", UnaryOpQuery("NOT", FieldValueQuery("name", "x"))),
        ("-name:x", UnaryOpQuery("-", FieldValueQuery("name", "x"))),
        ("+name:x", UnaryOpQuery("+", FieldValueQuery("name", "x"))),
        (
            "a:1 AND b:2",
            BinaryOpQuery("AND", FieldValueQuery("a", "1"), FieldValueQuery("b", "2")),
        ),
        (   # juxtaposition = AND (reference grammar)
            "a:1 b:2",
            BinaryOpQuery("AND", FieldValueQuery("a", "1"), FieldValueQuery("b", "2")),
        ),
        (
            "a:1 OR b:2 AND c:3",  # AND binds tighter than OR
            BinaryOpQuery(
                "OR",
                FieldValueQuery("a", "1"),
                BinaryOpQuery("AND", FieldValueQuery("b", "2"), FieldValueQuery("c", "3")),
            ),
        ),
        (
            "(a:1 OR b:2) AND c:3",
            BinaryOpQuery(
                "AND",
                BinaryOpQuery("OR", FieldValueQuery("a", "1"), FieldValueQuery("b", "2")),
                FieldValueQuery("c", "3"),
            ),
        ),
    ],
)
def test_parse_golden(expr, ast):
    assert QueryParser.parse(expr) == ast


@pytest.mark.parametrize(
    "bad",
    [
        "(a:1",            # unclosed paren
        "depth:[1 5]",     # missing TO
        "depth:[1 TO 5",   # unclosed bracket
        "name:",           # missing value
        "a:1)",            # trailing token
    ],
)
def test_parse_errors_raise_with_position(bad):
    with pytest.raises(QuerySyntaxError):
        QueryParser.parse(bad)


# ---------------------------------------------- compiled predicate semantics


@pytest.fixture(scope="module")
def parts(spark):
    return spark.createDataFrame(
        [
            (1, "green widget", 10, "alpha lab"),
            (2, "red gadget", 50, "beta lab"),
            (3, "blue widget", 100, "alpha works"),
            (4, "red widget", 5, "gamma lab"),
        ],
        "id int, name string, size int, affil string",
    )


def _ids(df, cond):
    return sorted(r["id"] for r in df.filter(cond).collect())


def test_compile_field_value(parts):
    assert _ids(parts, compile_expr("name:'red gadget'".replace("'", '"'))) == [2]


def test_compile_range_numeric(parts):
    assert _ids(parts, compile_expr("size:[10 TO 100]")) == [1, 2, 3]
    assert _ids(parts, compile_expr("size:[* TO 10]")) == [1, 4]


def test_compile_wildcard(parts):
    assert _ids(parts, compile_expr("name:*widget*")) == [1, 3, 4]
    assert _ids(parts, compile_expr("name:r?d*")) == [2, 4]


def test_compile_bool_combinators(parts):
    assert _ids(parts, compile_expr("name:*widget* AND size:[10 TO *]")) == [1, 3]
    assert _ids(parts, compile_expr("size:[* TO 5] OR size:[100 TO *]")) == [3, 4]
    assert _ids(parts, compile_expr("NOT name:*widget*")) == [2]
    assert _ids(parts, compile_expr("-name:*widget* size:[* TO 60]")) == [2]


def test_compile_phrase_default_fields(parts):
    cond = compile_expr("lab", default_fields=["name", "affil"])
    assert _ids(parts, cond) == [1, 2, 4]


def test_phrase_without_default_fields_raises():
    with pytest.raises(QuerySyntaxError):
        compile_expr("orphan")


def test_predicate_pushes_into_scan(spark, sf_dir):
    """The compiled Column must reach the parquet scan as a pushed
    filter — the whole point of compiling to Catalyst instead of
    evaluating post-hoc (reference pushes into Mongo; we push into
    the ParquetScan)."""
    from ocdb_server_spark.io import load_table

    df = load_table(spark, sf_dir, "part").filter(
        compile_expr("p_size:[1 TO 15]")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "p_size" in plan.split("PushedFilters:")[1][:200]
