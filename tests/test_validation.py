"""Validation rule engine tests (SURVEY.md §3.2 parity: one test per
rule kind + severity rollup, mirroring the reference's per-rule test
habit), including the end-to-end ingest→validate pipeline over the
SeaBASS fixture and a plan assertion that no Python UDF sneaks in."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ocdb_server_spark.sources.seabass import FIXTURE, read_seabass
from ocdb_server_spark.validation import (
    ERROR,
    OK,
    WARNING,
    custom,
    regex_match,
    required,
    status_rollup,
    validate,
    value_range,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "CR001"),
            (2, None, "CR002"),      # required violation (ERROR)
            (3, 999.0, "CR003"),     # range violation (ERROR)
            (4, 20.0, "bad id"),     # format violation (WARNING)
            (5, 999.0, "bad id"),    # range + format
        ],
        "id long, depth double, cruise string",
    )


@pytest.fixture(scope="module")
def rules(spark):
    # built lazily: Column construction needs an active SparkContext
    return [
        required("depth"),
        value_range("depth", 0.0, 100.0),
        regex_match("cruise", r"^CR\d+$"),
    ]


def test_issue_and_status_per_row(frame, rules):
    out = {r["id"]: r for r in validate(frame, rules).collect()}
    assert out[1]["status"] == OK and out[1]["issues"] == []
    assert out[2]["status"] == ERROR
    assert [i["rule"] for i in out[2]["issues"]] == ["required_depth"]
    assert out[3]["status"] == ERROR
    assert [i["rule"] for i in out[3]["issues"]] == ["range_depth"]
    assert out[4]["status"] == WARNING
    assert [i["rule"] for i in out[4]["issues"]] == ["format_cruise"]
    assert out[5]["status"] == ERROR  # worst severity wins
    assert {i["rule"] for i in out[5]["issues"]} == {"range_depth", "format_cruise"}


def test_custom_rule(frame):
    r = custom("depth_even", (F.col("depth") % 2 != 0), "depth must be even", WARNING)
    out = {x["id"]: x["status"] for x in validate(frame, [r]).collect()}
    assert out[1] == OK  # 10.0 is even
    assert out[2] == OK  # null → no violation fired


def test_bad_severity_rejected():
    with pytest.raises(ValueError, match="severity"):
        custom("x", F.lit(True), "m", "FATAL")


def test_status_rollup_worst_wins(frame, rules):
    validated = validate(frame.withColumn("file", F.col("id") % 2), rules)
    roll = {r["file"]: r for r in status_rollup(validated, ["file"]).collect()}
    # file 0: ids 2,4 → ERROR+WARNING → ERROR; file 1: ids 1,3,5 → ERROR
    assert roll[0]["status"] == ERROR
    assert roll[1]["status"] == ERROR
    assert roll[0]["n_records"] == 2
    assert roll[1]["n_records"] == 3


def test_all_clean_rolls_up_ok(spark):
    df = spark.createDataFrame([(1, 5.0)], "id long, depth double")
    v = validate(df, [value_range("depth", 0, 10)])
    assert status_rollup(v.withColumn("f", F.lit(0)), ["f"]).collect()[0]["status"] == OK


def test_seabass_ingest_validate_end_to_end(spark, tmp_path):
    """The reference's upload path: parse → validate → status rollup
    (SURVEY.md §3.2), all JVM expressions."""
    p = tmp_path / "exp.sb"
    p.write_text(FIXTURE)
    df = read_seabass(spark, str(p))
    rules = [
        required("chl", severity=WARNING),      # /missing is a data gap → warn
        value_range("depth", 0.0, 1000.0),
        value_range("sal", 0.0, 45.0),
    ]
    v = validate(df, rules)
    statuses = [r["status"] for r in v.collect()]
    assert statuses.count(WARNING) >= 2  # the -999/-888 chl rows
    roll = status_rollup(v.withColumn("file", F.lit("exp.sb")), ["file"]).collect()[0]
    assert roll["status"] == WARNING
    assert roll["n_records"] == 5


def test_validation_stays_in_jvm(frame, rules):
    """No BatchEvalPython / PythonUDF nodes — the engine's whole point
    vs the reference's row-at-a-time Python."""
    plan = validate(frame, rules)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
