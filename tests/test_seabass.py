"""SeaBASS-style ingest tests (SURVEY.md §5.2.2) — inline golden
documents, mirroring the reference's reader tests
(`tests/core/seabass/test_sb_file_reader.py` [U]): delimiter handling,
/missing and /below_detection_limit → NULL, typed records."""

from __future__ import annotations

import math

import pytest

from ocdb_server_spark.sources.seabass import FIXTURE, parse_header, read_seabass


def test_parse_header_keys():
    header = parse_header(FIXTURE.splitlines()[:10])
    assert header["investigators"] == "Jane_Doe"
    assert header["delimiter"] == "comma"
    assert header["missing"] == "-999"
    assert header["below_detection_limit"] == "-888"
    assert header["fields"] == "depth,chl,wt,sal"


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("seabass") / "exp2024.sb"
    p.write_text(FIXTURE)
    return str(p)


def test_read_seabass_schema_and_types(spark, fixture_path):
    df = read_seabass(spark, fixture_path)
    assert df.columns == ["depth", "chl", "wt", "sal"]
    assert all(f.dataType.typeName() == "double" for f in df.schema.fields)


def test_read_seabass_null_tokens(spark, fixture_path):
    rows = {r["depth"]: r for r in read_seabass(spark, fixture_path).collect()}
    assert set(rows) == {1.0, 2.5, 5.0, 7.5, 10.0}
    assert math.isclose(rows[1.0]["chl"], 0.52)
    assert rows[2.5]["chl"] is None          # /missing=-999
    assert rows[5.0]["wt"] is None           # /missing in another column
    assert rows[7.5]["sal"] is None          # /below_detection_limit=-888
    assert rows[10.0]["chl"] is None
    assert math.isclose(rows[10.0]["sal"], 34.7)


def test_read_seabass_space_delimiter(spark, tmp_path):
    text = (
        "/begin_header\n/delimiter=space\n/missing=-9\n"
        "/fields=a,b\n/end_header\n1 2\n3 -9\n"
    )
    p = tmp_path / "sp.sb"
    p.write_text(text)
    rows = sorted(read_seabass(spark, str(p)).collect(), key=lambda r: r["a"])
    assert [(r["a"], r["b"]) for r in rows] == [(1.0, 2.0), (3.0, None)]


def test_read_seabass_missing_fields_header(spark, tmp_path):
    p = tmp_path / "bad.sb"
    p.write_text("/begin_header\n/end_header\n1,2\n")
    with pytest.raises(ValueError, match="fields"):
        read_seabass(spark, str(p))


def test_read_seabass_no_end_header(spark, tmp_path):
    p = tmp_path / "noend.sb"
    p.write_text("/begin_header\n/fields=a\n1\n")
    with pytest.raises(ValueError, match="end_header"):
        read_seabass(spark, str(p))
