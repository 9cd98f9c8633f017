"""Upsert-sink tests: keep-latest merge semantics and the dynamic
partition overwrite property (untouched partitions' files are not
rewritten)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from ocdb_server_spark.sinks import upsert_partitioned, write_partitioned


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "serving")
    base = spark.createDataFrame(
        [
            (1, "a", 1, "p1"),
            (2, "b", 1, "p1"),
            (3, "c", 1, "p2"),
            (4, "d", 1, "p3"),
        ],
        "id long, val string, version int, part string",
    )
    write_partitioned(base, path, "part")
    return path


def test_upsert_keeps_latest_per_key(spark, table):
    updates = spark.createDataFrame(
        [
            (2, "b2", 2, "p1"),   # newer version of key 2
            (5, "e", 1, "p2"),    # brand-new key in existing partition
        ],
        "id long, val string, version int, part string",
    )
    upsert_partitioned(spark, table, updates, keys=["id"], order_col="version", partition_col="part")
    got = {
        r["id"]: (r["val"], r["version"])
        for r in spark.read.parquet(table).collect()
    }
    assert got == {
        1: ("a", 1),
        2: ("b2", 2),
        3: ("c", 1),
        4: ("d", 1),
        5: ("e", 1),
    }


def test_stale_update_loses(spark, table):
    updates = spark.createDataFrame(
        [(1, "stale", 0, "p1")], "id long, val string, version int, part string"
    )
    upsert_partitioned(spark, table, updates, keys=["id"], order_col="version", partition_col="part")
    got = {r["id"]: r["val"] for r in spark.read.parquet(table).collect()}
    assert got[1] == "a"  # version 0 < 1 → existing row survives


def test_untouched_partitions_not_rewritten(spark, table):
    """p3's files must be byte-identical after an update touching only
    p1 — the dynamic-overwrite property that bounds merge cost."""
    p3_dir = os.path.join(table, "part=p3")
    before = {
        f: os.path.getmtime(os.path.join(p3_dir, f))
        for f in os.listdir(p3_dir)
        if f.endswith(".parquet")
    }
    updates = spark.createDataFrame(
        [(2, "b3", 3, "p1")], "id long, val string, version int, part string"
    )
    upsert_partitioned(spark, table, updates, keys=["id"], order_col="version", partition_col="part")
    after = {
        f: os.path.getmtime(os.path.join(p3_dir, f))
        for f in os.listdir(p3_dir)
        if f.endswith(".parquet")
    }
    assert before == after  # same files, same mtimes: never rewritten
    got = {r["id"]: r["val"] for r in spark.read.parquet(table).collect()}
    assert got[2] == "b3" and got[4] == "d"


def test_empty_update_is_noop(spark, table):
    updates = spark.createDataFrame([], "id long, val string, version int, part string")
    before = spark.read.parquet(table).count()
    upsert_partitioned(spark, table, updates, keys=["id"], order_col="version", partition_col="part")
    assert spark.read.parquet(table).count() == before


def test_python_datasource_partitions_and_determinism(spark):
    """op152's synth source: one task per declared partition, rows
    deterministic across reads."""
    from ocdb_server_spark.sources import pyds

    pyds.register(spark)
    df = (
        spark.read.format("synth_events")
        .option("rows", 1000)
        .option("partitions", 8)
        .load()
    )
    parts = sorted(r.part for r in df.select("part").distinct().collect())
    assert parts == list(range(8))
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b and len(a) == 1000
    # hval formula matches the documented Knuth hash
    assert all(h == (i * 2654435761) % 10000 for i, _, h in a)


def test_gzip_jsonl_files_are_one_task_each(spark, sf_dir, tmp_path):
    """op207's documented scale trade: gzip is not splittable, so each
    .gz shard maps to exactly ONE read task regardless of
    maxPartitionBytes — which is why the export shards into many
    moderate files. Also proves the shard-size knob works and the
    round-trip loses nothing."""
    import glob

    from ocdb_server_spark.io import load_table

    out = str(tmp_path / "gz")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    n = d.count()
    (
        d.repartition(1)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .option("maxRecordsPerFile", max(1, n // 4))
        .json(out)
    )
    files = glob.glob(out + "/*.json.gz")
    assert len(files) >= 2, "fixture must produce multiple shards"
    back = spark.read.schema("doc_id long, text string, lang string").json(out)
    assert back.count() == n
    assert back.rdd.getNumPartitions() == len(files)
