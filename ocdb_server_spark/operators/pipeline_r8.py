"""Round-8 operators: the mini table-log (op255).

op255 composes the three lakehouse pieces certified separately in
earlier rounds into ONE multi-commit snapshot contract (round-7
verdict "next round" item 5 — the last uncomposed lakehouse
capability):

  - op234's atomic manifest commit (os.replace IS the commit point),
  - op228's merge-on-read position deletes (`_metadata.file_path` +
    `row_index` anti-join — no key lookup, no base rewrite),
  - op178's compaction step (rewrite live rows, drop delete files).

The real table formats (Delta/Iceberg) are absent from this container
(no jars), so the LOG is the honest miniature: one JSON file per
version holding the full snapshot listing — data files + position-
delete files — committed atomically. Readers resolve a version from
the log only; data files are immutable, so a reader pinned to
version N is isolated from every later commit by construction.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.registry import register


# --------------------------------------------------------------------------
# table-log primitives (used by op255 and the crash-window tests)
# --------------------------------------------------------------------------


def log_dir(root: str) -> str:
    return os.path.join(root, "log")


def log_commit(
    root: str, version: int, files: list[str], delete_files: list[str]
) -> None:
    """Atomically commit snapshot `version`: write the full listing to
    a tmp file, then os.replace it to `log/v{version}.json` — either
    the version exists (committed) or it doesn't; a crash before the
    replace leaves orphan data files no reader ever resolves
    (op234's commit discipline, per-version)."""
    os.makedirs(log_dir(root), exist_ok=True)
    entry = {
        "version": version,
        "files": sorted(files),
        "delete_files": sorted(delete_files),
    }
    path = os.path.join(log_dir(root), f"v{version}.json")
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, path)  # the atomic commit point


def latest_version(root: str) -> int:
    """Highest committed version (0 = empty table). Readers call this,
    never listdir the data directory."""
    try:
        names = os.listdir(log_dir(root))
    except FileNotFoundError:
        return 0
    vs = [
        int(n[1:-5])
        for n in names
        if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit()
    ]
    return max(vs, default=0)


def read_log(root: str, version: int) -> dict:
    with open(os.path.join(log_dir(root), f"v{version}.json")) as f:
        return json.load(f)


def read_snapshot(spark: SparkSession, root: str, version: int) -> DataFrame:
    """Resolve snapshot `version` from the log: union its immutable
    data files, then anti-join its position-delete files on
    (file_path, row_index) — op228's MoR read path. The delete side
    is metadata-sized and broadcast; real engines push the same join
    into the scan as a per-file bitmap."""
    entry = read_log(root, version)
    base = spark.read.parquet(*entry["files"]).withColumns(
        {
            "_file": F.col("_metadata.file_path"),
            "_pos": F.col("_metadata.row_index"),
        }
    )
    if entry["delete_files"]:
        deletes = spark.read.parquet(*entry["delete_files"]).select(
            "_file", "_pos"
        )
        base = base.join(
            F.broadcast(deletes), ["_file", "_pos"], "left_anti"
        )
    return base.drop("_file", "_pos")


def _parquet_files(path: str) -> list[str]:
    return [
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.endswith(".parquet")
    ]


def build_table_log(
    spark: SparkSession, sf_dir: str, root: str, upto_version: int = 3
) -> None:
    """Drive the three commits of op255's contract against `root`:

      v1  append: orders (3 columns) written as 4 immutable files
      v2  delete: position-delete file for o_orderkey % 7 = 0
                  (base files UNCHANGED — merge-on-read)
      v3  compact: v2's live rows rewritten as 2 files, deletes
                  dropped (op178's step materialized)

    Split out of the op so the crash-window test can stop between any
    data write and its log commit."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )

    # v1: append
    base_path = os.path.join(root, "data", "base")
    src.repartition(4).write.mode("overwrite").parquet(base_path)
    log_commit(root, 1, _parquet_files(base_path), [])
    if upto_version < 2:
        return

    # v2: position-delete commit — physical addressing via _metadata,
    # resolved ONCE writer-side from the predicate
    del_path = os.path.join(root, "data", "deletes-v2")
    (
        spark.read.parquet(*read_log(root, 1)["files"])
        .select(
            F.col("_metadata.file_path").alias("_file"),
            F.col("_metadata.row_index").alias("_pos"),
            "o_orderkey",
        )
        .filter(F.col("o_orderkey") % 7 == 0)
        .select("_file", "_pos")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(del_path)
    )
    log_commit(
        root, 2, read_log(root, 1)["files"], _parquet_files(del_path)
    )
    if upto_version < 3:
        return

    # v3: compaction — rewrite v2's LIVE rows, drop the delete file
    compact_path = os.path.join(root, "data", "compact-v3")
    read_snapshot(spark, root, 2).repartition(2).write.mode(
        "overwrite"
    ).parquet(compact_path)
    log_commit(root, 3, _parquet_files(compact_path), [])


# --------------------------------------------------------------------------
# op255: multi-commit snapshot isolation over the mini table-log
# --------------------------------------------------------------------------

# The oracle restates BOTH sides of the contract: the per-version DATA
# (v1 = full orders; v2 and v3 = the predicate-filtered table —
# compaction must be invisible to readers) and the per-version LOG
# STRUCTURE (file counts: append 4+0, MoR delete 4+1, compacted 2+0).
_OP255_SQL = """
WITH v AS (SELECT UNNEST([1, 2, 3]) AS version),
agg AS (
  SELECT v.version,
         CAST(COUNT(*) AS BIGINT) AS n_live,
         CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
  FROM v JOIN orders ON v.version = 1 OR o_orderkey % 7 <> 0
  GROUP BY v.version
),
layout(version, n_data_files, n_delete_files) AS (
  VALUES (1, 4, 0), (2, 4, 1), (3, 2, 0)
)
SELECT CAST(a.version AS BIGINT) AS version,
       CAST(l.n_data_files AS BIGINT) AS n_data_files,
       CAST(l.n_delete_files AS BIGINT) AS n_delete_files,
       a.n_live, a.sum_key, a.sum_price_cents
FROM agg a JOIN layout l ON a.version = l.version
"""


@register("op255_table_log_snapshots", oracle=_OP255_SQL)
def op255_table_log_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mini TABLE-LOG with multi-commit snapshot isolation (round-7
    verdict item 5): three commits — v1 append (4 immutable parquet
    files), v2 merge-on-read position-delete (op228's `_metadata`
    addressing; base files untouched), v3 compaction (op178's step:
    live rows rewritten as 2 files, deletes dropped) — each committed
    by op234's atomic os.replace of a full-listing log entry. Readers
    resolve every version FROM THE LOG ONLY; output is one row per
    version: its log layout (data/delete file counts) and its exact
    data aggregate.

    The hash certifies the whole contract at once: v1 must still read
    the PRE-delete table after v2 and v3 land (immutable files + log
    isolation), v2 must anti-join exactly the predicate's positions,
    and v3 must be byte-equivalent to v2 (n_live/sum_key/
    sum_price_cents identical) while its layout row proves the
    rewrite actually happened (2 data files, 0 delete files). The
    crash-window test (tests/test_pipeline_r8.py) additionally stops
    between each data write and its log commit and proves readers
    never see the uncommitted future.

    Scale: the log is one JSON listing per version (a production log
    appends actions + checkpoints, same atomicity); data moves only
    at v1 (the append) and v3 (the compaction rewrite — the nightly
    OPTIMIZE's cost); v2 moves (path, bigint) pairs. Reads are
    file-pruned unions + one broadcast anti-join — no shuffle of the
    base anywhere."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(
        tempfile.gettempdir(), f"ocdb_spark_tablelog_{tag}_{os.getpid()}"
    )
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    build_table_log(spark, sf_dir, root)

    frames = []
    for version in (1, 2, 3):
        entry = read_log(root, version)
        snap = read_snapshot(spark, root, version)
        frames.append(
            snap.agg(
                F.lit(version).cast("bigint").alias("version"),
                F.lit(len(entry["files"])).cast("bigint").alias("n_data_files"),
                F.lit(len(entry["delete_files"]))
                .cast("bigint")
                .alias("n_delete_files"),
                F.count("*").cast("bigint").alias("n_live"),
                F.sum("o_orderkey").cast("bigint").alias("sum_key"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias("sum_price_cents"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
