"""Persisted ANN index artifacts (round-11 verdict item 4).

op95 (IVF) and op180 (PQ-ADC) used to rebuild their codebooks INSIDE
every query plan — correct, but not the 100 TB serving reality, where
index build cost (a training scan over the corpus) dwarfs per-query
cost and a real similarity pipeline trains ONCE, persists, and reuses
across thousands of queries. This module is that split:

- build_ivf_index / build_pq_index: run the training scan and write
  the one-row codebook to parquet ATOMICALLY (write to a temp dir,
  rename into place — a concurrent builder loses the race cleanly and
  adopts the winner's files, the publish_build pattern).
- load_index: read a persisted codebook back; the query-side plan is
  then scan(corpus) × broadcast(scan(codebook)) — the training
  aggregation (orderBy(xxhash64)+limit+collect_list) is GONE from the
  query plan (asserted in tests/test_ann_index.py and visible in
  SCALE_AUDIT's op95/op180 rows).
- get_or_build_*: the keyed cache. Key = (dataset file identity:
  path+size+mtime of the embeddings parquet, index params) — editing
  the data or the params yields a new key and a fresh build; reruns
  in the same process (a 262-op sweep, a bench loop) hit the cache.
  Storage reuses scratch.py's per-process dir + dead-PID reaping, so
  repeated sessions never accumulate orphaned indexes.

At 100 TB the same artifact lives on shared storage (S3/HDFS path
instead of the local scratch dir) and is built by the ingest job; the
codebook stays a few MB even at 10⁹ vectors (K≈√n entries), so the
query-side broadcast holds at any corpus size.

Codebook schemas (one row each):
- IVF: cents: array<struct<cid:long, cvec:array<float>, cnorm:double>>
- PQ:  cents: array<struct<cid:long, cvec:array<float>>>
Both are consumed via crossJoin(broadcast(codebook)) + JVM HOF folds;
parquet round-trips the nested types exactly, so a persisted index
produces bit-identical top-k to an inline build (pinned in tests).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.functions.vector import _l2_sql
from ocdb_server_spark.scratch import scratch_dir


def ivf_seed_codebook(e: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic data-seeded IVF codebook: the first K vectors in
    (xxhash64, vec_id) order, packed into ONE row of (cid, cvec,
    cnorm) structs. Shared by the inline path (ivf_topk with no
    persisted index) and build_ivf_index, so both train identically."""
    return (
        e.withColumn("en", F.expr(_l2_sql("embedding")))
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(n_centroids)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cvec"),
            F.col("en").alias("cnorm"),
        )
        .agg(F.expr("collect_list(struct(cid, cvec, cnorm))").alias("cents"))
    )


def pq_seed_codebook(e: DataFrame, k: int = 16) -> DataFrame:
    """Deterministic data-seeded PQ codebook: k vectors in (xxhash64,
    vec_id) order as (cid, cvec) structs in one row. Subspace slicing
    happens at encode time (pq_topk), so the artifact stores whole
    vectors — simpler, and reusable across subspace layouts."""
    return (
        e.orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
        .agg(F.expr("collect_list(struct(cid, cvec))").alias("cents"))
    )


def _dataset_key(sf_dir: str, table: str = "embeddings") -> str:
    """Identity of the indexed dataset: absolute path + size + mtime —
    of the file itself for single-file datasets, of EVERY entry for
    directory datasets (round-12 review: os.stat on a directory
    succeeds but its size/mtime don't change when part files are
    overwritten in place with the same names, so the dir's own stat
    could serve a stale index for a refreshed corpus; the per-entry
    walk sees the rewritten files' mtimes). A data refresh changes
    the key, so a stale index can never serve a new corpus. Falls
    back to the path alone when unstatable — params still key."""
    path = os.path.abspath(os.path.join(sf_dir, f"{table}.parquet"))
    try:
        if os.path.isdir(path):
            # Walk the WHOLE tree, not just the top level: partitioned
            # layouts (key=value/part-*.parquet) rewritten in place
            # change neither the root's entries nor the partition
            # subdirs' own stats (overwriting a file doesn't bump its
            # parent dir's mtime) — only the leaf files' stats move
            # (round-12 review, second iteration of this fix).
            parts = []
            for root, dirs, files in os.walk(path):
                dirs.sort()
                rel = os.path.relpath(root, path)
                for fname in sorted(files):
                    st = os.stat(os.path.join(root, fname))
                    parts.append(
                        f"{rel}/{fname}|{st.st_size}|{st.st_mtime_ns}"
                    )
            ident = path + "||" + "||".join(parts)
        else:
            st = os.stat(path)
            ident = f"{path}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        ident = path
    return hashlib.sha256(ident.encode()).hexdigest()[:12]


def index_path(sf_dir: str, kind: str, params: dict) -> str:
    """Cache location for a (dataset, params) index artifact: inside
    the per-process 'annidx' scratch dir (fresh=False — artifacts
    persist across calls; dead-PID siblings are reaped on entry)."""
    base = scratch_dir("annidx", sf_dir, fresh=False)
    phash = hashlib.sha256(
        json.dumps(params, sort_keys=True).encode()
    ).hexdigest()[:12]
    return os.path.join(base, f"{kind}_{_dataset_key(sf_dir)}_{phash}")


def _publish(build: DataFrame, path: str) -> None:
    """Write the codebook to a temp sibling, then rename into place.
    os.rename of a directory is atomic on one filesystem: a concurrent
    builder that loses the race deletes its copy and reads the
    winner's — never a half-written artifact at `path`."""
    tmp = f"{path}.build-{uuid.uuid4().hex[:8]}"
    build.coalesce(1).write.mode("overwrite").parquet(tmp)
    try:
        os.rename(tmp, path)
    except OSError:
        # "Lost the race" is only true if a winner actually exists —
        # a rename failing for any OTHER reason (parent dir reaped,
        # permissions) must not delete the only copy and return as if
        # published, leaving load_index to crash on a missing path
        # (round-12 review). Verify, then adopt or re-raise.
        if os.path.isdir(path):
            shutil.rmtree(tmp, ignore_errors=True)  # raced: adopt winner
        else:
            shutil.rmtree(tmp, ignore_errors=True)
            raise


def build_ivf_index(e: DataFrame, n_centroids: int, path: str) -> str:
    """Train and persist an IVF codebook for `e` at `path`; returns
    `path`. One training scan (top-K by hash + single-row pack) — the
    cost a production pipeline pays once per ingest, not per query."""
    _publish(ivf_seed_codebook(e, n_centroids), path)
    return path


def build_pq_index(e: DataFrame, path: str, k: int = 16) -> str:
    """Train and persist a PQ codebook for `e` at `path`."""
    _publish(pq_seed_codebook(e, k), path)
    return path


def load_index(spark: SparkSession, path: str) -> DataFrame:
    """Read a persisted codebook. The returned one-row frame drops into
    ivf_topk/pq_topk's `codebook=` parameter; downstream it is
    broadcast, so the query plan's only sources are the corpus scan
    and this (tiny) artifact scan — no training aggregation."""
    return spark.read.parquet(path)


def get_or_build_ivf(
    spark: SparkSession, e: DataFrame, sf_dir: str, n_centroids: int
) -> DataFrame:
    """Persisted-IVF cache: build once per (dataset, K), reuse after."""
    path = index_path(sf_dir, "ivf", {"n_centroids": n_centroids})
    if not os.path.isdir(path):
        build_ivf_index(e, n_centroids, path)
    return load_index(spark, path)


def get_or_build_pq(
    spark: SparkSession, e: DataFrame, sf_dir: str, k: int = 16
) -> DataFrame:
    """Persisted-PQ cache: build once per (dataset, k), reuse after."""
    path = index_path(sf_dir, "pq", {"k": k})
    if not os.path.isdir(path):
        build_pq_index(e, path, k)
    return load_index(spark, path)
