#!/usr/bin/env python
"""Standalone-cluster smoke (round-10 verdict item 7): the last
untested leg of the 100 TB story is that every stress number so far
came from local[32] — one JVM, where "shuffle" is an in-process byte
copy. This script runs the 7 bench headliners + op96 on a REAL Spark
standalone cluster on this box — a master daemon and 2 worker daemons,
each worker hosting a separate executor JVM — so every exchange in the
plans crosses the netty shuffle service between processes, exactly the
transport a 1000-executor cluster uses (modulo the network hop).

Protocol: run each op once on the cluster (2 executors x 8 cores),
then once on local[16] (same total cores, same shuffle partitions),
and compare an order-insensitive value fingerprint of the full result.
Row-identical fingerprints = the plans are transport-agnostic: nothing
in them depends on single-JVM locality (no accidental reliance on
shared memory, partition-local state, or driver-side filesystem
visibility — the scratch-dir ops exercise executor-side writes too).

Usage: python scripts/cluster_smoke.py [sf_dir] [--json]
Emits a markdown table (for BASELINE.md) and one JSON summary line.
Daemons are cleaned up on exit; ports are the standalone defaults
offset to avoid clashes (master 7177, webui 8191+).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MASTER_PORT = int(os.environ.get("SMOKE_MASTER_PORT", "7177"))
MASTER_URL = f"spark://127.0.0.1:{MASTER_PORT}"
OPS = [
    "op17_agg_groupby",
    "op42_win_row_number_topk_group",
    "op39_join_multiway_star",
    "op69_stream_tumbling",
    "op80_sim_cosine_knn",
    "op75_dedup_exact",
    "op79_minhash_neardup",
    "op96_dedup_components",
    # The risky executor-side paths beyond the headliners: IVF's
    # broadcast codebook crossing a real process boundary, and the two
    # transformWithStateInPandas shapes — RocksDB state provider +
    # the (possibly vendored) protobuf Python state server running in
    # executor-forked Python workers, not the driver's process tree.
    "op95_sim_ivf_knn",
    "op206_stream_tws_user_stats",
    "op218_stream_tws_topk",
    # round-12 additions: RRF's two-leg fusion (bound-parameter capture
    # + broadcast corpus stats + full-outer of two TakeOrdered legs)
    # and the CDC merge's key-window + full-outer SMJ, both crossing
    # real executor JVMs.
    "op263_rrf_hybrid_topk",
    "op264_cdc_apply_changes",
    # round-13 additions: the streaming CDC path (foreachBatch merge
    # loop + manifest commits + generation store, all crossing real
    # executor JVMs — the store reads/writes are executor-side file
    # IO) and the persisted-index hybrid (codebook artifact broadcast
    # from disk across a process boundary).
    "op265_stream_cdc_apply_changes",
    "op266_rrf_hybrid_serving",
    # round-14 addition: the GeoJSON serving shape — find_datasets'
    # count+page envelope over a pooled persist (the cached hits frame
    # is built on one executor topology and must serve both actions),
    # with the to_json assembly running inside executor codegen.
    "op267_find_datasets_geojson",
    # round-15 additions: the avro OCF round-trips after the r15
    # kernel guards (truncated-deflate eof check, zero-advance
    # allowance reset) — the pure-Python encode/decode runs inside
    # mapInPandas on executor-forked Python workers across real JVM
    # boundaries, with the per-partition OCF files written and read
    # back executor-side.
    "op252_avro_roundtrip",
    "op258_avro_records_sink",
    # round-16 addition: op90 after the planted-fixture change — the
    # TakeOrdered-4 fixture derivation, the union, and the persisted
    # LSH signature self-join all crossing real executor JVMs; the
    # planted pairs must be recovered identically across transports.
    "op90_embedding_neardup_lsh",
    # round-18 addition: the op220 edge-iterator rewrite — its forced
    # broadcast of the adjacency-list aggregate and the persisted edge
    # frame feeding two broadcast joins are new cross-process paths
    # (the old wedge enumeration shuffled everything); counts must be
    # identical when the adjacency relation ships over real netty
    # transport instead of an in-JVM reference.
    "op220_triangle_count",
]


def _spark_class() -> tuple[str, dict]:
    import pyspark

    home = os.path.dirname(os.path.abspath(pyspark.__file__))
    env = dict(os.environ)
    env["SPARK_HOME"] = home
    # Workers fork executor JVMs which fork Python workers: they must
    # find this repo (and the vendored-protobuf fallback) on PYTHONPATH
    # and use THIS interpreter — the same wiring _vendor.py does for
    # local mode, done here at daemon level so executors inherit it.
    vendor = os.path.join(REPO, "vendor")
    env["PYTHONPATH"] = f"{REPO}:{vendor}:" + env.get("PYTHONPATH", "")
    env["PYSPARK_PYTHON"] = sys.executable
    env["SPARK_NO_DAEMONIZE"] = "1"  # run in foreground under our control
    return os.path.join(home, "bin", "spark-class"), env


def _wait_port(port: int, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        with socket.socket() as s:
            s.settimeout(1.0)
            try:
                s.connect(("127.0.0.1", port))
                return
            except OSError:
                time.sleep(0.5)
    raise TimeoutError(f"port {port} never opened")


SHUFFLE_SERVICE_PORT = int(os.environ.get("SMOKE_SHUFFLE_PORT", "7437"))


def start_cluster(
    n_workers: int = 2,
    cores: int = 8,
    mem: str = "6g",
    shuffle_service: bool = False,
):
    """Start master + workers as foreground child processes; return
    (procs, workdirs) for cleanup.

    shuffle_service=True runs the EXTERNAL shuffle service inside each
    worker (the standard executor-churn mitigation: map outputs are
    files the WORKER serves, so they survive executor death — and the
    prerequisite for dynamic allocation). Apps must set the matching
    spark.shuffle.service.enabled/port confs; see
    cluster_faultkill.py's --shuffle-service cases."""
    spark_class, env = _spark_class()
    if shuffle_service:
        env["SPARK_WORKER_OPTS"] = (
            f"-Dspark.shuffle.service.enabled=true "
            f"-Dspark.shuffle.service.port={SHUFFLE_SERVICE_PORT} "
            + env.get("SPARK_WORKER_OPTS", "")
        )
    procs, workdirs = [], []
    log_dir = tempfile.mkdtemp(prefix="smoke_logs_")
    workdirs.append(log_dir)
    procs.append(
        subprocess.Popen(
            [
                spark_class, "org.apache.spark.deploy.master.Master",
                "--host", "127.0.0.1", "--port", str(MASTER_PORT),
                "--webui-port", str(MASTER_PORT + 1014),
            ],
            env=env,
            stdout=open(os.path.join(log_dir, "master.log"), "w"),
            stderr=subprocess.STDOUT,
        )
    )
    _wait_port(MASTER_PORT)
    for i in range(n_workers):
        wd = tempfile.mkdtemp(prefix=f"smoke_worker{i}_")
        workdirs.append(wd)
        procs.append(
            subprocess.Popen(
                [
                    spark_class, "org.apache.spark.deploy.worker.Worker",
                    MASTER_URL,
                    "--host", "127.0.0.1",
                    "--cores", str(cores), "--memory", mem,
                    "--work-dir", wd,
                    "--webui-port", str(MASTER_PORT + 1015 + i),
                ],
                env=env,
                stdout=open(os.path.join(log_dir, f"worker{i}.log"), "w"),
                stderr=subprocess.STDOUT,
            )
        )
    return procs, workdirs


def stop_cluster(procs, workdirs):
    for p in reversed(procs):  # workers first, master last
        try:
            p.terminate()
            p.wait(timeout=15)
        except Exception:
            p.kill()
    for d in workdirs:
        shutil.rmtree(d, ignore_errors=True)


def churn_observed(counts: list[int]) -> tuple[bool, bool]:
    """(scaled_down, scaled_up) from interleaved (busy, idle) executor
    readings — THE churn-proof rule, shared by cluster_dynalloc and
    cluster_chaos so the two soaks can't disagree on what counts as
    evidence (round-12 review). A scale-down only counts when the
    busy-side reading was >= 1 — 0 -> 0 (a fast op whose executors
    were already released before the busy-side REST read) is a no-op,
    not evidence (round-11 ADVICE). A scale-up is any busy reading
    above the PREVIOUS op's idle reading (re-acquisition)."""
    n = len(counts) // 2
    scaled_down = any(
        counts[2 * i] >= 1 and counts[2 * i + 1] < counts[2 * i]
        for i in range(n)
    )
    scaled_up = any(
        counts[2 * i] > counts[2 * i - 1] for i in range(1, n)
    )
    return scaled_down, scaled_up


def fingerprint_tuple(df) -> tuple[int, str]:
    """Order-insensitive (n_rows, sha256-prefix) value fingerprint of a
    full result — THE canonicalization every cluster-vs-local script
    compares with (shared so a future repr/None fix lands once)."""
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    canon = sorted(
        "|".join("\x00" if row[c] is None else repr(row[c]) for c in cols)
        for row in rows
    )
    digest = hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]
    return len(rows), digest


def wait_for_cores(spark, n: int = 16, timeout: float = 60.0) -> None:
    """Block until `n` cores are registered, then return — or raise.
    defaultParallelism on a standalone master is max(registered
    cores, 2) until executors come up; proceeding early builds
    wrong-shaped caches (cluster_throughput's round-11 trap) or hangs
    forever on a zero-executor cluster. One shared policy: loud."""
    t0 = time.time()
    while (
        spark.sparkContext.defaultParallelism < n
        and time.time() - t0 < timeout
    ):
        time.sleep(0.5)
    par = spark.sparkContext.defaultParallelism
    if par < n:
        raise SystemExit(
            f"only {par}/{n} cores registered after {timeout:.0f}s — "
            "executors failed to start (check worker memory/logs)"
        )


def _fingerprint(df) -> dict:
    n, digest = fingerprint_tuple(df)
    return {"n_rows": n, "hash": digest}


def run_suite(master: str, sf_dir: str, label: str) -> dict[str, dict]:
    """One session per transport; ops run through the registered
    surface, timed and fingerprinted."""
    from ocdb_server_spark.registry import load_all, release_pool
    from ocdb_server_spark.session import get_spark

    extra = {}
    if master.startswith("spark://"):
        extra = {
            "spark.executor.memory": "6g",
            "spark.executor.cores": "8",
            "spark.executorEnv.PYTHONPATH": os.pathsep.join(
                [REPO, os.path.join(REPO, "vendor")]
            ),
        }
    spark = get_spark(
        app_name=f"cluster_smoke_{label}",
        master=master,
        shuffle_partitions=16,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ops = load_all()
    out: dict[str, dict] = {}
    for name in OPS:
        t0 = time.time()
        fp = _fingerprint(ops[name].fn(spark, sf_dir))
        fp["sec"] = round(time.time() - t0, 3)
        out[name] = fp
    release_pool()
    spark.stop()
    # A stopped JVM-side context lingers briefly; give the gateway a
    # beat so the next builder gets a clean slate.
    time.sleep(2)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Run op90 the way the gate surface does (plant ON) unless the
    # caller already chose: since the round-18 default inversion the
    # registry default is the faithful corpus answer, which is EMPTY
    # at smoke SFs — a 0=0 cross-transport comparison certifies
    # nothing. The planted fixture is the path with executor-side
    # work (TakeOrdered-4 + union + persisted LSH self-join) worth
    # smoking across real JVMs.
    os.environ.setdefault("SPARK_GRAFT_OP90_PLANT", "1")
    # r18 ADVICE low: an inherited SPARK_GRAFT_OP90_PLANT!=1 silently
    # reverts op90 to the faithful-empty path and the 0=0 comparison
    # certifies nothing — make a fixture-off run visibly distinguishable
    op90_plant = os.environ["SPARK_GRAFT_OP90_PLANT"]
    if op90_plant != "1":
        print(
            f"WARNING: SPARK_GRAFT_OP90_PLANT={op90_plant!r} inherited from "
            "the environment — op90 runs the faithful corpus path, which is "
            "EMPTY at smoke SFs; its row below certifies nothing.",
            file=sys.stderr,
        )
    procs, workdirs = start_cluster()
    try:
        cluster = run_suite(MASTER_URL, sf_dir, "standalone")
    finally:
        stop_cluster(procs, workdirs)
    local = run_suite("local[16]", sf_dir, "local")

    rows, all_match = [], True
    for name in OPS:
        c, l = cluster[name], local[name]
        match = (c["n_rows"], c["hash"]) == (l["n_rows"], l["hash"])
        all_match &= match
        rows.append(
            f"| {name} | {c['n_rows']} | {c['hash']} | "
            f"{'=' if match else 'MISMATCH'} | {c['sec']:.2f} | {l['sec']:.2f} |"
        )
    print("| op | rows | value hash | vs local | cluster s | local s |")
    print("|---|---|---|---|---|---|")
    print("\n".join(rows))
    print(json.dumps({
        "metric": "cluster_smoke",
        "sf_dir": sf_dir,
        "op90_plant": op90_plant,
        "transport": "standalone 2 workers x 8 cores (separate executor JVMs, netty shuffle)",
        "all_row_identical": all_match,
        "ops": {n: cluster[n] for n in OPS},
        "local": {n: local[n] for n in OPS},
    }))
    return 0 if all_match else 1


if __name__ == "__main__":
    sys.exit(main())
