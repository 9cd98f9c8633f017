#!/usr/bin/env python
"""Dynamic-allocation smoke (round 11g): the last deployment mode the
standalone cluster can exercise. On a shared production cluster the
engine's queries run under executor ELASTICITY — executors are
released when a session goes idle and re-acquired under load
(spark.dynamicAllocation, which requires the external shuffle service
round 11f added to the harness). This smoke proves the registered ops
return row-identical results while that churn actually happens, and
VERIFIES the churn happened (REST executor counts), so a pass can't
be a no-op.

Protocol: 1 worker x 16 cores with the external shuffle service;
session with dynamicAllocation min=0/max=2 executors and a 4 s idle
timeout; three COLD ops (no warm_cache — cached blocks would pin
executors) with deliberate idle gaps between them:

  op17 -> idle past the timeout (expect scale-DOWN toward 0)
  op39 -> expect scale-UP to serve the star join, then idle again
  op75 -> same

Each result is fingerprint-compared against a plain local[16] run of
the same cold op. Pass = all fingerprints identical AND the observed
executor-count series contains both a scale-down and a re-acquisition.

Usage: python scripts/cluster_dynalloc.py [REP]   (default 30)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# No wait_for_cores here: under dynamicAllocation min=0 the session
# legitimately starts with ZERO executors — the allocator acquires
# them when the first job queues.
from cluster_smoke import (  # noqa: E402
    MASTER_URL,
    SHUFFLE_SERVICE_PORT,
    churn_observed,
    fingerprint_tuple,
    start_cluster,
    stop_cluster,
)
from stress_scale import ensure_dataset  # noqa: E402

OPS = ("op17_agg_groupby", "op39_join_multiway_star", "op75_dedup_exact")
UI_PORT = 4071
IDLE_TIMEOUT_S = 4


def _live_executors() -> int:
    """Active (non-driver) executors via the UI REST API."""
    ui = f"http://127.0.0.1:{UI_PORT}"
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/executors"
    ) as r:
        ex = json.load(r)
    return sum(1 for e in ex if e["id"] != "driver" and e.get("isActive"))


def main() -> int:
    from ocdb_server_spark.registry import load_all, release_pool
    from ocdb_server_spark.session import get_spark

    positional = [a for a in sys.argv[1:] if not a.startswith("-")]
    rep = int(positional[0]) if positional else 30
    spark = get_spark(app_name="dynalloc_build")
    spark.sparkContext.setLogLevel("ERROR")
    data = ensure_dataset(spark, rep)
    spark.stop()
    time.sleep(2)

    # local[16] cold reference fingerprints
    spark = get_spark(
        app_name="dynalloc_ref", master="local[16]", shuffle_partitions=16
    )
    spark.sparkContext.setLogLevel("ERROR")
    ops = load_all()
    ref = {name: fingerprint_tuple(ops[name].fn(spark, data)) for name in OPS}
    release_pool()
    spark.stop()
    time.sleep(2)

    procs, wds = start_cluster(n_workers=1, cores=16, shuffle_service=True)
    counts: list[int] = []
    results: dict[str, dict] = {}
    try:
        spark = get_spark(
            app_name="dynalloc_smoke",
            master=MASTER_URL,
            shuffle_partitions=16,
            extra_conf={
                "spark.ui.enabled": "true",
                "spark.ui.port": str(UI_PORT),
                "spark.executor.memory": "6g",
                "spark.executor.cores": "8",
                "spark.executorEnv.PYTHONPATH": os.pathsep.join(
                    [REPO, os.path.join(REPO, "vendor")]
                ),
                "spark.shuffle.service.enabled": "true",
                "spark.shuffle.service.port": str(SHUFFLE_SERVICE_PORT),
                "spark.dynamicAllocation.enabled": "true",
                "spark.dynamicAllocation.minExecutors": "0",
                "spark.dynamicAllocation.maxExecutors": "2",
                "spark.dynamicAllocation.executorIdleTimeout":
                    f"{IDLE_TIMEOUT_S}s",
                "spark.dynamicAllocation.schedulerBacklogTimeout": "1s",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        ops = load_all()
        for name in OPS:
            t0 = time.perf_counter()
            fp = fingerprint_tuple(ops[name].fn(spark, data))
            sec = round(time.perf_counter() - t0, 2)
            counts.append(_live_executors())
            results[name] = {
                "sec": sec,
                "match": fp == ref[name],
                "executors_after": counts[-1],
            }
            # idle past the timeout so the allocator releases executors
            time.sleep(IDLE_TIMEOUT_S + 4)
            counts.append(_live_executors())
            print(f"  {name}: {sec:.2f}s match={fp == ref[name]} "
                  f"executors busy->{results[name]['executors_after']} "
                  f"idle->{counts[-1]}", file=sys.stderr)
        release_pool()
        spark.stop()
        time.sleep(2)
    finally:
        stop_cluster(procs, wds)

    all_match = all(r["match"] for r in results.values())
    # churn proof — shared rule (cluster_smoke.churn_observed)
    scaled_down, scaled_up = churn_observed(counts)
    ok = all_match and scaled_down and scaled_up
    print("| op | sec | result vs local[16] | executors busy / after idle |")
    print("|---|---|---|---|")
    for i, name in enumerate(OPS):
        r = results[name]
        print(f"| {name} | {r['sec']} | {'=' if r['match'] else 'MISMATCH'} "
              f"| {counts[2 * i]} / {counts[2 * i + 1]} |")
    print(json.dumps({
        "metric": "cluster_dynalloc",
        "rep": rep,
        "all_row_identical": all_match,
        "scaled_down_observed": scaled_down,
        "scaled_up_observed": scaled_up,
        "executor_counts": counts,
        "cases": results,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
