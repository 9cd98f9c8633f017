#!/usr/bin/env python
"""Combined chaos soak (round-11 verdict item 6): the three resilience
mechanisms rounds 11f/11g proved SEPARATELY — external shuffle
service, dynamic allocation, executor-loss recovery — composed in ONE
run, which is how production actually fails: an elastic session is
mid-query when an executor dies, the shuffle service keeps serving
the dead executor's map outputs, and the allocator replaces it while
the query finishes.

Protocol (one cluster, one session, the bench headliner set at REP×):

  1 worker × 16 cores, external shuffle service ON;
  session with dynamicAllocation min=0 / max=2 (8 cores each) and a
  4 s idle timeout — COLD ops (no warm_cache: cached blocks pin
  executors) with idle gaps between them so release/re-acquire churn
  genuinely happens (REST-verified, busy-side ≥ 1 required).

  Every headliner runs three times: a HEALTHY elastic pass (cold,
  fingerprint + wall), a WARM elastic pass (fingerprint + wall — the
  fault pass's honest twin: same JIT/codegen cache state), then a
  FAULT pass with one executor SIGKILLed at ~40% of the WARM wall.
  The kill timer must scale from the warm wall, not the cold one —
  the fault pass runs warm, 2–3× faster than cold, and a timer set
  at 0.4×cold fires after the query has already finished (the first
  r12 soak recorded NO-KILL on every op exactly that way). A kill
  must LAND — a too-fast query records no-kill and the op is
  reported unkilled, not passed. All passes must be
  fingerprint-identical to a plain local[16] cold reference.

Pass = all fingerprints identical (healthy, warm AND fault) + ≥1
genuine scale-down and ≥1 re-acquisition observed + every
slow-enough op's kill landed. Emits a markdown table + one JSON line
(recovery premium per op = fault_sec / warm_sec — like-for-like,
both warm).

Usage: python scripts/cluster_chaos.py [REP]   (default 30)
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cluster_smoke import (  # noqa: E402
    MASTER_URL,
    SHUFFLE_SERVICE_PORT,
    churn_observed,
    fingerprint_tuple,
    start_cluster,
    stop_cluster,
)
from stress_scale import ensure_dataset  # noqa: E402

OPS = (
    "op17_agg_groupby",
    "op42_win_row_number_topk_group",
    "op39_join_multiway_star",
    "op69_stream_tumbling",
    "op80_sim_cosine_knn",
    "op75_dedup_exact",
    "op79_minhash_neardup",
)
UI_PORT = 4072
IDLE_TIMEOUT_S = 4
# below this WARM wall the 40% kill timer can't reliably land
# mid-query (the fault pass often runs faster still — op80's third
# pass came in at 0.24 s against a 1.03 s warm wall in the first r12
# soak); such ops run fault-pass anyway but report "unkilled"
MIN_KILLABLE_SEC = 2.0


def _live_executors() -> int:
    ui = f"http://127.0.0.1:{UI_PORT}"
    try:
        with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
            app = json.load(r)[0]["id"]
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/executors"
        ) as r:
            ex = json.load(r)
        return sum(
            1 for e in ex if e["id"] != "driver" and e.get("isActive")
        )
    except Exception:
        return -1  # REST hiccup: recorded, never crashes the soak


def _ppid(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/stat") as f:
            # field 4 (after the parenthesized comm, which may contain
            # spaces — split after the LAST ')')
            return int(f.read().rsplit(")", 1)[1].split()[1])
    except Exception:
        return -1


def _executor_pids(worker_pids: set[int] | None = None) -> set[int]:
    """Executor backend pids — restricted to children of THIS cluster's
    worker daemons when worker_pids is given (round-12 review: the
    docstring promised that scoping but the set was a global pgrep,
    so min(pids) could SIGKILL an unrelated Spark app's executor and
    still be credited as a landed kill)."""
    out = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True, text=True,
    )
    pids = {int(p) for p in out.stdout.split()}
    if worker_pids is None:
        return pids
    return {p for p in pids if _ppid(p) in worker_pids}


def _kill_one(
    tag: str, candidates: set[int], holder: dict, worker_pids: set[int]
) -> None:
    """SIGKILL one executor from this cluster's candidate set and
    record the victim + the kill TIME, so a pass can't be claimed for
    a kill that never landed — or landed after the query finished.

    Under min=0 elasticity there may be NO executor at kill time even
    mid-"query": ops whose wall is dominated by driver-side result
    materialization (op42 fingerprints 1.3M rows at rep30) finish
    their executor compute in the first few seconds, the allocator
    releases to zero, and the timer fires into the driver phase.
    Retry briefly, then record none_alive — the elastic system
    working as designed (nothing exists to lose), distinct from a
    protocol failure."""
    for _ in range(4):
        pids = _executor_pids(worker_pids) & candidates
        # under dynalloc the replacement executor is a NEW pid — widen
        # to any executor alive NOW, still scoped to this cluster
        if not pids:
            pids = _executor_pids(worker_pids)
        if pids:
            victim = min(pids)
            os.kill(victim, signal.SIGKILL)
            holder["pid"] = victim
            holder["t"] = time.perf_counter()
            print(f"  [{tag}] SIGKILLed executor pid {victim}", file=sys.stderr)
            return
        time.sleep(0.5)
    holder["none_alive"] = True
    print(f"  [{tag}] no executor alive to kill (elastic zero)", file=sys.stderr)


def main() -> int:
    from ocdb_server_spark.registry import load_all, release_pool
    from ocdb_server_spark.session import get_spark

    positional = [a for a in sys.argv[1:] if not a.startswith("-")]
    rep = int(positional[0]) if positional else 30

    spark = get_spark(app_name="chaos_build")
    spark.sparkContext.setLogLevel("ERROR")
    data = ensure_dataset(spark, rep)
    spark.stop()
    time.sleep(2)

    # plain local[16] cold reference fingerprints
    spark = get_spark(
        app_name="chaos_ref", master="local[16]", shuffle_partitions=16
    )
    spark.sparkContext.setLogLevel("ERROR")
    ops = load_all()
    ref = {name: fingerprint_tuple(ops[name].fn(spark, data)) for name in OPS}
    release_pool()
    spark.stop()
    time.sleep(2)

    procs, wds = start_cluster(n_workers=1, cores=16, shuffle_service=True)
    # procs[0] is the master; executors are direct children of the
    # worker daemons — the kill scope (see _executor_pids)
    worker_pids = {p.pid for p in procs[1:]}
    counts: list[int] = []
    results: dict[str, dict] = {}
    try:
        spark = get_spark(
            app_name="chaos_soak",
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
                # cached RDD blocks pin executors FOREVER by default
                # (cachedExecutorIdleTimeout=infinity) — several soak
                # ops enroll pool_persist caches that are only released
                # at the NEXT op invocation, which lands inside the
                # idle window; bound the pin so "idle" can mean idle
                "spark.dynamicAllocation.cachedExecutorIdleTimeout":
                    f"{IDLE_TIMEOUT_S}s",
                "spark.dynamicAllocation.schedulerBacklogTimeout": "1s",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        ops = load_all()
        for name in OPS:
            # healthy elastic pass (cold)
            t0 = time.perf_counter()
            healthy_fp = fingerprint_tuple(ops[name].fn(spark, data))
            healthy = time.perf_counter() - t0

            # warm elastic pass: the fault pass's honest twin (same
            # JIT/codegen state) — calibrates the kill timer AND is
            # the denominator of the recovery premium
            t0 = time.perf_counter()
            warm_fp = fingerprint_tuple(ops[name].fn(spark, data))
            warm = time.perf_counter() - t0
            busy = _live_executors()

            # fault pass: kill an executor mid-query, timed off the
            # WARM wall (0.4×cold fires after a warm query finishes —
            # the first r12 soak's NO-KILL-everywhere failure mode)
            candidates = _executor_pids(worker_pids)
            holder: dict = {}
            timer = threading.Timer(
                max(0.2, 0.4 * warm),
                _kill_one,
                args=(name, candidates, holder, worker_pids),
            )
            df = ops[name].fn(spark, data)
            timer.start()
            t0 = time.perf_counter()
            try:
                fault_fp = fingerprint_tuple(df)
                t_end = time.perf_counter()
                timer.cancel()
                # a kill that landed AFTER the query completed faulted
                # nothing — it must not be credited (round-12 review)
                landed = "pid" in holder and holder.get("t", t_end) <= t_end
                if not landed:
                    if holder.get("none_alive"):
                        # min=0 elasticity released every executor
                        # before the kill time (driver-materialization
                        # phase): nothing existed to lose — the
                        # elastic design working, not a failed kill
                        outcome = "unkilled (elastic zero at kill time)"
                    else:
                        outcome = (
                            "unkilled" if warm < MIN_KILLABLE_SEC
                            else "NO-KILL (protocol failure)"
                        )
                    if "pid" in holder:
                        outcome += " [kill landed post-completion]"
                        holder.pop("pid")
                elif (
                    fault_fp == ref[name]
                    and healthy_fp == ref[name]
                    and warm_fp == ref[name]
                ):
                    outcome = "recovered-identical"
                else:
                    outcome = f"WRONG RESULT {fault_fp} vs {ref[name]}"
            except Exception as e:  # noqa: BLE001 — record, keep soaking
                outcome = f"FAILED: {type(e).__name__}"
            fault = time.perf_counter() - t0
            timer.cancel()
            results[name] = {
                "healthy_sec": round(healthy, 2),
                "warm_sec": round(warm, 2),
                "fault_sec": round(fault, 2),
                "healthy_match": healthy_fp == ref[name] and warm_fp == ref[name],
                "outcome": outcome,
                "executors_busy": busy,
                "killed_pid": holder.get("pid"),
            }
            counts.append(busy)
            # idle past the timeout so the allocator releases executors;
            # drop this op's pooled caches FIRST — a genuinely idle
            # session holds no cache blocks, and release at next-op
            # time would land inside the window we're measuring
            release_pool()
            time.sleep(IDLE_TIMEOUT_S + 6)
            idle = _live_executors()
            counts.append(idle)
            results[name]["executors_after_idle"] = idle
            print(
                f"  {name}: healthy {healthy:.2f}s warm {warm:.2f}s "
                f"fault {fault:.2f}s "
                f"{outcome} executors {busy}->{idle}", file=sys.stderr,
            )
        release_pool()
        spark.stop()
        time.sleep(2)
    finally:
        stop_cluster(procs, wds)

    healthy_ok = all(r["healthy_match"] for r in results.values())
    fault_ok = all(
        r["outcome"] in (
            "recovered-identical",
            "unkilled",
            "unkilled (elastic zero at kill time)",
        )
        for r in results.values()
    )
    kills_landed = sum(
        1 for r in results.values() if r["killed_pid"] is not None
    )
    # genuine churn: a scale-down needs busy >= 1 (the dynalloc
    # script's round-11-ADVICE rule), and some later busy reading must
    # exceed an earlier idle one (re-acquisition)
    scaled_down = any(
        counts[2 * i] >= 1 and counts[2 * i + 1] < counts[2 * i]
        for i in range(len(OPS))
    )
    scaled_up = any(
        counts[2 * i] > counts[2 * i - 1] for i in range(1, len(OPS))
    )
    ok = healthy_ok and fault_ok and scaled_down and scaled_up and kills_landed >= 1

    print(
        "| op | healthy s | warm s | fault s | premium (fault/warm) "
        "| outcome | execs busy/idle |"
    )
    print("|---|---|---|---|---|---|---|")
    for i, name in enumerate(OPS):
        r = results[name]
        prem = (
            f"{r['fault_sec'] / r['warm_sec']:.1f}x"
            if r["warm_sec"] > 0 else "—"
        )
        print(
            f"| {name} | {r['healthy_sec']} | {r['warm_sec']} "
            f"| {r['fault_sec']} | {prem} "
            f"| {r['outcome']} | {counts[2 * i]} / {counts[2 * i + 1]} |"
        )
    print(json.dumps({
        "metric": "cluster_chaos",
        "rep": rep,
        "all_healthy_identical": healthy_ok,
        "all_fault_recovered_or_unkillable": fault_ok,
        "kills_landed": kills_landed,
        "scaled_down_observed": scaled_down,
        "scaled_up_observed": scaled_up,
        "executor_counts": counts,
        "cases": results,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
