#!/usr/bin/env python
"""Cluster-mode THROUGHPUT delta (round-11 handoff item 4): price the
netty transport per shuffled byte.

scripts/cluster_smoke.py proved the plans are transport-agnostic
(row-identical results over a real standalone cluster); this script
asks the throughput question the smoke deliberately didn't: what does
crossing a process boundary COST per shuffled MiB, versus local[16]'s
in-process byte copy? That number is the missing coefficient in the
100 TB story — every stress slope so far (BASELINE.md 10x/30x/100x
tables) was measured on a single-JVM transport that never serializes
a shuffle block onto a socket.

Protocol: build (or adopt) the REP-times replicated ≈sf1 dataset via
scripts/stress_scale.py's ensure_dataset — the SAME bytes the slope
study measures — then run each op under two same-shape sessions:

- standalone cluster: master + 2 workers on this box, 2 executor JVMs
  x 8 cores, every exchange crossing the netty shuffle service
  between processes (cluster_smoke's daemons, reused);
- local[16]: one JVM, same total cores, same shuffle partitions (16),
  same batch profile (AQE on — the cluster-scale shape).

Per op: warm once (codegen + op-internal persists), then best-of-3
FRESH-instance executions (new shuffle deps per rep — the round-8
corrected methodology, see bench.py), with per-stage shuffle
read/write bytes scraped from the Spark UI REST API over the first
timed execution's window (skew_stress's _stage_rows).

The op set spans the shuffle-volume spectrum so the transport price
can be separated from the fixed per-job cluster overhead:

- op17  groupBy agg       — CONTROL: thin exchange (partial-agg
                            output, ~0.06 MiB at rep10); its delta is
                            pure per-job overhead — remote scheduling
                            + task dispatch over RPC, no byte term.
- op39  multiway star     — at rep10 the BIGGEST byte mover (the
                            replicated customer outgrows the batch
                            profile's 10 MB broadcast bar, so the
                            star's customer leg becomes a shuffle
                            join: 113.7 MiB) — plus 5-6 jobs of
                            broadcast builds, so its delta mixes both
                            terms.
- op114 Q3 top-10 revenue — the CLEAN byte mover: lineitem + orders
                            both shuffle on the order key in one job,
                            10-row result; its raw delta/MiB is the
                            tightest upper bound on the per-byte
                            transport price.
- op75  exact dedup       — digest-only shuffle (16-byte md5 keys).
- op79  MinHash banding   — signature self-join, the LSH shuffle.
- op96  dedup components  — iterate_to_fixpoint: MANY small
                            exchanges (per-iteration jobs), the
                            round-trip-latency-sensitive shape.

Output: a markdown table (for BASELINE.md) + one JSON summary line.
Headline figures: the control's fixed per-job delta, and an UPPER
BOUND on the transport price — min of raw delta/MiB over ops
shuffling ≥10 MiB (an upper bound because even that delta still
contains the op's own fixed overhead; clean-op deltas at or below
the control's show the true per-byte term is smaller still).

Usage: python scripts/cluster_throughput.py [REP] [--only=opA,opB]
           [--execmem=6g] [--workers=2]

--execmem sizes the worker daemons and executor JVMs (default 6g) —
the control knob that separates "two JVMs with less memory each"
from "two JVMs, full stop" when a rep shows a cluster premium.
--workers splits the same 16 total cores across N executor JVMs
(default 2x8) — the control knob for the fetch fan-in hypothesis:
if a byte-mover's premium is serving-endpoint concentration, more
endpoints at constant cores should shrink it.
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

from cluster_smoke import (  # noqa: E402
    MASTER_URL,
    start_cluster,
    stop_cluster,
    wait_for_cores,
)
from stress_scale import ensure_dataset, parse_args  # noqa: E402

CONTROL = "op17_agg_groupby"
OPS = (
    CONTROL,
    "op39_join_multiway_star",
    "op114_join_topk_revenue",
    "op75_dedup_exact",
    "op79_minhash_neardup",
    "op96_dedup_components",
)
UI_PORT = {"standalone": 4055, "local": 4056}


def _shuffle_totals(ui: str) -> tuple[int, int]:
    """Cumulative (read, write) shuffle bytes across all executors
    (driver included in local mode) from the UI REST API. Differenced
    around one execution this is exact attribution — nothing else runs
    concurrently — and immune to the stage-time-window misses a
    per-stage scrape suffers (cluster stages can report their first
    task launch from the executor clock side of a listener delay).
    The status listener drains async; callers sleep before reading."""
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/executors"
    ) as r:
        ex = json.load(r)
    return (
        sum(e.get("totalShuffleRead", 0) for e in ex),
        sum(e.get("totalShuffleWrite", 0) for e in ex),
    )


def run_suite(
    master: str,
    data: str,
    label: str,
    queries: tuple[str, ...],
    execmem: str = "6g",
    exec_cores: int = 8,
) -> dict[str, dict]:
    from ocdb_server_spark import io as eio
    from ocdb_server_spark.registry import load_all, release_pool
    from ocdb_server_spark.session import get_spark

    extra = {
        "spark.ui.enabled": "true",
        "spark.ui.port": str(UI_PORT[label]),
    }
    if master.startswith("spark://"):
        extra.update({
            "spark.executor.memory": execmem,
            "spark.executor.cores": str(exec_cores),
            "spark.executorEnv.PYTHONPATH": os.pathsep.join(
                [REPO, os.path.join(REPO, "vendor")]
            ),
        })
    spark = get_spark(
        app_name=f"cluster_tp_{label}",
        master=master,
        shuffle_partitions=16,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = f"http://127.0.0.1:{UI_PORT[label]}"
    ops = load_all()
    # warm_cache auto-sizes slices from defaultParallelism, which on a
    # standalone master is max(registered cores, 2) — executors take a
    # few seconds to register, and warming before they do builds 8-slice
    # caches where local[16] builds 64 (observed: same op17 plan then
    # shuffles 8x fewer partial-agg rows on the cluster — not an
    # apples-to-apples transport comparison). Wait for the full 16.
    wait_for_cores(spark, 16)
    eio.clear_cache()
    eio.warm_cache(spark, data)
    out: dict[str, dict] = {}
    for name in queries:
        fn = ops[name].fn
        fn(spark, data).toArrow()  # warm: codegen + op-internal persists
        best, rd, wr = float("inf"), 0, 0
        for i in range(3):
            df = fn(spark, data)  # fresh instance: new shuffle deps
            if i == 0:
                time.sleep(0.6)  # listener drain before the baseline read
                r0, w0 = _shuffle_totals(ui)
            tp = time.perf_counter()
            df.toArrow()
            dt = time.perf_counter() - tp
            if i == 0:
                time.sleep(0.6)
                r1, w1 = _shuffle_totals(ui)
                rd, wr = r1 - r0, w1 - w0
            best = min(best, dt)
        out[name] = {"sec": round(best, 3), "shuf_read": rd, "shuf_write": wr}
        print(f"  {label:10s} {name}: {best:.3f} s, "
              f"shuffle r/w {rd/2**20:.1f}/{wr/2**20:.1f} MiB",
              file=sys.stderr)
    eio.clear_cache()
    release_pool()
    spark.stop()
    time.sleep(2)  # let the gateway JVM settle before the next builder
    return out


def summarize(
    queries: tuple[str, ...],
    cluster: dict[str, dict],
    local: dict[str, dict],
) -> dict:
    """Derive the report from the two suites' raw measurements. Pure —
    unit-tested in tests/test_scale_paths.py. Returns rows (markdown),
    fixed (control delta, s — None when --only excluded the control op,
    so an unmeasured overhead is never printed as a measured +0 ms;
    round-11 ADVICE), bound/bound_op (transport price upper bound, ms
    per shuffled MiB over big movers), byte_parity_ok."""
    rows = []
    fixed = (
        cluster[CONTROL]["sec"] - local[CONTROL]["sec"]
        if CONTROL in queries and CONTROL in cluster else None
    )
    bound = float("inf")
    bound_op = None
    byte_parity_ok = True
    for name in queries:
        c, l = cluster[name], local[name]
        delta = c["sec"] - l["sec"]
        mib = c["shuf_read"] / 2**20
        # Parity is checked on the WRITE side: map-output volume is
        # plan-determined, while read bytes can legitimately exceed it
        # on the cluster (fetch retries / multi-consumer re-reads —
        # observed repeatedly on op79: read 6.8 vs write 5.75 MiB).
        # Pricing still uses read bytes — that's what crosses the
        # transport. No local-side truthiness guard (review finding):
        # local shuffling 0 bytes while the cluster shuffles many is
        # the STRONGEST divergence signal, not a skip condition.
        if abs(c["shuf_write"] - l["shuf_write"]) > max(
            0.01 * l["shuf_write"], 1 << 16
        ):
            byte_parity_ok = False  # not the same plan — don't price it
        # Only big byte-movers bound the transport price: below ~10 MiB
        # the delta is dominated by fixed per-job overhead and dividing
        # by small bytes manufactures absurd per-MiB figures.
        if mib >= 10.0 and delta * 1000 / mib < bound:
            bound, bound_op = delta * 1000 / mib, name
        raw = f"{delta*1000/mib:.0f}" if mib > 0.05 else "—"
        rows.append(
            f"| {name} | {l['sec']:.2f} | {c['sec']:.2f} | "
            f"{c['sec']/l['sec']:.2f}x | {mib:.1f} | {raw} |"
        )
    return {
        "rows": rows,
        "fixed": fixed,
        "bound": bound,
        "bound_op": bound_op,
        "byte_parity_ok": byte_parity_ok,
    }


def main() -> int:
    from ocdb_server_spark.session import get_spark

    rep, only = parse_args(sys.argv[1:])
    queries = tuple(only) if only else OPS
    execmem = next(
        (a.split("=", 1)[1] for a in sys.argv[1:]
         if a.startswith("--execmem=")),
        "6g",
    )
    n_workers = int(next(
        (a.split("=", 1)[1] for a in sys.argv[1:]
         if a.startswith("--workers=")),
        "2",
    ))
    if n_workers < 1 or 16 % n_workers:
        raise SystemExit(
            f"--workers={n_workers} must divide the 16 total cores "
            "(1, 2, 4, 8, 16) — otherwise the cluster registers fewer "
            "than 16 and the core-parity wait aborts after a wasted "
            "dataset build"
        )
    exec_cores = 16 // n_workers
    # Validate --only against the registry BEFORE the dataset build /
    # cluster spin (review finding: a typo otherwise costs minutes
    # and surfaces as a raw KeyError mid-suite).
    from ocdb_server_spark.registry import load_all

    unknown = [q for q in queries if q not in load_all()]
    if unknown:
        raise SystemExit(f"--only names unknown ops: {unknown}")

    # Build (or adopt) the shared REP-times dataset with a plain local
    # builder session, then tear it down so each measured suite gets a
    # clean session of its own shape.
    spark = get_spark(app_name="cluster_tp_build")
    spark.sparkContext.setLogLevel("ERROR")
    data = ensure_dataset(spark, rep)
    spark.stop()
    time.sleep(2)

    procs, workdirs = start_cluster(
        n_workers=n_workers, cores=exec_cores, mem=execmem
    )
    try:
        cluster = run_suite(
            MASTER_URL, data, "standalone", queries,
            execmem=execmem, exec_cores=exec_cores,
        )
    finally:
        stop_cluster(procs, workdirs)
    local = run_suite("local[16]", data, "local", queries)

    s = summarize(queries, cluster, local)
    print("| op | local[16] s | cluster s | ratio | shuffle MiB | raw Δms/MiB |")
    print("|---|---|---|---|---|---|")
    print("\n".join(s["rows"]))
    fixed_txt = (
        f"{s['fixed']*1000:+.0f} ms" if s["fixed"] is not None
        else "not measured (--only excluded the control op)"
    )
    print(
        f"fixed per-job cluster overhead (control {CONTROL}): "
        f"{fixed_txt}; transport price upper bound: "
        f"{s['bound']:.1f} ms/shuffled-MiB ({s['bound_op']}); "
        f"byte parity across transports: {s['byte_parity_ok']}",
        file=sys.stderr,
    )
    report = {
        "metric": "cluster_throughput",
        "rep": rep,
        "execmem": execmem,
        "workers": n_workers,
        "transport": f"standalone {n_workers} workers x {exec_cores} "
                     "cores vs local[16], shuffle_partitions=16, "
                     "batch profile",
        "price_bound_ms_per_mib":
            round(s["bound"], 2) if s["bound_op"] else None,
        "price_bound_op": s["bound_op"],
        "byte_parity_ok": s["byte_parity_ok"],
        "cluster": cluster,
        "local": local,
    }
    if s["fixed"] is not None:  # omit, don't fabricate, when unmeasured
        report["fixed_overhead_sec"] = round(s["fixed"], 3)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
