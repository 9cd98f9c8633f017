#!/usr/bin/env python
"""Measured skew evidence for the op167 salting pattern (round-8
verdict item 7): a zipf-style hot-key join at stress scale, salted vs
unsalted, with the straggler task-time spread that makes the skew
visible — not just total wall.

Skew model: ONE hot customer owns HOT_SHARE of the fact rows (the
"one key owns a large share" regime op167's docstring names); the
rest are uniform over the replicated customer keyspace. Key choice is
deterministic (xxhash64 of the orderkey), so both variants join the
IDENTICAL row set and their aggregates must be equal — asserted every
run, the same salting-changes-only-the-distribution contract op167's
oracle certifies at sf0.01.

Both variants pin the shuffled-hash join (hint + autoBroadcast off):
the salting pattern exists for the dim-too-big-to-broadcast case, and
broadcasting would dissolve the skew instead of measuring it. AQE is
OFF (the interactive profile): AQE's skewedJoin split handles
sort-merge skew but NOT shuffled-hash joins — op167's exact niche —
so enabling it would only add per-stage materialization latency to
both variants without mitigating either; the comparison is the same
one a production job with a skewed shuffled-hash join faces.

Straggler spread comes from the Spark UI REST API (taskSummary
quantiles of the heaviest stage in each run's window): an unsalted
hot key shows up as max >> median task duration; salting flattens it.

Usage: python scripts/skew_stress.py [REP] [--hot=0.4] [--salt=16]
Requires the /tmp/ocdb_stress_sf1_rep{REP} dataset (run
scripts/stress_scale.py REP --keep first).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flag(argv: list[str], name: str, default: float) -> float:
    for a in argv:
        if a.startswith(f"--{name}="):
            return float(a.split("=", 1)[1])
    return default


def _stage_rows(
    ui: str, t0: float, t1: float
) -> list[tuple[dict, str]]:
    """(stage, app_id) for completed stages whose submission fell
    inside [t0, t1] (epoch seconds), via the UI REST API."""
    import datetime as dt

    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    out = []
    for s in stages:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        if not sub:
            continue
        # REST timestamps look like 2026-08-15T07:50:01.123GMT
        ts = dt.datetime.strptime(
            sub.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
        ).timestamp()
        if t0 <= ts <= t1:
            out.append((s, app))
    return out


def _straggler_spread(
    ui: str, t0: float, t1: float, reducer_tasks: int
) -> tuple[float, float, int]:
    """(median_ms, max_ms, n_tasks) of the heaviest REDUCER stage in
    the window — identified as numTasks == the session's shuffle
    partition count, which in these plans is exactly the join-probe
    stage (scans have file-split task counts); among those, heaviest
    by max task duration."""
    best = (0.0, 0.0, 0)
    best_read = -1
    for s, app in _stage_rows(ui, t0, t1):
        if s["numTasks"] != reducer_tasks:
            continue
        # the join-probe reducer is the stage that READS the big fact
        # shuffle — the scan (no shuffle read) and the final agg
        # (kilobytes) disqualify themselves on volume
        read = s.get("shuffleReadBytes", 0)
        if read <= best_read:
            continue
        url = (
            f"{ui}/api/v1/applications/{app}/stages/{s['stageId']}/"
            f"{s['attemptId']}/taskSummary?quantiles=0.5,1.0"
        )
        try:
            with urllib.request.urlopen(url) as r:
                q = json.load(r)
        except OSError:
            continue
        best_read = read
        best = (q["duration"][0], q["duration"][1], s["numTasks"])
    if best == (0.0, 0.0, 0):
        # No stage in the window matched the reducer signature — the
        # spread column would silently read 0/0 and look like "no
        # skew" (round-9 ADVICE). Loudly mark the row as unmeasured
        # instead; wall-clock numbers are still valid.
        print(
            f"WARNING: no {reducer_tasks}-task shuffle-read stage found "
            f"in window [{t0:.0f}, {t1:.0f}] — spread columns are "
            "UNMEASURED for this variant",
            file=sys.stderr,
        )
        return (float("nan"), float("nan"), 0)
    return best


def main() -> None:
    from pyspark.sql import functions as F

    from ocdb_server_spark.session import get_spark

    argv = sys.argv[1:]
    positional = [a for a in argv if not a.startswith("-")]
    rep = int(positional[0]) if positional else 10
    hot = _flag(argv, "hot", 0.4)
    salt = int(_flag(argv, "salt", 16))
    data = os.path.join("/tmp", f"ocdb_stress_sf1_rep{rep}")
    if not os.path.isdir(data):
        raise SystemExit(
            f"{data} missing — run scripts/stress_scale.py {rep} --keep first"
        )

    # 32 reducers (one per core — the cluster shape): with 8 the hot
    # key's reducer also carries 1/8 of the uniform mass and the
    # spread washes out; at 32 the skew is visible the way it is on a
    # real cluster (one straggler vs 31 idle-ish peers). UI on for the
    # REST taskSummary quantiles. AQE off (interactive) — see module
    # docstring: AQE cannot split a skewed shuffled-HASH join anyway.
    reducers = 32
    spark = get_spark(
        app_name="skew_stress",
        profile="interactive",
        shuffle_partitions=reducers,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    o = spark.read.parquet(f"{data}/orders.parquet")
    c = spark.read.parquet(f"{data}/customer.parquet")
    n_cust = c.count()
    hot_pct = int(hot * 100)
    # deterministic zipf-style key: hot_pct% of fact rows hit customer
    # key 1; the rest spread uniformly over the replicated keyspace.
    # (REP-dataset custkeys are base_key + replica*1e9 — remap the
    # uniform draw into replica 0's dense range [1, n_cust/REP] plus
    # replica shifts so every draw is a real customer.)
    base = n_cust // rep
    fact = o.withColumn(
        "jk",
        F.when(F.pmod(F.xxhash64("o_orderkey"), F.lit(100)) < hot_pct, F.lit(1))
        .otherwise(
            F.pmod(F.xxhash64("o_orderkey", F.lit(7)), F.lit(base)) + 1
            + (F.pmod(F.xxhash64("o_orderkey", F.lit(11)), F.lit(rep)))
            * F.lit(10**9)
        ),
    ).select("jk", "o_orderkey", "o_totalprice")

    def unsalted():
        return (
            fact.join(c.hint("shuffle_hash"), fact.jk == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("tp"),
            )
        )

    def salted():
        # salt is per-ROW (op167's rule: hash of the unique orderkey,
        # NOT of the join key — a key-derived salt would send the hot
        # key's rows to one reducer again)
        fs = fact.withColumn(
            "salt",
            F.pmod(F.xxhash64("o_orderkey", F.lit(13)), F.lit(salt)).cast("int"),
        )
        cs = c.select(
            "c_custkey",
            "c_mktsegment",
            F.explode(F.expr(f"sequence(0, {salt - 1})")).alias("salt"),
        ).withColumn("salt", F.col("salt").cast("int"))
        return (
            fs.join(
                cs.hint("shuffle_hash"),
                (fs.jk == cs.c_custkey) & (fs.salt == cs.salt),
            )
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("tp"),
            )
        )

    # warm both shapes once (codegen/JIT), then measure fresh builds
    ua = sorted(map(tuple, unsalted().collect()))
    sa = sorted(map(tuple, salted().collect()))
    assert ua == sa, "salting changed the RESULT — broken variant"

    rows = []
    for name, build in (("unsalted", unsalted), ("salted", salted)):
        best = float("inf")
        w0 = time.time()
        for _ in range(3):
            df = build()
            t0 = time.perf_counter()
            df.toArrow()
            best = min(best, time.perf_counter() - t0)
        med, mx, ntasks = _straggler_spread(ui, w0, time.time(), reducers)
        rows.append((name, best * 1000, med, mx, ntasks))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    print(
        f"\nREP={rep} hot_share={hot} salt={salt} "
        f"(fact {fact.count():,} rows, dim {n_cust:,} rows)"
    )
    print("| variant | wall ms (best of 3) | task median ms | task max ms "
          "| max/median | tasks |")
    print("|---|---|---|---|---|---|")
    for name, wall, med, mx, ntasks in rows:
        spread = mx / med if med else float("inf")
        print(
            f"| {name} | {wall:.0f} | {med:.0f} | {mx:.0f} "
            f"| {spread:.1f}x | {ntasks} |"
        )


if __name__ == "__main__":
    main()
