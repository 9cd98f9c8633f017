#!/usr/bin/env python
"""Round-17 verdict item 2: measured floor decomposition for the two
floor-dominated headliners whose DuckDB yardstick sits at-or-below
Spark's local-mode job floor — op69_stream_tumbling (yardstick 14.5 ms,
2x bar 29 ms) and op80_sim_cosine_knn (yardstick 9.1 ms, 2x bar
18.2 ms). The round-9 decomposition already split fresh cost into
build | plan-force | exec | repeat; this script adds the PRIMITIVE
floor terms (what an empty job of the same stage/task shape costs on
this session) so the verdict can rule per-term whether any recoverable
headroom exists below the 2x bar, or extend the do-not-reattack ruling
with numbers.

Protocol mirrors bench.py exactly: interactive profile (AQE off,
8 shuffle partitions), warm_cache, best-of-7, toArrow materialization,
fresh DataFrame instance per rep (new shuffle deps). bench.py itself
stays frozen (eighth round).

Primitive terms (all best-of-7 on the shared session, after warmup):
  py4j_roundtrip      one no-op JVM call - the per-call client tax
  floor_1task         spark.range(1).toArrow() - bench's job_floor_sec
                      (scheduler + 1 task + Arrow fetch of 1 row)
  floor_1stage_k      k-task single-stage job returning 0 rows, k in
                      {4, 8, 32} - task-launch/wave cost scaling
  floor_2stage_5x8    5 map tasks -> tiny exchange -> 8 reduce tasks,
                      1-row result: the cheapest job with op69's
                      shape (events caches to ~5 slices at sf0.1;
                      interactive reducers = 8)
  floor_2stage_1x1    1 map -> exchange -> 1 reduce, fresh instance
                      per rep (build excluded) - the minimal fresh
                      shuffle-bearing job

Per-op terms (fresh instance each rep):
  build       python fn() -> DataFrame (py4j plan construction;
              excluded from bench's `queries`, same as bench)
  plan_force  first touch of queryExecution().executedPlan() - JVM
              analysis + optimization + physical planning
  exec        toArrow() on the SAME instance after plan_force (plan
              cached in QueryExecution - pure job execution + fetch)
  repeat      toArrow() re-issues on one instance (materialized
              shuffles - final stage + fetch only)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ocdb_server_spark.io import warm_cache
from ocdb_server_spark.registry import load_all
from ocdb_server_spark.session import get_spark

OPS = ("op69_stream_tumbling", "op80_sim_cosine_knn")
YARDSTICK_MS = {"op69_stream_tumbling": 14.5, "op80_sim_cosine_knn": 9.1}


def best_of(n: int, fn, warm: int = 3) -> float:
    """min of n timed reps, after `warm` untimed warmup reps (each
    primitive exercises its own JVM/JIT path - round-17 session found
    count() measuring 109 ms un-warmed vs ~13 ms warmed)."""
    for _ in range(warm):
        fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def ms(x: float) -> float:
    return round(x * 1000, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="floor_decompose", profile="interactive")
    spark.sparkContext.setLogLevel("ERROR")
    ops = load_all()
    warm_cache(spark, sf_dir)
    for name in OPS:  # codegen/Arrow warmup, exactly like bench.py
        ops[name].fn(spark, sf_dir).toArrow()

    out: dict = {"sf_dir": sf_dir, "primitives_ms": {}, "ops": {}}
    prim = out["primitives_ms"]

    # --- primitive floors -------------------------------------------
    jvm = spark._jsparkSession
    jvm.version()  # warm the call path
    prim["py4j_roundtrip"] = ms(best_of(25, lambda: jvm.version()))

    one = spark.range(1)
    prim["floor_1task"] = ms(best_of(7, lambda: one.toArrow()))

    for k in (4, 8, 32):
        df = spark.range(k * 1000, numPartitions=k).filter("id < 0")
        prim[f"floor_1stage_{k}task"] = ms(best_of(7, lambda d=df: d.toArrow()))

    # op69's shape: events caches to ~5 slices at sf0.1; tumbling agg
    # shuffles to the interactive profile's 8 reducers. Fresh instance
    # per rep so the map stage re-runs, exactly like bench `queries` -
    # but the py4j BUILD stays OUTSIDE the timer (bench excludes it).
    def fresh_shuffle_floor(n_map: int, key: str) -> float:
        def build():
            return (
                spark.range(n_map * 200, numPartitions=n_map)
                .groupBy((F.col("id") % 5).alias("g"))
                .count()
            )

        build().toArrow()  # codegen warm for this shape
        best = float("inf")
        for _ in range(7):
            df = build()
            t0 = time.perf_counter()
            df.toArrow()
            best = min(best, time.perf_counter() - t0)
        prim[key] = ms(best)
        return best

    fresh_shuffle_floor(1, "floor_2stage_1map_fresh")
    fresh_shuffle_floor(5, "floor_2stage_5map_8red_fresh")
    reused = (
        spark.range(1000, numPartitions=5)
        .groupBy((F.col("id") % 5).alias("g"))
        .count()
    )
    prim["floor_2stage_repeat"] = ms(best_of(7, lambda: reused.toArrow()))

    # --- per-op decomposition ---------------------------------------
    for name in OPS:
        builds, plans, execs = [], [], []
        df = None
        for _ in range(7):
            t0 = time.perf_counter()
            df = ops[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.toArrow()
            t3 = time.perf_counter()
            builds.append(t1 - t0)
            plans.append(t2 - t1)
            execs.append(t3 - t2)
        repeat = best_of(7, lambda: df.toArrow())
        # RUNTIME exchange count: everything below an InMemoryRelation
        # is the cache's already-materialized build plan (op69's cached
        # events carry a RoundRobin repartition that never re-executes)
        # - count only the query-time portion above the first cached
        # relation. Both target plans have exactly one cached scan.
        plan_str = df._jdf.queryExecution().executedPlan().toString()
        runtime = plan_str.split("InMemoryRelation")[0]
        n_shuffle = len(re.findall(r"(?<!Reused)(?<!Broadcast)Exchange ", runtime))
        n_broadcast = runtime.count("BroadcastExchange")
        y = YARDSTICK_MS[name]
        out["ops"][name] = {
            "build_ms": ms(min(builds)),
            "plan_force_ms": ms(min(plans)),
            "exec_fresh_ms": ms(min(execs)),
            "exec_median_ms": ms(sorted(execs)[3]),
            "repeat_ms": ms(repeat),
            "n_shuffle_exchanges": n_shuffle,
            "n_broadcast_exchanges": n_broadcast,
            "yardstick_ms": y,
            "bar_2x_ms": round(2 * y, 1),
        }

    # drift check: the 1-task floor again at the END - if it moved,
    # the run was loaded and the numbers carry their own explanation
    prim["floor_1task_at_end"] = ms(best_of(7, lambda: one.toArrow()))

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
