#!/usr/bin/env python
"""Substantiate BASELINE.md's op159 claim with a NUMBER: at stress
scale, how much of the fact⋈fact join's wall does persisted bucketing
(co-located layout, zero exchange, zero sort) actually remove?

Compares, on the 10×-replicated dataset (6M lineitem, 1.5M orders):

  shuffle : plain SMJ — both facts exchange + sort per query
  bucketed: both facts written ONCE as 32-bucket sorted tables
            (op159's layout, bucket count scaled 8→32 for the data
            size), joined with no exchange and no sort

Timing protocol is the round-8 corrected one: FRESH DataFrame per
rep, best-of-3 full executions, py4j build excluded. The one-time
bucketing write is reported separately — that is the layout cost a
nightly pipeline pays once per table, not per query.

Usage: python scripts/stress_scale.py 10 --keep   # build the dataset
       python scripts/bucketed_stress.py [REP]    # then this (default 10)
       python scripts/bucketed_stress.py [REP] --transports
           # 2x2: (shuffle SMJ vs bucketed SMJ) x (standalone cluster
           # vs local[16]). The round-11d law says the cluster premium
           # is paid per REMOTE shuffled byte — so the bucketed layout
           # (zero join-side exchanges) should show NO premium where
           # the shuffle join pays one. This mode measures that claim
           # directly on the real netty transport.

At REP=100 (60M lineitem ⋈ 15M orders) the comparison hits exactly
the regime BASELINE.md's corrected curve flags as op39's steepest
term — both facts out of the broadcast regime, shuffle-sort under
spill pressure — so the removed exchanges are the growing cost, not
a fixed one. Buckets scale with the data (32 at 10×, 128 at 100×)
to keep per-bucket files in the tens of MB, the same sizing rule
op159 documents.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REP = int(
    next((a for a in sys.argv[1:] if not a.startswith("-")), "10")
)
DATA = os.path.join(tempfile.gettempdir(), f"ocdb_stress_sf1_rep{REP}")
BUCKETS = 32 if REP <= 10 else 128


def run_transport(spark, suffix: str) -> dict:
    """shuffle-vs-bucketed comparison on one session. Returns the two
    best-of-3 fresh-exec times, the one-time layout write time, the
    bucketed plan's Exchange count (asserted == the single pre-agg
    one), and the results-identical check."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(DATA, "lineitem.parquet")).select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(os.path.join(DATA, "orders.parquet")).select(
        "o_orderkey", "o_orderstatus"
    )

    def join_agg(lib, ob):
        return (
            lib.filter(F.col("l_quantity") > 40)
            .hint("merge")
            .join(ob, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_items"),
                F.expr(
                    "cast(sum(cast(l_quantity as decimal(18,2))) as double)"
                ).alias("sum_qty"),
            )
        )

    def best_of(build, reps=3) -> float:
        build().toArrow()  # session/codegen warm
        best = float("inf")
        for _ in range(reps):
            df = build()  # fresh instance: no shuffle-output reuse
            t0 = time.perf_counter()
            df.toArrow()
            best = min(best, time.perf_counter() - t0)
        return best

    shuffle_s = best_of(lambda: join_agg(li, o))

    # one-time layout: both facts bucketed+sorted on the join key
    t0 = time.perf_counter()
    for name, df, key in (
        (f"ocdb_stress_li_b_rep{REP}{suffix}", li, "l_orderkey"),
        (f"ocdb_stress_o_b_rep{REP}{suffix}", o, "o_orderkey"),
    ):
        loc = os.path.join(tempfile.gettempdir(), f"ocdb_bucketed_{name}")
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(loc, ignore_errors=True)
        (
            df.repartition(BUCKETS, F.col(key))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(BUCKETS, key)
            .sortBy(key)
            .option("path", loc)
            .saveAsTable(name)
        )
    layout_s = time.perf_counter() - t0

    lib = spark.table(f"ocdb_stress_li_b_rep{REP}{suffix}")
    ob = spark.table(f"ocdb_stress_o_b_rep{REP}{suffix}")
    bucketed_s = best_of(lambda: join_agg(lib, ob))

    plan = (
        join_agg(lib, ob)._jdf.queryExecution().executedPlan().toString()
    )
    n_exch = plan.count("Exchange")
    # The whole claim is "zero JOIN-SIDE exchanges": the only Exchange
    # allowed in the bucketed plan is the single pre-agg repartition
    # after the join. Assert it, don't just print it — a bucket-count
    # mismatch or layout regression would otherwise produce a timing
    # table that silently measures a shuffled join (review finding).
    assert n_exch == 1, (
        f"bucketed plan has {n_exch} Exchanges (expected exactly the "
        f"1 pre-agg exchange — join-side shuffles are back):\n{plan}"
    )
    # sanity: identical results both paths
    a = join_agg(li, o).toPandas().sort_values("o_orderstatus")
    b = join_agg(lib, ob).toPandas().sort_values("o_orderstatus")
    same = a.reset_index(drop=True).equals(b.reset_index(drop=True))
    return {
        "shuffle_s": shuffle_s,
        "bucketed_s": bucketed_s,
        "layout_s": layout_s,
        "n_exch": n_exch,
        "same": same,
    }


def main() -> None:
    from ocdb_server_spark.session import get_spark

    if not os.path.isdir(DATA):
        sys.exit(f"{DATA} missing — run scripts/stress_scale.py {REP} --keep")

    if "--transports" not in sys.argv:
        spark = get_spark(app_name="bucketed_stress", profile="interactive")
        spark.sparkContext.setLogLevel("ERROR")
        r = run_transport(spark, "")
        print("| path | best-of-3 fresh exec | join-side exchanges |")
        print("|---|---|---|")
        print(f"| shuffle SMJ | {r['shuffle_s']*1000:.0f} ms "
              "| (exchange+sort both sides) |")
        print(f"| bucketed SMJ | {r['bucketed_s']*1000:.0f} ms "
              f"| {r['n_exch']} pre-agg exchange(s) in plan |")
        print(f"one-time bucketing write: {r['layout_s']:.1f} s; "
              f"results identical: {r['same']}")
        return

    # --transports: the 2x2. Interactive profile (AQE off — the plan
    # assert reads a deterministic executedPlan) at shuffle_partitions
    # =16 on BOTH transports; the merge hint pins SMJ either way.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cluster_smoke import (
        MASTER_URL,
        start_cluster,
        stop_cluster,
        wait_for_cores,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    procs, wds = start_cluster()
    try:
        spark = get_spark(
            app_name="bucketed_tp_cluster",
            master=MASTER_URL,
            shuffle_partitions=16,
            profile="interactive",
            extra_conf={
                "spark.executor.memory": "6g",
                "spark.executor.cores": "8",
                "spark.executorEnv.PYTHONPATH":
                    f"{repo}{os.pathsep}{os.path.join(repo, 'vendor')}",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        wait_for_cores(spark, 16)
        results["cluster"] = run_transport(spark, "_c")
        spark.stop()
        time.sleep(2)
    finally:
        stop_cluster(procs, wds)
    spark = get_spark(
        app_name="bucketed_tp_local",
        master="local[16]",
        shuffle_partitions=16,
        profile="interactive",
    )
    spark.sparkContext.setLogLevel("ERROR")
    results["local"] = run_transport(spark, "_l")

    c, l = results["cluster"], results["local"]
    print("| join path | local[16] | cluster (2x8, netty) | cluster premium |")
    print("|---|---|---|---|")
    print(f"| shuffle SMJ (both facts exchange) | {l['shuffle_s']*1000:.0f} ms "
          f"| {c['shuffle_s']*1000:.0f} ms "
          f"| {(c['shuffle_s']-l['shuffle_s'])*1000:+.0f} ms |")
    print(f"| bucketed SMJ (zero join-side exchange) "
          f"| {l['bucketed_s']*1000:.0f} ms | {c['bucketed_s']*1000:.0f} ms "
          f"| {(c['bucketed_s']-l['bucketed_s'])*1000:+.0f} ms |")
    print(f"results identical on both transports: "
          f"{c['same'] and l['same']}; one-time layout write "
          f"cluster/local: {c['layout_s']:.1f}/{l['layout_s']:.1f} s")


if __name__ == "__main__":
    main()
