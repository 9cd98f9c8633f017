#!/usr/bin/env python
"""Round-9 verdict item 3: op42 (top-3 orders per customer) has the
steepest measured headliner stress slope (19.2× wall at 100× data).
Evaluate the op112 two-phase salted window (functions/skew.py) for
op42's EXACT shape at stress scale and ship whichever wins.

Hypothesis check, stated up front: op42's slope is NOT skew — the
stress orders table's o_custkey is uniform (~10 orders/customer at
every REP), so the direct window's per-task sorts are already
balanced. The salted two-phase exists for the hot-key regime (one key
owning a large share — measured in skew_stress.py); on uniform data
it pays a SECOND full shuffle (phase-2 re-rank) for nothing. This
script measures that trade at 10×/30×/100× so the decision is a
number, not an argument.

Variants (both emit op42's exact output: custkey, orderkey,
totalprice, rn ≤ 3):

  direct : one window, partition by o_custkey — current op42 plan
  salted : phase 1 ranks within (o_custkey, spark_partition_id % 16)
           and keeps rn ≤ 3; phase 2 re-ranks the survivors per
           o_custkey (≤ 3×16 rows/key) — op112's salted_topk_per_key
           with the final rank kept as `rn`

Timing protocol: round-8 corrected — FRESH DataFrame per rep,
best-of-3 full executions via a count() materialization (the top-3
output at REP=100 is ~4.5M rows; an Arrow fetch would time transfer,
not the window), py4j build excluded. Result equality asserted by a
full-output checksum aggregate (sum/xor of per-row hashes), not
row-count alone.

Usage: python scripts/stress_scale.py REP --keep   # build dataset
       python scripts/op42_stress.py [REP ...]     # default: 10 30 100
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import Window as W, functions as F

    from ocdb_server_spark.session import get_spark

    reps = [int(a) for a in sys.argv[1:]] or [10, 30, 100]
    spark = get_spark(app_name="op42_stress", profile="interactive")
    spark.sparkContext.setLogLevel("ERROR")

    print("| REP | orders rows | direct ms (best of 3) | salted ms | winner |")
    print("|---|---|---|---|---|")
    for rep in reps:
        data = os.path.join(tempfile.gettempdir(), f"ocdb_stress_sf1_rep{rep}")
        if not os.path.isdir(data):
            sys.exit(f"{data} missing — run scripts/stress_scale.py {rep} --keep")
        orders = spark.read.parquet(os.path.join(data, "orders.parquet")).select(
            "o_custkey", "o_orderkey", "o_totalprice"
        )
        n_orders = orders.count()
        order_by = [F.col("o_totalprice").desc(), F.col("o_orderkey")]

        def direct():
            w = W.partitionBy("o_custkey").orderBy(*order_by)
            return (
                orders.withColumn("rn", F.row_number().over(w).cast("bigint"))
                .filter(F.col("rn") <= 3)
            )

        def salted():
            salt = (F.spark_partition_id() % 16).alias("_salt")
            w1 = W.partitionBy("o_custkey", "_salt").orderBy(*order_by)
            partial = (
                orders.select("*", salt)
                .withColumn("_rn", F.row_number().over(w1))
                .filter(F.col("_rn") <= 3)
                .drop("_rn", "_salt")
            )
            w2 = W.partitionBy("o_custkey").orderBy(*order_by)
            return (
                partial.withColumn("rn", F.row_number().over(w2).cast("bigint"))
                .filter(F.col("rn") <= 3)
            )

        def checksum(df):
            # bit_xor: order-independent and overflow-free (a SUM of
            # 64-bit hashes overflows under ANSI mode)
            row = df.select(
                F.xxhash64(
                    "o_custkey", "o_orderkey", "o_totalprice", "rn"
                ).alias("h")
            ).agg(
                F.count("*").alias("n"), F.expr("bit_xor(h)").alias("s")
            ).head()
            return (row["n"], row["s"])

        assert checksum(direct()) == checksum(salted()), (
            f"REP={rep}: salted variant changed the RESULT"
        )

        times = {}
        for name, build in (("direct", direct), ("salted", salted)):
            best = float("inf")
            for _ in range(3):
                df = build()
                t0 = time.perf_counter()
                df.count()
                best = min(best, time.perf_counter() - t0)
            times[name] = best * 1000
        winner = min(times, key=times.get)
        print(
            f"| {rep} | {n_orders:,} | {times['direct']:.0f} "
            f"| {times['salted']:.0f} | {winner} |"
        )


if __name__ == "__main__":
    main()
