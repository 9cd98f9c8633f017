#!/usr/bin/env python
"""Wall time vs data volume: the headline queries at 3 scale factors.

BASELINE.md's central performance argument is that at bench scale the
wall time is dominated by Spark's fixed per-job cost (task scheduling,
stage launch), not by data — so the DuckDB-millisecond gap is a
fixed-overhead artifact that amortizes to noise at cluster volumes,
while the data-proportional part (the one that matters at 100 TB)
stays linear. This script reproduces that evidence: each headline
query is built once and its execution timed best-of-5 per scale
factor over a warm auto-sized cache (the bench.py methodology), and
the marginal cost of 100x the rows is printed per query.

Usage: python scripts/scaling_study.py   # prints a markdown table
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ("sf0.001", "sf0.01", "sf0.1")
QUERIES = (
    "op17_agg_groupby",
    "op42_win_row_number_topk_group",
    "op39_join_multiway_star",
    "op114_join_topk_revenue",
    "op69_stream_tumbling",
    "op80_sim_cosine_knn",
    "op75_dedup_exact",
    "op79_minhash_neardup",
    # round-6/7 flagships: recurrences, sketches, tokenizer, formats —
    # families whose scale story differs from scans/joins (per-key
    # loops, vocab-sized aggs, executor-side codecs)
    "op212_kmeans_lloyd",
    "op216_bpe_train",
    "op215_cms_pointquery",
    "op233_interval_coverage",
    "op252_avro_roundtrip",
    "op253_holt_damped",
)


def main() -> None:
    from ocdb_server_spark.session import get_spark
    from ocdb_server_spark import io as eio
    from ocdb_server_spark.registry import load_all

    spark = get_spark(app_name="scaling_study", profile="interactive")
    spark.sparkContext.setLogLevel("ERROR")
    ops = load_all()

    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        eio.clear_cache()
        eio.warm_cache(spark, sf_dir)
        for q in QUERIES:
            # ROUND-8 CORRECTION (see bench.py): a FRESH DataFrame per
            # rep — re-executing one instance reuses completed shuffle
            # map outputs and times only the final stage, which is how
            # the pre-correction tables got flat relational rows.
            ops[q].fn(spark, sf_dir).toArrow()  # warm session/codegen
            best = float("inf")
            for _ in range(5):
                df = ops[q].fn(spark, sf_dir)
                t0 = time.perf_counter()
                df.toArrow()
                best = min(best, time.perf_counter() - t0)
            results[q][sf] = best

    print("| query | sf0.001 | sf0.01 | sf0.1 (100×) | marginal cost of 100× data |")
    print("|---|---|---|---|---|")
    tot = {sf: 0.0 for sf in SFS}
    for q in QUERIES:
        r = results[q]
        for sf in SFS:
            tot[sf] += r[sf]
        delta = (r["sf0.1"] / r["sf0.001"] - 1) * 100
        print(
            f"| {q} | {r['sf0.001']*1000:.0f} | {r['sf0.01']*1000:.0f} "
            f"| {r['sf0.1']*1000:.0f} | {delta:+.0f}% |"
        )
    delta = (tot["sf0.1"] / tot["sf0.001"] - 1) * 100
    print(
        f"| **total** | **{tot['sf0.001']:.2f} s** | **{tot['sf0.01']:.2f} s** "
        f"| **{tot['sf0.1']:.2f} s** | **{delta:+.0f}%** |"
    )


if __name__ == "__main__":
    main()
