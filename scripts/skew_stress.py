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
                                     [--mode=join|agg|bucket] [--hotn=4000]
Requires the /tmp/ocdb_stress_sf1_rep{REP} dataset (run
scripts/stress_scale.py REP --keep first).

Round-10 enrollment (round-9 verdict item 6 — op75/op79's variants):

--mode=agg  (op75's shape): the SAME 40%-hot key under a DECOMPOSABLE
  aggregate (count + min per digest). skew.py's docstring claims
  map-side partial aggregation already collapses the hot key before
  the shuffle and salting would only add a shuffle; this mode prints
  the number behind that claim (expect: unsalted ≤ salted).

--mode=bucket (op79's shape): a hot LSH band BUCKET under the
  candidate-pair self-join — one band_hash owning hot_share of the
  docs means that bucket's |B|² pairs all materialize in ONE task of
  the unsalted join (the key IS the bucket id; AQE can't split a
  shuffled-hash self-join either). The salted variant is the blocked
  TRIANGLE self-join: slice each bucket by pmod(xxhash64(doc_id), S),
  replicate each row to its (i≤j) slice-pair cells (left role: j ∈
  [s, S); right role: i ∈ [0, s]), join on (bucket, i, j) — the hot
  bucket's pairs spread over S(S+1)/2 reducer cells at a ~S/2-row
  replication cost. Pair sets asserted identical (each cross-slice
  pair lands in exactly one cell; same-slice duplicates removed by
  the doc_a < doc_b filter). --hotn sets the hot bucket's size: the
  trade has a measured crossover (REP=10: at 4k docs / 8M pairs the
  one-task sort is only ~180 ms and replication loses; at 20k docs /
  200M pairs the unsalted straggler is 3.1 s and the triangle wins
  −50% wall, spread 21×→2×). op79's production guard stays the
  op192-style fanout CAP first; the triangle is the answer when the
  big bucket's pairs are genuinely all wanted.
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


def _mode_flag(argv: list[str]) -> str:
    for a in argv:
        if a.startswith("--mode="):
            return a.split("=", 1)[1]
    return "join"


def main() -> None:
    from pyspark.sql import functions as F

    from ocdb_server_spark.session import get_spark

    argv = sys.argv[1:]
    positional = [a for a in argv if not a.startswith("-")]
    rep = int(positional[0]) if positional else 10
    hot = _flag(argv, "hot", 0.4)
    salt = int(_flag(argv, "salt", 16))
    mode = _mode_flag(argv)
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

    def join_unsalted():
        return (
            fact.join(c.hint("shuffle_hash"), fact.jk == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("tp"),
            )
        )

    def join_salted():
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

    # --- mode=agg: op75's shape — decomposable agg under the hot key ---
    # The per-key aggregate (1 row per key, ~n_cust of them) is folded
    # to ONE summary row so timing measures the aggregation, not a
    # megarow Arrow transfer; the fold is identical in both variants.
    def _agg_summary(per_key):
        return per_key.agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.expr("bit_xor(xxhash64(jk, n, mn))").alias("sig"),
        )

    def agg_unsalted():
        per_key = fact.groupBy("jk").agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("o_orderkey").alias("mn"),
        )
        return _agg_summary(per_key)

    def agg_salted():
        # the two-phase form skew.py's docstring says NOT to write:
        # partial per (key, salt), then re-aggregate per key
        per_salt = (
            fact.withColumn(
                "salt",
                F.pmod(F.xxhash64("o_orderkey", F.lit(13)), F.lit(salt)).cast(
                    "int"
                ),
            )
            .groupBy("jk", "salt")
            .agg(
                F.count("*").cast("bigint").alias("pn"),
                F.min("o_orderkey").alias("pmn"),
            )
        )
        per_key = per_salt.groupBy("jk").agg(
            F.sum("pn").cast("bigint").alias("n"),
            F.min("pmn").alias("mn"),
        )
        return _agg_summary(per_key)

    # --- mode=bucket: op79's shape — hot LSH band bucket self-join ---
    # Docs = the orders keyspace; ONE bucket holds ~hot_n docs (the
    # replicated-corpus regime op79 meets at stress scale: every band
    # of a duplicated doc collides), the rest sit in ~4-doc buckets.
    hot_n = int(_flag(argv, "hotn", 4000))
    n_docs_bucket = None

    def _bucket_docs():
        docs = o.select(F.col("o_orderkey").alias("doc_id"))
        return docs.withColumn(
            "bucket",
            F.when(
                F.pmod(F.xxhash64("doc_id", F.lit(3)), F.lit(10**6))
                < F.lit(int(hot_n * 10**6 / max(n_docs_bucket, 1))),
                F.lit(0),
            ).otherwise(
                F.pmod(F.xxhash64("doc_id", F.lit(5)), F.lit(n_docs_bucket // 4))
                + 1
            ),
        )

    def _pair_summary(pairs):
        return pairs.agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.expr("bit_xor(xxhash64(doc_a, doc_b))").alias("sig"),
        )

    def bucket_unsalted():
        d = _bucket_docs()
        pairs = (
            d.alias("l")
            .join(
                # NO shuffle_hash hint here (unlike mode=join): at
                # REP=100 the per-reducer build side is ~500k rows x 32
                # concurrent tasks and the SHJ hash map OOMs — op79's
                # real plan at this scale is the sort-merge join, so
                # that is what both variants measure.
                d.alias("r").hint("merge"),
                F.expr("l.bucket = r.bucket AND l.doc_id < r.doc_id"),
            )
            .selectExpr("l.doc_id AS doc_a", "r.doc_id AS doc_b")
        )
        return _pair_summary(pairs)

    def _triangle_pairs(d, S):
        # blocked TRIANGLE self-join: slice s = hash(doc_id) % S; a row
        # serves as LEFT of cells (s, j≥s) and RIGHT of cells (i≤s, s);
        # each unordered slice pair is ONE reducer cell. Cross-slice
        # cells (i<j) hold each pair exactly once (orientation forced
        # by slice order — emit least/greatest); diagonal cells (i=j)
        # hold both orientations — keep doc_l < doc_r. ONE copy of the
        # coverage-invariant logic, shared by bucket_salted and
        # bucket_hybrid (round-10 review).
        d = d.withColumn(
            "s", F.pmod(F.xxhash64("doc_id", F.lit(17)), F.lit(S)).cast("int")
        )
        lrep = d.select(
            "doc_id",
            "bucket",
            F.col("s").alias("i"),
            F.explode(F.expr(f"sequence(s, {S - 1})")).alias("j"),
        )
        rrep = d.select(
            "doc_id",
            "bucket",
            F.explode(F.expr("sequence(0, s)")).alias("i"),
            F.col("s").alias("j"),
        )
        return (
            lrep.alias("l")
            .join(
                rrep.alias("r").hint("merge"),
                F.expr(
                    "l.bucket = r.bucket AND l.i = r.i AND l.j = r.j"
                    " AND (l.i < l.j OR l.doc_id < r.doc_id)"
                    " AND l.doc_id != r.doc_id"
                ),
            )
            .selectExpr(
                "least(l.doc_id, r.doc_id) AS doc_a",
                "greatest(l.doc_id, r.doc_id) AS doc_b",
            )
        )

    def bucket_salted():
        return _pair_summary(_triangle_pairs(_bucket_docs(), salt))

    def bucket_hybrid():
        # the PRODUCTION shape (round-10 finding): blanket triangling
        # loses at REP=100 because the uniform small-bucket mass pays
        # the ~S/2 replication for nothing — so route ONLY oversized
        # buckets through the triangle (one count agg + broadcast
        # semi/anti split; AQE's skew-split logic, hand-rolled for the
        # self-join AQE cannot split). Threshold 1000 docs ~ 0.5M pairs
        # per bucket, the point where one task's quadratic work starts
        # to dominate its peers.
        d = _bucket_docs()
        big = (
            d.groupBy("bucket").count().filter(F.col("count") > 1000)
            .select("bucket")
        )
        d_big = d.join(F.broadcast(big), "bucket", "left_semi")
        d_small = d.join(F.broadcast(big), "bucket", "left_anti")
        small_pairs = (
            d_small.alias("l")
            .join(
                d_small.alias("r").hint("merge"),
                F.expr("l.bucket = r.bucket AND l.doc_id < r.doc_id"),
            )
            .selectExpr("l.doc_id AS doc_a", "r.doc_id AS doc_b")
        )
        big_pairs = _triangle_pairs(d_big, salt)
        return _pair_summary(small_pairs.unionAll(big_pairs))

    if mode == "join":
        variants = (("unsalted", join_unsalted), ("salted", join_salted))
    elif mode == "agg":
        variants = (("unsalted", agg_unsalted), ("salted", agg_salted))
    elif mode == "bucket":
        n_docs_bucket = o.count()
        variants = (
            ("unsalted", bucket_unsalted),
            ("salted", bucket_salted),
            ("hybrid", bucket_hybrid),
        )
    else:
        raise SystemExit(f"unknown --mode={mode}")

    # warm every shape once (codegen/JIT), then measure fresh builds;
    # all variants must produce the identical result
    ref = sorted(map(tuple, variants[0][1]().collect()))
    for name, build in variants[1:]:
        got = sorted(map(tuple, build().collect()))
        assert got == ref, f"{mode}/{name}: variant changed the RESULT"

    rows = []
    for name, build in variants:
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
        f"\nmode={mode} REP={rep} hot_share={hot} salt={salt} "
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
