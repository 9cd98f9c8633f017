#!/usr/bin/env python
"""10× stress run: replicate sf0.1 into an ≈sf1 derived dataset and
measure throughput-representative operators on it.

The driver's largest testdata is sf0.1 (600k lineitem rows). The
scaling study (BASELINE.md) shows wall time there is still
fixed-cost-dominated, which proves overhead amortizes but says little
about the data-proportional slope. This script manufactures the next
decade locally. Replication rules (round-7 review fixed the first
cut, which replicated dimensions and broke join fan-out):

- FACT/ENTITY tables (lineitem, orders, customer, events, documents,
  embeddings) are replicated REP times with BOTH their primary keys
  AND the foreign keys among themselves shifted by i*10^9 per replica
  (l_orderkey; o_orderkey + o_custkey; c_custkey; event_id + user_id;
  doc_id; vec_id) — each replica joins within itself.
- DIMENSIONS (supplier, nation, region, part) are written ONCE:
  l_suppkey/l_partkey stay unshifted and every replica's facts join
  the single dimension copy 1:1, exactly like a production star.
- documents TEXT is per-replica letter-translated (the alphabet
  rotated by the replica index) so replicas are NOT
  near-duplicates of each other — without this the LSH ops would
  legitimately find O(REP^2) cross-replica pairs and measure pair
  blow-up, not throughput.

Everything is written as multi-file parquet to tmp and the
throughput-shaped operators run with the bench methodology
(warm cache, best-of-3, toArrow).

Prints a markdown table: sf0.1 wall, sf1 wall, ratio (ideal ≤ 10×),
and per-row slope.
Usage: python scripts/stress_scale.py [REP] [--keep] [--only=opA,opB]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocdb_server_spark.scratch import _pid_alive  # noqa: E402

def parse_args(argv: list[str]) -> tuple[int, list[str] | None]:
    """(REP, only-list). Flags first, then the positional REP
    (round-7 ADVICE: `--keep` as argv[1] used to crash int()).
    --only=opA,opB runs a subset (e.g. freshly added ops against KEPT
    datasets) without re-timing the whole list — the round-8 close
    measured op259/op260 this way. Parsed inside main(), not at
    import time, so the build-publish helpers stay unit-testable."""
    positional = [a for a in argv if not a.startswith("-")]
    rep = int(positional[0]) if positional else 10
    only = next(
        (a.split("=", 1)[1].split(",") for a in argv
         if a.startswith("--only=")),
        None,
    )
    return rep, only


SRC = "/root/testdata/sf0.1"
SHIFT = 10**9

# replicated tables -> key columns shifted per replica
REPLICATED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# dimensions written once (facts join them 1:1, unshifted keys)
SINGLE = ("supplier", "nation", "region", "part")

# per-replica letter permutations for documents.text (replica 0 = identity)
_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _rotated(i: int) -> str:
    return _ALPHA[i % 26:] + _ALPHA[: i % 26]

def reap_stale_builds(base: str, out_name: str) -> list[str]:
    """Remove `<out_name>.building.<pid>` dirs whose owning PID is
    dead — the litter a Ctrl-C mid-build leaves behind (the atomic
    rename cleans up the happy path). Never touches a live builder's
    dir or anything not matching the marker. Returns reaped names
    (unit-tested in tests/test_scale_paths.py)."""
    marker = f"{out_name}.building."
    reaped: list[str] = []
    for name in os.listdir(base):
        if name.startswith(marker) and name[len(marker):].isdigit():
            if not _pid_alive(int(name[len(marker):])):
                shutil.rmtree(os.path.join(base, name), ignore_errors=True)
                reaped.append(name)
    return reaped


def publish_build(build_dir: str, out_dir: str) -> str:
    """Atomically publish a finished build: os.replace so a reader
    never observes a partial dataset under `out_dir`. If a concurrent
    run won the publish race (rename(2) onto a non-empty dir fails),
    use theirs and drop ours. Returns the dataset path to measure."""
    try:
        os.replace(build_dir, out_dir)
    except OSError:
        if os.path.isdir(out_dir):
            shutil.rmtree(build_dir, ignore_errors=True)
        else:
            raise
    return out_dir


QUERIES = (
    "op17_agg_groupby",
    "op39_join_multiway_star",
    "op69_stream_tumbling",
    # round-9 enrollment (round-8 verdict item 2): the two weak
    # headliners that had no measured data slope — window top-k
    # (customer count scales with REP) and brute-force cosine kNN
    # (corpus scan scales with REP; the vec_id=0 query vector stays
    # unique — replica keys shift by 1e9)
    "op42_win_row_number_topk_group",
    "op80_sim_cosine_knn",
    "op75_dedup_exact",
    "op79_minhash_neardup",
    "op93_token_count",
    "op233_interval_coverage",
    # round-8 additions: the folded CMS point-query (per-token md5
    # kernel, single scan) and the damped multiplicative forecaster
    # (daily-spine agg 10x taller, recurrence length unchanged)
    "op215_cms_pointquery",
    "op257_holt_winters_damped_multiplicative",
    # round-8 late additions: the Croston state loop (series count
    # fixed, window fixed — only the counts agg sees 10× rows) and
    # the BGZF write→walk→split-read round-trip (10× documents →
    # 10× members; the whole pipeline is data-proportional)
    "op259_croston_sba",
    "op260_bgzf_splittable_gzip",
    # round-10 additions: the seekable-zstd write→seek-table→split-
    # read round-trip (10× documents → 10× frames, one footer read
    # per file) and the ADI/CV² classifier (counts agg sees 10× rows;
    # series count fixed at 128 — pure-agg slope)
    "op261_zstd_seekable_ingest",
    "op262_demand_classification",
)


def ensure_dataset(spark, rep: int) -> str:
    """Build (or adopt) the REP× replicated dataset under the system
    tmpdir and return its path. Shared by this script's slope study
    and scripts/cluster_throughput.py's netty-transport pricing, so
    both measure the exact same bytes.

    Build goes into a temp name and is atomically renamed on
    completion, so a run interrupted mid-build never leaves a partial
    dataset that a later run silently measures against (round-7
    ADVICE)."""
    from pyspark.sql import functions as F

    from ocdb_server_spark import io as eio

    out_dir = os.path.join(tempfile.gettempdir(), f"ocdb_stress_sf1_rep{rep}")
    # reap .building litter from crashed/interrupted runs (the rename
    # below cleans up the happy path; Ctrl-C mid-build does not) —
    # only dirs whose owning PID is gone, never a concurrent builder's
    reap_stale_builds(tempfile.gettempdir(), f"ocdb_stress_sf1_rep{rep}")
    if os.path.isdir(out_dir):
        return out_dir
    build_dir = out_dir + f".building.{os.getpid()}"
    os.makedirs(build_dir, exist_ok=True)
    for name in SINGLE:
        eio.load_table(spark, SRC, name).write.mode("overwrite").parquet(
            os.path.join(build_dir, f"{name}.parquet")
        )
    for name, keys in REPLICATED.items():
        src = eio.load_table(spark, SRC, name)
        parts = []
        for i in range(rep):
            df = src
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            if name == "documents" and i > 0:
                df = df.withColumn(
                    "text", F.translate("text", _ALPHA, _rotated(i))
                )
            parts.append(df)
        rep_df = parts[0]
        for p in parts[1:]:
            rep_df = rep_df.unionByName(p)
        rep_df.write.mode("overwrite").parquet(
            os.path.join(build_dir, f"{name}.parquet")
        )
    out = publish_build(build_dir, out_dir)
    print(f"built or adopted {out} (REP={rep})", file=sys.stderr)
    return out


def main() -> None:
    from ocdb_server_spark import io as eio
    from ocdb_server_spark.registry import load_all
    from ocdb_server_spark.session import get_spark

    REP, only = parse_args(sys.argv[1:])
    spark = get_spark(app_name="stress_scale", profile="interactive")
    spark.sparkContext.setLogLevel("ERROR")
    ops = load_all()
    queries = tuple(only) if only else QUERIES
    unknown = [q for q in queries if q not in ops]
    if unknown:
        raise SystemExit(f"--only names unknown ops: {unknown}")

    out_dir = ensure_dataset(spark, REP)

    def run(sf_dir: str) -> dict[str, float]:
        eio.clear_cache()
        eio.warm_cache(spark, sf_dir)
        out: dict[str, float] = {}
        for q in queries:
            ops[q].fn(spark, sf_dir).toArrow()  # session/codegen warm
            best = float("inf")
            # ROUND-8 CORRECTION (see bench.py): re-executing ONE
            # DataFrame reuses completed shuffle map outputs, so only
            # the final stage was being re-timed for shuffle-bearing
            # ops — which made the relational rows look flatter than
            # the engine is. Build a FRESH instance per rep (new
            # shuffle deps) and time one full execution, excluding
            # the py4j plan construction.
            for _ in range(3):
                df = ops[q].fn(spark, sf_dir)
                t0 = time.perf_counter()
                df.toArrow()
                best = min(best, time.perf_counter() - t0)
            out[q] = best
        return out

    base = run(SRC)
    big = run(out_dir)
    print(f"| query | sf0.1 ms | {REP}x ms | ratio (ideal <= {REP}x) |")
    print("|---|---|---|---|")
    for q in queries:
        print(
            f"| {q} | {base[q]*1000:.0f} | {big[q]*1000:.0f} "
            f"| {big[q]/base[q]:.1f}x |"
        )
    tb, tg = sum(base.values()), sum(big.values())
    print(f"| **total** | **{tb*1000:.0f}** | **{tg*1000:.0f}** | **{tg/tb:.1f}x** |")
    if "--keep" not in sys.argv:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
