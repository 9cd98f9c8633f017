"""Connected components over near-dup candidate pairs — op96: the
step that turns pair lists (op79 MinHash, op88 SimHash, op90 LSH) into
dedup decisions: every document gets a canonical cluster id (the min
doc_id of its component) so a pipeline can keep one survivor per
cluster.

Algorithm: iterative min-label propagation (the standard large-graph
connected components on a relational engine — cf. the HashToMin /
"large-star small-star" family, Kiveris et al. '14): each vertex
starts labeled with itself; every iteration each vertex takes the min
label among itself and its neighbors; stop when no label changed.
Iterations = O(graph diameter); near-dup graphs are unions of small
cliques, so 2–3 iterations in practice (bounded at `max_iter` with a
convergence check, not a blind unroll).

Scale notes: each iteration is one join (labels ⋈ edges) + one
groupBy(min) — all shuffles on vertex id, no driver-side state except
the converged flag (one scalar per iteration). Labels are
`localCheckpoint`ed each round so the plan doesn't grow exponentially
with iterations — the classic iterative-DataFrame trap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.functions.iterate import iterate_to_fixpoint
from ocdb_server_spark.io import load_table
from ocdb_server_spark.operators.pipeline_ext import (
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_ctes,
)
from ocdb_server_spark.registry import register


def connected_components(
    edges: DataFrame,
    max_iter: int = 20,
    telemetry: list[dict] | None = None,
    reliable: bool = False,
) -> DataFrame:
    """(src, dst) edge frame → (id, component) with component = min id
    reachable. Vertices only appear if they occur in an edge.

    The loop runs through functions.iterate.iterate_to_fixpoint (the
    general unbounded-recursion surface, round-10 verdict "what's
    missing" item): per-iteration localCheckpoint, a keyed LIMIT-1
    convergence probe (join on id, compare only `component` — cheaper
    than the generic exceptAll probe because the id column prunes),
    loud ValueError on max_iter exhaustion, and optional per-iteration
    telemetry ({iteration, changed, seconds}) for convergence
    observability at scale.

    reliable=True switches BOTH the loop state and the loop-invariant
    edge frame to directory-backed checkpoint() (requires
    sc.setCheckpointDir on shared storage): an executor death
    mid-loop then recomputes nothing and the job completes with the
    identical result, where the default executor-resident
    localCheckpoint blocks would be unrecoverable (both behaviors
    fault-injection-measured — scripts/cluster_faultkill.py /
    BASELINE.md Round 11f). Default stays local: op96's driver-gate
    runs are single-JVM, where reliable's per-iteration write+read
    buys nothing."""
    from ocdb_server_spark.functions.iterate import _truncate_lineage

    sym = _truncate_lineage(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct(),
        # Materialize ONCE (round-10 review): the edge frame is joined
        # every iteration AND feeds the initial labels — without this,
        # each iteration's checkpoint action re-derives the whole
        # upstream pair pipeline (for op96/op221 that is the 5-shuffle
        # ngram-Jaccard plan), so 2-3 iterations ran it 3-4 times. Same
        # "self-join would evaluate the aggregation twice" economics
        # op88 solves with a persist; checkpointing keeps the helper
        # self-contained (no cache pool needed, blocks GC with the df).
        # Durability must MATCH the loop's: a localCheckpointed
        # invariant dies with its executor no matter how the loop
        # state is protected.
        reliable,
    )
    labels0 = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )

    def step(labels: DataFrame) -> DataFrame:
        # each vertex adopts the min component among itself + neighbors
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("n_comp"))
        )
        return labels.join(neighbor_min, "id", "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
            ).alias("component"),
        )

    def label_changed(old: DataFrame, new: DataFrame) -> int:
        return (
            new.alias("n")
            .join(old.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )

    # Exhaustion raises (iterate_to_fixpoint's contract): exiting on
    # range end would mean the labels are NOT a fixpoint — op96/op221
    # would emit split clusters with non-canonical ids, silently wrong
    # at no-oracle bench scales (round-10 review). A graph of diameter
    # > max_iter is real on chain-shaped near-dup corpora; the caller
    # raises max_iter.
    return iterate_to_fixpoint(
        labels0,
        step,
        changed=label_changed,
        max_iter=max_iter,
        reliable=reliable,
        telemetry=telemetry,
        what="connected_components",
    )


# The exact near-dup edge relation both engines can compute: word-
# 3-gram Jaccard ≥ 0.5 across ALL sources (dedup's whole point is the
# same text resurfacing in different crawls). 0.5 is the classic
# "near duplicate" bar (≈ the similarity MinHash banding at 4×4 is
# tuned to catch); the LSH approximation of this same relation stays
# under op79/op194 as the 100 TB candidate-generation path.
_EXACT_NEARDUP_THRESHOLD = 0.5

# Shared CTE chain for the op96/op221 oracles: the exact gram-blocked
# pair relation (ONE template with op89's oracle —
# pipeline_ext.ngram_jaccard_pairs_ctes, here with no source
# restriction and J ≥ 0.5), its symmetric closure, and the
# min-reachable-id fixpoint — DuckDB's WITH RECURSIVE computes
# exactly the label each vertex converges to under min-label
# propagation, because both equal "min doc_id reachable" (the
# fixpoint is order-independent). UNION (not UNION ALL) dedups reach
# rows, so the recursion terminates after diameter steps.
# O(cluster_size²) rows per cluster is oracle-only economics:
# near-dup clusters are small cliques; the ENGINE side never builds
# transitive closure (connected_components above is the
# HashToMin-family iterative relational CC).
NEARDUP_CC_CTES = f"""
{ngram_jaccard_pairs_ctes(_EXACT_NEARDUP_THRESHOLD, same_source=False)},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(id, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
),
comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
"""

_OP96_SQL = f"""
WITH RECURSIVE {NEARDUP_CC_CTES}
SELECT component AS canonical_doc_id,
       CAST(COUNT(*) AS BIGINT) AS cluster_size,
       STRING_AGG(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
FROM comp GROUP BY component HAVING COUNT(*) > 1
"""


@register(
    "op96_dedup_components",
    oracle=_OP96_SQL,
    # both kernels the plan lives in: the candidate-pair generator and
    # the iterative min-label CC (round-14 helper audit)
    deps=(connected_components, ngram_jaccard_pairs),
)
def op96_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters over documents: exact 3-gram-Jaccard ≥ 0.5
    candidate pairs (ngram_jaccard_pairs, cross-source) → connected
    components → per-cluster size and canonical (min) doc_id,
    returning only non-trivial clusters. The keep-one-survivor dedup
    decision is `filter(doc_id == component)` on the same frame.

    Graduated from ROWS to a SQL oracle in round 9 (round-8 verdict
    item 5): the edge relation is the EXACT near-dup graph — the
    deterministic, ANSI-expressible relation MinHash-LSH (op79)
    approximates — so DuckDB's WITH RECURSIVE min-reachable-id
    fixpoint hash-certifies the iterative min-label CC end to end.
    The LSH→CC composition (the approximate 100 TB candidate path)
    keeps its planted-cluster behavioral gates in
    tests/test_components.py.

    Transport note: this op's many-tiny-exchanges fixpoint — the
    shape naively expected to suffer most on a real shuffle service —
    was FASTER on a 2-executor standalone cluster than local[16] in
    every measured config at 10x and 30x data (0.70-0.95x; BASELINE
    Round 11b-11e): its exchanges carry ~zero bytes and its stages
    are few and coarse, so none of the measured cluster cost terms
    apply, while two half-size JVMs GC better than one big one.

    DURABILITY AT EXECUTOR SCALE: the registered plan keeps the FAST
    default (`reliable=False` → localCheckpoint), which is correct in
    one JVM — but localCheckpoint blocks die with their executor and,
    lineage truncated, CANNOT be recomputed: an executor loss mid-loop
    FAILS the job loudly (measured: scripts/cluster_faultkill.py; it
    never ships a wrong fixpoint). Production fixpoints on a real
    multi-executor cluster should call
    ``connected_components(edges, reliable=True)`` after
    ``sc.setCheckpointDir(<HDFS/S3 path>)`` — directory-backed
    checkpoints survive executor loss with byte-identical results
    (fault-injection-verified, BASELINE.md Round 11f), superseded
    generations are GC'd per iteration (functions/iterate.py
    _ReliableCkptGC), at the cost of one state write+read per
    iteration."""
    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=_EXACT_NEARDUP_THRESHOLD,
        same_source=False,
    )
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    # members is surfaced as a sorted comma-joined string, not
    # array<bigint>: the observable surface must stay scalar-typed so
    # row hashing / canonicalization works downstream (same
    # representation-stable pattern as op24's collect_sorted).
    return (
        comp.groupBy("component")
        .agg(
            F.count("*").alias("cluster_size"),
            F.array_join(F.sort_array(F.collect_list("id")), ",").alias("members"),
        )
        .filter(F.col("cluster_size") > 1)
        .select(
            F.col("component").alias("canonical_doc_id"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "members",
        )
    )
