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

from ocdb_server_spark.io import load_table
from ocdb_server_spark.operators.northstar import minhash_neardup_pairs
from ocdb_server_spark.registry import register


def connected_components(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """(src, dst) edge frame → (id, component) with component = min id
    reachable. Vertices only appear if they occur in an edge."""
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # each vertex adopts the min component among itself + neighbors
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("n_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()  # truncate lineage: O(1) plan per iteration
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


@register("op96_dedup_components", oracle=None)  # ROWS: iterative, not ANSI-expressible
def op96_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters over documents: MinHash candidate pairs →
    connected components → per-cluster size and canonical (min) doc_id,
    returning only non-trivial clusters. The keep-one-survivor dedup
    decision is `filter(doc_id == component)` on the same frame."""
    pairs = minhash_neardup_pairs(load_table(spark, sf_dir, "documents"))
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
