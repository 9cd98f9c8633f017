"""Connected-components tests (op96): exact components on crafted
graphs, convergence on chains (worst-case diameter), and the dedup
end-to-end over the documents corpus."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ocdb_server_spark.operators.components import connected_components
from ocdb_server_spark.registry import load_all

OPS = load_all()


def _components(spark, edge_list):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    return {
        r["id"]: r["component"] for r in connected_components(edges).collect()
    }


def test_two_triangles_and_isolated_edge(spark):
    comp = _components(
        spark,
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (20, 21)],
    )
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == comp[12] == 10
    assert comp[20] == comp[21] == 20


def test_chain_worst_case_diameter(spark):
    """A 12-vertex chain needs several propagation rounds — proves the
    loop iterates to convergence, not just once."""
    comp = _components(spark, [(i, i + 1) for i in range(12)])
    assert set(comp.values()) == {0}
    assert len(comp) == 13


def test_bridge_merges_cliques(spark):
    comp = _components(
        spark, [(1, 2), (2, 3), (5, 6), (6, 7), (3, 5)]  # bridge 3-5
    )
    assert len(set(comp.values())) == 1


def test_symmetric_input_irrelevant(spark):
    a = _components(spark, [(1, 2), (2, 3)])
    b = _components(spark, [(2, 1), (3, 2), (1, 2)])  # reversed + dup edges
    assert a == b


def test_minhash_lsh_to_components_composition(spark):
    """The APPROXIMATE candidate path — op79's MinHash-LSH bands —
    feeding connected_components: the 100 TB composition that op96's
    exact-Jaccard certification (r9 graduation) no longer exercises
    directly. Planted duplicate groups must collapse into single
    min-labeled clusters; the singleton must not appear (vertices
    only exist via edges)."""
    from ocdb_server_spark.operators.northstar import minhash_neardup_pairs

    texts = (
        ["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 3
        + ["totally different words about cooking pasta with garlic tonight"]
        * 2
        + ["unique solitary text sharing nothing with anything else here"]
    )
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    pairs = minhash_neardup_pairs(docs)
    labels = {
        r["id"]: r["component"]
        for r in connected_components(
            pairs.selectExpr("doc_a AS src", "doc_b AS dst")
        ).collect()
    }
    assert labels[0] == labels[1] == labels[2] == 0
    assert labels[3] == labels[4] == 3
    assert 5 not in labels


def test_op96_clusters_cover_exact_dups(spark, sf_dir):
    """Every exact-duplicate text group must land in one cluster whose
    canonical id is the group's min doc_id."""
    from ocdb_server_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    groups = (
        docs.groupBy("text")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .collect()
    )
    # members is a comma-joined string (canonicalizer-safe surface)
    clusters = {
        r["canonical_doc_id"]: {int(m) for m in r["members"].split(",")}
        for r in OPS["op96_dedup_components"].fn(spark, sf_dir).collect()
    }
    for g in groups:
        ids = set(g["ids"])
        # the dup group's members must all share one cluster
        containing = [c for c in clusters.values() if ids <= c]
        assert containing, f"dup group {sorted(ids)} not clustered together"
    # canonical id is always the cluster minimum and a member
    for canon, members in clusters.items():
        assert canon == min(members)
