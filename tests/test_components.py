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


def test_jaccard_pairs_random_differential_vs_sql_template(spark):
    """Randomized differential for the r9 single-fold pair relation:
    random small corpora (planted dup groups, shared phrases, unicode,
    short/empty docs) through the Spark helper AND the SQL template,
    both parameterizations (op89's same-source J>=0.1 and op96/op221's
    cross-source J>=0.5) — the pair SETS and 6dp jaccards must match
    exactly. Guards the template/helper pair against exactly the
    silent drift the review flagged (one side's tokenizer or df-cap
    changing without the other)."""
    import random

    import duckdb

    from ocdb_server_spark.operators.pipeline_ext import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_ctes,
    )

    rng = random.Random(20260815)
    vocab = ["alpha", "beta", "gamma", "delta", "nu", "ümlaut", "東京",
             "x1", "y2", "z3", "longishword", "q"]
    rows = []
    doc_id = 0
    for _ in range(6):  # dup groups with light edits
        base = " ".join(rng.choices(vocab, k=rng.randint(4, 12)))
        for _ in range(rng.randint(2, 3)):
            tail = " ".join(rng.choices(vocab, k=rng.randint(0, 2)))
            rows.append((doc_id, (base + " " + tail).strip(),
                         rng.choice(["a", "b"])))
            doc_id += 1
    for _ in range(20):  # unrelated singletons incl. degenerate docs
        rows.append((doc_id,
                     " ".join(rng.choices(vocab, k=rng.randint(0, 8))),
                     rng.choice(["a", "b"])))
        doc_id += 1

    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)

    for threshold, same_source in ((0.1, True), (0.5, False)):
        got = {
            (r.doc_a, r.doc_b): round(r.jaccard, 6)
            for r in ngram_jaccard_pairs(
                docs, threshold=threshold, same_source=same_source
            ).collect()
        }
        want = {
            (a, b): round(j, 6)
            for a, b, j in con.execute(
                f"WITH {ngram_jaccard_pairs_ctes(threshold, same_source)} "
                "SELECT doc_a, doc_b, jaccard FROM pairs"
            ).fetchall()
        }
        assert got == want, (threshold, same_source)
        assert want, "degenerate corpus: no pairs found at all"


def test_connected_components_random_differential_vs_recursive_sql(spark):
    """Randomized differential for the r9 CC certification: 30 random
    graphs (mixed cliques, chains, isolated edges, duplicate +
    reversed edges) through the iterative min-label loop AND DuckDB's
    WITH RECURSIVE min-reachable-id fixpoint — labels must be
    identical. This is the engine-vs-independent-recursion check
    op213 established, applied to the dedup family's cluster step."""
    import random

    import duckdb

    rng = random.Random(99)
    for trial in range(30):
        edges = set()
        n = rng.randint(2, 18)
        for _ in range(rng.randint(1, 25)):
            a, b = rng.randint(0, n), rng.randint(0, n)
            if a != b:
                edges.add((a, b))
        if not edges:
            continue
        elist = list(edges) + [
            (b, a) for a, b in list(edges)[: rng.randint(0, len(edges))]
        ]  # some reversed duplicates
        df = spark.createDataFrame(elist, "src long, dst long")
        got = {
            r.id: r.component for r in connected_components(df).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO e VALUES (?, ?)", elist)
        want = dict(
            con.execute(
                """
WITH RECURSIVE sym AS (
  SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e
),
reach(id, r) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.a, reach.r FROM sym s JOIN reach ON reach.id = s.b
)
SELECT id, MIN(r) FROM reach GROUP BY id
"""
            ).fetchall()
        )
        assert got == want, f"trial {trial}: {sorted(elist)}"
