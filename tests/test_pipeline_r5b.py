"""op186-op189 tests: the iterative integer-exact PageRank against a
pure-Python reference on a hand-built graph, layout invariance, and
vocab-coverage sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocdb_server_spark.registry import load_all

OPS = load_all()


def _py_pagerank(edges, iters, scale):
    """Reference implementation of op186's EXACT integer recurrence
    (plain dicts, no Spark, no SQL) — the third engine."""
    nodes = sorted({s for s, _ in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    base = (15 * scale) // (100 * n)
    pr = {v: scale // n for v in nodes}
    for _ in range(iters):
        msgs = {}
        for s, d in edges:
            msgs[d] = msgs.get(d, 0) + pr[s] // outdeg[s]
        pr = {v: base + (85 * msgs.get(v, 0)) // 100 for v in nodes}
    return pr


def test_pagerank_matches_python_reference_on_crafted_graph(spark):
    """Spark's 5-iteration loop must reproduce the pure-Python integer
    recurrence bit-for-bit on a small asymmetric graph (star + chain:
    ranks genuinely differ per node)."""
    from ocdb_server_spark.operators import pipeline_r5b as r5b

    # part 0 links suppliers 0,1,2; part 1 links supplier 0; part 2
    # links supplier 2 → node ids via the op's 2p / 2s+1 encoding
    pairs = [(0, 0), (0, 1), (0, 2), (1, 0), (2, 2)]
    edges = [(2 * p, 2 * s + 1) for p, s in pairs] + [
        (2 * s + 1, 2 * p) for p, s in pairs
    ]
    want = _py_pagerank(edges, r5b._PR_ITERS, r5b._PR_SCALE)

    li = spark.createDataFrame(
        [(p, s) for p, s in pairs], "l_partkey long, l_suppkey long"
    )
    # rebuild the op pipeline on the crafted edge list by monkeypatching
    # load_table's output shape: easiest is to run the same construction
    # inline (the op body is the contract; this mirrors it exactly)
    fwd = li.select(
        (2 * F.col("l_partkey")).alias("src"),
        (2 * F.col("l_suppkey") + 1).alias("dst"),
    )
    rev = li.select(
        (2 * F.col("l_suppkey") + 1).alias("src"),
        (2 * F.col("l_partkey")).alias("dst"),
    )
    e = fwd.unionAll(rev)
    nodes = e.select(F.col("src").alias("node")).distinct()
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("bigint").alias("outdeg")
    )
    params = nodes.agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr(f"(15 * {r5b._PR_SCALE}L) div (100 * count(*))").alias("base_u"),
    )
    ranks = nodes.crossJoin(F.broadcast(params)).select(
        "node", F.expr(f"{r5b._PR_SCALE}L div n").alias("u")
    )
    for _ in range(r5b._PR_ITERS):
        contrib = ranks.join(outdeg, "node").select(
            "node", F.expr("u div outdeg").alias("contrib")
        )
        msgs = (
            contrib.join(e, contrib.node == e.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("contrib").alias("m"))
        )
        ranks = (
            nodes.join(msgs, "node", "left")
            .crossJoin(F.broadcast(params))
            .select(
                "node",
                F.expr("base_u + (85 * coalesce(m, 0L)) div 100").alias("u"),
            )
        )
    got = {r["node"]: r["u"] for r in ranks.collect()}
    assert got == want
    # asymmetric fixture really distinguishes nodes
    assert len(set(want.values())) > 2


def test_pagerank_is_partitioning_invariant(spark, sf_dir):
    """Integer arithmetic commutes: the exact pr_u values must be
    identical whatever the source layout (the property that makes the
    iterative op hash-certifiable at all)."""
    base = OPS["op186_pagerank"].fn(spark, sf_dir)
    want = sorted(
        (r["node_type"], r["key"], r["pr_u"]) for r in base.collect()
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        got = sorted(
            (r["node_type"], r["key"], r["pr_u"])
            for r in OPS["op186_pagerank"].fn(spark, sf_dir).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert got == want


def test_pagerank_mass_is_plausible(spark, sf_dir):
    """Sanity on the real table: top-20 ranks positive, sorted desc,
    both node types present (the bipartite graph links every part to
    some supplier)."""
    rows = OPS["op186_pagerank"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    prs = [r["pr_u"] for r in rows]
    assert prs == sorted(prs, reverse=True)
    assert all(p > 0 for p in prs)


def test_vocab_coverage_shrinks_with_bigger_vocab(spark, sf_dir):
    """OOV must be monotonically non-increasing in vocab size — rebuild
    the op's pipeline at K=4 and K=16 and compare per-lang OOV."""
    from ocdb_server_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")

    def oov_by_lang(k):
        tok = d.select(
            "lang", F.explode(F.split("text", " ")).alias("word")
        ).filter(F.col("word") != "")
        vocab = (
            tok.groupBy("word")
            .agg(F.count("*").alias("c"))
            .orderBy(F.col("c").desc(), "word")
            .limit(k)
            .select("word", F.lit(1).alias("in_vocab"))
        )
        j = tok.join(F.broadcast(vocab), "word", "left").select(
            "lang", F.when(F.col("in_vocab").isNull(), 1).otherwise(0).alias("oov")
        )
        return {
            r["lang"]: r["o"]
            for r in j.groupBy("lang").agg(F.sum("oov").alias("o")).collect()
        }

    small, big = oov_by_lang(4), oov_by_lang(16)
    assert set(small) == set(big)
    for lang in small:
        assert big[lang] <= small[lang]
    # and the registered op agrees with the K=16 rebuild
    got = {
        r["lang"]: r["oov_tokens"]
        for r in OPS["op187_vocab_coverage"].fn(spark, sf_dir).collect()
    }
    assert got == big


def test_skew_diagnosis_is_balanced_on_uniform_keys(spark, sf_dir):
    """Uniform TPC-H custkeys must land near the even share in every
    bucket (the report's baseline case), hottest flag unique-ish and
    consistent with n_rows."""
    rows = OPS["op188_skew_diagnosis"].fn(spark, sf_dir).collect()
    assert rows
    max_rows = max(r["n_rows"] for r in rows)
    for r in rows:
        assert r["is_hottest"] == (r["n_rows"] == max_rows)
        # within 3x of even share on uniform keys (loose: small sf)
        assert r["load_ppm_of_even"] < 3_000_000, r
    assert sum(r["n_rows"] for r in rows) > 0


def test_union_schema_evolution_counts_add_up(spark, sf_dir):
    """Sentinel bucket must hold exactly the pre-1998 rows; the other
    buckets partition the post-1998 slice by priority."""
    from ocdb_server_spark.io import load_table

    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    n_old = o.filter(F.col("o_orderdate") < cut).count()
    n_new = o.filter(F.col("o_orderdate") >= cut).count()
    rows = OPS["op189_union_schema_evolution"].fn(spark, sf_dir).collect()
    got = {r["priority"]: r["n_orders"] for r in rows}
    assert got.pop("<pre-schema>") == n_old
    assert sum(got.values()) == n_new
    assert all(not p.startswith("<") for p in got)


def test_substring_spans_cover_planted_duplicates(spark):
    """sf0.1 plants 8 exact-duplicate texts (FIXTURES.md): each dup doc
    must carry one span covering its ENTIRE token range (overlapping
    windows fused into one maximal span), and spans never exceed doc
    length. Also: a crafted corpus where only a 10-token quote is
    shared must yield exactly that quote's span in both docs."""
    from ocdb_server_spark.operators import pipeline_r5b as r5b

    quote = " ".join(f"q{i}" for i in range(10))
    rows = [
        (1, "aa bb cc dd ee ff gg hh " + quote + " zz yy"),
        (2, quote + " kk ll mm nn oo pp qq rr"),
        (3, "uu vv ww xx " + " ".join(f"u{i}" for i in range(20))),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    # run the op body against the crafted frame via a shim loader
    orig = r5b.load_table
    try:
        r5b.load_table = lambda s, sf, name: d
        got = {
            (r["doc_id"], r["span_start"], r["span_len"])
            for r in r5b.op190_substring_dup_spans(spark, "crafted").collect()
        }
    finally:
        r5b.load_table = orig
    # doc1: quote occupies tokens 9..18 → windows 9..11 (L=8) → span (9, 10)
    # doc2: tokens 1..10 → windows 1..3 → span (1, 10)
    assert got == {(1, 9, 10), (2, 1, 10)}, got


def test_substring_spans_on_planted_sf01_dups(spark):
    """The 8 planted duplicate texts at sf0.1 must each surface a
    whole-document span."""
    from pyspark.sql import functions as F

    from ocdb_server_spark.io import load_table

    sf_dir = "/root/testdata/sf0.1"
    d = load_table(spark, sf_dir, "documents")
    dup_texts = (
        d.groupBy("text")
        .agg(F.count("*").alias("c"), F.collect_list("doc_id").alias("ids"))
        .filter(F.col("c") > 1)
        .collect()
    )
    assert dup_texts, "fixture must contain planted dups at sf0.1"
    spans = {
        r["doc_id"]: (r["span_start"], r["span_len"])
        for r in OPS["op190_substring_dup_spans"].fn(spark, sf_dir).collect()
    }
    for row in dup_texts:
        n_tokens = len(row["text"].split(" "))
        for doc_id in row["ids"]:
            assert doc_id in spans, f"dup doc {doc_id} has no span"
            start, length = spans[doc_id]
            assert start == 1 and length == n_tokens, (
                f"doc {doc_id}: expected whole-doc span (1, {n_tokens}), "
                f"got ({start}, {length})"
            )


def test_bigram_backoff_fires_on_unseen_language(spark):
    """A crafted corpus where the non-en doc shares NO vocabulary with
    the en training slice: every one of its transitions must take the
    backoff path, and its avg_neglogp must exceed the in-model doc's
    (the filter's discriminating direction)."""
    from ocdb_server_spark.operators import pipeline_r5b as r5b

    rows = [
        (1, "en", "a b c a b c a b"),
        (2, "en", "a b a b c c a b"),
        (3, "zh", "x y z x y z x y"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    orig = r5b.load_table
    try:
        r5b.load_table = lambda s, sf, name: d
        got = {
            r["doc_id"]: (r["n_transitions"], r["n_backoff"], r["avg_neglogp"])
            for r in r5b.op191_bigram_logprob(spark, "crafted").collect()
        }
    finally:
        r5b.load_table = orig
    assert got[3][0] == got[3][1] == 7, "all zh transitions must back off"
    assert got[1][1] == 0 and got[2][1] == 0
    assert got[3][2] > got[1][2] and got[3][2] > got[2][2]


def test_containment_catches_planted_dups_and_quote_inclusion(spark):
    """sf0.1's 8 planted exact-dup pairs must score containment 1.0 on
    BOTH sides; a crafted quote-inclusion corpus must score ~1.0 on
    the contained side and <0.5 on the containing side — the asymmetry
    Jaccard misses."""
    from pyspark.sql import functions as F

    from ocdb_server_spark.io import load_table
    from ocdb_server_spark.operators import pipeline_r5b as r5b

    rows = OPS["op192_shingle_containment"].fn(
        spark, "/root/testdata/sf0.1"
    ).collect()
    full = [
        r for r in rows if r["containment_a"] == 1.0 and r["containment_b"] == 1.0
    ]
    d = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_dup_pairs = (
        d.groupBy("text").count().filter(F.col("count") > 1).count()
    )
    assert len(full) == n_dup_pairs, (full, n_dup_pairs)

    quote = " ".join(f"q{i}" for i in range(12))
    crafted = spark.createDataFrame(
        [
            (1, quote),  # the tweet: entirely contained
            (2, " ".join(f"w{i}" for i in range(40)) + " " + quote
                + " " + " ".join(f"v{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    orig = r5b.load_table
    try:
        r5b.load_table = lambda s, sf, name: crafted
        got = r5b.op192_shingle_containment(spark, "crafted").collect()
    finally:
        r5b.load_table = orig
    assert len(got) == 1
    r = got[0]
    assert r["doc_a"] == 1 and r["containment_a"] == 1.0
    assert r["containment_b"] < 0.5


def test_keyset_page_equals_offset_page(spark, sf_dir):
    """The keyset page after cursor row R must equal the OFFSET page
    that starts right after R in the same total order — the semantic
    contract that lets an API migrate from offset to keyset tokens."""
    from ocdb_server_spark.io import load_table
    from ocdb_server_spark.operators import pipeline_r5b as r5b

    o = load_table(spark, sf_dir, "orders")
    ordered = o.select("o_orderkey", "o_orderdate", "o_totalprice").orderBy(
        "o_orderdate", "o_orderkey"
    )
    allrows = ordered.collect()
    cur_d = r5b._KS_CURSOR_DATE
    import datetime

    cd = datetime.datetime.fromisoformat(cur_d)
    idx = sum(
        1
        for r in allrows
        if (r["o_orderdate"], r["o_orderkey"]) <= (cd, r5b._KS_CURSOR_KEY)
    )
    want = [tuple(r) for r in allrows[idx : idx + r5b._KS_PAGE]]
    got = [
        tuple(r)
        for r in OPS["op193_keyset_pagination"].fn(spark, sf_dir).collect()
    ]
    assert got == want


def test_minhash_rollup_law_and_duplicate_sources(spark, sf_dir):
    """min(minhash(A), minhash(B)) = minhash(A∪B): the corpus row the
    op derives FROM source signatures must equal the signature computed
    directly from all shingles; and two sources with identical content
    must emit identical signatures (crafted corpus)."""
    from pyspark.sql import functions as F

    from ocdb_server_spark.io import load_table
    from ocdb_server_spark.operators import pipeline_r5b as r5b

    rows = OPS["op194_minhash_rollup"].fn(spark, sf_dir).collect()
    sig = {
        (r["level"], r["key"]): tuple(r[f"mh{i}"] for i in range(r5b._MH_K))
        for r in rows
    }
    corpus = sig[("corpus", "*")]
    srcs = [v for (lvl, _), v in sig.items() if lvl == "source"]
    assert corpus == tuple(min(s[i] for s in srcs) for i in range(r5b._MH_K))

    # direct computation from all shingles, bypassing the rollup
    d = load_table(spark, sf_dir, "documents")
    w = d.select(F.expr("split(lower(text), ' ')").alias("w"))
    shingles = F.expr(
        "array_distinct(filter("
        "  zip_with(w, slice(w, 2, greatest(size(w) - 1, 0)),"
        "           (x, y) -> concat_ws(' ', x, y)),"
        "  s -> contains(s, ' ')))"
    )
    sh = w.select(F.explode(shingles).alias("shingle"))
    direct = sh.agg(
        *[
            F.expr(f"min(xxhash64({i}, shingle)) AS mh{i}")
            for i in range(r5b._MH_K)
        ]
    ).collect()[0]
    assert corpus == tuple(direct[f"mh{i}"] for i in range(r5b._MH_K))

    crafted = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon", "s1"),
            (2, "alpha beta gamma delta epsilon", "s2"),
            (3, "zeta eta theta iota kappa", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    orig = r5b.load_table
    try:
        r5b.load_table = lambda s, sf, name: crafted
        got = {
            r["key"]: tuple(r[f"mh{i}"] for i in range(r5b._MH_K))
            for r in r5b.op194_minhash_rollup(spark, "crafted").collect()
        }
    finally:
        r5b.load_table = orig
    assert got["s1"] == got["s2"], "identical sources must share a signature"
    assert got["s1"] != got["s3"]


def test_bottomk_sketch_merge_algebra_and_accuracy(spark, sf_dir):
    """(a) the op's merged 'all' sketch must equal the DIRECT global
    bottom-k computed from raw rows (merge = union + cut, exactly);
    (b) the sketch-estimated global median must land within the
    [0.30, 0.70] true-CDF band (64-point sample bound)."""
    from pyspark.sql import Window as W, functions as F

    from ocdb_server_spark.io import load_table
    from ocdb_server_spark.operators import pipeline_r5b as r5b

    rows = OPS["op201_bottomk_quantile_sketch"].fn(spark, sf_dir).collect()
    overall = next(r for r in rows if r["level"] == "all")
    assert overall["k"] == r5b._BK_K

    e = load_table(spark, sf_dir, "events").select(
        "value", F.xxhash64("event_id").alias("tag")
    )
    direct = (
        e.withColumn("rn", F.row_number().over(W.orderBy("tag")))
        .filter(F.col("rn") <= r5b._BK_K)
        .agg(F.expr("round(percentile(value, 0.5), 6)").alias("p50"))
        .collect()[0]["p50"]
    )
    assert overall["est_p50"] == direct, "merge != direct global sketch"

    n = e.count()
    rank = e.filter(F.col("value") <= overall["est_p50"]).count() / n
    assert 0.30 <= rank <= 0.70, f"median estimate rank {rank} out of band"

    # per-type sketches are deterministic: same rows on a re-run
    again = {
        (r["level"], r["key"]): (r["est_p25"], r["est_p50"], r["est_p75"])
        for r in OPS["op201_bottomk_quantile_sketch"].fn(spark, sf_dir).collect()
    }
    first = {
        (r["level"], r["key"]): (r["est_p25"], r["est_p50"], r["est_p75"])
        for r in rows
    }
    assert again == first
