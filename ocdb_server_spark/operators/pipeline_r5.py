"""Round-5 pipeline extensions — SURVEY.md §2.20 (op178–op185).

Eight operators: five closing the §7.5 future-work list plus BM25
retrieval scoring, a binned range join, and a Misra-Gries
heavy-hitters sketch (op183-op185) — each a lakehouse /
training-pipeline shape a 100 TB deployment needs:

- physical-layout tooling: small-file compaction planning (op178),
  secondary-sorted export layout + manifest (op179), per-file
  min/max data-skipping audit (op181);
- ANN: product-quantization ADC search with exact re-rank (op180) —
  op95's next fidelity step;
- join pruning: runtime bloom-filter pre-join filtering (op182) —
  the JVM-side design the round-3/4 notes called for (Spark's own
  InjectRuntimeFilter rule, not a driver-side df.stat.bloomFilter);
- search scoring: BM25 ranked retrieval (op183) — the relevance half
  of the reference's search surface;
- range joins at scale: interval⋈point as an equi-join on arithmetic
  bins (op184), op36's both-sides-large case;
- custom sketches: Misra-Gries heavy hitters via Arrow-batched
  mapInPandas + exact verify pass (op185).

Design rules as everywhere else in the package: DataFrame/Catalyst
plans only, no Python in any hot path, cross-engine floats reduced
through the established round/quantize discipline, and shuffles carry
keys + counters — never document text or vector payloads (the one
deliberate exception is op180's candidate re-rank, which keeps 64
floats per SURVIVING candidate, k·rerank rows total).

The reference (`bcdev/ocdb-server`, public knowledge — SURVEY.md §0)
has no analog for these; they extend the 100 TB-pipeline surface
mandated by BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.registry import register


# --------------------------------------------------------------------------
# op178: small-file compaction plan — greedy cumulative bin packing
# --------------------------------------------------------------------------

_COMPACT_TARGET = 65_536  # target output-file bytes (test-scale sized)

_OP178_SQL = f"""
WITH f AS (
  SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS bytes
  FROM documents GROUP BY lang, source
),
c AS (
  SELECT lang, source, bytes,
         SUM(bytes) OVER (ORDER BY bytes DESC, lang, source
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM f
),
b AS (SELECT (cum - bytes) // {_COMPACT_TARGET} AS bin, bytes FROM c)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(bytes) AS BIGINT) AS min_file_bytes,
       CAST(MAX(bytes) AS BIGINT) AS max_file_bytes
FROM b GROUP BY bin
"""


@register("op178_compaction_plan", oracle=_OP178_SQL)
def op178_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: pack input files into target-size
    output bins (the OPTIMIZE/bin-packing step every parquet lake runs
    nightly — small files are the #1 cheap win at 100 TB, where a
    10⁶-file table turns every scan into task-launch soup).

    "Files" here are the per-(lang, source) byte totals of documents
    (the natural ingest-partition granularity for this corpus); the
    plan is the classic greedy next-fit: order files big-first
    (deterministic tiebreak), running-sum their sizes, and cut a new
    bin every time the cumulative offset crosses a target multiple —
    bin = (cum − size) div target, pure integer arithmetic in both
    engines (Spark's `div`, DuckDB's `//` — exact at ANY cumulative
    magnitude; the earlier double-divide-then-cast agreed with the
    oracle only below 2^53 ≈ 9 PB of cumulative bytes, a boundary a
    100 TB-design op has no business flirting with — round-5 ADVICE).
    Output: one manifest row per planned output file.

    Scale: everything after the first aggregate runs over FILE
    METADATA (~10⁶ rows at 100 TB — kilobytes of state), so the
    global-order window is a deliberate, bounded exception to the
    no-global-sort rule (same argument as op156's source-level
    Pareto); a production planner additionally partitions the window
    by table/date prefix, which this plan picks up for free by adding
    the prefix to partitionBy."""
    d = load_table(spark, sf_dir, "documents")
    files = d.groupBy("lang", "source").agg(
        F.sum("n_chars").cast("bigint").alias("bytes")
    )
    w = W.orderBy(F.col("bytes").desc(), "lang", "source").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    binned = files.select(
        "bytes",
        (F.sum("bytes").over(w) - F.col("bytes")).alias("offset"),
    ).select(
        "bytes",
        F.expr(f"offset div {_COMPACT_TARGET}").alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("bytes").cast("bigint").alias("total_bytes"),
        F.min("bytes").cast("bigint").alias("min_file_bytes"),
        F.max("bytes").cast("bigint").alias("max_file_bytes"),
    )


# --------------------------------------------------------------------------
# op179: secondary-sorted export layout + manifest
# --------------------------------------------------------------------------

_N_SHARDS = 8

_OP179_SQL = f"""
WITH s AS (
  SELECT doc_id, lang, n_chars, doc_id % {_N_SHARDS} AS shard
  FROM documents
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM s GROUP BY shard
"""


def sorted_export_frame(d: DataFrame) -> DataFrame:
    """documents sharded (doc_id mod N — engine-portable, no Murmur
    dependency) and SECONDARY-SORTED within each shard by (lang,
    doc_id): `repartition(N, shard)` + `sortWithinPartitions` is
    Spark's secondary-sort idiom; written with
    `.write.partitionBy("shard")`, every shard directory gets exactly
    ONE file (all of a shard's rows hash to one task) whose rows are
    (lang, doc_id)-sorted, so downstream per-lang scans skip row
    groups via parquet min/max stats (the layout op181 audits). No
    global sort anywhere: N independent per-partition sorts.
    tests/test_pipeline_r5.py writes the export and proves the files
    really are sorted and shard-pure."""
    return (
        d.select(
            "doc_id",
            "lang",
            "n_chars",
            (F.col("doc_id") % _N_SHARDS).alias("shard"),
        )
        .repartition(_N_SHARDS, F.col("shard"))
        .sortWithinPartitions("shard", "lang", "doc_id")
    )


@register("op179_sorted_export_manifest", oracle=_OP179_SQL)
def op179_sorted_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard manifest of the secondary-sorted training export (see
    sorted_export_frame): shard, doc count, byte volume, id range —
    what an export job hands the training loader so it can plan
    readers without listing files. The manifest aggregate consumes
    the sorted frame, so the registered plan carries the real
    repartition+sort; the file-level sortedness proof lives in
    tests/test_pipeline_r5.py (plan assertions can't see files)."""
    return sorted_export_frame(load_table(spark, sf_dir, "documents")).groupBy(
        "shard"
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )


# --------------------------------------------------------------------------
# op180: product-quantization ANN — ADC scoring + exact re-rank
# --------------------------------------------------------------------------

_PQ_M = 8          # subspaces (64-dim / 8 = 8 dims each)
_PQ_SUB = 8        # dims per subspace
_PQ_K = 16         # centroids per subspace (4-bit codes)
_PQ_RERANK = 100   # ADC candidates that get exact re-ranking


def _sub(col: str, m: int) -> str:
    """SQL slice of subspace m (1-based slice positions)."""
    return f"slice({col}, {m * _PQ_SUB + 1}, {_PQ_SUB})"


def _d2(a: str, b: str) -> str:
    """Squared L2 distance between two float arrays (JVM HOF fold)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) ->"
        " (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))),"
        " cast(0 as double), (acc, x) -> acc + x)"
    )


def pq_topk(
    e: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization approximate top-k cosine neighbors — op95
    IVF's next fidelity step (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011 — public method).

    Index: each vector splits into M=8 subspaces of 8 dims; per
    subspace, 16 centroids come from 16 deterministically-sampled
    vectors (xxhash64 order — a production index k-means-refines them;
    the query path is identical). A vector's code is its nearest
    centroid id per subspace → 8×4-bit codes replace 64 floats, a
    32× compression. The codebook is ONE broadcast row (16×64 floats).

    Query (asymmetric distance computation): the approximate score of
    a vector is dot(query, reconstruction-from-codes) — computed by
    flattening the 8 chosen centroid subvectors and folding one dot
    product, all JVM higher-order functions at the scan, zero
    shuffles. The top-100 ADC candidates (TakeOrderedAndProject) get
    exact-similarity re-ranking; only those 100 rows ever carry the
    full vector past the scan. Encode + ADC + rerank is one linear
    pass — the 100 TB shape (at that scale codes are PRECOMPUTED at
    ingest; here encoding is inlined so the op is self-contained).

    ROWS-oracle (approximate by design); recall@10 vs brute force is
    gated on a planted-cluster fixture in tests/test_pipeline_r5.py.

    codebook=None trains inline (self-contained one-shot mode);
    passing functions.ann_index.get_or_build_pq's persisted artifact
    makes this pure query — no training aggregation in the plan
    (round-11 verdict item 4), identical top-k either way (pinned in
    tests/test_ann_index.py)."""
    nrm = (
        "sqrt(aggregate(transform(embedding,"
        " x -> cast(x as double) * cast(x as double)),"
        " cast(0 as double), (acc, x) -> acc + x))"
    )
    with_norm = e.withColumn("en", F.expr(nrm))
    if codebook is None:
        from ocdb_server_spark.functions.ann_index import pq_seed_codebook

        codebook = pq_seed_codebook(e, _PQ_K)
    # per-subspace nearest-centroid codes: argmin via max of
    # (-d2, cid) structs — deterministic (ties break to max cid)
    codes = F.array(
        *[
            F.expr(
                f"array_max(transform(cents, c -> struct("
                f"-{_d2(_sub('embedding', m), _sub('c.cvec', m))} AS negd,"
                " c.cid AS cid))).cid"
            )
            for m in range(_PQ_M)
        ]
    ).alias("codes")
    encoded = with_norm.crossJoin(F.broadcast(codebook)).select(
        "vec_id", "embedding", "en", "cents", codes
    )
    qrow = encoded.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe"), F.col("en").alias("qnorm")
    )
    # ADC: reconstruct from codes (flatten the 8 chosen centroid
    # subvectors) and fold one dot product against the query
    recon = (
        "flatten(transform(sequence(0, " + str(_PQ_M - 1) + "), m ->"
        " slice(element_at(filter(cents, c -> c.cid = element_at(codes, m + 1)),"
        f" 1).cvec, m * {_PQ_SUB} + 1, {_PQ_SUB})))"
    )
    approx = F.expr(
        f"aggregate(zip_with(qe, {recon},"
        " (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0 as double), (acc, x) -> acc + x)"
    )
    cands = (
        encoded.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qrow))
        .select("vec_id", "embedding", "en", "qe", "qnorm", approx.alias("adc"))
        .orderBy(F.col("adc").desc(), "vec_id")
        .limit(_PQ_RERANK)
    )
    exact = F.round(
        F.expr(
            "aggregate(zip_with(embedding, qe,"
            " (x, y) -> cast(x as double) * cast(y as double)),"
            " cast(0 as double), (acc, x) -> acc + x)"
        )
        / (F.col("en") * F.col("qnorm")),
        6,
    )
    return (
        cands.select("vec_id", exact.alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(k)
    )


@register(
    "op180_pq_ann_knn",
    oracle=None,  # ROWS: PQ codes are approximate
    deps=(pq_topk,),  # the plan lives in the kernel (round-12 deps rule)
)
def op180_pq_ann_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate top-10 cosine neighbors of vec_id=0 over the
    embeddings table — see pq_topk for the index design (8×4-bit
    codes, broadcast codebook, ADC scan, exact re-rank of 100).

    Round 12 (verdict item 4): queries a PERSISTED codebook —
    get_or_build_pq trains once per (dataset, k) into a keyed parquet
    artifact; the query plan carries no training aggregation (see
    functions/ann_index.py). Identical top-k to the inline build
    (pinned in tests/test_ann_index.py), so the golden ROWS snapshot
    is unchanged."""
    from ocdb_server_spark.functions.ann_index import get_or_build_pq

    e = load_table(spark, sf_dir, "embeddings")
    return pq_topk(e, codebook=get_or_build_pq(spark, e, sf_dir, _PQ_K))


# --------------------------------------------------------------------------
# op181: per-file min/max data-skipping audit
# --------------------------------------------------------------------------

_DATE_CUT = "2000-01-01 00:00:00"   # predicate: o_orderdate >= cut
_PRICE_CUT = 400_000.0              # predicate: o_totalprice >= cut

_OP181_SQL = f"""
WITH m AS (
  SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS month,
         o_orderdate, o_totalprice
  FROM orders
)
SELECT month,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MAX(o_orderdate) < TIMESTAMP '{_DATE_CUT}' AS BOOLEAN)
         AS date_skippable,
       CAST(MAX(o_totalprice) < {_PRICE_CUT} AS BOOLEAN) AS price_skippable,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM m GROUP BY month
"""


@register("op181_file_skipping_audit", oracle=_OP181_SQL)
def op181_file_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-FILE min/max statistics audit — would a given predicate let
    the scan skip each file entirely? The layout-quality question
    behind every data-skipping format (parquet row-group stats,
    Delta/Iceberg file stats): a column the layout CLUSTERS
    (o_orderdate, because files are month-partitioned) yields mostly
    skippable files for a date predicate, while an UNCLUSTERED column
    (o_totalprice — every month spans the full price range) yields
    none — measuring exactly the contrast op161 scores for Z-order.

    Mechanics: orders are exported month-partitioned (one file per
    month: repartition by the partition column before the write),
    re-read, and audited per physical file via input_file_name() —
    real file paths, real footer-backed stats recomputed from rows.
    The month key is recovered from the hive-style path so the DuckDB
    oracle (which sees no files) can compute identical per-month
    truth straight from the table.

    Scale: the audit is one map-side-partial agg keyed by file name —
    #files rows of state; the export write is the only data-sized
    step and any lake already pays it. Per-process scratch (r9:
    migrated off the shared sf-tagged dir — the overwrite-vs-lazy-read
    cross-session race)."""
    import os

    from ocdb_server_spark.scratch import scratch_dir

    out = os.path.join(scratch_dir("skip_audit", sf_dir), "t")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    )
    (
        o.repartition(F.col("month"))
        .write.mode("overwrite")
        .partitionBy("month")
        .parquet(out)
    )
    back = spark.read.parquet(out).withColumn("fname", F.input_file_name())
    per_file = back.groupBy("fname").agg(
        F.first("month").alias("month"),  # 1 file : 1 month by construction
        F.count("*").cast("bigint").alias("n_rows"),
        (F.max("o_orderdate") < F.lit(_DATE_CUT).cast("timestamp")).alias(
            "date_skippable"
        ),
        (F.max("o_totalprice") < F.lit(_PRICE_CUT)).alias("price_skippable"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )
    return per_file.drop("fname")


# --------------------------------------------------------------------------
# op182: runtime bloom-filter join pruning
# --------------------------------------------------------------------------

_OP182_SQL = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus
"""


@register("op182_bloom_join_prune", oracle=_OP182_SQL)
def op182_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim join where a runtime BLOOM FILTER built from the
    selective dim side pre-filters the fact scan — Spark's
    InjectRuntimeFilter rule (JVM-side: bloom_filter_agg on the
    creation side, might_contain on the application side), the design
    the round-3/4 notes asked for instead of the driver-side
    df.stat.bloomFilter. At 100 TB this is the shuffle-join
    counterpart of op172's DPP: the fact side drops ~4/5 of its rows
    BEFORE the exchange, paying one xxhash64+bitset probe per row.

    Two runtime confs are pinned while THIS plan optimizes, then
    restored: the app-side scan-size threshold drops to 0 (upstream
    requires ≥10 GB on the probe side — trivially true at production
    scale, never at test scale) and auto-broadcast is disabled (the
    rule correctly skips broadcastable builds, and at test scale
    everything is broadcastable — at 100 TB a season's orders are
    not). The optimized+physical plans are forced eagerly inside the
    conf scope (QueryExecution caches them), so the returned frame
    keeps its bloom filter wherever it executes;
    tests/test_pipeline_r5.py asserts might_contain + bloom_filter_agg
    in the plan and that the confs are restored."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderstatus")
    )
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_items"),
                F.expr(
                    "cast(sum(cast(l_quantity as decimal(18,2))) as double)"
                ).alias("sum_qty"),
            )
        )
        # force optimization + physical planning NOW, inside the conf
        # scope — QueryExecution caches both, so later actions reuse them
        out._jdf.queryExecution().executedPlan()
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    return out


# --------------------------------------------------------------------------
# op183: BM25 ranked retrieval — the search-service scoring path
# --------------------------------------------------------------------------

_BM25_TERMS = ("hash", "join", "scan")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

# Robertson/Spärck Jones BM25 (public-domain IR folklore; the "+1" idf
# form that never goes negative). Per-term scores are quantized
# floor(x·1e6 + 0.5)→int64 BEFORE the per-doc sum (op162/op165's
# IEEE-deterministic discipline) so the cross-engine float reduction
# is order-free; the observable is the final double score.
# The scorer CTE chain (through `scored`), SHARED between op183's
# oracle and op263's (pipeline_r12) — the SQL twin of the
# bm25_scored_docs kernel below, deduplicated for the same drift-risk
# reason (round-12 review).
BM25_SCORE_CTES = f"""d AS (
  SELECT doc_id,
         length(text) - length(replace(text, ' ', '')) + 1 AS len,
         text
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         AVG(CAST(len AS DOUBLE)) AS avg_len
  FROM d
),
w AS (
  SELECT doc_id, len, unnest(string_split(text, ' ')) AS term FROM d
),
tf AS (
  SELECT doc_id, term, MAX(len) AS len, CAST(COUNT(*) AS BIGINT) AS tf
  FROM w WHERE term IN ({_BM25_TERMS_SQL})
  GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         CAST(FLOOR(
           LN(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({_BM25_K1} + 1))
           / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
              + {_BM25_B} * tf.len / stats.avg_len))
           * 1000000.0 + 0.5) AS BIGINT) AS term_score_u
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats
)"""

_OP183_SQL = f"""
WITH {BM25_SCORE_CTES},
s AS (
  SELECT doc_id, CAST(SUM(term_score_u) AS DOUBLE) / 1000000.0 AS score
  FROM scored GROUP BY doc_id
)
SELECT doc_id, score FROM s
ORDER BY score DESC, doc_id
LIMIT {_BM25_TOPK}
"""


def bm25_scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score): the BM25 scorer for the fixed _BM25_TERMS
    query over every document containing ≥1 query term — op183's
    kernel, SHARED with op263's lexical leg (round-12 review: the
    floor(x·1e6+0.5) quantization discipline must live in one place).
    Both callers declare this via register(deps=...) so a rewrite
    here re-fronts both for re-certification. Plan shape: see
    op183's docstring — the explode is pruned to the query-term
    subset BEFORE the tf shuffle, df/stats broadcast back."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("length(text) - length(replace(text, ' ', '')) + 1").alias("len"),
        "text",
    )
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.col("len").cast("double")).alias("avg_len"),
    )
    w = d.select(
        "doc_id", "len", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term").isin(*_BM25_TERMS))
    tf = w.groupBy("doc_id", "term").agg(
        F.max("len").alias("len"), F.count("*").cast("bigint").alias("tf")
    )
    df_t = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    term_score_u = F.expr(
        f"cast(floor(ln(1 + (n_docs - df + 0.5D) / (df + 0.5D))"
        f" * (tf * ({_BM25_K1}D + 1))"
        f" / (tf + {_BM25_K1}D * (1 - {_BM25_B}D"
        f" + {_BM25_B}D * len / avg_len))"
        " * 1000000.0D + 0.5D) as bigint)"
    )
    return (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score_u.alias("u"))
        .groupBy("doc_id")
        .agg((F.sum("u").cast("double") / 1_000_000.0).alias("score"))
    )


@register("op183_bm25_topk", oracle=_OP183_SQL, deps=(bm25_scored_docs,))
def op183_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a fixed multi-term query over documents — the
    ranked-retrieval scoring the reference's search surface implies
    (`bcdev/ocdb-server` is a dataset *search* service, public
    knowledge — SURVEY.md §0; its Lucene-ish query language parses
    through plans/expr_compiler.py, and this op is the scoring half a
    relevance-ranked search needs; op13's phrase filter is the boolean
    half).

    Plan shape: one explode confined to the |query|-term subset
    (`term IN (…)` prunes BEFORE the tf aggregate, so the shuffle
    carries at most |query| rows per doc, never the corpus vocab),
    document-frequency and corpus stats reduce to |query|-row /
    1-row broadcasts, and top-k plans as TakeOrderedAndProject.
    Per-term scores quantize floor(x·1e6+0.5)→int64 pre-sum
    (op165's discipline) so the 3-term addition is order-free and
    cross-engine exact. Scoring kernel extracted to bm25_scored_docs
    in round 12 (shared with op263's lexical leg; declared as a dep
    so kernel rewrites re-front both ops)."""
    return (
        bm25_scored_docs(spark, sf_dir)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )


# --------------------------------------------------------------------------
# op184: binned range join — overlapping intervals without a theta join
# --------------------------------------------------------------------------

_BIN_SEC = 21_600          # 6h bins
_WIN_SEC = 43_200          # 12h windows, sliding every 6h (2 bins each)

_OP184_SQL = """
WITH w AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-31 00:00:00',
                                INTERVAL 6 HOUR)) AS ws
),
j AS (
  SELECT w.ws, e.value
  FROM w JOIN (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events) e
    ON e.ts >= w.ws AND e.ts < w.ws + INTERVAL 12 HOUR
)
SELECT ws AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM j GROUP BY ws
"""


@register("op184_range_join_binned", oracle=_OP184_SQL)
def op184_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join of events against OVERLAPPING 12h windows (sliding
    every 6h), executed as an EQUI-join on arithmetic bins — the
    bucketized range-join pattern op36's docstring promises for the
    case where neither side broadcasts. Each window spans exactly two
    6h bins; exploding the window side into its bin keys turns the
    interval predicate into `event.bin = window.bin` plus a residual
    range check, so Catalyst plans a hash/merge join on the bin — no
    BroadcastNestedLoopJoin, no per-row interval comparison against
    every window. (For these aligned windows the residual prunes
    nothing — bins nest exactly; for arbitrary intervals the same
    plan works and the residual does the trimming. The bin width is
    the classic tuning knob: ≈ the median interval length.)

    Scale: the shuffle key is the bin; window-side rows are
    2 × #windows (metadata-sized). The oracle states the same join
    as the naive range predicate — same rows, quadratic plan — which
    doubles as the semantic proof that binning loses nothing."""
    from ocdb_server_spark.operators.streaming_batch import _events
    from ocdb_server_spark.operators._helpers import dsum

    ev = _events(spark, sf_dir).select(
        "ts",
        "value",
        (F.unix_timestamp("ts").cast("bigint") / _BIN_SEC)
        .cast("bigint")
        .alias("bin"),
    )
    windows = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp"),
                    F.lit("2024-01-31 00:00:00").cast("timestamp"),
                    F.expr("INTERVAL 6 HOURS"),
                )
            ).alias("ws")
        )
        .select(
            "ws",
            F.explode(
                F.array(
                    (F.unix_timestamp("ws").cast("bigint") / _BIN_SEC).cast(
                        "bigint"
                    ),
                    (F.unix_timestamp("ws").cast("bigint") / _BIN_SEC).cast(
                        "bigint"
                    )
                    + 1,
                )
            ).alias("bin"),
        )
    )
    j = ev.join(windows, "bin").filter(
        (F.col("ts") >= F.col("ws"))
        & (F.col("ts") < F.col("ws") + F.expr(f"INTERVAL {_WIN_SEC} SECONDS"))
    )
    return j.groupBy(F.col("ws").alias("window_start")).agg(
        F.count("*").alias("n"), dsum("value", 18, 6).alias("sum_value")
    )


# --------------------------------------------------------------------------
# op185: Misra-Gries heavy hitters — bounded-memory sketch + exact verify
# --------------------------------------------------------------------------

_MG_K = 32           # counters per partition sketch (memory bound)
_MG_PHI_DEN = 30     # report words with count > total/30 (phi ≈ 3.3%)

_OP185_SQL = f"""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
f AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n
  FROM w WHERE word <> '' GROUP BY word
),
t AS (SELECT SUM(n) AS total FROM f)
SELECT word, n
FROM f, t
WHERE n > total / {_MG_PHI_DEN}.0
"""


def _mg_sketch_batches(it):
    """Misra-Gries over a stream of Arrow batches of words: at most
    _MG_K counters live at any moment (decrement-all when full — the
    classic 1982 algorithm). Runs once per PARTITION (the generator
    sees all of a partition's batches), emits the surviving counters.
    Guarantee: any word with true partition count > n_part/( _MG_K+1 )
    survives, so the union over partitions is a SUPERSET of every
    global phi-heavy word for phi ≥ 1/(_MG_K+1)."""
    import pandas as pd

    counters: dict[str, int] = {}
    for batch in it:
        for word in batch["word"]:
            if word in counters:
                counters[word] += 1
            elif len(counters) < _MG_K:
                counters[word] = 1
            else:
                dead = []
                for k in counters:
                    counters[k] -= 1
                    if counters[k] == 0:
                        dead.append(k)
                for k in dead:
                    del counters[k]
    yield pd.DataFrame(
        {"word": list(counters), "lb": [counters[k] for k in counters]}
    )


@register("op185_heavy_hitters_mg", oracle=_OP185_SQL)
def op185_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi-heavy-hitters (words with > total/30 of all token
    occurrences) computed the bounded-memory way: a Misra-Gries sketch
    pass (≤32 counters per partition, Arrow-batched mapInPandas over
    JVM-exploded words — the custom-sketch surface: Spark has no MG
    aggregate) yields a small CANDIDATE set guaranteed to contain
    every phi-heavy word; an exact second pass counts ONLY candidates
    (broadcast semi-join, so the verify shuffle carries candidate
    words, never the corpus vocab) and applies the threshold. Sketch
    candidates depend on partition layout; the final exact filter
    makes the OUTPUT layout-independent — which is why this op can
    carry a full SQL oracle while op20/op166 stay ROWS.

    At 100 TB the two-pass shape is the standard heavy-hitters recipe
    (sketch → verify); the sketch pass is the only Python here, one
    dict of ≤32 ints per partition.
    tests/test_pipeline_r5.py stresses the superset guarantee on a
    500-word Zipf corpus where vocab ≫ counters."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    cands = (
        words.mapInPandas(_mg_sketch_batches, "word string, lb long")
        .groupBy("word")
        .agg(F.sum("lb").alias("lb"))
        .select("word")
    )
    total = words.agg(F.count("*").cast("bigint").alias("total"))
    exact = (
        words.join(F.broadcast(cands), "word", "left_semi")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return exact.crossJoin(F.broadcast(total)).filter(
        F.col("n") > F.col("total") / _MG_PHI_DEN
    ).select("word", "n")
