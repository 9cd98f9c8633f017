"""Round-5 pipeline extensions, batch 2 — SURVEY.md §2.20 (op186–op189).

- op186: ITERATIVE graph analytics (PageRank over the part⋈supplier
  co-occurrence graph) with a full SQL oracle — the recurrence is
  kept in exact int64 fixed-point so five engine-side iterations are
  bit-identical to five unrolled CTE steps in DuckDB, making an
  iterative algorithm hash-certifiable (op96's connected components
  stayed ROWS; this shows the quantization discipline extends to
  fixpoint loops).
- op187: tokenizer vocab coverage / OOV-rate report — the
  "how big must the vocab be" measurement a tokenizer build runs
  before committing to a merge table.
- op188: partition-skew diagnosis — per-bucket load report for a
  prospective shuffle key (engine-portable hash, so fully oracled).
- op189: schema-evolution union — unionByName across an added-column
  boundary, the long-lived-lake read path.

Same package rules: DataFrame/Catalyst only, no Python in hot paths,
shuffles carry ids + counters, cross-engine floats quantized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.registry import pool_persist, register


# --------------------------------------------------------------------------
# op186: PageRank — iterative fixpoint, integer-exact, hash-certified
# --------------------------------------------------------------------------

_PR_ITERS = 5
_PR_SCALE = 1_000_000_000_000  # PR mass in 1e-12 units (int64)
# damping 0.85 expressed as exact integer arithmetic: d·x = (85·x) div 100


def _pr_sql() -> str:
    """Unrolled-recurrence DuckDB oracle: standard SQL forbids
    aggregates in a recursive CTE term, so the five iterations are
    generated as five chained CTEs — the textual unrolling of the
    exact integer recurrence the Spark loop runs."""
    step = """
pr{k} AS (
  SELECT n.node,
         p.base_u + (85 * COALESCE(s.m, 0)) // 100 AS u
  FROM nodes n
  CROSS JOIN params p
  LEFT JOIN (
    SELECT e.dst AS node, SUM(c.contrib) AS m
    FROM (SELECT p0.node, p0.u // d.outdeg AS contrib
          FROM pr{prev} p0 JOIN outdeg d ON p0.node = d.node) c
    JOIN edges e ON c.node = e.src
    GROUP BY e.dst) s ON n.node = s.node
)"""
    steps = ",".join(step.format(k=k, prev=k - 1) for k in range(1, _PR_ITERS + 1))
    return f"""
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
edges AS (
  SELECT 2 * l_partkey AS src, 2 * l_suppkey + 1 AS dst FROM pairs
  UNION ALL
  SELECT 2 * l_suppkey + 1 AS src, 2 * l_partkey AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
outdeg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
           FROM edges GROUP BY src),
params AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         (15 * {_PR_SCALE}) // (100 * CAST(COUNT(*) AS BIGINT)) AS base_u
  FROM nodes
),
pr0 AS (
  SELECT n.node, {_PR_SCALE} // p.n AS u FROM nodes n CROSS JOIN params p
),{steps}
SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
       CAST(node // 2 AS BIGINT) AS key,
       CAST(u AS BIGINT) AS pr_u,
       CAST(u AS DOUBLE) / {_PR_SCALE} AS pr
FROM pr{_PR_ITERS}
ORDER BY pr_u DESC, node
LIMIT 20
"""


@register("op186_pagerank", oracle=_pr_sql())
def op186_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five PageRank iterations (damping 0.85) over the symmetrized
    part↔supplier co-occurrence graph from lineitem, top-20 nodes —
    iterative graph analytics as DataFrame programs (supply-chain /
    link-analysis centrality; op96's components op is the other
    fixpoint shape, ROWS-checked; this one is HASH-certified).

    Exactness: rank mass lives in int64 units of 1e-12 (pr_u); each
    step is new = (15·SCALE) div (100·N) + (85·Σ contrib) div 100
    with contrib = pr div outdeg — every operation integer, so the
    5-step fixpoint is bit-identical to the oracle's five unrolled
    CTEs regardless of join order, partitioning, or summation order
    (int64 addition commutes; the op162 discipline extended to
    iteration). The deliberately-dropped remainder mass (div
    truncation) is part of the recurrence in BOTH engines.

    Scale: per iteration one shuffle join (ranks⋈edges on src) + one
    aggregate on dst — the textbook message-passing shape; edges are
    (int64, int64) pairs, never payloads. The loop-invariant graph
    structure (edges / nodes / outdeg) is persist()ed once — the
    unrolled static plan would otherwise recompute the edge-distinct
    shuffle in every iteration (the 23-shuffle shape the plan audit
    caught pre-persist). At real scale each iteration additionally
    localCheckpoints the RANKS frame (op96's pattern) to cut lineage;
    at 5 iterations the plan tree stays small enough to skip that."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    fwd = pairs.select(
        (2 * F.col("l_partkey")).alias("src"),
        (2 * F.col("l_suppkey") + 1).alias("dst"),
    )
    rev = pairs.select(
        (2 * F.col("l_suppkey") + 1).alias("src"),
        (2 * F.col("l_partkey")).alias("dst"),
    )
    # loop invariants, referenced 5-6x by the unrolled iterations
    edges = pool_persist(fwd.unionAll(rev))
    nodes = pool_persist(edges.select(F.col("src").alias("node")).distinct())
    outdeg = pool_persist(edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("bigint").alias("outdeg")
    ))
    params = nodes.agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr(f"(15 * {_PR_SCALE}L) div (100 * count(*))").alias("base_u"),
    )
    ranks = nodes.crossJoin(F.broadcast(params)).select(
        "node", F.expr(f"{_PR_SCALE}L div n").alias("u")
    )
    for _ in range(_PR_ITERS):
        contrib = ranks.join(outdeg, "node").select(
            "node", F.expr("u div outdeg").alias("contrib")
        )
        msgs = (
            contrib.join(edges, contrib.node == edges.src)
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
    return (
        ranks.select(
            F.expr(
                "CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END"
            ).alias("node_type"),
            F.expr("node div 2").alias("key"),
            F.col("u").alias("pr_u"),
            (F.col("u").cast("double") / _PR_SCALE).alias("pr"),
        )
        .orderBy(F.col("pr_u").desc(), F.col("key"), "node_type")
        .limit(20)
    )


# --------------------------------------------------------------------------
# op187: tokenizer vocab coverage — OOV rate vs a top-K vocabulary
# --------------------------------------------------------------------------

_VOCAB_K = 16

_OP187_SQL = f"""
WITH w AS (
  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
),
tok AS (SELECT lang, word FROM w WHERE word <> ''),
freq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY word),
vocab AS (
  SELECT word FROM freq ORDER BY c DESC, word LIMIT {_VOCAB_K}
),
j AS (
  SELECT t.lang,
         CASE WHEN v.word IS NULL THEN 1 ELSE 0 END AS oov
  FROM tok t LEFT JOIN vocab v ON t.word = v.word
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS total_tokens,
       CAST(SUM(oov) AS BIGINT) AS oov_tokens,
       CAST(FLOOR(CAST(SUM(oov) AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5)
            AS BIGINT) AS oov_rate_ppm
FROM j GROUP BY lang
"""


@register("op187_vocab_coverage", oracle=_OP187_SQL)
def op187_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against a top-K corpus
    vocabulary — the measurement a tokenizer build runs to size its
    merge table ("how much of each language does a K-entry vocab
    cover?"); op137's vocab-growth curve answers corpus-side, this
    answers per-slice, and a skewed per-lang OOV is the classic sign
    a multilingual vocab under-serves a language.

    Plan: token explode → corpus-frequency agg → top-K TakeOrdered →
    BROADCAST vocab (K rows by construction — the one join in this
    family that is always broadcast-safe, unlike op120's full-df
    table) → left-join + per-lang agg. OOV rate quantized to ppm via
    floor(x·1e6+0.5) (op165's discipline)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    vocab = (
        tok.groupBy("word")
        .agg(F.count("*").cast("bigint").alias("c"))
        .orderBy(F.col("c").desc(), "word")
        .limit(_VOCAB_K)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    j = tok.join(F.broadcast(vocab), "word", "left").select(
        "lang",
        F.when(F.col("in_vocab").isNull(), 1).otherwise(0).alias("oov"),
    )
    return j.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("total_tokens"),
        F.sum("oov").cast("bigint").alias("oov_tokens"),
        F.expr(
            "cast(floor(cast(sum(oov) as double) / count(*)"
            " * 1000000.0D + 0.5D) as bigint)"
        ).alias("oov_rate_ppm"),
    )


# --------------------------------------------------------------------------
# op188: partition-skew diagnosis — the report behind every salting fix
# --------------------------------------------------------------------------

_SKEW_BUCKETS = 32
_SKEW_MULT = 2654435761  # op174's Knuth constant, same overflow-free mulmod


def _bucket_sql(col: str, int_div: str) -> str:
    from ocdb_server_spark.operators.pipeline_r4b import _mulmod32

    return f"({_mulmod32(col, _SKEW_MULT, int_div)} % {_SKEW_BUCKETS})"


_OP188_SQL = f"""
WITH b AS (
  SELECT {_bucket_sql('o_custkey', '//')} AS bucket FROM orders
),
c AS (
  SELECT CAST(bucket AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM b GROUP BY bucket
),
t AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
         CAST(MAX(n_rows) AS BIGINT) AS max_rows
  FROM c
)
SELECT c.bucket, c.n_rows,
       CAST(FLOOR(CAST(c.n_rows AS DOUBLE) * {_SKEW_BUCKETS}
                  / t.total * 1000000.0 + 0.5) AS BIGINT) AS load_ppm_of_even,
       c.n_rows = t.max_rows AS is_hottest
FROM c, t
"""


@register("op188_skew_diagnosis", oracle=_OP188_SQL)
def op188_skew_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket load report for a prospective shuffle key: hash
    o_custkey into 32 buckets (the engine-portable _mulmod32 hash, so
    the oracle sees identical buckets) and report each bucket's row
    count, its load relative to a perfectly even spread (ppm of even
    share, quantized), and whether it is the hottest bucket — the
    diagnosis that decides BETWEEN plain hash join, op167's salting,
    and AQE skew splitting before anyone pays for a failed shuffle.
    On uniform TPC-H keys every bucket sits near 1,000,000 ppm; a
    web-corpus host key would show the 10-100× hot bucket this report
    exists to catch.

    Scale: one map-side-partial agg to 32 rows + a 2-row broadcast
    total — the report costs one scan regardless of table size."""
    o = load_table(spark, sf_dir, "orders")
    b = o.select(F.expr(_bucket_sql("o_custkey", "div")).alias("bucket"))
    c = b.groupBy(F.col("bucket").cast("bigint").alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n_rows")
    )
    t = c.agg(
        F.sum("n_rows").cast("bigint").alias("total"),
        F.max("n_rows").cast("bigint").alias("max_rows"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "bucket",
        "n_rows",
        F.expr(
            f"cast(floor(cast(n_rows as double) * {_SKEW_BUCKETS}"
            " / total * 1000000.0D + 0.5D) as bigint)"
        ).alias("load_ppm_of_even"),
        (F.col("n_rows") == F.col("max_rows")).alias("is_hottest"),
    )


# --------------------------------------------------------------------------
# op189: schema-evolution union — reading across an added-column boundary
# --------------------------------------------------------------------------

_OP189_SQL = """
WITH old AS (
  SELECT o_orderkey, o_totalprice
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
),
new AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
),
u AS (
  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM old
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderpriority FROM new
)
SELECT COALESCE(o_orderpriority, '<pre-schema>') AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM u GROUP BY 1
"""


@register("op189_union_schema_evolution", oracle=_OP189_SQL)
def op189_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union across a schema-evolution boundary: the "old" slice of
    orders lacks a column the "new" slice carries (modeling a lake
    table that gained o_orderpriority mid-history);
    `unionByName(allowMissingColumns=True)` aligns by NAME and nulls
    the missing column — the read path every long-lived parquet lake
    needs, and a silent-corruption trap for positional UNION (which
    would mis-zip columns; the oracle spells out the NULL-padded
    by-name semantics explicitly). Observable: per-priority counts
    with the pre-schema rows grouped under a sentinel.

    Scale: pure map-side projection + one 6-group agg."""
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_totalprice")
    new = o.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")
    u = old.unionByName(new, allowMissingColumns=True)
    return (
        u.select(
            F.coalesce(F.col("o_orderpriority"), F.lit("<pre-schema>")).alias(
                "priority"
            ),
            "o_totalprice",
        )
        .groupBy("priority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.expr(
                "cast(sum(cast(o_totalprice as decimal(18,2))) as double)"
            ).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# op190: exact-substring duplicate spans — shingle-run merging
# --------------------------------------------------------------------------

_SPAN_L = 8  # minimum duplicated run, in tokens

_OP190_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n
  FROM documents
),
w AS (
  SELECT doc_id,
         CAST(i AS BIGINT) AS pos,
         md5(array_to_string(ws[i:i + {_SPAN_L} - 1], ' ')) AS h
  FROM t, UNNEST(range(1, n - {_SPAN_L} + 2)) AS u(i)
  WHERE n >= {_SPAN_L}
),
dup AS (SELECT h FROM w GROUP BY h HAVING COUNT(*) >= 2),
p AS (
  SELECT w.doc_id, w.pos,
         w.pos - ROW_NUMBER() OVER (PARTITION BY w.doc_id ORDER BY w.pos)
           AS grp
  FROM w JOIN dup ON w.h = dup.h
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) - MIN(pos) + {_SPAN_L} AS BIGINT) AS span_len
FROM p GROUP BY doc_id, grp
"""


@register("op190_substring_dup_spans", oracle=_OP190_SQL)
def op190_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate SPANS: every maximal run of ≥8 tokens
    that occurs (anywhere) at least twice in the corpus, reported as
    (doc_id, span_start, span_len) — the actionable output of
    exact-substring dedup (public method: Lee et al., "Deduplicating
    Training Data Makes Language Models Better", 2021 — which removes
    the repeated SPAN, not the document; op75/op154 handle whole-doc /
    prefix dups, op79/op88 the fuzzy ones).

    Distributed formulation: the paper's suffix array becomes a
    shingle-hash pipeline — every 8-token window hashes (md5, window
    text never shuffles beyond the hash), duplicated hashes surface
    via one count≥2 aggregate, and each doc's duplicated positions
    merge into maximal spans with the gaps-and-islands trick
    (pos − row_number per doc). Overlapping duplicated windows fuse
    into one span, so a verbatim 50-token quote reports as ONE
    43-window span, start and length exact.

    Scale: shuffles carry (hash) then (doc_id, pos) — both O(tokens);
    the span merge windows over each doc's own positions. The dup-hash
    join is a semi-join on the hash (corpus-sized at web scale →
    shuffle; Catalyst may broadcast it at test scale)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.split("text", " ").alias("ws")
    ).withColumn("n", F.size("ws"))
    w = (
        t.filter(F.col("n") >= _SPAN_L)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, n - {_SPAN_L} + 1),"
                    f" i -> struct(cast(i as bigint) as pos,"
                    f" md5(array_join(slice(ws, i, {_SPAN_L}), ' ')) as h))"
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    )
    dup = w.groupBy("h").agg(F.count("*").alias("c")).filter(F.col("c") >= 2)
    p = w.join(dup.select("h"), "h", "left_semi")
    from pyspark.sql import Window as _W

    grp = (
        F.col("pos")
        - F.row_number().over(_W.partitionBy("doc_id").orderBy("pos"))
    ).alias("grp")
    return (
        p.select("doc_id", "pos", grp)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") - F.min("pos") + _SPAN_L)
            .cast("bigint")
            .alias("span_len"),
        )
        .drop("grp")
    )


# --------------------------------------------------------------------------
# op191: bigram LM scoring with backoff — the CCNet perplexity filter
# --------------------------------------------------------------------------

# Stupid-backoff weight (Brants et al. 2007, public method), exact
# constant in both engines.
_BO = 0.4

_OP191_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n
  FROM documents
),
tr AS (
  SELECT doc_id, lang, ws[i] AS v, ws[i + 1] AS w
  FROM d, UNNEST(range(1, n)) AS u(i)
  WHERE n >= 2
),
bi AS (
  SELECT v, w, CAST(COUNT(*) AS BIGINT) AS cb
  FROM tr WHERE lang = 'en' GROUP BY v, w
),
uni AS (SELECT v, CAST(SUM(cb) AS BIGINT) AS cu FROM bi GROUP BY v),
tot AS (SELECT SUM(cu) AS big_t FROM uni),
scored AS (
  SELECT tr.doc_id,
         CASE WHEN bi.cb IS NOT NULL THEN 0 ELSE 1 END AS backoff,
         CAST(FLOOR(
           CASE
             WHEN bi.cb IS NOT NULL
               THEN LN(CAST(uni.cu AS DOUBLE) / bi.cb)
             WHEN uw.cu IS NOT NULL
               THEN LN(CAST(tot.big_t AS DOUBLE) / ({_BO} * uw.cu))
             ELSE LN(CAST(tot.big_t AS DOUBLE) / {_BO})
           END * 1000000.0 + 0.5) AS BIGINT) AS nlp
  FROM tr
  LEFT JOIN bi ON tr.v = bi.v AND tr.w = bi.w
  LEFT JOIN uni ON tr.v = uni.v
  LEFT JOIN uni uw ON tr.w = uw.v
  CROSS JOIN tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(SUM(backoff) AS BIGINT) AS n_backoff,
       CAST(SUM(nlp) AS DOUBLE) / (COUNT(*) * 1000000) AS avg_neglogp
FROM scored GROUP BY doc_id
"""


@register("op191_bigram_logprob", oracle=_OP191_SQL)
def op191_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document under a BIGRAM model trained on the English
    slice, with stupid backoff (Brants et al. 2007) for unseen
    transitions — the real CCNet/Gopher perplexity-filter shape: a
    reference-corpus LM scores the candidate corpus, and the backoff
    path genuinely fires (non-en docs hit it constantly; op169's
    self-trained unigram never could). n_backoff is emitted so the
    filter can ALSO threshold on model coverage.

    Per-transition -ln p: seen bigram → ln(cu(v)/cb(v,w)); unseen with
    known continuation → ln(T/(0.4·cu(w))); fully OOV → ln(T/0.4).
    Every p is a ratio of exact int64 counts (+ one exact constant),
    quantized floor(x·1e6+0.5)→int64 before the per-doc sum (op169's
    discipline), one divide at the end.

    Scale: the model joins are LEFT joins of transitions against the
    bigram/unigram tables keyed on the grams — kept as SHUFFLE joins
    (op120's rule: gram tables are vocab²-sized on a web corpus, no
    broadcast hint), so every shuffle carries gram keys + counts,
    O(tokens). The transition explode is the same budget as op77's
    wordcount."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", F.split("text", " ").alias("ws")
    ).withColumn("n", F.size("ws"))
    tr = (
        t.filter(F.col("n") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, n - 1),"
                    " i -> struct(element_at(ws, i) as v,"
                    " element_at(ws, i + 1) as w))"
                )
            ).alias("s"),
        )
        .select("doc_id", "lang", F.col("s.v").alias("v"), F.col("s.w").alias("w"))
    )
    bi = (
        tr.filter(F.col("lang") == "en")
        .groupBy("v", "w")
        .agg(F.count("*").cast("bigint").alias("cb"))
    )
    uni = bi.groupBy("v").agg(F.sum("cb").cast("bigint").alias("cu"))
    tot = uni.agg(F.sum("cu").alias("big_t"))
    uw = uni.select(F.col("v").alias("w"), F.col("cu").alias("cuw"))
    scored = (
        tr.join(bi.hint("shuffle_merge"), ["v", "w"], "left")
        .join(uni.hint("shuffle_merge"), ["v"], "left")
        .join(uw.hint("shuffle_merge"), ["w"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.when(F.col("cb").isNotNull(), 0).otherwise(1).alias("backoff"),
            F.expr(
                "cast(floor(CASE"
                " WHEN cb IS NOT NULL THEN ln(cast(cu as double) / cb)"
                f" WHEN cuw IS NOT NULL THEN ln(cast(big_t as double) / ({_BO}D * cuw))"
                f" ELSE ln(cast(big_t as double) / {_BO}D)"
                " END * 1000000.0D + 0.5D) as bigint)"
            ).alias("nlp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_transitions"),
        F.sum("backoff").cast("bigint").alias("n_backoff"),
        (F.sum("nlp").cast("double") / (F.count("*") * 1_000_000)).alias(
            "avg_neglogp"
        ),
    )


# --------------------------------------------------------------------------
# op192: shingle containment — asymmetric near-dup scoring
# --------------------------------------------------------------------------

_CT_L = 5        # tokens per shingle
_CT_DFCAP = 100  # drop shingles present in more docs (bounds join fanout)
_CT_MIN = 3      # report pairs sharing at least this many shingles

_OP192_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(ws[i:i + {_CT_L} - 1], ' ')) AS h
  FROM t, UNNEST(range(1, n - {_CT_L} + 2)) AS u(i)
  WHERE n >= {_CT_L}
),
keep AS (
  SELECT h FROM sh GROUP BY h HAVING COUNT(*) <= {_CT_DFCAP}
),
shc AS (SELECT sh.doc_id, sh.h FROM sh JOIN keep ON sh.h = keep.h),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM shc GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {_CT_MIN}
)
SELECT p.doc_a, p.doc_b, p.inter,
       sa.sz AS size_a, sb.sz AS size_b,
       ROUND(CAST(p.inter AS DOUBLE) / sa.sz, 6) AS containment_a,
       ROUND(CAST(p.inter AS DOUBLE) / sb.sz, 6) AS containment_b
FROM pairs p
JOIN sizes sa ON p.doc_a = sa.doc_id
JOIN sizes sb ON p.doc_b = sb.doc_id
"""


@register("op192_shingle_containment", oracle=_OP192_SQL)
def op192_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup scoring: for doc pairs sharing ≥3 distinct
    5-token shingles, report |A∩B| and BOTH containments |A∩B|/|A|,
    |A∩B|/|B| — the metric that catches quote-inclusion and
    superset/subset duplication that symmetric Jaccard (op89)
    underweights (a tweet quoted inside an article has tiny Jaccard
    but containment ≈ 1 on the tweet side; RefinedWeb-style pipelines
    filter on exactly this).

    Scale: candidate pairs come from the shared-shingle equi-join —
    never doc×doc — and the df-cap (drop shingles in >100 docs,
    applied identically in the oracle) bounds each shingle's fanout
    at 100², the standard boilerplate-shingle guard; shuffles carry
    (hash, doc_id) pairs only. At sf0.1 the planted duplicate texts
    must surface with containment 1.0 both sides (tested); at lower
    sf the word-soup corpus shares no 5-gram runs and the correct
    output is empty."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("ws")).withColumn(
        "n", F.size("ws")
    )
    sh = (
        t.filter(F.col("n") >= _CT_L)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, n - {_CT_L} + 1),"
                    f" i -> md5(array_join(slice(ws, i, {_CT_L}), ' ')))"
                )
            ).alias("h"),
        )
        .distinct()
    )
    keep = sh.groupBy("h").agg(F.count("*").alias("df")).filter(
        F.col("df") <= _CT_DFCAP
    )
    shc = sh.join(keep.select("h"), "h", "left_semi")
    sizes = shc.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("sz"))
    a = shc.alias("a")
    b = shc.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("bigint").alias("inter"))
        .filter(F.col("inter") >= _CT_MIN)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("size_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "size_a",
            "size_b",
            F.round(F.col("inter").cast("double") / F.col("size_a"), 6).alias(
                "containment_a"
            ),
            F.round(F.col("inter").cast("double") / F.col("size_b"), 6).alias(
                "containment_b"
            ),
        )
    )


# --------------------------------------------------------------------------
# op193: keyset (seek) pagination — the scale-correct page fetch
# --------------------------------------------------------------------------

# cursor = last (o_orderdate, o_orderkey) of the previous page — the
# values a real API echoes back as its page token.
_KS_CURSOR_DATE = "1995-06-01 00:00:00"
_KS_CURSOR_KEY = 42
_KS_PAGE = 20

_OP193_SQL = f"""
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
WHERE (o_orderdate > TIMESTAMP '{_KS_CURSOR_DATE}')
   OR (o_orderdate = TIMESTAMP '{_KS_CURSOR_DATE}' AND o_orderkey > {_KS_CURSOR_KEY})
ORDER BY o_orderdate, o_orderkey
LIMIT {_KS_PAGE}
"""


@register("op193_keyset_pagination", oracle=_OP193_SQL)
def op193_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-based) pagination: fetch the page AFTER a cursor
    row by filtering on the sort key instead of skipping rows — the
    scale-correct twin of op52's LIMIT/OFFSET (offset N scans and
    discards N rows on every page, so page latency grows linearly
    into deep result sets; the reference's dataset-search pagination
    has exactly this failure mode at depth). The cursor tuple
    predicate pushes to the parquet scan (o_orderdate range lands in
    PushedFilters), and the page plans as TakeOrderedAndProject —
    per-partition top-20 then merge, NEVER a global sort or a
    skip-scan. Same row-order contract as op52 (total order via the
    unique key tiebreak), so pages never duplicate or drop rows
    between requests even under concurrent inserts outside the
    cursor range."""
    o = load_table(spark, sf_dir, "orders")
    cur_d = F.lit(_KS_CURSOR_DATE).cast("timestamp")
    after = (F.col("o_orderdate") > cur_d) | (
        (F.col("o_orderdate") == cur_d)
        & (F.col("o_orderkey") > _KS_CURSOR_KEY)
    )
    return (
        o.filter(after)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(_KS_PAGE)
    )


# --------------------------------------------------------------------------
# op194: mergeable MinHash rollup — similarity sketches as algebra
# --------------------------------------------------------------------------

_MH_K = 16  # signature width (same as op79)


@register("op194_minhash_rollup", oracle=None)  # ROWS: xxhash64-based
def op194_minhash_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE MinHash signatures rolled up to a corpus signature by
    ELEMENTWISE MIN — the similarity-sketch member of the mergeable-
    aggregate family (op166 HLL∪, op171 algebraic rollup): because
    min(minhash(A), minhash(B)) = minhash(A∪B) exactly, any hierarchy
    level re-aggregates from stored signatures instead of re-shingling
    raw text, and two stored signatures estimate the Jaccard overlap
    of whole sub-corpora (matching components / dedup-across-dumps at
    100 TB without touching documents).

    One explode over shingles feeds the source-level 16-min partial
    agg (shuffle = 16 longs per source); the corpus row then derives
    PURELY from the source signatures. tests/test_pipeline_r5b.py
    proves the rollup law: corpus-from-sources ≡ corpus-from-shingles,
    and that planted duplicate sources produce identical signatures.

    ROWS-oracle: signatures are xxhash64-based (no DuckDB twin — same
    rationale as op79).

    NO-CHANGE NOTE (round-10 verdict item 6, measured r11): the rollup
    path stays the direct per-source min-agg. hybrid_selfjoin_pairs
    does not apply — this plan has NO bucket self-join (the group key
    is `source`, not an LSH band, and no pair space ever forms); and
    the group distribution is perfectly uniform at every test scale
    (20 sources × equal doc counts, checked sf0.01/sf0.1). Measured at
    10× the driver gate scale (sf0.1, local[32], 3 interleaved reps):
    direct min/med 0.544/0.721 s vs two-phase salted 0.698/0.717 s —
    the salt's second shuffle buys nothing even before skew is absent,
    consistent with the round-10 --mode=agg rule (decomposable aggs:
    never salt; map-side partials already collapse hot keys)."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select("source", F.expr("split(lower(text), ' ')").alias("w"))
    shingles = F.expr(
        "array_distinct(filter("
        "  zip_with(w, slice(w, 2, greatest(size(w) - 1, 0)),"
        "           (x, y) -> concat_ws(' ', x, y)),"
        "  s -> contains(s, ' ')))"
    )
    sh = w.select("source", F.explode(shingles).alias("shingle"))
    per_source = sh.groupBy("source").agg(
        *[F.expr(f"min(xxhash64({i}, shingle)) AS mh{i}") for i in range(_MH_K)]
    )
    src_rows = per_source.select(
        F.lit("source").alias("level"),
        F.col("source").alias("key"),
        *[F.col(f"mh{i}") for i in range(_MH_K)],
    )
    corpus = per_source.agg(
        *[F.expr(f"min(mh{i}) AS mh{i}") for i in range(_MH_K)]
    ).select(
        F.lit("corpus").alias("level"),
        F.lit("*").alias("key"),
        *[F.col(f"mh{i}") for i in range(_MH_K)],
    )
    return src_rows.unionAll(corpus)


# --------------------------------------------------------------------------
# op201: bottom-k quantile sketch — mergeable, deterministic, bounded
# --------------------------------------------------------------------------

_BK_K = 64  # sketch size per level


@register("op201_bottomk_quantile_sketch", oracle=None)  # ROWS: xxhash-based
def op201_bottomk_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile estimation via BOTTOM-K sketches (Cohen &
    Kaplan's bottom-k sampling, public method) — the quantile member
    of the mergeable family the round-4/5 notes kept asking for
    (op166 HLL=cardinality, op194 MinHash=similarity, this=quantiles):
    each event_type keeps the 64 rows with the SMALLEST xxhash64(id)
    tags — a deterministic uniform sample, because the hash order is
    independent of the value — and the union of per-type sketches,
    re-cut to its 64 smallest tags, IS exactly the global bottom-k
    sketch (merge = union + cut; tested against the direct global
    computation). Per level the op reports the sketch-estimated
    median and quartiles of `value`.

    Exact-pass contrast: op26/op107 re-scan raw data per level; a
    stored 64-row sketch re-aggregates any hierarchy level in O(k).
    Accuracy: a 64-point uniform sample's median sits within ±0.13 of
    the true CDF position w.h.p. — gated in tests (estimated median's
    true rank within [0.30, 0.70]).

    ROWS-oracle: hash-based sampling has no DuckDB twin (op79's
    rationale); determinism + merge algebra + accuracy are pinned in
    tests/test_pipeline_r5b.py instead."""
    from pyspark.sql import Window as _W

    e = load_table(spark, sf_dir, "events").select(
        "event_type", "value", F.xxhash64("event_id").alias("tag")
    )
    w_type = _W.partitionBy("event_type").orderBy("tag")
    per_type_sk = (
        e.withColumn("rn", F.row_number().over(w_type))
        .filter(F.col("rn") <= _BK_K)
        .drop("rn")
    )

    def level_stats(sk: DataFrame, level_col, key_col) -> DataFrame:
        return sk.groupBy(
            level_col.alias("level"), key_col.alias("key")
        ).agg(
            F.count("*").cast("bigint").alias("k"),
            F.expr("percentile(value, 0.25)").alias("est_p25"),
            F.expr("percentile(value, 0.5)").alias("est_p50"),
            F.expr("percentile(value, 0.75)").alias("est_p75"),
        )
    typed = level_stats(per_type_sk, F.lit("event_type"), F.col("event_type"))
    # merge: union of per-type sketches, re-cut to the k smallest tags
    w_all = _W.orderBy("tag")
    merged = (
        per_type_sk.withColumn("rn", F.row_number().over(w_all))
        .filter(F.col("rn") <= _BK_K)
        .drop("rn")
    )
    overall = level_stats(merged, F.lit("all"), F.lit("*"))
    return typed.unionAll(overall).select(
        "level",
        "key",
        "k",
        F.round("est_p25", 6).alias("est_p25"),
        F.round("est_p50", 6).alias("est_p50"),
        F.round("est_p75", 6).alias("est_p75"),
    )
