"""Round-2 pipeline extensions, second batch — SURVEY.md §2.17 (op134–op145).

Widens the training-data-pipeline axis (multilingual sampling weights,
deterministic corpus sampling, vocabulary-growth curves, embedding
feature scaling, dup-cluster histograms, cross-source contamination,
sequence-length histograms, anomaly flags, label centroids) and the
relational axis (TPC-H Q14 promo share, Q18 large orders, Q10 returned
items). Same design rules as the rest of the package:
pure DataFrame/Catalyst plans, canonicalizer-safe scalar outputs,
float observables either bit-identical IEEE on both engines or
round(6)-stabilized where libm-vs-JVM ulps can differ (`pow`, HOF
double folds — verified divergent in the last ulp this round).

The reference (`bcdev/ocdb-server`, public knowledge — SURVEY.md §0)
has no analog for these; they extend the 100 TB-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.operators._helpers import SQL_REVENUE_DEC, revenue_dec
from ocdb_server_spark.registry import register


# --------------------------------------------------------------------------
# op134: TPC-H Q14 shape — promo revenue share per ship month
# --------------------------------------------------------------------------

_OP134_SQL = f"""
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN {SQL_REVENUE_DEC}
                     ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM({SQL_REVENUE_DEC}) AS DOUBLE) AS total_revenue,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN {SQL_REVENUE_DEC}
                     ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
         / CAST(SUM({SQL_REVENUE_DEC}) AS DOUBLE) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ship_month
"""


@register("op134_promo_revenue", oracle=_OP134_SQL)
def op134_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: promo-part revenue share per ship month.

    Plan at scale: part is the small dim → broadcast, so lineitem never
    shuffles for the join; the month agg is partial+final hash agg on
    ~84 month keys. Revenue accumulates in exact decimal (order-
    independent); the share is one double divide of two exact sums —
    bit-identical both engines, no rounding guard needed."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", revenue_dec()).otherwise(
        F.lit(0).cast("decimal(17,4)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(revenue_dec()).cast("double").alias("total_revenue"),
        )
        .select(
            "ship_month",
            "promo_revenue",
            "total_revenue",
            (F.col("promo_revenue") / F.col("total_revenue")).alias("promo_share"),
        )
    )


# --------------------------------------------------------------------------
# op135: temperature-scaled multilingual sampling weights
# --------------------------------------------------------------------------

_ALPHA = 0.3  # sampling temperature (multilingual-LM convention)

_OP135_SQL = f"""
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
p AS (
  SELECT lang, n_docs,
         CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS raw_share,
         CAST(ROUND(POW(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), {_ALPHA}), 6)
              AS DECIMAL(18,6)) AS p6
  FROM c)
SELECT lang, n_docs, raw_share,
       ROUND(CAST(p6 AS DOUBLE) / CAST(SUM(p6) OVER () AS DOUBLE), 6) AS sample_weight
FROM p
"""


@register("op135_sampling_weights", oracle=_OP135_SQL)
def op135_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per language: weight_l ∝
    (n_l/N)^0.3, the standard multilingual-LM upsampling of low-
    resource languages.

    Determinism: `pow` is libm-vs-JVM ulp-divergent (verified this
    round: last-bit differs for 0.43^0.3), so the powered share is
    round(6)'d and then cast to DECIMAL(18,6) before the normalizing
    sum — decimal addition is exact and order-independent, so the
    denominator can't drift with partition order. Final weight is one
    double divide of identical inputs, re-rounded to 6 dp.

    Scale: one hash agg on lang, then windows over the #langs-row agg
    output (a single tiny partition post-agg — trivially safe)."""
    c = load_table(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count("*").alias("n_docs")
    )
    all_w = W.partitionBy()
    p6 = F.round(
        F.pow(F.col("n_docs").cast("double") / F.sum("n_docs").over(all_w), _ALPHA), 6
    ).cast("decimal(18,6)")
    return (
        c.withColumn("raw_share", F.col("n_docs").cast("double") / F.sum("n_docs").over(all_w))
        .withColumn("p6", p6)
        .select(
            "lang",
            "n_docs",
            "raw_share",
            F.round(
                F.col("p6").cast("double") / F.sum("p6").over(all_w).cast("double"), 6
            ).alias("sample_weight"),
        )
    )


# --------------------------------------------------------------------------
# op136: deterministic hash sample, k docs per language
# --------------------------------------------------------------------------

_SAMPLE_K = 8
_SAMPLE_SALTS = 16

_OP136_SQL = f"""
SELECT lang, doc_id, rk FROM (
  SELECT lang, doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY md5('s' || CAST(doc_id AS VARCHAR)), doc_id)
              AS BIGINT) AS rk
  FROM documents)
WHERE rk <= {_SAMPLE_K}
"""


@register("op136_hash_sample_per_lang", oracle=_OP136_SQL)
def op136_hash_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-language corpus sample: rank docs by
    md5(salt || doc_id) within language, keep the first k. Hash-ranked
    sampling is reproducible across runs/engines (no RNG state) and
    uniform in expectation — the standard way to cut eval slices from
    a training corpus.

    Skew note: lang cardinality is tiny (~5), so a direct per-lang
    window would funnel the whole corpus through ~5 tasks at 100 TB.
    Implemented instead as the op112 two-phase top-k: rank within
    (lang, salt-of-16) → keep k per salted group → re-rank the ≤16k
    survivors per lang. Identical result set and ranks, 16× the
    parallelism, and the final window sees ≤16k rows per lang.
    The md5 ranks match DuckDB's because both engines hex-encode
    lowercase and compare as strings."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        F.md5(F.concat(F.lit("s"), F.col("doc_id").cast("string")).cast("binary")).alias("h"),
    )
    salted = d.withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(_SAMPLE_SALTS)))
    per_salt = W.partitionBy("lang", "salt").orderBy("h", "doc_id")
    survivors = (
        salted.withColumn("srk", F.row_number().over(per_salt))
        .filter(F.col("srk") <= _SAMPLE_K)
    )
    per_lang = W.partitionBy("lang").orderBy("h", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(per_lang).cast("bigint"))
        .filter(F.col("rk") <= _SAMPLE_K)
        .select("lang", "doc_id", "rk")
    )


# --------------------------------------------------------------------------
# op137: vocabulary growth curve (Heaps'-law empirics)
# --------------------------------------------------------------------------

_VOCAB_BUCKET = 100  # docs per corpus slice

_OP137_SQL = f"""
WITH w AS (
  SELECT CAST(FLOOR(doc_id / {_VOCAB_BUCKET}.0) AS BIGINT) AS bucket,
         unnest(string_split(text, ' ')) AS word
  FROM documents),
f AS (
  SELECT word, MIN(bucket) AS first_bucket
  FROM w WHERE word <> '' GROUP BY word),
n AS (
  SELECT first_bucket AS bucket, CAST(COUNT(*) AS BIGINT) AS new_words
  FROM f GROUP BY first_bucket)
SELECT bucket, new_words,
       CAST(SUM(new_words) OVER (ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
FROM n
"""


@register("op137_vocab_growth", oracle=_OP137_SQL)
def op137_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve: per 100-doc corpus slice, how many
    never-before-seen words appear, and the cumulative vocabulary size
    (the empirical Heaps'-law curve a tokenizer-training pipeline
    monitors).

    Plan at scale: explode words → hash agg MIN(bucket) per word (the
    heavy shuffle, but map-side partial MIN collapses each partition
    to its distinct words first) → hash agg per bucket (#buckets
    rows) → one running-sum window over the #buckets-row result, which
    is a single tiny partition post-agg, not a corpus-wide sort."""
    d = load_table(spark, sf_dir, "documents").select(
        F.floor(F.col("doc_id") / _VOCAB_BUCKET).cast("bigint").alias("bucket"),
        F.explode(F.split("text", " ")).alias("word"),
    )
    first = (
        d.filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.min("bucket").alias("first_bucket"))
    )
    per_bucket = first.groupBy(F.col("first_bucket").alias("bucket")).agg(
        F.count("*").alias("new_words")
    )
    running = W.partitionBy().orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    return per_bucket.select(
        "bucket",
        "new_words",
        F.sum("new_words").over(running).cast("bigint").alias("vocab_size"),
    )


# --------------------------------------------------------------------------
# op138: TPC-H Q18 shape — large-quantity orders and their customers
# --------------------------------------------------------------------------

_Q18_QTY = 200

_OP138_SQL = f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > {_Q18_QTY})
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("op138_large_orders", oracle=_OP138_SQL)
def op138_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total quantity exceeds the
    threshold, joined back to orders+customer, top-20 by price.

    Plan at scale: the lineitem agg shuffles once on l_orderkey and the
    HAVING prunes ~97% of groups BEFORE the joins, so the orders join
    sees only the big-order keys; customer joins via broadcast-sized
    key set after AQE. Top-20 is TakeOrderedAndProject with o_orderkey
    tiebreak (deterministic set, never a global sort). Quantity sums
    in exact decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qdec"))
        .filter(F.col("qdec") > _Q18_QTY)
        .select("l_orderkey", F.col("qdec").cast("double").alias("sum_qty"))
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# op139: embedding-norm min-max feature scaling per label
# --------------------------------------------------------------------------

_OP139_SQL = """
WITH n AS (
  SELECT vec_id, label,
         ROUND(sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm_r
  FROM embeddings),
b AS (
  SELECT vec_id, label, norm_r,
         MIN(norm_r) OVER (PARTITION BY label) AS mn,
         MAX(norm_r) OVER (PARTITION BY label) AS mx
  FROM n)
SELECT vec_id, label, norm_r,
       ROUND(CASE WHEN mx = mn THEN 0.0 ELSE (norm_r - mn) / (mx - mn) END, 6)
         AS scaled
FROM b
"""


@register("op139_feature_minmax", oracle=_OP139_SQL)
def op139_feature_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max scale each embedding's L2 norm within its label group —
    the feature-normalization step before norm-based quality filtering
    or mixture balancing.

    Determinism: the sum-of-squares is a sequential HOF fold in both
    engines, but accumulation strategy isn't contractually identical
    (DuckDB list_sum vs Spark aggregate), so the norm is round(6)'d
    FIRST and all downstream min/max/scale arithmetic runs on the
    rounded value — exact comparisons and one double divide from
    there. Scale: zero shuffle for the fold (per-row JVM codegen, no
    Python), one window shuffle on label; with ~10 labels at 100 TB
    the same two-phase salted min/max as op136 applies (documented,
    not needed for the observable)."""
    e = load_table(spark, sf_dir, "embeddings")
    ss = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    n = e.select("vec_id", "label", F.round(F.sqrt(ss), 6).alias("norm_r"))
    by_label = W.partitionBy("label")
    return (
        n.withColumn("mn", F.min("norm_r").over(by_label))
        .withColumn("mx", F.max("norm_r").over(by_label))
        .select(
            "vec_id",
            "label",
            "norm_r",
            F.round(
                F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
                    (F.col("norm_r") - F.col("mn")) / (F.col("mx") - F.col("mn"))
                ),
                6,
            ).alias("scaled"),
        )
    )


# --------------------------------------------------------------------------
# op140: TPC-H Q10 shape — revenue lost to returns, per customer
# --------------------------------------------------------------------------

_OP140_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM({SQL_REVENUE_DEC}) AS DOUBLE) AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""


@register("op140_returned_items", oracle=_OP140_SQL)
def op140_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: revenue lost to returned items ('R' flag) per
    customer with nation name, top-20.

    Plan at scale: the returnflag filter pushes to the lineitem scan
    (~1/3 survives), lineitem⋈orders shuffles on the order key,
    customer and nation broadcast; top-20 is TakeOrderedAndProject
    with c_custkey tiebreak. Revenue in exact decimal."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue_dec()).cast("double").alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# op141: exact-duplicate cluster-size histogram
# --------------------------------------------------------------------------

_OP141_SQL = """
WITH g AS (SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS dup_size
           FROM documents GROUP BY h)
SELECT dup_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(dup_size - 1) AS BIGINT) AS redundant_docs
FROM g GROUP BY dup_size
"""


@register("op141_dup_cluster_stats", oracle=_OP141_SQL)
def op141_dup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup cluster-size histogram: how many content clusters
    exist at each duplication level, and how many docs are redundant —
    the dedup-yield report a corpus pipeline prints before committing
    to a dedup pass (op75 gives the totals; this gives the shape).

    Plan at scale: groupBy on the 128-bit digest (never the text
    bytes), then a re-aggregation of the cluster-size table — the
    second shuffle carries one row per distinct size (~dozens)."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.count("*").alias("dup_size")
    )
    return g.groupBy("dup_size").agg(
        F.count("*").alias("n_clusters"),
        F.sum(F.col("dup_size") - 1).alias("redundant_docs"),
    )


# --------------------------------------------------------------------------
# op142: cross-source shingle-overlap matrix
# --------------------------------------------------------------------------

_OP142_SQL = """
WITH toks AS (
  SELECT source, string_split(lower(text), ' ') AS w FROM documents),
grams AS (
  SELECT DISTINCT source,
         md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]) AS h
  FROM toks, UNNEST(range(1, len(w) - 3)) AS t(i)),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM grams GROUP BY source),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b, CAST(COUNT(*) AS BIGINT) AS shared_grams
  FROM grams a JOIN grams b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2)
SELECT s.source_a, s.source_b, s.shared_grams,
       ROUND(CAST(s.shared_grams AS DOUBLE) / (sa.n + sb.n - s.shared_grams), 6) AS jaccard
FROM shared s
JOIN sizes sa ON sa.source = s.source_a
JOIN sizes sb ON sb.source = s.source_b
"""


@register("op142_source_overlap", oracle=_OP142_SQL)
def op142_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: word-5-gram Jaccard overlap
    between every source pair — the "are two crawls secretly the same
    corpus" audit run before mixing training sources.

    Plan at scale: grams dedup to (source, md5) BEFORE anything else
    (map-side partial dedup), then ONE groupBy on the 128-bit gram
    hash collects each gram's co-occurring source set and a HOF
    generates the sorted source pairs in-place — no self-join, no
    second shuffle of the gram table, and the pair agg input is
    O(grams × co-occurrence²) with co-occurrence bounded by the
    source-catalog size. Every big exchange carries 16-byte digests,
    not text. (The DuckDB oracle keeps the equivalent self-join
    formulation — identical pair multiset.)"""
    d = load_table(spark, sf_dir, "documents")
    w = d.select("source", F.split(F.lower("text"), " ").alias("w"))
    grams = (
        w.select(
            "source",
            # Guard: sequence(0, size-5) with size<5 would step -1 and
            # produce negative indices (runtime error in slice); docs
            # shorter than one gram contribute nothing, matching the
            # oracle's empty range(1, len(w)-3).
            F.explode(
                F.when(
                    F.size("w") >= 5,
                    F.transform(
                        F.sequence(F.lit(0), F.size("w") - 5),
                        lambda i: F.md5(
                            F.concat_ws(" ", F.slice("w", i + 1, 5)).cast("binary")
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("h"),
        )
        .distinct()
    )
    sizes = grams.groupBy("source").agg(F.count("*").alias("n"))
    # per gram: sorted set of sources containing it -> all (a < b) pairs
    co = grams.groupBy("h").agg(F.sort_array(F.collect_set("source")).alias("ss"))
    pairs = co.filter(F.size("ss") > 1).select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ss"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ss"), i + 2, F.size("ss")),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    )
    shared = (
        pairs.groupBy(
            F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b")
        ).agg(F.count("*").alias("shared_grams"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        shared.join(F.broadcast(sa), F.col("source_a") == F.col("sa.source"))
        .join(F.broadcast(sb), F.col("source_b") == F.col("sb.source"))
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            F.round(
                F.col("shared_grams").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("shared_grams")),
                6,
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# op143: token-length histogram per language
# --------------------------------------------------------------------------

_LEN_BIN = 32  # tokens per histogram bin

_OP143_SQL = f"""
WITH t AS (
  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
  FROM documents)
SELECT lang,
       CAST(FLOOR(tokens / {_LEN_BIN}.0) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS total_tokens
FROM t GROUP BY lang, bin
"""


@register("op143_token_len_histogram", oracle=_OP143_SQL)
def op143_token_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram (32-token bins) per language — the
    packing-efficiency / truncation-loss planning table for a training
    run. All-integer math, one hash agg, zero float risk."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang", F.size(F.split("text", " ")).cast("bigint").alias("tokens")
    )
    return d.groupBy(
        "lang", F.floor(F.col("tokens") / _LEN_BIN).cast("bigint").alias("bin")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").alias("total_tokens"),
    )


# --------------------------------------------------------------------------
# op144: daily-volume anomaly flags (z-score over exact moments)
# --------------------------------------------------------------------------

_OP144_SQL = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY day),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS days,
         CAST(SUM(n) AS BIGINT) AS s1,
         CAST(SUM(n * n) AS BIGINT) AS s2
  FROM d)
SELECT day, n,
       ROUND((n - CAST(s1 AS DOUBLE) / days)
             / sqrt(CAST(s2 AS DOUBLE) / days
                    - (CAST(s1 AS DOUBLE) / days) * (CAST(s1 AS DOUBLE) / days)), 6)
         AS z,
       abs((n - CAST(s1 AS DOUBLE) / days)
           / sqrt(CAST(s2 AS DOUBLE) / days
                  - (CAST(s1 AS DOUBLE) / days) * (CAST(s1 AS DOUBLE) / days))) > 2.0
         AS is_anomaly
FROM d, m
"""


@register("op144_daily_anomaly", oracle=_OP144_SQL)
def op144_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-volume z-scores with |z|>2 anomaly flags — the
    ops-monitoring pass over an ingest stream's history.

    Determinism: counts are integers, so s1/s2 are EXACT (bigint sums,
    order-free); mean/variance/z are then identical double expressions
    on identical inputs in both engines — the flag threshold compares
    the unrounded z, and only the reported z is round(6). Plan at
    scale: one day-grain agg, a single-row moment agg off it, broadcast
    back over the day table (never a window over raw events)."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(F.count("*").alias("n"))
    m = d.agg(
        F.count("*").alias("days"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("days")
    var = F.col("s2").cast("double") / F.col("days") - mean * mean
    z = (F.col("n") - mean) / F.sqrt(var)
    return d.join(F.broadcast(m)).select(
        "day",
        "n",
        F.round(z, 6).alias("z"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
# op145: per-label embedding centroids
# --------------------------------------------------------------------------

_OP145_SQL = """
SELECT label, CAST(i - 1 AS INTEGER) AS pos,
       ROUND(SUM(CAST(embedding[i] AS DOUBLE)) / COUNT(*), 6) AS centroid
FROM embeddings, range(1, 65) t(i)
GROUP BY label, pos
"""


@register("op145_label_centroids", oracle=_OP145_SQL)
def op145_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the 64-dim embeddings — the k-means /
    IVF-index build step (op95 consumes exactly these as its coarse
    quantizer).

    Determinism: double sums are order-dependent in the last ulp, so
    the centroid is round(6)'d (the op120 ln-guard pattern; ~1e-13
    relative drift vs a 5e-7 rounding boundary). Deliberately NOT
    decimal-summed: this round verified Spark casts double→decimal
    ties HALF_UP while DuckDB rounds half-even, so per-element decimal
    rounding of dyadic floats would diverge where plain doubles don't.
    Plan at scale: posexplode + hash agg on (label,pos) — 640 groups,
    map-side partials collapse each partition to ≤640 rows before the
    shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            F.round(F.sum(F.col("x").cast("double")) / F.count("*"), 6).alias("centroid")
        )
    )


# --------------------------------------------------------------------------
# op148: SCD2 dimension build (validity intervals from an event log)
# --------------------------------------------------------------------------

_OP148_SQL = """
WITH runs AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
           AS grp
  FROM events),
iv AS (
  SELECT user_id, event_type,
         MIN(ts) AS valid_from,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, event_type, grp)
SELECT user_id, event_type, valid_from, n_events,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) IS NULL
         AS is_current
FROM iv
"""


@register("op148_scd2_intervals", oracle=_OP148_SQL)
def op148_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from an event log:
    collapse each user's consecutive same-type event runs into validity
    intervals [valid_from, valid_to) with an is_current flag — the CDC
    materialization every warehouse dim table needs.

    Run detection is the rn − rn_per_type gaps-and-islands difference
    (op111's technique, here producing interval rows rather than streak
    lengths). Plan at scale: ALL windows and the run aggregate share
    the ONE hashpartitioning(user_id) exchange; no global sort
    anywhere. Ties broken by event_id so run ids are deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    )
    by_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    by_user_type = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = ev.withColumn(
        "grp", F.row_number().over(by_user) - F.row_number().over(by_user_type)
    )
    iv = runs.groupBy("user_id", "event_type", "grp").agg(
        F.min("ts").alias("valid_from"), F.count("*").alias("n_events")
    )
    nxt = W.partitionBy("user_id").orderBy("valid_from")
    return iv.select(
        "user_id",
        "event_type",
        "valid_from",
        "n_events",
        F.lead("valid_from").over(nxt).alias("valid_to"),
        F.lead("valid_from").over(nxt).isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# op149: rolling 7-day distinct users (explode, not range-join)
# --------------------------------------------------------------------------

_OP149_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
bounds AS (SELECT MAX(day) AS max_day FROM du),
contrib AS (
  SELECT du.day + CAST(o.o AS INTEGER) AS spine_day, du.user_id
  FROM du, UNNEST(range(0, 7)) AS o(o))
SELECT spine_day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS rolling_users
FROM contrib, bounds
WHERE spine_day <= max_day
GROUP BY spine_day
"""


@register("op149_rolling_distinct_users", oracle=_OP149_SQL)
def op149_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day rolling distinct users per day — the DAU/WAU
    engagement series, and the classic op a sliding window CANNOT
    express (count distinct isn't windowable).

    Scale shape: a range join (day BETWEEN s-6 AND s) would plan as a
    nested-loop at any scale; instead each distinct (day, user) pair
    EXPLODES into the ≤7 spine days it contributes to, turning the
    range join into an equi-groupBy. Shuffles carry (day,user) pairs
    (pre-deduped map-side), never raw events. The max-day bound
    broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    bounds = du.agg(F.max("day").alias("max_day"))
    contrib = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"), "day", "user_id"
    ).select(F.date_add("day", F.col("o")).alias("spine_day"), "user_id")
    return (
        contrib.join(F.broadcast(bounds))
        .filter(F.col("spine_day") <= F.col("max_day"))
        .groupBy("spine_day")
        .agg(F.count_distinct("user_id").alias("rolling_users"))
    )


# --------------------------------------------------------------------------
# op150: schema-on-read JSON struct parse (from_json, not per-path extract)
# --------------------------------------------------------------------------

_OP150_SQL = """
SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
WHERE json_valid(props)
GROUP BY k
"""


@register("op150_json_struct_parse", oracle=_OP150_SQL)
def op150_json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON: parse the props column ONCE into a typed
    struct with `from_json` and aggregate on the parsed field — the
    production path when several fields are consumed (op65's
    get_json_object re-parses the string per extracted path; from_json
    amortizes one parse across the struct).

    min/max on doubles are exact comparisons (no sum-order risk).
    Zero shuffle before the k-grain agg."""
    ev = load_table(spark, sf_dir, "events")
    # from_json in PERMISSIVE mode returns a non-null struct with null
    # fields for malformed JSON, so p.isNotNull() would NOT mirror the
    # oracle's json_valid(props): invalid rows would land in the k=NULL
    # group on Spark but be excluded by DuckDB. try_parse_json proves
    # the whole document parsed (NULL for invalid JSON).
    parsed = ev.select(
        F.from_json("props", "k INT").alias("p"), "value"
    ).filter(F.expr("try_parse_json(props) IS NOT NULL"))
    return parsed.groupBy(F.col("p.k").alias("k")).agg(
        F.count("*").alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# --------------------------------------------------------------------------
# op151: boilerplate chunk detection (repeated word-chunks across docs)
# --------------------------------------------------------------------------

_CHUNK_W = 3       # words per chunk (non-overlapping stride)
_CHUNK_MIN_DOCS = 5

_OP151_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
chunks AS (
  SELECT doc_id,
         md5(array_to_string(w[(i*{_CHUNK_W})+1 : (i+1)*{_CHUNK_W}], ' ')) AS h
  FROM toks, UNNEST(range(0, 100000)) AS t(i)
  WHERE (i+1)*{_CHUNK_W} <= len(w))
SELECT h AS chunk_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM chunks
GROUP BY h
HAVING COUNT(DISTINCT doc_id) >= {_CHUNK_MIN_DOCS}
"""


@register("op151_boilerplate_chunks", oracle=_OP151_SQL)
def op151_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: non-overlapping 3-word chunks that recur
    in ≥5 distinct docs — the headers/footers/nav-text scrub list a
    web-corpus pipeline builds before training.

    Plan at scale: chunks hash to 16-byte md5 BEFORE the shuffle (the
    exchange never carries text), count+count_distinct in one agg with
    map-side partials, HAVING prunes the long tail. The oracle's
    UNNEST(range(…)) upper bound is a constant far above any doc's
    chunk count; Spark derives the exact per-doc count via
    transform(sequence(...))."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split(F.lower("text"), " ").alias("w"))
    n_chunks = F.floor(F.size("w") / _CHUNK_W).cast("int")
    chunks = w.select(
        "doc_id",
        # Guard: docs with fewer than _CHUNK_W words have n_chunks=0 and
        # sequence(0, -1) would step backwards ([0,-1] — a short chunk
        # plus a from-the-end slice). Emit no chunks instead, matching
        # the oracle's WHERE (i+1)*W <= len(w).
        F.explode(
            F.when(
                n_chunks > 0,
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.md5(
                        F.concat_ws(
                            " ", F.slice("w", i * _CHUNK_W + 1, _CHUNK_W)
                        ).cast("binary")
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("h"),
    )
    return (
        chunks.groupBy(F.col("h").alias("chunk_hash"))
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= _CHUNK_MIN_DOCS)
    )


# --------------------------------------------------------------------------
# op152: custom Python DataSource (Spark 4 connector extension point)
# --------------------------------------------------------------------------

# 2048 rows / 2 partitions: the sweep cost of this op is ~all Python
# worker spin-up per partition (11.2 s at 8 parts in round 3 —
# op_costs.json); the oracle is a closed-form formula, so ANY N proves
# the connector. 2 partitions still exercises multi-partition planning.
_SYNTH_ROWS = 2048
_SYNTH_PARTS = 2

_OP152_SQL = f"""
SELECT CAST((i * 2654435761) % 10000 // 1000 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM((i * 2654435761) % 10000) AS BIGINT) AS checksum
FROM range(0, {_SYNTH_ROWS}) t(i)
GROUP BY bucket
"""


@register("op152_python_datasource", oracle=_OP152_SQL)
def op152_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector via the Spark 4 Python DataSource API: a
    deterministic synthetic-events source (`partitions()` → one task
    per partition, `read()` → generator rows), registered and consumed
    like any built-in format. This is the engine's extension point for
    the reference's pluggable file readers — a new wire format becomes
    a DataSource class, not a driver-side loop.

    The stream is a Knuth multiplicative hash of the row id, so the
    DuckDB oracle reproduces it from range() exactly. The aggregate
    proves the rows flow through normal Catalyst plans (hash agg with
    partials over the Python scan)."""
    from ocdb_server_spark.sources import pyds

    pyds.register(spark)
    src = (
        spark.read.format("synth_events")
        .option("rows", _SYNTH_ROWS)
        .option("partitions", _SYNTH_PARTS)
        .load()
    )
    return src.groupBy(
        (F.col("hval") / 1000).cast("bigint").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum("hval").alias("checksum"),
    )


# --------------------------------------------------------------------------
# op153: VariantType shredding (Spark 4 semi-structured native type)
# --------------------------------------------------------------------------

_OP153_SQL = """
SELECT CAST(CAST(json_extract(props, '$.k') AS BIGINT) // 25 AS BIGINT) AS k_quartile,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events
GROUP BY k_quartile
"""


@register("op153_variant_shred", oracle=_OP153_SQL)
def op153_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's VARIANT type: parse_json
    ONCE into the binary variant encoding, then typed variant_get
    extraction — the engine-native path for open-schema JSON (vs
    op65's per-path string extract and op150's fixed-schema from_json;
    variant keeps fields the schema didn't anticipate queryable).

    The variant column itself never leaves the plan (binary type would
    trip the gate canonicalizer) — only typed scalars surface."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("v"))
    k = F.expr("cast(variant_get(v, '$.k', 'bigint') as bigint)")
    return (
        v.select(k.alias("k"))
        .groupBy(F.floor(F.col("k") / 25).cast("bigint").alias("k_quartile"))
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )
