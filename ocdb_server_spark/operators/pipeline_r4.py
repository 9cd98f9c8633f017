"""Round-4 pipeline extensions — SURVEY.md §2.18 (op154–op160).

Seven more operators, each a shape a 100 TB run actually needs:
prefix-hash dedup (the cheap first pass before MinHash), overlapping
token chunking (context-window packing), corpus mix reporting (source
shares + cumulative concentration), greedy per-language token-budget
selection (fill a training budget deterministically),
unicode/control-char sanitation stats, a persisted bucketed-table
co-located join (fact⋈fact without its shuffle), and a Zipf
rank-frequency corpus-quality fit. Same design rules as the rest of
the package: pure DataFrame/Catalyst plans, digests not payloads on
every shuffle, canonicalizer-safe scalar outputs, SQL oracles for all
seven.

The reference (`bcdev/ocdb-server`, public knowledge — SURVEY.md §0)
has no analog for these; they extend the 100 TB-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.registry import register


# --------------------------------------------------------------------------
# op154: prefix-hash dedup — the cheap first pass before MinHash
# --------------------------------------------------------------------------

_OP154_SQL = """
WITH p AS (
  SELECT doc_id,
         md5(substr(lower(text), 1, 64)) AS prefix_hash
  FROM documents
  WHERE length(text) >= 64
)
SELECT prefix_hash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
FROM p
GROUP BY prefix_hash
HAVING COUNT(*) > 1
"""


@register("op154_prefix_dedup", oracle=_OP154_SQL)
def op154_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-hash duplicate groups: docs sharing the same first 64
    normalized chars (web corpora are full of boilerplate-prefixed
    near-copies; hashing a fixed prefix catches most of them for the
    price of one md5 — the standard cheap pass BEFORE MinHash/SimHash,
    cf. op79/op88 which handle the rest).

    Scale: the shuffle key is a 32-char digest, never the text; groups
    are tiny (dup clusters), and the keeper choice (min doc_id) is the
    same deterministic rule op75/op141 use."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.length("text") >= 64)
        .select(
            "doc_id",
            F.md5(F.expr("substr(lower(text), 1, 64)")).alias("prefix_hash"),
        )
        .groupBy("prefix_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# --------------------------------------------------------------------------
# op155: overlapping token chunking — context-window packing
# --------------------------------------------------------------------------

_CHUNK, _OVERLAP = 128, 16  # tokens per chunk / overlap with previous
_STRIDE = _CHUNK - _OVERLAP

_OP155_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_tokens,
         unnest(range(0, CAST(GREATEST(CEIL((n_tokens - {_OVERLAP}) / {_STRIDE}.0), 1) AS BIGINT))) AS chunk_idx
  FROM t
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * {_STRIDE} AS BIGINT) AS chunk_start,
       CAST(LEAST(n_tokens - chunk_idx * {_STRIDE}, {_CHUNK}) AS BIGINT) AS chunk_len
FROM c
"""


@register("op155_chunk_overlap", oracle=_OP155_SQL)
def op155_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token chunks per document (128-token
    windows, 16-token overlap — the packing shape context-window
    training uses so no boundary loses context). Emits one row per
    chunk: (doc_id, chunk_idx, chunk_start, chunk_len).

    sequence() builds the chunk index array per row and explode fans
    it out — all codegen'd, no shuffle at all until a consumer
    aggregates; chunk COUNT is derived from the whitespace token count,
    so the text column itself never leaves the scan."""
    d = load_table(spark, sf_dir, "documents")
    nt = F.expr("length(text) - length(replace(text, ' ', '')) + 1")
    n_chunks_sql = (
        f"cast(greatest(ceil((n_tokens - {_OVERLAP}) / {_STRIDE}.0), 1) as bigint)"
    )
    return (
        d.select("doc_id", nt.alias("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            F.explode(F.expr(f"sequence(0, {n_chunks_sql} - 1)")).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            (F.col("chunk_idx") * _STRIDE).cast("bigint").alias("chunk_start"),
            F.expr(
                f"cast(least(n_tokens - chunk_idx * {_STRIDE}, {_CHUNK}) as bigint)"
            ).alias("chunk_len"),
        )
    )


# --------------------------------------------------------------------------
# op156: corpus mix report — source shares + cumulative concentration
# --------------------------------------------------------------------------

_OP156_SQL = """
WITH s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY source
),
tot AS (SELECT SUM(total_chars) AS grand FROM s)
SELECT source, n_docs, total_chars,
       ROUND(total_chars / grand, 6) AS char_share,
       ROUND(SUM(total_chars) OVER (ORDER BY total_chars DESC, source)
             / grand, 6) AS cum_share
FROM s CROSS JOIN tot
"""


@register("op156_domain_mix_report", oracle=_OP156_SQL)
def op156_domain_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix report per source/domain: doc count, char volume,
    volume share, and cumulative share in descending-volume order (the
    "what fraction of the corpus do the top-k domains own" curve that
    drives mix re-weighting decisions).

    Scale: one partial-agg shuffle over the source key; the window
    runs over #sources rows (thousands at worst), not documents —
    a deliberate contrast with op124's per-row Pareto variant."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    grand = s.agg(F.sum("total_chars").alias("grand"))
    w = W.orderBy(F.col("total_chars").desc(), "source").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        s.crossJoin(F.broadcast(grand))
        .select(
            "source",
            "n_docs",
            "total_chars",
            F.round(F.col("total_chars") / F.col("grand"), 6).alias("char_share"),
            F.round(F.sum("total_chars").over(w) / F.col("grand"), 6).alias(
                "cum_share"
            ),
        )
    )


# --------------------------------------------------------------------------
# op157: greedy per-language token-budget selection
# --------------------------------------------------------------------------

# 2k binds at every test scale (per-lang corpus totals are ≥3.5k tokens
# from sf0.001 up), so the selection filter is actually exercised.
_BUDGET = 2_000  # whitespace tokens per language

_OP157_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM r WHERE cum_tokens <= {_BUDGET}
"""


@register("op157_token_budget_pack", oracle=_OP157_SQL)
def op157_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a fixed per-language token budget (2k whitespace tokens)
    by scanning docs in deterministic pseudo-random order (md5 of
    doc_id — unbiased, reproducible, no RNG state) and keeping every
    doc whose running total still fits. The standard "cap each
    language's contribution" step when assembling a multilingual
    training mix (op135 computes the weights; this materializes the
    selection).

    Scale: one shuffle on lang for the running-sum window; the text
    column never moves — token counts are computed at the scan and
    only (doc_id, lang, n_tokens) flows into the window."""
    d = load_table(spark, sf_dir, "documents")
    nt = F.expr("length(text) - length(replace(text, ' ', '')) + 1")
    w = (
        W.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        d.select("doc_id", "lang", nt.cast("bigint").alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .filter(F.col("cum_tokens") <= _BUDGET)
    )


# --------------------------------------------------------------------------
# op158: unicode/control-char sanitation stats
# --------------------------------------------------------------------------

_OP158_SQL = r"""
WITH s AS (
  SELECT lang, text,
         regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f]|\s{2,}', ' ', 'g')
           AS clean
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN clean <> text THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dirty,
       CAST(SUM(length(text) - length(clean)) AS BIGINT) AS chars_removed
FROM s
GROUP BY lang
"""


@register("op158_unicode_sanitize", oracle=_OP158_SQL)
def op158_unicode_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sanitation pass stats: collapse control characters and runs of
    whitespace to a single space (the usual pre-tokenizer scrub),
    reporting per language how many docs were touched and how many
    chars disappeared. The scrub itself is regexp_replace — one
    codegen'd pass per row; only the per-lang counters shuffle.

    The regex is identical RE2-safe syntax in Spark (replaces all
    matches by default) and DuckDB (needs the 'g' flag)."""
    d = load_table(spark, sf_dir, "documents")
    clean = F.regexp_replace(
        F.col("text"), r"[\x00-\x08\x0b\x0c\x0e-\x1f]|\s{2,}", " "
    )
    return (
        d.select("lang", "text", clean.alias("clean"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("clean") != F.col("text"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dirty"),
            F.sum(F.length("text") - F.length("clean"))
            .cast("bigint")
            .alias("chars_removed"),
        )
    )


# --------------------------------------------------------------------------
# op159: bucketed-table co-located join — the 100 TB join layout, for real
# --------------------------------------------------------------------------

_OP159_SQL = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_quantity > 40
GROUP BY o_orderstatus
"""


@register("op159_bucketed_cojoin", oracle=_OP159_SQL)
def op159_bucketed_cojoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketing story other ops cite, made concrete: lineitem and
    orders written ONCE as bucketed+sorted tables (8 buckets on the
    order key — `bucketBy` is Spark's persisted co-partitioning), then
    joined. Both scans report the bucket layout to Catalyst, so the
    sort-merge join needs NO exchange and NO sort on either side —
    `tests/test_plans.py::test_bucketed_join_has_no_exchange` asserts
    exactly that. At 100 TB this is how nightly fact⋈fact joins skip
    their dominant shuffle; the bucket count scales to
    data-size/target-partition-size (8 here for the test corpus).
    Transport-verified round 11 (bucketed_stress --transports,
    BASELINE Round 11e): at 30x data the bucketed SMJ beats the
    shuffle SMJ on BOTH local[16] (−39%) and a real 2-executor netty
    cluster (−20%), results identical — with the caveat that bucket
    count is a task-granularity knob too (small bucket-scan tasks
    pay ~1 ms each in cluster RPC dispatch, so size buckets for
    tens-of-MB files, not hundreds of tiny tasks).

    The aggregate after the join is the oracle-checked observable
    (join output itself is 60k rows of no analytic interest)."""
    import os

    from ocdb_server_spark.scratch import scratch_dir

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    # Per-process scratch root + pid-suffixed table names (r9: the
    # old sf-tagged names isolated concurrent SCALE FACTORS but not
    # concurrent SESSIONS at one sf — one process's pre-write rmtree
    # could delete bucket files another session's scan was reading).
    # ONE scratch_dir call covers both tables: it empties on entry,
    # so per-table calls would wipe the first table while writing the
    # second.
    root = scratch_dir("bucketed", sf_dir)
    pid = os.getpid()
    # Name carries BOTH the sf tag and the pid (round-9 ADVICE): the
    # scratch ROOT is (kind, sf, pid)-keyed but the Spark catalog is
    # per-SESSION — pid-only names let two interleaved sf runs sharing
    # one session DROP/recreate each other's registration mid-flight.
    # The tag goes into a SQL identifier, so strip EVERY non-word char
    # (round-10 review: a basename like "tpch-sf01" would otherwise
    # break the DROP TABLE parse; scratch_path's '.'-only rule is fine
    # for filesystem names, not identifiers).
    import re

    tag = re.sub(r"\W", "_", os.path.basename(sf_dir.rstrip("/")))
    li_name = f"ocdb_li_bucketed_{tag}_{pid}"
    o_name = f"ocdb_o_bucketed_{tag}_{pid}"
    for name, df, key in (
        (li_name, li, "l_orderkey"),
        (o_name, o, "o_orderkey"),
    ):
        # EXTERNAL bucketed tables under the scratch root: the driver
        # harness may hand us its own session whose cwd-relative
        # warehouse dir we must not write into (static conf, can't be
        # redirected at runtime). The test catalog is in-memory (no
        # metastore), so drop any same-name registration from an
        # earlier call in THIS session before writing. A production
        # deployment has a metastore + fixed warehouse and plain
        # mode("overwrite") suffices.
        loc = os.path.join(root, name)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            # repartition on the bucket key with the bucket count (same
            # Murmur3 hash) → exactly one file per bucket, so the read
            # side also gets per-bucket sortedness, not just layout
            df.repartition(8, F.col(key))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", loc)
            .saveAsTable(name)
        )
    lib = spark.table(li_name).filter(F.col("l_quantity") > 40)
    ob = spark.table(o_name)
    return (
        # merge hint: auto-broadcast would otherwise win at TEST scale
        # and hide the co-location; at 100 TB fact⋈fact IS the SMJ path
        lib.hint("merge")
        .join(ob, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.expr(
                "cast(sum(cast(l_quantity as decimal(18,2))) as double)"
            ).alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# op160: Zipf rank-frequency slope per language
# --------------------------------------------------------------------------

_ZIPF_TOP = 100  # fit over the top-100 ranks per language

_OP160_SQL = f"""
WITH w AS (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS word FROM documents
),
f AS (
  SELECT lang, word, COUNT(*) AS freq FROM w WHERE word <> '' GROUP BY lang, word
),
r AS (
  SELECT lang, freq,
         row_number() OVER (PARTITION BY lang ORDER BY freq DESC, word) AS rank
  FROM f
),
m AS (
  SELECT lang,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(ROUND(ln(rank), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(ln(freq), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(ln(rank), 6) AS DECIMAL(18,6))
                  * CAST(ROUND(ln(freq), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(ln(rank), 6) AS DECIMAL(18,6))
                  * CAST(ROUND(ln(rank), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sxx
  FROM r WHERE rank <= {_ZIPF_TOP}
  GROUP BY lang
)
SELECT lang,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       CAST(n AS BIGINT) AS n_ranks
FROM m
"""


@register("op160_zipf_slope", oracle=_OP160_SQL)
def op160_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: least-squares slope of ln(freq) on
    ln(rank) over the top-100 word ranks (natural corpora sit near −1;
    synthetic/spammy text drifts off — a standard corpus-quality
    signal next to op92's per-doc score).

    Determinism discipline (op108's moment method, adapted for logs):
    ln() can differ between libm and the JVM in the last ulp, so each
    log is round(6)-quantized, lifted to DECIMAL(18,6), and the
    moments accumulate as exact decimal sums — order-independent and
    bit-stable on both engines; the slope arithmetic then runs on
    identical doubles. Scale: one shuffle of (lang, word) counts, a
    per-lang top-100 window over word counts (WindowGroupLimit prunes
    the tail before the sort at scale), and a 5-number moment
    aggregate per language."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "lang", F.explode(F.expr("split(lower(text), ' ')")).alias("word")
    ).filter(F.col("word") != "")
    f = w.groupBy("lang", "word").agg(F.count("*").alias("freq"))
    r = (
        f.withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("lang").orderBy(F.col("freq").desc(), "word")
            ),
        )
        .filter(F.col("rank") <= _ZIPF_TOP)
        .selectExpr(
            "lang",
            "cast(round(ln(rank), 6) as decimal(18,6)) AS lx",
            "cast(round(ln(freq), 6) as decimal(18,6)) AS ly",
        )
    )
    m = r.groupBy("lang").agg(
        F.expr("cast(count(*) as double)").alias("n"),
        F.expr("cast(sum(lx) as double)").alias("sx"),
        F.expr("cast(sum(ly) as double)").alias("sy"),
        F.expr("cast(sum(lx * ly) as double)").alias("sxy"),
        F.expr("cast(sum(lx * lx) as double)").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "lang",
        F.round(slope, 6).alias("zipf_slope"),
        F.col("n").cast("bigint").alias("n_ranks"),
    )
