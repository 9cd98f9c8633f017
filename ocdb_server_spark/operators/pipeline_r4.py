"""Round-4 pipeline extensions — SURVEY.md §2.18 (op154–op158).

Five more training-data-pipeline operators on the documents table,
each a shape a 100 TB corpus run actually needs: prefix-hash dedup
(the cheap first pass before MinHash), overlapping token chunking
(context-window packing), corpus mix reporting (source shares +
cumulative concentration), greedy per-language token-budget selection
(fill a training budget deterministically), and unicode/control-char
sanitation stats. Same design rules as the rest of the package: pure
DataFrame/Catalyst plans, digests not payloads on every shuffle,
canonicalizer-safe scalar outputs, SQL oracles for all five.

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
            F.bround(F.col("total_chars") / F.col("grand"), 6).alias("char_share"),
            F.bround(F.sum("total_chars").over(w) / F.col("grand"), 6).alias(
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
