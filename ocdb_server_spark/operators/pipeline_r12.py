"""Round-12 pipeline extensions — SURVEY.md §2.21 (op263–op264).

Two operators closing serving-pipeline gaps the existing 262 leave
open (round-11 verdict allowed 0–2 new ops; these are the two a
retrieval + lakehouse user hits first):

- op263: reciprocal-rank-fusion hybrid retrieval — the standard way a
  production search service combines the lexical (BM25, op183) and
  dense (cosine kNN, op80) rankers this engine already ships. RRF
  (Cormack/Clarke/Buettcher 2009, public IR folklore) fuses by RANK,
  not score, so no cross-ranker score calibration is needed — which
  is also what makes it hash-certifiable cross-engine: ranks are
  integers once each leg's ordering is deterministic.
- op264: CDC apply-changes — merge a keyed change feed (upserts +
  deletes, last-writer-wins by sequence) into a base snapshot: the
  MERGE INTO semantics of a lakehouse sink, completing the ACID
  simulation family (op148 SCD2 intervals, op168 snapshot diff,
  op228 MOR position deletes, op255 table log) with the *apply* step
  none of them performs.

Design rules as everywhere else: DataFrame/Catalyst only, no Python
in the hot path, floats cross engines only through the established
disciplines (op263 fuses integer ranks; op264 only COPIES parquet
doubles, never recomputes them).

The reference (`bcdev/ocdb-server`, public knowledge — SURVEY.md §0)
has no analog; these extend the 100 TB-pipeline surface mandated by
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ocdb_server_spark.io import load_embeddings_normed, load_table, query_vector
from ocdb_server_spark.registry import register

# --------------------------------------------------------------------------
# op263: reciprocal-rank-fusion hybrid retrieval (lexical ⊕ dense)
# --------------------------------------------------------------------------
# The lexical leg IS op183's scorer (bm25_scored_docs — same query
# terms, same k1/b, same floor(x·1e6+0.5) int64 quantization that makes
# the per-doc score sum order-free and cross-engine exact); the SQL
# constants build the matching oracle CTEs.
from ocdb_server_spark.functions.cdc import apply_changes, collapse_feed
from ocdb_server_spark.operators.pipeline_r5 import (  # noqa: E402
    BM25_SCORE_CTES,
    bm25_scored_docs,
)

_RRF_K = 60          # the standard RRF damping constant (public IR folklore)
_RRF_DEPTH = 50      # per-leg candidate depth
_RRF_TOPK = 20

_OP263_SQL = f"""
WITH {BM25_SCORE_CTES},
lexs AS (
  SELECT doc_id, CAST(SUM(term_score_u) AS DOUBLE) / 1000000.0 AS score
  FROM scored WHERE doc_id <> 0 GROUP BY doc_id
),
lex AS (
  SELECT doc_id, lex_rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS lex_rank
    FROM lexs
  ) WHERE lex_rank <= {_RRF_DEPTH}
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
z AS (SELECT e.vec_id,
             CAST(unnest(e.embedding) AS DOUBLE) AS x,
             CAST(unnest(q.qe) AS DOUBLE) AS y
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> 0),
sv AS (SELECT vec_id, SUM(x*y) AS dot, SUM(x*x) AS na, SUM(y*y) AS nb
       FROM z GROUP BY vec_id),
den AS (
  SELECT vec_id, dense_rank FROM (
    SELECT vec_id,
           ROW_NUMBER() OVER (
             ORDER BY ROUND(dot / (sqrt(na) * sqrt(nb)), 6) DESC, vec_id
           ) AS dense_rank
    FROM sv
  ) WHERE dense_rank <= {_RRF_DEPTH}
)
SELECT COALESCE(lex.doc_id, den.vec_id) AS doc_id,
       lex.lex_rank,
       den.dense_rank,
       COALESCE(1.0 / ({_RRF_K} + lex.lex_rank), 0)
         + COALESCE(1.0 / ({_RRF_K} + den.dense_rank), 0) AS rrf_score
FROM lex FULL OUTER JOIN den ON lex.doc_id = den.vec_id
ORDER BY rrf_score DESC, doc_id
LIMIT {_RRF_TOPK}
"""


@register(
    "op263_rrf_hybrid_topk",
    oracle=_OP263_SQL,
    deps=(bm25_scored_docs,),
)
def op263_rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking (op183's scorer, same
    terms/quantization) ⊕ dense cosine ranking (op80's scorer, same
    bound-parameter capture of vec_id=0 and the round-6 observable)
    fused by reciprocal rank — rrf = Σ_legs 1/(60 + rank), depth 50
    per leg, top-20 out. Docs in one leg only contribute one term
    (COALESCE 0 for the missing leg); doc 0 (the query's own doc) is
    excluded from both legs.

    Cross-engine float discipline: fusion is over INTEGER ranks, so
    the only floats crossing engines are 1/(60+r) terms added in a
    fixed written order — bit-identical IEEE on both sides. Each
    leg's ordering is deterministic: the BM25 leg ranks the exact
    quantized score (ties→doc_id), the dense leg ranks the round-6
    sim (ties→vec_id) whose full-column cross-engine equality op80
    established in round 9.

    100 TB plan shape: each leg cuts to depth with
    orderBy().limit(DEPTH) — TakeOrderedAndProject, per-partition
    partial top-50 + driver merge, NO global window over the scored
    set — and only then ranks the ≤50 survivors (a window over a
    constant-sized frame). row_number over the top-DEPTH cut equals
    row_number ≤ DEPTH over the whole set because the ordering is
    total (ties broken by id). Upstream each leg is already
    aggregate-sized (BM25: ≤|query-term| rows/doc pruned before the
    tf shuffle, per op183; dense: one row/vec after the dot-product
    agg — at serving scale the dense leg swaps in op95/op180's
    bucketed index with the same (id, rank) contract, which is the
    point of fusing on rank not score). The fusion join is a
    50×50-row full outer — trivial under any join strategy."""
    import math

    # ---- lexical leg: op183's scorer (shared kernel) at depth 50 ----
    # per-doc rows are independent, so excluding the query's own doc
    # after the score agg is equivalent to excluding it before
    lex_scores = bm25_scored_docs(spark, sf_dir).filter(F.col("doc_id") != 0)
    # Cut to depth FIRST (TakeOrderedAndProject: per-partition partial
    # top-50, driver merge — no global single-partition window over the
    # full scored set), then rank the ≤50 survivors; row_number over
    # the top-DEPTH cut ≡ row_number ≤ DEPTH over the whole set because
    # the ordering is total (ties broken by id).
    lex = (
        lex_scores.orderBy(F.col("score").desc(), "doc_id")
        .limit(_RRF_DEPTH)
        .withColumn(
            "lex_rank",
            F.row_number()
            .over(W.orderBy(F.col("score").desc(), "doc_id"))
            .cast("bigint"),
        )
        .select("doc_id", "lex_rank")
    )

    # ---- dense leg: op80's cosine scorer at depth 50 ----
    en = load_embeddings_normed(spark, sf_dir)
    qvec = query_vector(spark, sf_dir, vec_id=0)
    if qvec is None:
        raise ValueError(
            "op263: query vec_id=0 not present in embeddings — the dense "
            "leg's query vector is a bound parameter (op80's contract)"
        )
    qn = 0.0
    for x in qvec:
        qn += x * x
    qn = math.sqrt(qn)
    arr = "array(" + ",".join(f"cast('{v!r}' as double)" for v in qvec) + ")"
    dot = F.expr(
        f"aggregate(zip_with(embedding, {arr},"
        " (x, y) -> cast(x as double) * y),"
        " cast(0.0 as double), (a, b) -> a + b)"
    )
    sim = F.round(dot / (F.col("nrm") * F.lit(qn)), 6)
    den = (
        en.filter(F.col("vec_id") != 0)
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(_RRF_DEPTH)
        .withColumn(
            "dense_rank",
            F.row_number()
            .over(W.orderBy(F.col("sim").desc(), "vec_id"))
            .cast("bigint"),
        )
        .select("vec_id", "dense_rank")
    )

    # ---- fusion: rank-reciprocal sum over a 50×50-row full outer ----
    fused = lex.join(den, lex["doc_id"] == den["vec_id"], "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("dense_rank")), F.lit(0.0)
    )
    return (
        fused.select(
            F.coalesce(lex["doc_id"], den["vec_id"]).alias("doc_id"),
            "lex_rank",
            "dense_rank",
            rrf.alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(_RRF_TOPK)
    )


# --------------------------------------------------------------------------
# op264: CDC apply-changes — MERGE a keyed change feed into a snapshot
# --------------------------------------------------------------------------
# Change-feed derivation from `events` (deterministic, documented):
# event_type 'error' → DELETE the key, anything else → UPSERT the key's
# balance to `value`; sequence order is (ts, event_id). The base
# snapshot is customer c_custkey ≥ 5, a floor chosen so the feed
# exercises ALL merge outcomes at every shipped SF (sf0.001's feed
# only reaches user_id 14): user_id < 5 → INSERT (no base row) or the
# delete-of-nonexistent no-op, ≥ 5 → UPDATE/DELETE, keys beyond the
# feed's reach → base rows passing through unchanged.
_CDC_BASE_MIN_KEY = 5


def cdc_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The op264/op265 change feed, defined ONCE (round-13 review: the
    streaming twin used to re-derive it inline — an edit here would
    have silently diverged the op from the oracle both share): events →
    (key=user_id, seq=(ts, event_id), op 'D' on event_type 'error'
    else 'U', payload balance=value). Reads through load_table so the
    events ts normalization (nanos→micros legacy layouts, UTC pinning)
    applies — a raw parquet read would order sub-µs timestamps
    differently than the µs-truncated oracle."""
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("value").alias("balance"),
    )


def cdc_base_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The op264/op265 base snapshot, defined once: customer keys ≥
    _CDC_BASE_MIN_KEY (floor chosen so ALL merge outcomes occur at
    every shipped SF) as (user_id, balance)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") >= _CDC_BASE_MIN_KEY)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_acctbal").alias("balance"),
        )
    )


_OP264_SQL = f"""
WITH ch AS (
  SELECT user_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         value AS new_balance,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_changes
  FROM events
),
last AS (
  SELECT user_id, op, new_balance, n_changes FROM ch WHERE rn = 1
),
base AS (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_custkey >= {_CDC_BASE_MIN_KEY}
)
SELECT COALESCE(base.c_custkey, last.user_id) AS user_id,
       CASE WHEN last.op = 'U' THEN last.new_balance
            ELSE base.c_acctbal END AS balance,
       CASE WHEN base.c_custkey IS NULL THEN 'inserted'
            WHEN last.user_id IS NULL THEN 'unchanged'
            ELSE 'updated' END AS status,
       CAST(COALESCE(last.n_changes, 0) AS BIGINT) AS n_changes
FROM base FULL OUTER JOIN last ON base.c_custkey = last.user_id
WHERE last.op IS NULL OR last.op <> 'D'
"""


@register(
    "op264_cdc_apply_changes",
    oracle=_OP264_SQL,
    deps=(apply_changes, collapse_feed, cdc_changes_feed, cdc_base_snapshot),
)
def op264_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change feed to a base snapshot — the MERGE INTO /
    APPLY CHANGES semantics of a lakehouse upsert sink, batch-shaped
    (op74 is the streaming foreachBatch twin; op148/op168/op228/op255
    simulate the surrounding table format, this op performs the merge
    itself). Feed: events → (key=user_id, seq=(ts, event_id),
    op='D' for event_type 'error' else 'U', payload=value);
    last-writer-wins per key; a terminal 'D' drops the key (including
    delete-of-nonexistent = no row, the MERGE no-op case); survivors
    carry status inserted/updated/unchanged and the key's change
    count.

    The merge itself is the PUBLIC combinator
    functions/cdc.py:apply_changes (generic over key/seq/op/payload
    columns); this op is its registered instantiation over the
    events→customer feed and the DuckDB-oracle certification of its
    semantics.

    Float discipline: `balance` is only ever COPIED (events.value or
    customer.c_acctbal, both parquet doubles read identically by both
    engines) — never recomputed, so no float arithmetic crosses
    engines at all.

    100 TB plan shape: one key-partitioned window over the feed
    (shuffle carries only (key, seq, op, payload) — at CDC scale the
    feed is a day's changes, orders smaller than the base), collapsing
    it to ≤1 row/key BEFORE the merge join, then ONE full-outer
    sort-merge join against the base on the key. The base is never
    shuffled more than once and never windowed; with a bucketed/
    z-ordered base (op159/op161) the join co-locates and the merge is
    a map-side zip per bucket. AQE broadcasts the collapsed feed when
    a partition's slice is small enough — the classic big-base ×
    small-delta MERGE."""
    changes = cdc_changes_feed(spark, sf_dir)
    base = cdc_base_snapshot(spark, sf_dir)
    return apply_changes(
        base,
        changes,
        key="user_id",
        seq=["ts", "event_id"],
        op_col="op",
        payload=["balance"],
    )
