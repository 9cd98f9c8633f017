"""Round-13 operators (SURVEY.md §2.22).

op265 — STREAMING CDC apply-changes: the round-12 verdict's "Next
round" item 3 (0–2 new-op allowance, candidate 1). op264 proved the
MERGE semantics batch-shaped; op74 streams but only keeps the latest
value. op265 is the production composition: the same change feed
arriving as real micro-batches (Structured Streaming, foreachBatch),
each batch merged into a keyed store with full last-writer-wins /
delete / insert semantics, exactly-once under Spark's batch replay
(op234's atomic-manifest commit), and robust to out-of-order batches
(a per-key applied-seq watermark — functions/cdc.py's incremental
path). Certified end-state-equal to op264's batch twin: the oracle is
op264's own SQL, so the hash gate proves that splitting the feed into
interleaved micro-batches changes NOTHING.

op266 — hybrid retrieval SERVED from the persisted ANN index: the
round-12 verdict's candidate 2. op263 fuses op183's BM25 leg with
op80's exact dense leg; at 100 TB the dense leg is the brute-force
scan a serving deployment replaces with op180's persisted PQ
codebook. op266 is that swap under the same (id, rank) RRF contract —
the query-side plan trains NOTHING (codebook loaded via
functions/ann_index.get_or_build: train-once/serve-many).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark.sql import Window as W

from ocdb_server_spark.functions.cdc import (
    apply_changes_incremental,
    collapse_feed,
    finish_store,
    seed_store,
)
from ocdb_server_spark.io import load_table
from ocdb_server_spark.operators.pipeline_r12 import (
    _OP264_SQL,
    _RRF_DEPTH,
    _RRF_K,
    _RRF_TOPK,
    cdc_base_snapshot,
    cdc_changes_feed,
)
from ocdb_server_spark.operators.pipeline_r5 import (
    _PQ_K,
    bm25_scored_docs,
    pq_topk,
)
from ocdb_server_spark.registry import register
from ocdb_server_spark.streaming.jobs import stream_cdc_apply_changes


@register(
    "op265_stream_cdc_apply_changes",
    oracle=_OP264_SQL,
    deps=(
        stream_cdc_apply_changes,
        apply_changes_incremental,
        collapse_feed,
        seed_store,
        finish_store,
        cdc_changes_feed,
        cdc_base_snapshot,
    ),
)
def op265_stream_cdc_apply_changes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING CDC: op264's apply-changes MERGE driven by a real
    Structured Streaming query — the feed split into 3 parquet files
    with event timestamps deliberately INTERLEAVED across them
    (event_id mod 3), streamed back one file per micro-batch, each
    batch merged exactly-once into a generation-versioned store.

    What each certification layer proves:
    - the DuckDB hash gate (op264's own oracle SQL — the end state
      over the whole feed): micro-batching the feed, in an order that
      puts OLDER changes in LATER batches, produces the byte-identical
      end state the one-shot batch MERGE produces. That is the
      last-writer-wins guarantee a streaming CDC sink must keep and a
      naive per-batch upsert (op74's shape) provably does not: the
      per-key applied-seq watermark in the store is what makes batch
      order irrelevant (functions/cdc.py:apply_changes_incremental).
    - the in-op replay assert (op234's pattern): the last batch is
      re-applied with its own data after the stream drains — the
      manifest marker makes it a no-op, so a retrying driver cannot
      double-apply against the MUTABLE store (worse than op234's
      append-only case: double-applying an append is visible rows,
      double-applying a merge is silently wrong n_changes).
    - tests/test_pipeline_r13.py pins the semantics kernel directly:
      incremental-over-shuffled-splits == one-shot apply_changes, a
      duplicated batch commits nothing, tombstones keep deleted keys'
      watermarks alive for later re-inserts.

    Float discipline: `balance` is only ever COPIED (events.value or
    customer.c_acctbal, parquet doubles round-tripping bit-exact
    through the generation store) — no float arithmetic crosses
    engines.

    100 TB shape: per batch, ONE key-window over the micro-batch
    (tiny — a CDC batch is seconds of changes) and ONE full-outer
    join against the store; the store shuffles once per batch, is
    never windowed, and never rewrites more than one generation.
    Generations + atomic markers are the table-format transaction
    log in miniature (op255's simulation made load-bearing); a real
    deployment swaps the parquet generations for Delta/Iceberg
    commits with the SAME foreachBatch body."""
    return stream_cdc_apply_changes(spark, sf_dir)


# --------------------------------------------------------------------------
# op266: hybrid retrieval served from the persisted ANN index
# --------------------------------------------------------------------------


@register(
    "op266_rrf_hybrid_serving",
    oracle=None,  # ROWS: the dense leg is PQ-approximate by design
    deps=(bm25_scored_docs, pq_topk),
)
def op266_rrf_hybrid_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op263's RRF hybrid retrieval with the dense leg SERVED from
    op180's persisted PQ codebook — the shape a 100 TB deployment
    actually runs (the docstring promise op263 made, kept): the
    lexical leg is unchanged (op183's BM25 scorer, top-50 by exact
    quantized score), the dense leg swaps op80's brute-force cosine
    scan for pq_topk over get_or_build_pq's train-once/serve-many
    artifact. Fusion is IDENTICAL — rrf = Σ 1/(60+rank), depth 50 per
    leg, top-20 out — because RRF fuses integer RANKS, swapping a
    ranker implementation never touches the fusion arithmetic; that
    rank-contract is the whole reason op263 fused on rank, not score.

    Certification is honestly ROWS-only: PQ's ADC scores are
    approximate, so the dense leg's rank order can differ from op80's
    exact order (the golden snapshot pins determinism — codes,
    centroids and tie-breaks are all deterministic given the fixed
    testdata). The semantics gates live in tests/test_pipeline_r13.py:
    the query plan carries ZERO training aggregation (the codebook
    subtree is an artifact scan, op180's test extended to the fused
    plan) and the fused top-20 keeps high overlap with op263's exact
    twin (the PQ leg's recall@10 ≥ 0.9 gate lives with op180).

    100 TB plan shape, per leg: lexical = op183's pruned tf shuffle →
    TakeOrderedAndProject(50); dense = ONE linear ADC pass over
    precomputed codes (broadcast codebook, no shuffle) →
    TakeOrderedAndProject(100) → exact re-rank of 100 → top-50. The
    fusion join is a 50×50-row full outer. No global window ever sees
    a scored set bigger than 50 rows; the ONLY index work in the plan
    is reading the persisted parquet codebook."""
    from ocdb_server_spark.functions.ann_index import get_or_build_pq

    # ---- lexical leg: op183's scorer at depth 50 (op263's leg) ----
    lex = (
        bm25_scored_docs(spark, sf_dir)
        .filter(F.col("doc_id") != 0)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_RRF_DEPTH)
        .withColumn(
            "lex_rank",
            F.row_number()
            .over(W.orderBy(F.col("score").desc(), "doc_id"))
            .cast("bigint"),
        )
        .select("doc_id", "lex_rank")
    )

    # ---- dense leg: persisted-PQ ANN at depth 50 (op180's serving path)
    e = load_table(spark, sf_dir, "embeddings")
    codebook = get_or_build_pq(spark, e, sf_dir, _PQ_K)
    den = (
        pq_topk(e, query_vec_id=0, k=_RRF_DEPTH, codebook=codebook)
        .withColumn(
            "dense_rank",
            F.row_number()
            .over(W.orderBy(F.col("sim").desc(), "vec_id"))
            .cast("bigint"),
        )
        .select("vec_id", "dense_rank")
    )

    # ---- fusion: identical to op263 (integer ranks, fixed-order sum)
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
