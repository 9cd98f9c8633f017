"""Round-4 pipeline extensions, batch 2 — SURVEY.md §2.19 (op161–op177).

Seventeen more operators, each a shape a 100 TB deployment needs and
the earlier inventory does not cover:

- physical-layout tooling: Z-order clustering stats (op161), an
  equi-depth histogram (op163), a salt-neutralized skewed join
  (op167), dynamic partition pruning (op172);
- data-quality / drift: PSI distribution drift between sources
  (op162), per-doc token entropy (op165), corpus unigram
  log-probability scoring — the perplexity-filter shape (op169),
  burst/bot detection over sliding time frames (op170),
  referential-integrity audit (op173);
- incremental processing: snapshot diff / CDC classification (op168),
  algebraic rollup merge (op171);
- mergeable sketches: HyperLogLog sketch → union rollup (op166);
- training export: weighted reservoir sampling (op174), PMI
  collocations (op175), deterministic train/val/test split (op176);
- query surface: LATERAL correlated top-k (op177).

Design rules as everywhere else in the package: DataFrame/Catalyst
plans only, no Python in any hot path, every cross-engine float
reduced through the round-then-exact-decimal discipline (op108/op160's
trick) so hashes are bit-stable vs DuckDB, and shuffles carry keys +
counters — never document text.

The reference (`bcdev/ocdb-server`, public knowledge — SURVEY.md §0)
has no analog for these; they extend the 100 TB-pipeline surface
mandated by BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.operators._helpers import sql_isum, isum
from ocdb_server_spark.registry import register


# --------------------------------------------------------------------------
# op161: Z-order (Morton) clustering stats — data-skipping layout audit
# --------------------------------------------------------------------------

_ZBITS = 8  # bits per dimension -> 16-bit z-value, 64 blocks of 1024


def _morton(spark_side: bool, x: str, y: str) -> str:
    """Bit-interleave two 8-bit ints into a 16-bit Morton code.

    Emitted as one big arithmetic expression (disjoint bits summed, no
    OR needed) in each engine's shift syntax: Spark `shiftleft/
    shiftright` functions, DuckDB `<<`/`>>` operators. Pure integer
    math — bit-identical across engines by construction.
    """
    terms = []
    for i in range(_ZBITS):
        if spark_side:
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_OP161_SQL = f"""
WITH b AS (
  SELECT CAST(l_partkey % 256 AS BIGINT) AS x,
         CAST(l_suppkey % 256 AS BIGINT) AS y
  FROM lineitem
),
z AS (SELECT x, y, {_morton(False, "x", "y")} AS zval FROM b)
SELECT CAST(zval >> 10 AS BIGINT) AS z_block,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
       CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y,
       CAST((MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS BIGINT) AS bbox_area
FROM z GROUP BY 1
"""


@register("op161_zorder_layout", oracle=_OP161_SQL)
def op161_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit: interleave two bucketized key columns
    into a 16-bit Morton code, group rows into 64 z-ranges, and report
    each range's per-dimension min/max bounding box. Writing a table
    sorted by zval is THE multi-column data-skipping layout (Delta
    OPTIMIZE ZORDER, Hudi clustering); the bbox_area column is exactly
    the file-level min/max tightness a scan planner would prune on —
    z-blocks cover ~1/64 of the (x,y) plane instead of all of it.

    Scale: the Morton code is one codegen'd integer expression at the
    scan; only (z_block, counters) shuffle. At 100 TB the same
    expression becomes the sort key of a write job; the audit here is
    the cheap way to validate the layout before paying for the sort."""
    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        F.expr("cast(l_partkey % 256 as bigint)").alias("x"),
        F.expr("cast(l_suppkey % 256 as bigint)").alias("y"),
    ).withColumn("zval", F.expr(_morton(True, "x", "y")))
    return (
        z.groupBy(F.expr("cast(shiftright(zval, 10) as bigint)").alias("z_block"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.min("y").cast("bigint").alias("min_y"),
            F.max("y").cast("bigint").alias("max_y"),
        )
        .withColumn(
            "bbox_area",
            (
                (F.col("max_x") - F.col("min_x") + 1)
                * (F.col("max_y") - F.col("min_y") + 1)
            ).cast("bigint"),
        )
    )


# --------------------------------------------------------------------------
# op162: PSI distribution drift — each source vs the whole corpus
# --------------------------------------------------------------------------

_PSI_BINS = 12  # n_chars bins of width 50, last bin open-ended


_OP162_SQL = f"""
WITH d AS (
  SELECT source,
         CAST(LEAST(FLOOR(n_chars / 50.0), {_PSI_BINS - 1}) AS BIGINT) AS bin
  FROM documents
),
sb AS (SELECT source, bin, COUNT(*) AS cnt FROM d GROUP BY 1, 2),
srcs AS (SELECT source, SUM(cnt) AS n_s FROM sb GROUP BY 1),
bins AS (SELECT unnest(range(0, {_PSI_BINS})) AS bin),
gb AS (SELECT bin, COUNT(*) AS g_cnt FROM d GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_tot FROM d),
grid AS (
  SELECT s.source, s.n_s, b.bin,
         COALESCE(sb.cnt, 0) AS cnt,
         COALESCE(gb.g_cnt, 0) AS g_cnt,
         t.n_tot
  FROM srcs s CROSS JOIN bins b
  LEFT JOIN sb ON sb.source = s.source AND sb.bin = b.bin
  LEFT JOIN gb ON gb.bin = b.bin
  CROSS JOIN tot t
),
terms AS (
  SELECT source, n_s,
         CAST(FLOOR(
           ((cnt + 0.5) / (n_s + {_PSI_BINS / 2.0})
            - (g_cnt + 0.5) / (n_tot + {_PSI_BINS / 2.0}))
           * LN(((cnt + 0.5) / (n_s + {_PSI_BINS / 2.0}))
                / ((g_cnt + 0.5) / (n_tot + {_PSI_BINS / 2.0})))
           * 1000000000.0 + 0.5)
         AS BIGINT) AS term
  FROM grid
)
SELECT source,
       CAST(MAX(n_s) AS BIGINT) AS n_docs,
       CAST(SUM(term) AS DOUBLE) / 1000000000.0 AS psi
FROM terms GROUP BY source
"""


@register("op162_drift_psi", oracle=_OP162_SQL)
def op162_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's doc-length
    distribution against the whole corpus — the standard drift score
    data-quality monitors alarm on (PSI > 0.2 = significant shift).
    Laplace-smoothed (½ doc per bin) so empty bins are defined; the
    full source×bin grid is materialized so missing bins contribute
    their term instead of silently dropping.

    Cross-engine determinism: per-bin PSI terms are IEEE doubles
    (identical op sequence both engines), quantized floor(x·1e9+0.5)
    into int64 BEFORE the sum so the reduction is exact and
    order-independent (see the term comment below for why
    round-to-decimal is NOT stable). Scale: one shuffle over
    (source,bin) digests; the grid is #sources × 12 rows —
    driver-trivial; the global histogram (12 rows) broadcasts."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.expr(
            f"cast(least(floor(n_chars / 50.0D), {_PSI_BINS - 1}) as bigint)"
        ).alias("bin"),
    )
    sb = d.groupBy("source", "bin").agg(F.count("*").alias("cnt"))
    srcs = sb.groupBy("source").agg(F.sum("cnt").alias("n_s"))
    bins = spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
    gb = d.groupBy("bin").agg(F.count("*").alias("g_cnt"))
    tot = d.agg(F.count("*").alias("n_tot"))
    grid = (
        srcs.crossJoin(F.broadcast(bins))
        .join(sb, ["source", "bin"], "left")
        .join(F.broadcast(gb), ["bin"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_s",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.coalesce("g_cnt", F.lit(0)).alias("g_cnt"),
            "n_tot",
        )
    )
    half = f"{_PSI_BINS / 2.0}D"
    # Quantize each term with floor(x*1e9 + 0.5) -> BIGINT: every step
    # is a single IEEE double op (identical in both engines — Spark's
    # round() goes through BigDecimal while DuckDB's re-rounds in
    # double, so round-to-decimal is NOT cross-engine stable; this is).
    # PSI terms are >= 0, so floor(+0.5) is plain half-up.  The D
    # suffixes matter: Spark parses bare `0.5` in SQL text as
    # DECIMAL(1,1) (and then runs the whole chain in low-scale decimal
    # arithmetic), while DuckDB's `/` always yields DOUBLE — `0.5D`
    # forces the identical all-double evaluation.
    term = F.expr(
        f"cast(floor(((cnt + 0.5D) / (n_s + {half}) - (g_cnt + 0.5D) / (n_tot + {half}))"
        f" * ln(((cnt + 0.5D) / (n_s + {half}))"
        f" / ((g_cnt + 0.5D) / (n_tot + {half}))) * 1000000000.0D + 0.5D) as bigint)"
    )
    return (
        grid.withColumn("term", term)
        .groupBy("source")
        .agg(
            F.max("n_s").cast("bigint").alias("n_docs"),
            (F.sum("term").cast("double") / 1_000_000_000.0).alias("psi"),
        )
    )


# --------------------------------------------------------------------------
# op163: equi-depth histogram — exact NTILE variant
# --------------------------------------------------------------------------

_NTILES = 16

_OP163_SQL = f"""
WITH t AS (
  SELECT l_extendedprice,
         ntile({_NTILES}) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS bucket
  FROM lineitem
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(l_extendedprice) AS lo,
       MAX(l_extendedprice) AS hi,
       {sql_isum("l_extendedprice")} AS sum_price
FROM t GROUP BY bucket
"""


@register("op163_equidepth_histogram", oracle=_OP163_SQL)
def op163_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth histogram: NTILE(16) over extended price (with
    a unique tiebreak so bucket assignment is deterministic), then
    per-bucket count / bounds / exact fixed-point sum. Equi-depth
    bounds are what a range-partitioner or an optimizer's selectivity
    estimator wants — equal row mass per bucket, unlike op110's fixed-
    width bins.

    Scale caveat, by design: exact global NTILE is a total sort into
    ONE window partition — correct at test scale, and the honest
    yardstick for its approximate twin op107 (approx_percentile), which
    is the 100 TB path (sketch-merge boundaries, no global sort). The
    pairing mirrors op26-exact / op107-approx."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    return (
        li.select("l_extendedprice", "l_orderkey", "l_linenumber")
        .withColumn("bucket", F.ntile(_NTILES).over(w).cast("bigint"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
            isum("l_extendedprice").alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# op164: time-weighted average — irregular time series done right
# --------------------------------------------------------------------------

_OP164_SQL = """
WITH e AS (
  SELECT user_id, value, epoch_us(ts) AS ep,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS ep_next
  FROM events
),
iv AS (
  SELECT user_id,
         ep_next - ep AS dt_us,
         CAST(FLOOR(value * 1000.0 + 0.5) AS BIGINT) * (ep_next - ep) AS w
  FROM e WHERE ep_next IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dt_us) // 1000000 AS BIGINT) AS covered_sec,
       CAST(SUM(w) AS DOUBLE) / (SUM(dt_us) * 1000) AS twa_value
FROM iv GROUP BY user_id HAVING SUM(dt_us) > 0
"""


@register("op164_time_weighted_avg", oracle=_OP164_SQL)
def op164_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of a sampled metric per user: each
    observation holds until the next one, so its weight is the µs gap
    to the successor (last observation carries no weight). The correct
    mean for irregularly-sampled series — a plain AVG over-counts busy
    periods; this is the standard fix (cf. op123's EWMA, which decays
    instead of holding).

    Determinism: weights are DECIMAL(18,6) × BIGINT µs products summed
    exactly; the single divide at the end is one IEEE op. Scale: one
    shuffle on user_id shared by the lead() window and the aggregate —
    the 'shuffle once by entity' shape (op121)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    iv = (
        e.select(
            "user_id",
            "value",
            F.unix_micros("ts").alias("ep"),
            F.lead(F.unix_micros("ts")).over(w).alias("ep_next"),
        )
        .filter(F.col("ep_next").isNotNull())
        .select(
            "user_id",
            (F.col("ep_next") - F.col("ep")).alias("dt_us"),
            # Fixed-point milli-value × µs gap, all in int64 (exact,
            # order-free; floor(x*1000+0.5) is IEEE-deterministic in
            # both engines, unlike round-to-decimal).  Overflow bound:
            # per-user Σdt_us telescopes to the stream's time span
            # (~2.6e12 µs) × max milli-value ~1e5 → ~2.6e17 ≪ 2^63.
            (
                F.expr("cast(floor(value * 1000.0D + 0.5D) as bigint)")
                * (F.col("ep_next") - F.col("ep"))
            ).alias("w"),
        )
    )
    return (
        iv.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            # Integer div on both sides (double-cast would round in
            # DuckDB but truncate in Spark — off-by-one at .5+).
            F.expr("cast(sum(dt_us) div 1000000 as bigint)").alias("covered_sec"),
            # One IEEE divide of two exact int64 sums — deterministic.
            (F.sum("w").cast("double") / (F.sum("dt_us") * 1000)).alias("twa_value"),
            F.sum("dt_us").alias("_dt"),
        )
        .filter(F.col("_dt") > 0)
        .drop("_dt")
    )


# --------------------------------------------------------------------------
# op165: per-document token entropy — repetition quality signal
# --------------------------------------------------------------------------

_OP165_SQL = """
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
n AS (
  SELECT doc_id, tok, c, SUM(c) OVER (PARTITION BY doc_id) AS n FROM c
),
terms AS (
  SELECT doc_id, n,
         CAST(FLOOR(-(c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE))
                    * 1000000000.0 + 0.5) AS BIGINT) AS term
  FROM n
)
SELECT doc_id,
       CAST(MAX(n) AS BIGINT) AS n_tokens,
       CAST(SUM(term) AS DOUBLE) / 1000000000.0 AS entropy_bits
FROM terms GROUP BY doc_id
"""


@register("op165_token_entropy", oracle=_OP165_SQL)
def op165_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each document's word distribution —
    the information-density quality signal: boilerplate and template
    spam score low, natural prose scores high. Complements op118's
    distinct/total ratio with a frequency-weighted measure (a doc
    repeating one word 90% of the time but with many singletons looks
    fine to op118, not to entropy).

    Per-term -p·log2(p) values are quantized to DECIMAL(20,9) before
    summing (exact, order-free). Scale: tokens explode only as
    (doc_id, token-digest…) — wait, tokens themselves shuffle here;
    at 100 TB hash the token first (xxhash64) as op120 does. The
    per-doc token-count window and final agg share one doc_id
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    c = t.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    n = c.withColumn("n", F.sum("c").over(W.partitionBy("doc_id")))
    # floor(x*1e9 + 0.5) -> BIGINT quantization (see op162: IEEE-
    # deterministic in both engines, unlike round-to-decimal); terms
    # -p*log2(p) are >= 0 so floor(+0.5) is plain half-up.
    term = F.expr(
        "cast(floor(-(c / cast(n as double)) * log2(c / cast(n as double))"
        " * 1000000000.0D + 0.5D) as bigint)"
    )
    return (
        n.withColumn("term", term)
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("bigint").alias("n_tokens"),
            (F.sum("term").cast("double") / 1_000_000_000.0).alias("entropy_bits"),
        )
    )


# --------------------------------------------------------------------------
# op166: HyperLogLog sketch rollup — mergeable cardinality at every level
# --------------------------------------------------------------------------


@register("op166_hll_sketch_rollup", oracle=None)  # approx by design -> ROWS
def op166_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user cardinality per event_type AND overall from ONE
    pass over the data: build a Datasketches HLL sketch per type
    (hll_sketch_agg), then hll_union_agg merges the five binary
    sketches into the global estimate — no second scan, no exact
    count-distinct shuffle of raw user_ids.

    THE 100 TB rollup pattern: sketches are tiny (≈2^12 buckets),
    associative, and mergeable, so any hierarchy level re-aggregates
    from stored sketches instead of raw data (contrast op19 exact /
    op20 approx_count_distinct, which both re-scan). Approximate by
    design → ROWS-only check; tests/test_pipeline_r4b.py asserts each
    estimate within 5% of the exact count."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    typed = per_type.select(
        F.lit("event_type").alias("level"),
        F.col("event_type").alias("key"),
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"),
    )
    overall = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("all").alias("level"),
        F.lit("*").alias("key"),
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"),
    )
    return typed.unionAll(overall)


# --------------------------------------------------------------------------
# op167: salted skewed join — same answer, no hot partition
# --------------------------------------------------------------------------

_SALT = 8

_OP167_SQL = f"""
SELECT c.c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_isum("o.o_totalprice")} AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


@register("op167_salted_join", oracle=_OP167_SQL)
def op167_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-neutralized fact⋈dim join: each orders row picks a
    deterministic salt in [0,8); the customer side is exploded 8× (one
    replica per salt); the join key becomes (custkey, salt), so a hot
    customer's rows spread across 8 reducers instead of one. The
    oracle is the PLAIN join — proving salting changes the physical
    distribution and nothing else.

    When to use at 100 TB: the dim is too big to broadcast and one key
    owns a large share of the fact (AQE's skew-join split handles sort-
    merge skew, but not a skewed SHUFFLED hash join or pre-Spark-3
    engines; explicit salting always works). Cost: dim×8 replication —
    cheap when |dim| ≪ |fact|, which is the skew regime anyway.
    Cf. op112, which salts a global aggregation instead."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(_SALT)).cast("int")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.explode(F.expr(f"sequence(0, {_SALT - 1})")).alias("salt"),
        )
        .withColumn("salt", F.col("salt").cast("int"))
    )
    # shuffle_hash hint: at test scale Catalyst would broadcast the
    # 8×-replicated dim, which is the case where you would NOT salt at
    # all — the hint pins the shuffled-join physical shape the pattern
    # exists for (dim too big to broadcast), like op41's hint demo.
    return (
        o.join(c.hint("shuffle_hash"), (o.o_custkey == c.c_custkey) & (o.salt == c.salt))
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            isum("o_totalprice").alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# op168: snapshot diff — CDC classification between two as-of states
# --------------------------------------------------------------------------

_T1 = "2024-01-15 00:00:00"

_OP168_SQL = f"""
WITH r1 AS (
  SELECT user_id, value, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rn
  FROM events WHERE ts < TIMESTAMP '{_T1}'
),
s1 AS (SELECT user_id, value AS old_value, event_type AS old_type
       FROM r1 WHERE rn = 1),
r2 AS (
  SELECT user_id, value, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rn
  FROM events
),
s2 AS (SELECT user_id, value AS new_value, event_type AS new_type
       FROM r2 WHERE rn = 1)
SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
       CASE WHEN s1.user_id IS NULL THEN 'added'
            WHEN s2.user_id IS NULL THEN 'removed'
            WHEN s1.old_value = s2.new_value AND s1.old_type = s2.new_type
              THEN 'unchanged'
            ELSE 'changed' END AS status,
       s1.old_value, s2.new_value
FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
"""


@register("op168_snapshot_diff", oracle=_OP168_SQL)
def op168_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff: latest state per user as of T1 vs
    latest state now, FULL OUTER joined on the entity key and
    classified added / removed / changed / unchanged. The core of
    every incremental pipeline (Delta MERGE, SCD maintenance — op148
    builds the intervals; this computes the delta that feeds them).

    Scale: both snapshots reduce to one row per entity BEFORE the
    join (row_number top-1 per key — WindowGroupLimit pushes the
    filter into the sort), so the join is entity-sized, not
    event-sized; both sides share the user_id partitioning."""
    e = load_table(spark, sf_dir, "events")

    def snapshot(df: DataFrame, val: str, typ: str) -> DataFrame:
        w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("value").alias(val), F.col("event_type").alias(typ))
        )

    s1 = snapshot(e.filter(F.col("ts") < F.lit(_T1).cast("timestamp")), "old_value", "old_type")
    s2 = snapshot(e, "new_value", "new_type")
    j = s1.join(s2, ["user_id"], "full_outer")
    status = (
        F.when(F.col("old_type").isNull(), F.lit("added"))
        .when(F.col("new_type").isNull(), F.lit("removed"))
        .when(
            (F.col("old_value") == F.col("new_value"))
            & (F.col("old_type") == F.col("new_type")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select("user_id", status.alias("status"), "old_value", "new_value")


# --------------------------------------------------------------------------
# op169: corpus unigram log-probability — the perplexity-filter shape
# --------------------------------------------------------------------------

_OP169_SQL = """
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
freq AS (SELECT tok, COUNT(*) AS tf FROM t GROUP BY tok),
tot AS (SELECT SUM(tf) AS big_t FROM freq),
scored AS (
  SELECT t.doc_id,
         CAST(FLOOR(LN(CAST(big_t AS DOUBLE) / tf) * 1000000.0 + 0.5) AS BIGINT)
           AS nlp
  FROM t JOIN freq ON t.tok = freq.tok CROSS JOIN tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(nlp) AS DOUBLE) / (COUNT(*) * 1000000) AS avg_neglogp
FROM scored GROUP BY doc_id
"""


@register("op169_unigram_logprob", oracle=_OP169_SQL)
def op169_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document by its mean negative log-probability under
    the corpus's own unigram model — the cheap end of the perplexity-
    filter family (CCNet/Gopher filter on LM perplexity; a unigram
    model is the shuffle-free approximation): low avg_neglogp =
    common-word soup, high = rare-token noise; both tails get cut.

    Two passes over tokens, but the model itself (vocab × count) is
    small and BROADCAST into the scoring join, so the per-token join
    is map-side — no shuffle of the exploded corpus. Per-token
    -ln p quantized to DECIMAL(18,6), summed exactly, one divide at
    the end (op108 discipline)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = t.groupBy("tok").agg(F.count("*").alias("tf"))
    tot = freq.agg(F.sum("tf").alias("big_t"))
    # Micro-nat fixed point via floor(x*1e6 + 0.5) (see op162 — cross-
    # engine-stable, ln(T/tf) >= 0); exact int64 sums, one final divide.
    model = freq.crossJoin(F.broadcast(tot)).withColumn(
        "nlp",
        F.expr("cast(floor(ln(cast(big_t as double) / tf) * 1000000.0D + 0.5D) as bigint)"),
    )
    return (
        t.join(F.broadcast(model.select("tok", "nlp")), ["tok"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            (F.sum("nlp").cast("double") / (F.count("*") * 1_000_000)).alias(
                "avg_neglogp"
            ),
        )
    )


# --------------------------------------------------------------------------
# op170: burst detection — bot/abuse hygiene over a sliding time frame
# --------------------------------------------------------------------------

_BURST_WINDOW_SEC = 21_600  # 6 h trailing
_BURST_K = 3  # >= K events in the window flags a burst

_OP170_SQL = f"""
WITH w AS (
  SELECT user_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                        RANGE BETWEEN {_BURST_WINDOW_SEC * 1_000_000} PRECEDING
                        AND CURRENT ROW) AS burst
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(burst) AS BIGINT) AS max_burst,
       CAST(COUNT(*) FILTER (burst >= {_BURST_K}) AS BIGINT) AS n_burst_events
FROM w GROUP BY user_id
HAVING MAX(burst) >= {_BURST_K}
"""


@register("op170_burst_detect", oracle=_OP170_SQL)
def op170_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst/bot detection: for every event, count the user's events
    in the trailing 6 h (a RANGE frame over µs epoch — tie-safe by
    definition: equal timestamps land in the same frame regardless of
    sort order), then surface users whose peak burst reaches 3+. The
    rate-limit shape corpus hygiene uses to drop scripted traffic
    before training-data export (cf. op117 PII, op158 sanitize — this
    is the behavioral filter).

    Scale: one shuffle on user_id shared by the window and the
    aggregate; the frame holds only in-window row counts (Spark's
    range frame keeps a running bound, not the payload)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_BURST_WINDOW_SEC * 1_000_000, 0)
    )
    return (
        e.select("user_id", F.count("*").over(w).alias("burst"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.max("burst").cast("bigint").alias("max_burst"),
            F.sum(F.when(F.col("burst") >= _BURST_K, 1).otherwise(0))
            .cast("bigint")
            .alias("n_burst_events"),
        )
        .filter(F.col("max_burst") >= _BURST_K)
    )


# --------------------------------------------------------------------------
# op171: algebraic rollup merge — re-aggregate from partials, not raws
# --------------------------------------------------------------------------

_OP171_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         COUNT(*) AS cnt,
         SUM(CAST(FLOOR(value * 1000.0 + 0.5) AS BIGINT)) AS sum_mv,
         MIN(value) AS min_v, MAX(value) AS max_v
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(cnt) AS BIGINT) AS n_events,
       CAST(SUM(sum_mv) AS DOUBLE) / (1000 * SUM(cnt)) AS avg_value,
       MIN(min_v) AS min_value, MAX(max_v) AS max_value
FROM daily GROUP BY user_id
"""


@register("op171_rollup_merge", oracle=_OP171_SQL)
def op171_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level algebraic re-aggregation: daily per-user partials
    (count / scaled-int sum / min / max) merged into per-user totals
    using ONLY the partials — sum-of-sums, min-of-mins, count-of-
    counts, avg recomputed from merged sum and count. The discipline
    that makes incremental 100 TB pipelines possible: store daily
    partials once, answer weekly/monthly/all-time from them, never
    re-scan raw events (op166 is the sketch flavor; this is the exact
    algebraic flavor — note AVG itself is NOT mergeable, which is why
    the partial carries sum+count instead).

    Scale: both levels are hash aggs with map-side partials; level 2's
    input is |users × days| rows, already tiny relative to events."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(F.expr("cast(floor(value * 1000.0D + 0.5D) as bigint)")).alias("sum_mv"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    return daily.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("cnt").cast("bigint").alias("n_events"),
        (F.sum("sum_mv").cast("double") / (F.sum("cnt") * 1000)).alias("avg_value"),
        F.min("min_v").alias("min_value"),
        F.max("max_v").alias("max_value"),
    )


# --------------------------------------------------------------------------
# op172: dynamic partition pruning — runtime skip of whole partitions
# --------------------------------------------------------------------------

_OP172_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events WHERE event_type IN ('signup', 'purchase')
GROUP BY event_type
"""


@register("op172_dpp_join", oracle=_OP172_SQL)
def op172_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: events persisted partitioned by
    event_type (the conversion-funnel layout), then joined to a tiny
    conversion-dimension whose FILTER is only known at plan time on
    the dim side — Catalyst turns the dim's filtered keys into a
    runtime subquery on the fact's PartitionFilters
    (dynamicpruningexpression, asserted in tests/test_plans.py), so
    non-conversion partitions are never even listed. op147 proves
    static pruning from a literal predicate; this proves the join-
    driven flavor a star schema needs at 100 TB (filter the date dim,
    scan 7 of 3650 day partitions of the fact).

    The write is part of the operator's semantics (op05/op106/op147
    pattern); per-process scratch (r9: migrated off the shared
    sf-tagged dirs — the overwrite-vs-lazy-read cross-session race;
    ONE scratch root holds both the fact and dim sides, which also
    keeps the old different-SF isolation)."""
    import os as _os

    from ocdb_server_spark.scratch import scratch_dir

    root = scratch_dir("dpp", sf_dir)
    out = _os.path.join(root, "fact")
    e = load_table(spark, sf_dir, "events")
    (
        e.select("event_id", "user_id", "value", "event_type")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    fact = spark.read.parquet(out)
    # Two subtleties make the pruning subquery actually appear:
    # 1. the dim must be a REAL scan, not a LocalRelation — Catalyst
    #    constant-folds a filtered in-memory relation and DPP's
    #    heuristic then sees no Filter node;
    # 2. the dim predicate must be "likely selective" per Catalyst's
    #    isLikelySelective (a binary comparison / IN / LIKE …) — a
    #    bare boolean attribute does NOT qualify (and `flag = true`
    #    gets boolean-simplified back to the bare attribute), hence a
    #    string category filter. Both match how a real date dim is
    #    filtered in a lake anyway.
    dim_path = _os.path.join(root, "dim")
    spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("error", "ops"),
         ("signup", "conversion"), ("purchase", "conversion")],
        "etype string, category string",
    ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)
    return (
        fact.join(
            F.broadcast(dim.filter(F.col("category") == "conversion")),
            fact.event_type == F.col("etype"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )


# --------------------------------------------------------------------------
# op173: referential-integrity audit — anti-join orphan counts
# --------------------------------------------------------------------------

_OP173_SQL = """
SELECT 'lineitem_without_order' AS violation,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'order_without_customer' AS violation,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'lineitem_without_part' AS violation,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l ANTI JOIN part p ON l.l_partkey = p.p_partkey
"""


@register("op173_ri_audit", oracle=_OP173_SQL)
def op173_ri_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: count
    orphaned fact rows (lineitems without an order / orders without a
    customer / lineitems without a part) via LEFT ANTI joins — the
    data-quality gate every warehouse load runs before publishing a
    snapshot (op12 covers null semantics; this covers cross-table
    consistency). Expected all-zeros on the synthetic data — the
    audit's value is the plan, and zero IS the assertion.

    Scale: each anti join broadcasts nothing here by hint-freedom —
    Catalyst picks broadcast for the key-only dim projections
    (orders/customer/part key columns prune to single-column scans);
    counts are map-side-partial aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")

    def orphans(fact, dim, cond, name):
        return fact.join(dim, cond, "left_anti").agg(
            F.lit(name).alias("violation"),
            F.count("*").cast("bigint").alias("n_rows"),
        )

    return (
        orphans(li, o, li.l_orderkey == o.o_orderkey, "lineitem_without_order")
        .unionAll(orphans(o, c, o.o_custkey == c.c_custkey, "order_without_customer"))
        .unionAll(orphans(li, p, li.l_partkey == p.p_partkey, "lineitem_without_part"))
    )


# --------------------------------------------------------------------------
# op174: weighted reservoir sample — Efraimidis–Spirakis, deterministic
# --------------------------------------------------------------------------

_RES_K = 50
# Knuth multiplicative hash -> uniform in (0,1): pure int64 arithmetic,
# portable to any engine (same constant sources/pyds.py uses).
_KNUTH = 2654435761
_U32 = 4294967296


def _mulmod32(col: str, mult: int, int_div: str) -> str:
    """(col · mult) mod 2³² with every int64 intermediate < 2⁴⁹ —
    overflow-free under Spark 4's default ANSI mode (and in DuckDB)
    for ANY non-negative int64 col. The naive ``col * mult`` raises
    at runtime once col exceeds ~2⁶³/mult ≈ 4.1e9 — i.e. exactly the
    100 TB-corpus doc_ids these ops are written for (round-4 advice).
    Identity: with a = col mod 2³² = hi·2¹⁶ + lo,
    a·m ≡ lo·m + ((hi·m mod 2³²)·2¹⁶)  (mod 2³²); bounds
    lo·m, hi·m < 2¹⁶·2³² = 2⁴⁸. Bit-identical to the naive product
    wherever that product doesn't overflow, so existing oracle hashes
    are unchanged. int_div: the engine's integer-division operator
    ('div' in Spark SQL, '//' in DuckDB)."""
    a = f"(({col}) % {_U32})"
    lo = f"({a} % 65536)"
    hi = f"({a} {int_div} 65536)"
    return (
        f"((({lo} * {mult}) % {_U32}"
        f" + ((({hi} * {mult}) % {_U32}) * 65536) % {_U32}) % {_U32})"
    )


_OP174_SQL = f"""
WITH u AS (
  SELECT doc_id, lang, n_chars,
         ({_mulmod32('doc_id', _KNUTH, '//')} + 1.0) / {_U32 + 1}.0 AS u
  FROM documents
),
k AS (
  SELECT doc_id, lang, n_chars,
         -LN(u) / n_chars AS key
  FROM u WHERE n_chars > 0
),
r AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
         ROW_NUMBER() OVER (ORDER BY key, doc_id) AS rn
  FROM k
)
SELECT doc_id, lang, weight, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= {_RES_K}
"""


@register("op174_weighted_sample", oracle=_OP174_SQL)
def op174_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): each doc draws a deterministic uniform u from a Knuth
    multiplicative hash of its id and gets key = -ln(u)/weight; the k
    smallest keys ARE a weighted sample without replacement. The
    standard way to sample a training subset proportional to length /
    quality weights reproducibly — no RNG state, same sample on every
    run and every cluster size (op99/op136 are the unweighted
    stratified/hash siblings).

    Scale: keys are computed at the scan; the global top-k is
    TakeOrderedAndProject-shaped via row_number (k rows per partition
    feed the final sort — never a full global sort of the corpus).
    All arithmetic is int64 + two IEEE double ops (ln, divide) —
    cross-engine exact, no quantization needed."""
    d = load_table(spark, sf_dir, "documents")
    u = F.expr(
        f"({_mulmod32('doc_id', _KNUTH, 'div')} + 1.0D) / {_U32 + 1}.0D"
    )
    k = (
        d.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("bigint").alias("weight"),
            (-F.log(u) / F.col("n_chars")).alias("key"),
        )
    )
    w = W.orderBy("key", "doc_id")
    return (
        k.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= _RES_K)
        .drop("key")
    )


# --------------------------------------------------------------------------
# op175: PMI collocations — statistically-bound phrases, not just frequent
# --------------------------------------------------------------------------

_PMI_MIN_COUNT = 5


_OP175_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
uni AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(ws) AS tok FROM w) GROUP BY tok
),
nu AS (SELECT SUM(c) AS n_uni FROM uni),
bi AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM (SELECT array_to_string(ws[t.i:t.i+1], ' ') AS bigram
        FROM w, UNNEST(range(1, len(ws))) AS t(i))
  GROUP BY bigram
),
nb AS (SELECT SUM(c_xy) AS n_bi FROM bi),
s AS (
  SELECT b.bigram, b.c_xy, x.c AS c_x, y.c AS c_y,
         CAST(FLOOR(LN((CAST(b.c_xy AS DOUBLE) / n_bi)
                       / ((CAST(x.c AS DOUBLE) / n_uni)
                          * (CAST(y.c AS DOUBLE) / n_uni)))
                    * 1000000.0 + 0.5) AS BIGINT) AS pmi_u
  FROM bi b
  JOIN uni x ON x.tok = string_split(b.bigram, ' ')[1]
  JOIN uni y ON y.tok = string_split(b.bigram, ' ')[2]
  CROSS JOIN nu CROSS JOIN nb
  WHERE b.c_xy >= {_PMI_MIN_COUNT}
)
SELECT bigram, c_xy, c_x, c_y,
       CAST(pmi_u AS DOUBLE) / 1000000.0 AS pmi
FROM s WHERE pmi_u > 0
"""


@register("op175_pmi_collocations", oracle=_OP175_SQL)
def op175_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information collocations: bigrams whose
    observed frequency beats the independence expectation of their
    parts (PMI > 0, support ≥ 5) — the statistic phrase-mining /
    tokenizer-vocab builds use to find bound phrases that RAW counts
    miss (op128 ranks by count; 'of the' wins there and loses here).

    Scale: unigram and bigram counts are two map-side-partial aggs
    over the exploded corpus; the PMI join runs over the AGGREGATED
    vocab (vocab-sized, broadcast), never over corpus rows. PMI is
    quantized floor(x·1e6+0.5)→int64 at the last step (op162's
    discipline; every input is an exact int64 count, the two totals
    arrive via broadcast)."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    toks = d.select(F.explode(ws).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("c"))
    nu = uni.agg(F.sum("c").alias("n_uni"))
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(" ", F.slice(ws, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("bigint").alias("c_xy"))
        .filter(F.col("c_xy") >= _PMI_MIN_COUNT)
    )
    nb_all = (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c"))
        .agg(F.sum("c").alias("n_bi"))
    )
    x = uni.select(F.col("tok").alias("tx"), F.col("c").alias("c_x"))
    y = uni.select(F.col("tok").alias("ty"), F.col("c").alias("c_y"))
    s = (
        bi.withColumn("tx", F.expr("split(bigram, ' ')[0]"))
        .withColumn("ty", F.expr("split(bigram, ' ')[1]"))
        .join(F.broadcast(x), ["tx"])
        .join(F.broadcast(y), ["ty"])
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb_all))
        .withColumn(
            "pmi_u",
            F.expr(
                "cast(floor(ln((cast(c_xy as double) / n_bi)"
                " / ((cast(c_x as double) / n_uni)"
                " * (cast(c_y as double) / n_uni))) * 1000000.0D + 0.5D) as bigint)"
            ),
        )
        .filter(F.col("pmi_u") > 0)
    )
    return s.select(
        "bigram",
        "c_xy",
        "c_x",
        "c_y",
        (F.col("pmi_u").cast("double") / 1_000_000.0).alias("pmi"),
    )


# --------------------------------------------------------------------------
# op176: train/val/test split — deterministic hash assignment + stats
# --------------------------------------------------------------------------

# xxhash-family odd prime, deliberately different from op174's Knuth
# constant so the two assignments are decorrelated.
_SPLIT_MULT = 2246822519


_OP176_SQL = f"""
WITH a AS (
  SELECT doc_id, lang, n_chars,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
         {_mulmod32('doc_id', _SPLIT_MULT, '//')} AS h
  FROM documents
),
s AS (
  SELECT CASE WHEN h % 100 < 98 THEN 'train'
              WHEN h % 100 = 98 THEN 'val'
              ELSE 'test' END AS split,
         n_chars, n_tokens
  FROM a
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM s GROUP BY split
"""


@register("op176_train_val_split", oracle=_OP176_SQL)
def op176_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/val/test assignment by multiplicative
    hash of doc_id, with per-split volume stats — the last step before
    every training export, and the one that must NEVER depend on row
    order, partitioning, or cluster size (a doc's split is a pure
    function of its id, so re-runs and backfills land identically;
    contrast op99's stratified fractions). Uses a different hash
    constant than op174's sampler so sampling and splitting are
    decorrelated.

    Scale: pure map-side arithmetic + one 3-group agg; nothing but
    (split, counters) ever shuffles."""
    d = load_table(spark, sf_dir, "documents")
    nt = F.expr("length(text) - length(replace(text, ' ', '')) + 1")
    h = F.expr(_mulmod32("doc_id", _SPLIT_MULT, "div"))
    split = (
        F.when(h % 100 < 98, F.lit("train"))
        .when(h % 100 == 98, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(
            split.alias("split"),
            F.col("n_chars"),
            nt.cast("bigint").alias("n_tokens"),
        )
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


# --------------------------------------------------------------------------
# op177: LATERAL correlated subquery — per-row dependent top-k
# --------------------------------------------------------------------------

_OP177_SQL = """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_mktsegment = 'BUILDING'
"""


@register("op177_lateral_topk", oracle=_OP177_SQL)
def op177_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each BUILDING-segment customer's
    top-2 orders by value — the per-row dependent-subquery surface
    (SQL:1999 LATERAL, Spark 3.2+/DuckDB native). op102 proves scalar
    correlation; this proves TABLE correlation with ORDER BY + LIMIT
    inside the lateral body, the shape analysts write naturally
    instead of the row_number idiom (op42 is the window twin).

    Identical SQL text runs on both engines. Scale: Catalyst
    decorrelates the lateral into a join + per-key WindowGroupLimit
    (NOT a re-scan of orders per customer row), so at 100 TB it costs
    one shuffle on the correlation key — same plan family as op42;
    the point is the surface comes for free."""
    from ocdb_server_spark.io import load_tables

    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_OP177_SQL)
