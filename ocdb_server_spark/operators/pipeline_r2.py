"""Round-2 pipeline extensions — SURVEY.md §2.16 (op114–op126).

Second batch of training-data-pipeline and analytics operators on top
of the op75–op99/op104–op105 families: the TPC-H Q3 shape (the one
BASELINE.md yardstick that had no matching operator), training-sequence
packing, benchmark-contamination detection, lexicon PII scrubbing,
repetition scoring, a quality funnel, per-language TF-IDF terms,
event-sessionized funnel analysis, geo nearest-neighbors, bounded-frame
EWMA, Pareto concentration, cohort retention, and the count-distinct
re-aggregation pattern.

Like the rest of the package, every op is pure DataFrame/Catalyst code
(no Python UDFs in any hot path), outputs are canonicalizer-safe
(scalars only, no DECIMAL — see tests/test_gate_shape.py), and
floating-point observables are either bit-identical IEEE expressions
on both engines or round(6)-stabilized (SURVEY.md §4.2.3).

The reference (`bcdev/ocdb-server`, public knowledge — SURVEY.md §0)
has no analog for any of these; they're the "what a 100 TB training
pipeline needs" axis of the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.operators._helpers import SQL_REVENUE_DEC, revenue_dec
from ocdb_server_spark.registry import register


# --------------------------------------------------------------------------
# op114: TPC-H Q3 shape — the BASELINE.md "Q3-style join+agg+top-10"
# yardstick (54.9 ms DuckDB at sf0.1) previously had no operator.
# --------------------------------------------------------------------------

_OP114_SQL = f"""
SELECT l_orderkey,
       CAST(SUM({SQL_REVENUE_DEC}) AS DOUBLE) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("op114_join_topk_revenue", oracle=_OP114_SQL)
def op114_join_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: segment-filtered customer ⋈ orders ⋈ lineitem,
    revenue per order, top-10. (The testdata's orders table has no
    o_shippriority column, so the grouping is (l_orderkey,
    o_orderdate).) Plan shape at scale: both joins shuffle on the
    order key after the segment/date filters push to the scans; the
    top-10 is TakeOrderedAndProject (per-partition heap + driver merge
    of 10-row heads, never a global sort). Revenue aggregates in exact
    decimal (order-independent) and surfaces as double; the orderkey
    tiebreak makes the returned SET deterministic."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue_dec()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# op115: training-sequence packing
# --------------------------------------------------------------------------

_PACK_BUDGET = 512  # tokens per training sequence

_OP115_SQL = f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
  FROM documents),
c AS (
  SELECT source, doc_id, tokens,
         SUM(tokens) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT source,
       CAST(FLOOR((cum - tokens) / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS n_tokens
FROM c
GROUP BY source, pack_id
"""


@register("op115_seq_pack", oracle=_OP115_SQL)
def op115_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token-budget training sequences:
    within each source shard, in doc_id order, a document joins the
    pack its running token count (exclusive of itself) falls in.
    This is the contiguous-fill formulation: pack boundaries are
    determined by a per-shard window cumsum — one shuffle on source,
    no global sort, so 100 TB packs shard-parallel (the same
    per-shard-window pattern as op98's train_shard_assign). Output is
    the pack manifest (docs + tokens per pack), which is what a
    dataloader consumes."""
    d = load_table(spark, sf_dir, "documents")
    tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    t = d.select("source", "doc_id", tokens.alias("tokens"))
    c = t.withColumn("cum", F.sum("tokens").over(w))
    pack = F.floor((F.col("cum") - F.col("tokens")) / float(_PACK_BUDGET)).cast(
        "bigint"
    )
    return (
        c.withColumn("pack_id", pack)
        .groupBy("source", "pack_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("tokens").cast("bigint").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# op116: benchmark-contamination detection
# --------------------------------------------------------------------------

_OP116_SQL = """
WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
b AS (SELECT DISTINCT array_to_string(ws[t.i:t.i+2], ' ') AS gram
      FROM w, UNNEST(range(1, len(ws)-1)) AS t(i)
      WHERE doc_id % 97 = 0),
c AS (SELECT doc_id, lang, array_to_string(ws[t.i:t.i+2], ' ') AS gram
      FROM w, UNNEST(range(1, len(ws)-1)) AS t(i)
      WHERE doc_id % 97 <> 0)
SELECT c.doc_id, c.lang,
       CAST(COUNT(DISTINCT c.gram) AS BIGINT) AS overlap_grams
FROM c JOIN b ON c.gram = b.gram
GROUP BY c.doc_id, c.lang
"""


@register("op116_contamination_overlap", oracle=_OP116_SQL)
def op116_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: which corpus documents share
    word 3-grams with a held-out benchmark set (here: doc_id % 97 = 0,
    the driver-data stand-in for an eval suite). The benchmark side
    deduplicates its grams FIRST (distinct before the join — at scale
    the benchmark is tiny and broadcasts); the corpus side explodes
    grams and joins on the gram, so shuffle volume is corpus-grams ×
    match-rate, never corpus × benchmark. At 100 TB the gram string
    would be xxhash64'd before the join (same trick as op75's digest
    groupBy) — kept as the raw string here so the oracle is
    SQL-expressible. Reports distinct overlapping grams per document
    (the DataComp/Dolma-style decontamination signal)."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    grams = F.when(
        F.size(ws) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 2),
            lambda i: F.concat_ws(" ", F.slice(ws, i, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = d.select("doc_id", "lang", F.explode(grams).alias("gram"))
    bench = (
        g.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    corpus = g.filter(F.col("doc_id") % 97 != 0)
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "lang")
        .agg(F.countDistinct("gram").cast("bigint").alias("overlap_grams"))
    )


# --------------------------------------------------------------------------
# op117: lexicon-based PII scrubbing
# --------------------------------------------------------------------------

_PII_PAT = r"\b(customer|key|value)\b"

_OP117_SQL = f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '{_PII_PAT}'))) AS BIGINT) AS total_hits,
       CAST(SUM(length(text) -
                length(regexp_replace(text, '{_PII_PAT}', '[X]', 'g'))) AS BIGINT)
         AS chars_removed
FROM documents
GROUP BY lang
"""


@register("op117_pii_scrub", oracle=_OP117_SQL)
def op117_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based scrub pass: count and redact occurrences of a
    deny-list of terms (stand-ins for a name/credential lexicon — the
    testdata corpus has no real emails/SSNs to match). Pure per-row
    JVM regex (regexp_count / regexp_replace), zero shuffle before the
    5-group aggregate, so it streams at scan speed at any scale; the
    same shape handles the real PII regex battery (emails, phones,
    IP addresses) by swapping the pattern. Reports per-language hit
    and removed-character totals — the audit numbers a scrub job logs."""
    d = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(F.col("text"), _PII_PAT, "[X]")
    return d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.regexp_count(F.col("text"), F.lit(_PII_PAT)))
        .cast("bigint")
        .alias("total_hits"),
        F.sum(F.length("text") - F.length(scrubbed))
        .cast("bigint")
        .alias("chars_removed"),
    )


# --------------------------------------------------------------------------
# op118: repetition scoring
# --------------------------------------------------------------------------

_OP118_SQL = """
WITH r AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
  FROM documents)
SELECT doc_id, lang, n_words, n_distinct,
       1 - CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS rep_ratio
FROM r
WHERE 1 - CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) > 0.5
"""


@register("op118_repetition_ratio", oracle=_OP118_SQL)
def op118_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal: fraction of duplicated words per
    document (1 - distinct/total), filtering to the repetitive tail
    (> 0.5 — Gopher-style repetition filters use exactly this family
    of signals). Per-row expressions only, zero shuffle. The ratio is
    a single IEEE divide of two integers, bit-identical in Spark and
    DuckDB, so both the values and the > 0.5 row set hash-match
    without rounding (SURVEY.md §4.2.3's "same-IEEE-ops" rule)."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    n_words = F.size(ws).cast("bigint")
    n_distinct = F.size(F.array_distinct(ws)).cast("bigint")
    r = d.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct"),
    )
    ratio = 1 - F.col("n_distinct").cast("double") / F.col("n_words").cast("double")
    return r.withColumn("rep_ratio", ratio).filter(F.col("rep_ratio") > 0.5)


# --------------------------------------------------------------------------
# op119: quality funnel
# --------------------------------------------------------------------------

_OP119_SQL = """
WITH q AS (
  SELECT n_chars >= 200 AS len_ok,
         n_chars >= 200 AND lang <> 'zh' AS lang_ok,
         n_chars >= 200 AND lang <> 'zh'
           AND 1 - CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                 / CAST(len(string_split(text,' ')) AS DOUBLE) <= 0.65 AS rep_ok,
         n_chars >= 200 AND lang <> 'zh'
           AND 1 - CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                 / CAST(len(string_split(text,' ')) AS DOUBLE) <= 0.65
           AND len(string_split(text,' ')) >= 60 AS final_ok
  FROM documents)
SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(*) FILTER (len_ok) AS BIGINT) AS n_len_ok,
       CAST(COUNT(*) FILTER (lang_ok) AS BIGINT) AS n_lang_ok,
       CAST(COUNT(*) FILTER (rep_ok) AS BIGINT) AS n_rep_ok,
       CAST(COUNT(*) FILTER (final_ok) AS BIGINT) AS n_final
FROM q
"""


@register("op119_quality_funnel", oracle=_OP119_SQL)
def op119_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-cleaning funnel report: how many documents survive each
    successive quality gate (length ≥ 200 chars → language filter →
    repetition ≤ 0.65 → ≥ 60 tokens). One conditional-count aggregate
    over a zero-shuffle scan — the one-pass funnel every filtering run
    reports before committing a training mix. Cascading AND conditions
    (each stage implies the previous) keep the funnel monotone."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    rep = 1 - F.size(F.array_distinct(ws)).cast("double") / F.size(ws).cast("double")
    len_ok = F.col("n_chars") >= 200
    lang_ok = len_ok & (F.col("lang") != "zh")
    rep_ok = lang_ok & (rep <= 0.65)
    final_ok = rep_ok & (F.size(ws) >= 60)

    def cnt(cond, name):
        return F.count(F.when(cond, 1)).cast("bigint").alias(name)

    return d.agg(
        F.count("*").cast("bigint").alias("n_total"),
        cnt(len_ok, "n_len_ok"),
        cnt(lang_ok, "n_lang_ok"),
        cnt(rep_ok, "n_rep_ok"),
        cnt(final_ok, "n_final"),
    )


# --------------------------------------------------------------------------
# op120: per-language TF-IDF terms
# --------------------------------------------------------------------------

_OP120_SQL = """
WITH words AS (
  SELECT doc_id, lang, w.word AS word
  FROM documents, UNNEST(string_split(text, ' ')) AS w(word)),
df AS (
  SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM words GROUP BY word),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
tf AS (
  SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS tf
  FROM words GROUP BY lang, word),
scored AS (
  SELECT tf.lang, tf.word, tf.tf,
         ROUND(tf.tf * ln(n.n_docs / df.df), 6) AS score
  FROM tf JOIN df ON tf.word = df.word CROSS JOIN n),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY score DESC, word) AS rnk
  FROM scored)
SELECT lang, word, tf, score, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 5
"""


@register("op120_tfidf_terms", oracle=_OP120_SQL)
def op120_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per language by TF-IDF (tf = term
    occurrences within the language slice, idf = ln(N/df) over the
    whole corpus). Two hash aggregates over the exploded words (both
    map-side partial) + a plain shuffle join of tf⋈df on `word` + a
    partitioned top-k window — no global sort, and the explode carries
    one word per row so the shuffle is O(tokens), the same budget as
    op77's wordcount. The tf⋈df join deliberately does NOT broadcast:
    df is VOCAB-sized (10⁷-10⁸ distinct grams on a web corpus — far
    past any broadcast bar; round-4 verdict item 3). The explicit
    shuffle_merge hint pins a sort-merge join on `word` — both sides
    exchange vocab-sized word rows, never documents, and the hint
    also stops the test-scale auto-broadcast from hiding the
    production plan. Only the 1-row N frame broadcasts. Scores
    are round(6)-stabilized: ln() may differ between libm and the JVM
    in the last ulp, and 6 dp is the cross-engine-stable observable
    (same rule as op80's cosine)."""
    d = load_table(spark, sf_dir, "documents")
    # N as a broadcast 1-row frame, not an eager .count() literal — the
    # plan stays lazy and re-reads fresh data (the op75 round-1 lesson).
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    words = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    df_t = words.groupBy("word").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    tf = words.groupBy("lang", "word").agg(F.count("*").cast("bigint").alias("tf"))
    scored = (
        tf.join(df_t.hint("shuffle_merge"), "word")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "word",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = W.partitionBy("lang").orderBy(F.col("score").desc(), "word")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .select("lang", "word", "tf", "score", "rnk")
    )


# --------------------------------------------------------------------------
# op121: sessionized event funnel
# --------------------------------------------------------------------------

_SESSION_GAP_SEC = 24 * 3600

_OP121_SQL = f"""
WITH s AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > {_SESSION_GAP_SEC * 1_000_000}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM s),
f AS (
  SELECT user_id, sid,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
  FROM sess GROUP BY user_id, sid)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) FILTER (t_view IS NOT NULL) AS BIGINT) AS n_view,
       CAST(COUNT(*) FILTER (t_click > t_view) AS BIGINT) AS n_view_click,
       CAST(COUNT(*) FILTER (t_buy > t_click AND t_click > t_view) AS BIGINT)
         AS n_full_funnel
FROM f
"""


@register("op121_session_funnel", oracle=_OP121_SQL)
def op121_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize the event stream by inactivity gap (24 h — the
    testdata's users act on a daily cadence) and report the
    view → click → purchase conversion funnel over first-touch
    timestamps per session. Session assignment is the gaps-and-islands
    cumsum (op111's pattern) partitioned by user — all three windows
    and the session aggregate share ONE shuffle on user_id (Catalyst
    reuses the partitioning), then a single-row global rollup. The
    batch twin of op71's streaming session windows; at 100 TB this is
    the canonical "shuffle once by entity, window within" shape."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # µs-precision gap on both engines (a seconds cast would truncate
    # and flip strict > comparisons that land within 1 s of the gap).
    gap_ok = (
        F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        > _SESSION_GAP_SEC * 1_000_000
    )
    new_s = F.when(
        F.lag("ts").over(w).isNull() | gap_ok, F.lit(1)
    ).otherwise(F.lit(0))
    cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sess = e.withColumn("new_s", new_s).withColumn("sid", F.sum("new_s").over(cum))

    def first_ts(etype, name):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts"))).alias(name)

    f = sess.groupBy("user_id", "sid").agg(
        first_ts("view", "t_view"),
        first_ts("click", "t_click"),
        first_ts("purchase", "t_buy"),
    )
    return f.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.count(F.when(F.col("t_view").isNotNull(), 1))
        .cast("bigint")
        .alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1))
        .cast("bigint")
        .alias("n_view_click"),
        F.count(
            F.when(
                (F.col("t_buy") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        )
        .cast("bigint")
        .alias("n_full_funnel"),
    )


# --------------------------------------------------------------------------
# op122: geo nearest-neighbors (haversine)
# --------------------------------------------------------------------------

# The testdata has no geo columns (same situation as op14's bbox);
# deterministic integer arithmetic derives a (lat, lon) per customer so
# both engines compute bit-identical coordinates.
_LAT_SQL = "(c_custkey % 18000) / 100.0 - 90"
_LON_SQL = "((c_custkey * 7) % 36000) / 100.0 - 180"
_QLAT, _QLON = 40.7, -74.0  # query point
_EARTH_KM = 6371.0

_OP122_SQL = f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer),
d AS (
  SELECT c_custkey, lat, lon,
         ROUND(2 * {_EARTH_KM} * asin(sqrt(
             pow(sin(radians(lat - ({_QLAT})) / 2), 2)
             + cos(radians({_QLAT})) * cos(radians(lat))
               * pow(sin(radians(lon - ({_QLON})) / 2), 2))), 6) AS dist_km
  FROM pts)
SELECT c_custkey, lat, lon, dist_km
FROM d
ORDER BY dist_km, c_custkey
LIMIT 10
"""


@register("op122_geo_knn", oracle=_OP122_SQL)
def op122_geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 nearest customers to a query point by haversine distance —
    the geo nearest-station query of the reference's domain (SeaBASS
    measurements carry lat/lon; the testdata doesn't, so coordinates
    derive from c_custkey by exact integer arithmetic, op14's proxy
    convention). Linear scan + TakeOrderedAndProject top-k: no
    shuffle, no index needed until the corpus is so large a geohash
    bucket prune (op81's blocking pattern on a geohash prefix) pays.
    Distance is round(6)-stabilized BEFORE the order-by: sin/cos/asin
    may differ between libm and the JVM in the final ulp, and ordering
    on the rounded value with the c_custkey tiebreak keeps the top-k
    SET cross-engine deterministic (SURVEY.md §4.2.3)."""
    c = load_table(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 18000) / 100.0 - 90
    lon = ((F.col("c_custkey") * 7) % 36000) / 100.0 - 180
    pts = c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    dlat = F.radians(F.col("lat") - F.lit(_QLAT)) / 2
    dlon = F.radians(F.col("lon") - F.lit(_QLON)) / 2
    h = (
        F.pow(F.sin(dlat), 2)
        + F.cos(F.radians(F.lit(_QLAT)))
        * F.cos(F.radians(F.col("lat")))
        * F.pow(F.sin(dlon), 2)
    )
    dist = F.round(2 * _EARTH_KM * F.asin(F.sqrt(h)), 6)
    return (
        pts.withColumn("dist_km", dist)
        .orderBy("dist_km", "c_custkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# op123: time-decayed engagement (EWMA over a bounded frame)
# --------------------------------------------------------------------------

_DECAY = 0.9
_TAPS = 10  # bounded frame: last 10 events


def _ewma_weights() -> list[float]:
    return [_DECAY**k for k in range(_TAPS)]


_OP123_SQL = f"""
WITH w AS (
  SELECT user_id, event_id, ts, value,
         {' + '.join(
             f"coalesce(lag(value, {k}) OVER "
             f"(PARTITION BY user_id ORDER BY ts, event_id), 0.0) * {w!r}"
             for k, w in enumerate(_ewma_weights())
         )} AS decayed
  FROM events)
SELECT user_id, event_id, ROUND(decayed, 6) AS decayed_value
FROM w
"""


@register("op123_ewma_decay", oracle=_OP123_SQL)
def op123_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement score: for each event, the
    exponentially weighted sum of the user's last 10 event values
    (decay 0.9 per step). Implemented as 10 lag taps with weights
    computed ONCE in Python and injected as identical double literals
    into both engines — no libm pow() at query time, so every product
    and the left-to-right sum are bit-identical IEEE sequences in
    Spark and DuckDB. All 10 lags share ONE user_id window sort (one
    shuffle), and the frame is bounded, so cost stays O(taps × rows)
    at any scale — the recursive-EWMA formulation would need either an
    unbounded frame or per-row state."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    decayed = None
    for k, wt in enumerate(_ewma_weights()):
        term = F.coalesce(F.lag("value", k).over(w), F.lit(0.0)) * F.lit(wt)
        decayed = term if decayed is None else decayed + term
    return e.select(
        "user_id", "event_id", F.round(decayed, 6).alias("decayed_value")
    )


# --------------------------------------------------------------------------
# op124: Pareto share (top-decile concentration)
# --------------------------------------------------------------------------

_OP124_SQL = """
WITH spend AS (
  SELECT o_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
  FROM orders GROUP BY o_custkey),
b AS (
  SELECT s, NTILE(10) OVER (ORDER BY s DESC, o_custkey) AS decile
  FROM spend)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(*) FILTER (decile = 1) AS BIGINT) AS n_top,
       CAST(CAST(SUM(CASE WHEN decile = 1 THEN s END) AS DOUBLE)
            / CAST(SUM(s) AS DOUBLE) AS DOUBLE) AS top_share
FROM b
"""


@register("op124_pareto_share", oracle=_OP124_SQL)
def op124_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration analysis: what share of total spend comes
    from the top decile of customers. Per-customer spend aggregates in
    exact decimal (order-independent); the decile assignment is an
    NTILE over (spend DESC, custkey) — the unique tiebreak makes the
    boundary deterministic in both engines; the share is ONE double
    divide of two exact decimal totals. Shape at scale: hash agg on
    custkey + a window over the (small) per-customer aggregate +
    single-row rollup — the window input is |customers|, not |orders|."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
    )
    w = W.orderBy(F.col("s").desc(), "o_custkey")
    b = spend.select("s", F.ntile(10).over(w).alias("decile"))
    return b.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.count(F.when(F.col("decile") == 1, 1)).cast("bigint").alias("n_top"),
        (
            F.sum(F.when(F.col("decile") == 1, F.col("s"))).cast("double")
            / F.sum("s").cast("double")
        ).cast("double").alias("top_share"),
    )


# --------------------------------------------------------------------------
# op125: cohort retention
# --------------------------------------------------------------------------

_OP125_SQL = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
  FROM events)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.act_week) / 7 AS BIGINT)
         AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM activity a JOIN first_seen f ON a.user_id = f.user_id
GROUP BY f.cohort_week, week_offset
"""


@register("op125_cohort_retention", oracle=_OP125_SQL)
def op125_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, and
    for each later week the count still active — the standard product
    retention triangle. Both date_trunc('week') (Monday start in Spark
    and DuckDB) and the week offset (integer day arithmetic / 7) are
    exact. Shape: two aggregates over ONE user_id-partitioned pass
    (first-seen min + distinct active weeks) joined on user_id, then a
    small cohort×offset rollup; nothing touches raw event rows after
    the first aggregation, so the retention triangle costs O(users ×
    active-weeks), not O(events), downstream."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("act_week")
    ).distinct()
    j = activity.join(first_seen, "user_id")
    offset = (
        F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
    ).cast("bigint")
    return (
        j.select("cohort_week", offset.alias("week_offset"), "user_id")
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


# --------------------------------------------------------------------------
# op126: count-distinct rollup (pre-aggregated distinct pairs)
# --------------------------------------------------------------------------

_OP126_SQL = """
WITH pairs AS (
  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id FROM events),
daily AS (
  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS daily_users
  FROM pairs GROUP BY event_type, day)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(d.daily_users) AS BIGINT) AS sum_daily_distinct,
       t.total_users
FROM daily d
JOIN (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS total_users
      FROM events GROUP BY event_type) t
  ON d.event_type = t.event_type
GROUP BY d.event_type, t.total_users
"""


@register("op126_distinct_rollup", oracle=_OP126_SQL)
def op126_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-distinct re-aggregation pattern: daily distinct users
    per event type, rolled up alongside the true month-level distinct
    (which is NOT the sum of dailies — the output shows both, the
    classic dashboard trap). Scale shape: ONE distinct pre-aggregation
    on (type, day, user) — a map-side-combinable group-by — feeds the
    daily counts, so raw events are touched once; the exact total
    distinct reuses the same exchange. This is the exact-arithmetic
    baseline op20's HLL sketch approximates at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    pairs = e.select(
        "event_type", F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    daily = pairs.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("daily_users")
    )
    total = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("total_users")
    )
    return (
        daily.join(total, "event_type")
        .groupBy("event_type", "total_users")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum("daily_users").cast("bigint").alias("sum_daily_distinct"),
        )
        .select("event_type", "n_days", "sum_daily_distinct", "total_users")
    )


# --------------------------------------------------------------------------
# op128: corpus bigram frequencies
# --------------------------------------------------------------------------

_OP128_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT array_to_string(ws[t.i:t.i+1], ' ') AS bigram
      FROM w, UNNEST(range(1, len(ws))) AS t(i)),
c AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY bigram)
SELECT bigram, n,
       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, bigram) AS BIGINT) AS rnk
FROM c
ORDER BY rnk
LIMIT 20
"""


@register("op128_top_bigrams", oracle=_OP128_SQL)
def op128_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams (op77's unigram wordcount, one order up —
    the co-occurrence statistics a tokenizer/vocab build reads). The
    explode carries one bigram per row (O(tokens) shuffle, same budget
    as op77), the count is a map-side-partial hash agg, and the global
    top-20 runs over the AGGREGATED vocab (vocab-bounded, not
    corpus-bounded), with rank made deterministic by the bigram
    tiebreak."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(" ", F.slice(ws, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    c = (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = W.orderBy(F.col("n").desc(), "bigram")
    return (
        c.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 20)
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# op129: month-over-month growth
# --------------------------------------------------------------------------

_OP129_SQL = """
WITH m AS (
  SELECT n_name,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, month)
SELECT n_name, month, revenue,
       lag(revenue) OVER (PARTITION BY n_name ORDER BY month) AS prev_revenue,
       (revenue - lag(revenue) OVER (PARTITION BY n_name ORDER BY month))
         / lag(revenue) OVER (PARTITION BY n_name ORDER BY month) AS mom_pct
FROM m
"""


@register("op129_mom_growth", oracle=_OP129_SQL)
def op129_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per nation — the standard
    trend-report shape. Monthly revenue aggregates in exact decimal
    and surfaces as double, so the lag and the growth ratio are single
    IEEE ops on identical inputs in both engines (first month per
    nation is NULL). Scale shape: one shuffled agg down to
    nation×month grain, then a window over that tiny frame — the
    window never sees order rows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    m = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w = W.partitionBy("n_name").orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "n_name",
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        ((F.col("revenue") - prev) / prev).alias("mom_pct"),
    )


# --------------------------------------------------------------------------
# op131: daily resample + forward fill
# --------------------------------------------------------------------------

_OP131_SQL = """
WITH spine AS (
  SELECT CAST(g.d AS DATE) AS day
  FROM generate_series(DATE '2024-01-01', DATE '2024-01-30',
                       INTERVAL 1 DAY) AS g(d)),
users AS (SELECT DISTINCT user_id FROM events),
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
grid AS (
  SELECT u.user_id, s.day, d.value
  FROM users u CROSS JOIN spine s
  LEFT JOIN (SELECT user_id, day, value FROM daily WHERE rn = 1) d
    ON d.user_id = u.user_id AND d.day = s.day)
SELECT user_id, day,
       last_value(value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS UNBOUNDED PRECEDING) AS ffill_value
FROM grid
"""


@register("op131_resample_ffill", oracle=_OP131_SQL)
def op131_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event series onto a daily grid and
    forward-fill gaps with the last observed value — the time-series
    regularization every feature store runs before model training.
    The spine generates from a literal range (no source scan), the
    per-day last observation is a row_number dedup, and the fill is
    last_value(IGNORE NULLS) over a user-partitioned window. Carried
    values are untouched doubles (no arithmetic), so cross-engine
    equality is exact. Scale: grid is users × days (not events); the
    fill window shares the user_id partitioning with the dedup — at
    100 TB this is one shuffle on user plus a broadcast of the spine."""
    e = load_table(spark, sf_dir, "events")
    spine = spark.range(0, 30).select(
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias(
            "day"
        )
    )
    users = e.select("user_id").distinct()
    wd = W.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        e.select("user_id", F.col("ts").cast("date").alias("day"), "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    grid = users.crossJoin(F.broadcast(spine)).join(daily, ["user_id", "day"], "left")
    wf = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return grid.select(
        "user_id",
        "day",
        F.last("value", ignorenulls=True).over(wf).alias("ffill_value"),
    )


# --------------------------------------------------------------------------
# op132: edit-distance near-dup verification
# --------------------------------------------------------------------------


def editdist_verify_pairs(
    docs: DataFrame, pairs: DataFrame, threshold: float = 0.7
) -> DataFrame:
    """op132's Levenshtein verify stage, decoupled from its shape-block
    candidate generator — the 100 TB COMPOSITION path (BASELINE.md
    17g/18c): `pairs` (columns id_a < id_b) comes from a corpus-stable
    signature generator (op79 MinHash banding / op88 SimHash chunks,
    exactly as the op96/op221 dedup pipeline sources its candidates),
    the texts join back by doc_id, and the same edit-distance +
    relative-threshold predicate as op132 decides. Output schema is
    op132's (id_a, id_b, edit_dist, edit_ratio).

    Scale shape: two hash joins of a small pair set against the
    documents table on its key (candidates from signatures are
    O(near-dups), not O(n²)), then a per-row Levenshtein — no
    self-join, no value-shape blocking, bucket sizes corpus-stable.

    Relation to op132, measured round 18 (BASELINE.md 18a) and pinned
    by tests/test_components.py: in the near-dup regime
    (edit_ratio ≤ 0.3) this path STRICTLY DOMINATES the shape block —
    it recovers every regime pair op132 finds with identical
    (edit_dist, edit_ratio) values, and finds the near-dups the
    equality block structurally misses (a single-token edit usually
    changes the word count or the n_chars/10 bucket, so at sf0.1 the
    shape block sees 1 of the corpus's 256 true near-dup pairs; this
    path sees all 256). The shape block's 0.6–0.7 tail — same-shape,
    token-wise unrelated texts — is a threshold artifact this path
    does not (and should not) reproduce."""
    d = docs.select("doc_id", "text")
    j = pairs.select("id_a", "id_b").join(
        d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a")),
        "id_a",
    ).join(
        d.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b")),
        "id_b",
    )
    lev = F.levenshtein(F.col("text_a"), F.col("text_b"))
    ratio = lev.cast("double") / F.greatest(
        F.length(F.col("text_a")), F.length(F.col("text_b"))
    )
    return (
        j.select(
            "id_a",
            "id_b",
            lev.cast("bigint").alias("edit_dist"),
            ratio.alias("edit_ratio"),
        )
        .filter(F.col("edit_ratio") <= threshold)
    )


_OP132_SQL = """
WITH d AS (
  SELECT doc_id, lang, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
         CAST(n_chars // 10 AS BIGINT) AS cb
  FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
       CAST(levenshtein(a.text, b.text) AS DOUBLE)
         / greatest(length(a.text), length(b.text)) AS edit_ratio
FROM d a JOIN d b
  ON a.lang = b.lang AND a.nw = b.nw AND a.cb = b.cb AND a.doc_id < b.doc_id
WHERE CAST(levenshtein(a.text, b.text) AS DOUBLE)
        / greatest(length(a.text), length(b.text)) <= 0.7
"""


@register("op132_editdist_neardup", oracle=_OP132_SQL)
def op132_editdist_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup verification: candidate pairs blocked on
    (lang, word count, n_chars/10 bucket) — blocks cap at ~18 docs at
    sf0.1, ~10.7k candidate pairs total — then exact Levenshtein with
    a relative threshold (dist / max-length ≤ 0.7; the character-level
    lens that complements op79/op88/op89's token-level signatures).
    Both engines implement the same classical DP, so distances and the
    single IEEE divide are identical.

    SCALE BOUNDARY (measured round 17, BASELINE.md 17f/17g): the
    blocking key's cardinality is value-bounded (1629 blocks at sf0.1
    AND at 30× — DuckDB-verified), so block size grows linearly with
    the corpus and the quadratic verify explodes (candidate pairs
    ×1102 for ×30 rows; one 30× execution DNF'd at 30 min). An earlier
    revision of this note proposed tightening the key with a content
    prefix hash; round 17 MEASURED that idea non-viable at this
    threshold — only 1 of the 2051 sf0.1 result pairs shares a 16-char
    prefix (99.95% recall loss), because at edit-ratio ≤ 0.7 matching
    pairs can differ almost anywhere, so NO content-equality block key
    retains recall (loose-threshold edit similarity needs metric
    indexing, not equality blocking). The 100 TB path is therefore
    COMPOSITION, not a tighter key: this op's Levenshtein verify stage
    consumes candidates from a signature generator (op79 MinHash /
    op88 SimHash — corpus-stable bucket sizes) exactly as the
    op96/op221 dedup pipeline composes candidates→verify→components;
    the shape-block candidate generator here is the certified
    small-scale convenience that keeps the op self-contained and
    ANSI-mirrorable.

    COMPOSITION SCOPE (measured round 18, BASELINE.md 18a; the
    composed stage itself is `editdist_verify_pairs`, pinned by
    tests/test_components.py): the claim above holds for the NEAR-DUP
    REGIME, not for this op's full loose-threshold output — and there
    composition doesn't just match the shape block, it strictly
    dominates it. At sf0.1 the shape block emits 2051 pairs of which
    exactly 1 has edit_ratio ≤ 0.3; the op79∪op88 composed path
    recovers that pair AND the 255 further true near-dups the
    equality block structurally misses (a one-token edit usually
    changes nw or the n_chars/10 bucket — same asymmetry at every SF:
    composed finds 28/25/256 regime pairs at sf0.001/0.01/0.1, the
    shape block 0/0/1). The shape block's other 2050 pairs sit at
    ratio ≈ 0.45–0.70 — same-shape but token-wise UNRELATED texts the
    signatures rightly never candidate (composed recall on that tail:
    0, at every SF). So composition replaces this op at scale for
    near-duplicate detection — the semantics a dedup pipeline needs,
    with better recall than this op's own generator — while the
    0.6–0.7 tail is a threshold artifact of the bounded shape block,
    certified here at gate scale but with no recall-preserving scale
    path (per the 17g measurement, none can exist by equality
    blocking or signatures)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("nw"),
        F.floor(F.col("n_chars") / 10).cast("bigint").alias("cb"),
    )
    a = d.alias("a")
    b = d.alias("b")
    lev = F.levenshtein(F.col("a.text"), F.col("b.text"))
    ratio = lev.cast("double") / F.greatest(
        F.length(F.col("a.text")), F.length(F.col("b.text"))
    )
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.nw") == F.col("b.nw"))
            & (F.col("a.cb") == F.col("b.cb"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            lev.cast("bigint").alias("edit_dist"),
            ratio.alias("edit_ratio"),
        )
        .filter(F.col("edit_ratio") <= 0.7)
    )


# --------------------------------------------------------------------------
# op133: training-export manifest with content digests
# --------------------------------------------------------------------------

_OP133_SQL = """
WITH h AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
              AS BIGINT) AS shard,
         md5(text) AS doc_digest,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
  FROM documents)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS n_tokens,
       md5(string_agg(doc_digest, '' ORDER BY doc_digest)) AS content_digest
FROM h
GROUP BY shard
"""


@register("op133_export_manifest", oracle=_OP133_SQL)
def op133_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export manifest: per shard (op98's md5 assignment), the
    doc count, token total, and an order-independent content digest —
    md5 over the SORTED per-doc digests, so two exports of the same
    data produce byte-identical manifests regardless of partitioning
    or arrival order. This is the artifact a dataloader checks before
    touching shard bytes. One hash agg on the shard key; the shuffle
    carries 32-char digests, never document text (op75's digest-only
    contract)."""
    d = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 8
    )
    h = d.select(
        shard.alias("shard"),
        F.md5("text").alias("doc_digest"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tokens"),
    )
    return h.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws("", F.sort_array(F.collect_list("doc_digest")))).alias(
            "content_digest"
        ),
    )
