"""Window functions — SURVEY.md §2.5 (op42–op49).

No reference analog (the MongoDB-era server's only order-aware op is
pagination); all relational completeness. Every window here is
partitioned (`Window.partitionBy`) — an unpartitioned ordered window
is a single-task global sort and is banned in this codebase outside
the deliberate top-k (op51). Orderings always carry a unique
tiebreaker so results are deterministic under Spark's nondeterministic
row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.operators._helpers import dec
from ocdb_server_spark.registry import register


@register(
    "op42_win_row_number_topk_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def op42_win_row_number_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the scalable top-k-per-group idiom
    (one shuffle on the group key; no global sort)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "op43_win_rank_dense",
    oracle="""
    SELECT o_orderkey, o_orderstatus, price_k,
           CAST(rank() OVER (PARTITION BY o_orderstatus ORDER BY price_k DESC) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY price_k DESC) AS BIGINT) AS drnk
    FROM (SELECT o_orderkey, o_orderstatus,
                 CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS price_k
          FROM orders)
    """,
)
def op43_win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank with real ties (price bucketed to 10k)."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") / 10000.0).cast("bigint").alias("price_k"),
    )
    w = W.partitionBy("o_orderstatus").orderBy(F.col("price_k").desc())
    return t.select(
        "o_orderkey",
        "o_orderstatus",
        "price_k",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@register(
    "op44_win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                          lag(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS days_since_prev,
           CAST(date_diff('day',
                          o_orderdate, lead(o_orderdate) OVER w) AS BIGINT) AS days_to_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def op44_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead: gap to previous and next order per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("days_since_prev"),
        F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_next"),
    )


@register(
    "op45_win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    """,
)
def op45_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer (exact decimal accumulation so
    every prefix sum is order-independent and engine-identical)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@register(
    "op46_win_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS moving_avg
    FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def op46_win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average of event value per user."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(dec("value", 18, 6)).over(w).cast("double") / F.count("*").over(w)).alias(
            "moving_avg"
        ),
    )


@register(
    "op47_win_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, day_num,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY day_num
                        RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS sum_30d
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS day_num
          FROM orders)
    """,
)
def op47_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame: trailing-30-day revenue per customer. RANGE
    frames depend only on the order value, so ties need no tiebreaker
    (peers share the frame) — deterministic by construction."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("day_num"),
    )
    w = W.partitionBy("o_custkey").orderBy("day_num").rangeBetween(-30, 0)
    return t.select(
        "o_custkey",
        "o_orderkey",
        "day_num",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("sum_30d"),
    )


@register(
    "op48_win_ntile_cume",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def op48_win_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) + percent_rank + cume_dist of acctbal per segment (the
    unique tiebreaker makes all three rank functions deterministic)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "op49_win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def op49_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value over the full partition frame."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
    )
