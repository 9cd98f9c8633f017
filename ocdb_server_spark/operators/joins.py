"""Joins — SURVEY.md §2.4 (op27–op41).

The reference has no join execution — the closest semantics are the
dataset↔submission id linkage (application-side lookup,
`ocdb/ws/controllers/datasets.py` [U]) and the satellite *matchup*
concept (`MatchupFilesHandler` [U]), which op37 formalizes as an as-of
join. Everything else is relational completeness.

Scale notes baked into each op:
- small dims (region/nation/part/supplier at dim-scale) → broadcast;
  the big fact side never shuffles for those joins.
- fact⋈fact equi-joins shuffle both sides on the key — at 100 TB the
  production layout buckets both tables on the join key so this
  becomes a zero-shuffle sort-merge (see SURVEY.md §7.2).
- AQE (enabled in session.py) converts to broadcast at runtime when a
  post-filter side turns out small, and splits skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ocdb_server_spark.io import load_table, load_tables
from ocdb_server_spark.operators._helpers import dsum, revenue_dec, sql_dsum, SQL_REVENUE_DEC
from ocdb_server_spark.registry import register


@register(
    "op27_join_inner_equi",
    oracle="""
    SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def op27_join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join; Catalyst picks the physical strategy."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey"), "inner"
    ).select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")


@register(
    "op28_join_broadcast",
    oracle=f"""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def op28_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim): the dimension ships to every executor, the
    600k/100TB fact side is never shuffled for the join."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    j = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"), "inner"
    )
    return j.groupBy("p_brand").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@register(
    "op29_join_left_outer",
    oracle="""
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def op29_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join; customers without orders surface with count 0."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    j = t["customer"].join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
    return j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("n_orders"))


@register(
    "op30_join_right_outer",
    oracle="""
    SELECT o_orderkey, c_custkey, c_acctbal
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def op30_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (null o_orderkey for order-less customers)."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey"), "right"
    ).select("o_orderkey", "c_custkey", "c_acctbal")


@register(
    "op31_join_full_outer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM (SELECT c_custkey FROM customer WHERE c_custkey <= 1000) c
    FULL OUTER JOIN (SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey >= 500) o
      ON c.c_custkey = o.o_custkey
    """,
)
def op31_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join on a partially-overlapping key range."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    c = t["customer"].filter(F.col("c_custkey") <= 1000).select("c_custkey")
    o = (
        t["orders"]
        .filter(F.col("o_custkey") >= 500)
        .select("o_orderkey", "o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select("c_custkey", "o_orderkey")


@register(
    "op32_join_left_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def op32_join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi join (ref-adjacent: "datasets having
    docfiles" existence checks [U]). Semi-join ships only the key
    column of the right side — at scale, prefer it over join+distinct."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "op33_join_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def op33_join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "op34_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def op34_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two small dims (5 × 25)."""
    t = load_tables(spark, sf_dir, ("region", "nation"))
    return t["region"].select("r_name").crossJoin(t["nation"].select("n_name"))


@register(
    "op35_join_theta_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_partkey
    FROM lineitem JOIN part
      ON l_partkey = p_partkey AND l_extendedprice > p_retailprice * 10.0
    """,
)
def op35_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite non-equi join: equi key + range residual. Catalyst
    plans the equi part as the join key and the range as a post-join
    filter — so this stays a hash/merge join, not a BNLJ."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    cond = (F.col("l_partkey") == F.col("p_partkey")) & (
        F.col("l_extendedprice") > F.col("p_retailprice") * 10.0
    )
    return t["lineitem"].join(t["part"], cond, "inner").select(
        "l_orderkey", "l_linenumber", "p_partkey"
    )


@register(
    "op36_join_interval",
    oracle=f"""
    SELECT w.ws AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('e.value', 18, 6)} AS sum_value
    FROM (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events) e
    JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                        TIMESTAMP '2024-01-31 00:00:00',
                                        INTERVAL 6 HOUR)) AS ws) w
      ON e.ts >= w.ws AND e.ts < w.ws + INTERVAL 6 HOUR
    GROUP BY w.ws
    """,
)
def op36_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: events against generated 6h windows via an
    overlap condition (ref: time-interval matchup). At 100 TB the range
    join must be bucketized — assign each event to its bucket with
    arithmetic (an equi-key) instead of a BNLJ; here the windows side is
    tiny so Spark broadcasts it and the range is a cheap residual."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    windows = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-31 00:00:00").cast("timestamp"),
                F.expr("INTERVAL 6 HOURS"),
            )
        ).alias("ws")
    )
    j = ev.join(
        F.broadcast(windows),
        (F.col("ts") >= F.col("ws"))
        & (F.col("ts") < F.col("ws") + F.expr("INTERVAL 6 HOURS")),
    )
    return j.groupBy(F.col("ws").alias("window_start")).agg(
        F.count("*").alias("n"), dsum("value", 18, 6).alias("sum_value")
    )


@register(
    "op37_join_asof",
    oracle="""
    WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'purchase')
    SELECT c.event_id, c.ts, p.ts AS purchase_ts, p.value AS purchase_value
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def op37_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (ref: matchup nearest-in-time, formalized): for every
    click, the latest purchase by the same user at-or-before it.

    Spark has no native as-of join; the scalable reformulation is the
    union trick: tag both streams, sort within user by (ts, tag), and
    carry the last purchase forward with last(ignorenulls) — one
    shuffle on user_id, no row explosion, identical to DuckDB ASOF
    semantics (ties: a purchase at the same instant matches, hence
    purchases sort before clicks at equal ts)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type", "value",
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(1).alias("tag"),
        F.lit(None)
        .cast("struct<p_ts:timestamp,p_value:double>")
        .alias("p"),
    )
    # One struct column, not independent (p_ts, p_value) windows: a
    # purchase row with NULL value must still be THE match (with a NULL
    # value), never a frankenrow pairing the newest ts with an older
    # row's value — ASOF matches whole rows.
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id", "ts",
        F.lit(0).alias("tag"),
        F.struct(
            F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
        ).alias("p"),
    )
    u = clicks.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select(
        "event_id", "user_id", "ts", "tag",
        F.last("p", ignorenulls=True).over(w).alias("lp"),
    )
    return filled.filter(F.col("tag") == 1).select(
        "event_id", "ts",
        F.col("lp.p_ts").alias("purchase_ts"),
        F.col("lp.p_value").alias("purchase_value"),
    )


@register(
    "op38_join_self_sequential",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                          lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                 ORDER BY o_orderdate, o_orderkey),
                          o_orderdate) AS BIGINT) AS gap_days
    FROM orders
    """,
)
def op38_join_self_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive orders per customer — the self-join expressed as a
    lag window (one shuffle on the partition key instead of a
    self-equi-join that would double-scan the fact)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("gap_days"),
    )


_OP39_SQL = f"""
SELECT n_name, CAST(SUM({SQL_REVENUE_DEC}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("op39_join_multiway_star", oracle=_OP39_SQL)
def op39_join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table star join + aggregation — the flagship
    query (also served by ``entry``). Dims broadcast; the only
    fact-side shuffle is lineitem⋈orders (bucketed co-location at
    production scale) and the final 25-group aggregate."""
    t = load_tables(
        spark,
        sf_dir,
        ("lineitem", "orders", "customer", "supplier", "nation", "region"),
    )
    li, o, c = t["lineitem"], t["orders"], t["customer"]
    s, n, r = t["supplier"], t["nation"], t["region"]
    # join conditions and the filter as single JVM-parsed expression
    # strings (op79's flattening rule: identical Catalyst plan, a
    # fraction of the py4j round trips — this is the flagship build,
    # measured in every bench's plan_build_per_query)
    j = (
        li.join(o, F.expr("l_orderkey = o_orderkey"))
        .join(c, F.expr("o_custkey = c_custkey"))
        .join(
            F.broadcast(s),
            F.expr("l_suppkey = s_suppkey AND s_nationkey = c_nationkey"),
        )
        .join(F.broadcast(n), F.expr("c_nationkey = n_nationkey"))
        .join(F.broadcast(r), F.expr("n_regionkey = r_regionkey"))
        .filter(
            F.expr(
                "r_name = 'ASIA'"
                " AND o_orderdate >= timestamp'1996-01-01 00:00:00'"
                " AND o_orderdate < timestamp'1998-01-01 00:00:00'"
            )
        )
    )
    return j.groupBy("n_name").agg(F.sum(revenue_dec()).cast("double").alias("revenue"))


_OP27_SQL = """
SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
"""


@register("op40_join_smj_hint", oracle=_OP27_SQL)
def op40_join_smj_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op27 with an explicit sort-merge-join hint — the plan-level check
    that the SMJ path (the default for two large pre-sorted/bucketed
    tables at scale) produces identical results."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return t["orders"].hint("merge").join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey"), "inner"
    ).select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")


@register("op41_join_shuffle_hash_hint", oracle=_OP27_SQL)
def op41_join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op27 with a shuffle-hash hint (avoids the sort when one side is
    modest per-partition; the skew-prone choice AQE can rescue)."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return t["orders"].hint("shuffle_hash").join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey"), "inner"
    ).select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")
