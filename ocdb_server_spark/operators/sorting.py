"""Sorts / limits / top-k / pagination — SURVEY.md §2.6 (op50–op52).

op52 is the reference's paging contract verbatim:
`find(...).skip(offset).limit(count)` in
`ocdb/db/mongo_db_driver.py::MongoDbDriver.find_datasets` [U], with
offset/count parsed by `ocdb/ws/reqparams.py::RequestParams` [U].

Scale note: `orderBy().limit(k)` plans as `TakeOrderedAndProject` —
each partition keeps its local top-k, the driver merges k·p rows; no
global sort ever materializes. OFFSET pagination is fine at the
result-set sizes a search API returns; deep pagination at 100 TB
should be keyset-based (WHERE key > last_seen ORDER BY key LIMIT n),
which op52's unique order key enables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.operators._helpers import revenue_dec, SQL_REVENUE_DEC
from ocdb_server_spark.registry import register


@register(
    "op50_sort_multikey_nulls",
    oracle="""
    SELECT c_custkey, seg, c_acctbal
    FROM (SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal
          FROM customer)
    ORDER BY seg ASC NULLS LAST, c_acctbal DESC, c_custkey
    LIMIT 50
    """,
)
def op50_sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with explicit NULLS LAST on a derived nullable
    column (Spark's ASC default is NULLS FIRST — the explicit modifier
    matters), LIMIT so ordering affects the result set."""
    c = load_table(spark, sf_dir, "customer")
    t = c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        "c_acctbal",
    )
    return t.orderBy(
        F.col("seg").asc_nulls_last(), F.col("c_acctbal").desc(), "c_custkey"
    ).limit(50)


@register(
    "op51_topk_global",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, CAST(rev AS DOUBLE) AS revenue
    FROM (SELECT l_orderkey, l_linenumber, {SQL_REVENUE_DEC} AS rev FROM lineitem)
    ORDER BY rev DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def op51_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by the revenue expression — the one deliberate
    globally-ordered op in the inventory, planned as
    TakeOrderedAndProject (per-partition heap, no global sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select("l_orderkey", "l_linenumber", revenue_dec().alias("rev"))
    return (
        t.orderBy(F.col("rev").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
        .select("l_orderkey", "l_linenumber", F.col("rev").cast("double").alias("revenue"))
    )


@register(
    "op52_limit_offset_page",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def op52_limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 3 of size 20 under a deterministic order — the reference's
    offset/count paging (`find().skip(offset).limit(count)` [U])."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .offset(40)
        .limit(20)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )
