"""Set operations — SURVEY.md §2.7 (op53–op57). All relational
completeness (the reference delegates set logic to MongoDB `$in`/
`$or`). Spark: UNION is a zero-shuffle concatenation; DISTINCT /
INTERSECT / EXCEPT shuffle on the full row — at 100 TB prefer
pre-aggregated keys or semi/anti joins on a single key column, which
is how op55/op56 are phrased.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.io import load_table, load_tables
from ocdb_server_spark.registry import register


@register(
    "op53_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 300000.0
    """,
)
def op53_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two overlapping selections (duplicates retained)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")
    b = o.filter(F.col("o_totalprice") > 300000.0).select("o_orderkey", "o_totalprice")
    return a.unionByName(b)


@register(
    "op54_union_distinct",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 300000.0
    """,
)
def op54_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-semantics union."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")
    b = o.filter(F.col("o_totalprice") > 300000.0).select("o_orderkey", "o_totalprice")
    return a.unionByName(b).distinct()


@register(
    "op55_intersect",
    oracle="""
    SELECT c_custkey FROM customer
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def op55_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer keys ∩ ordering-customer keys."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return t["customer"].select("c_custkey").intersect(
        t["orders"].select(F.col("o_custkey").alias("c_custkey"))
    )


@register(
    "op56_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def op56_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set minus: customers that never ordered."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return t["customer"].select("c_custkey").subtract(
        t["orders"].select(F.col("o_custkey").alias("c_custkey"))
    )


@register(
    "op57_intersect_except_all",
    oracle="""
    (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
     INTERSECT ALL
     SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F')
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_quantity > 40
    """,
)
def op57_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag semantics: INTERSECT ALL then EXCEPT ALL (multiplicities
    min() / subtract, per ANSI)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_suppkey")
    c = li.filter(F.col("l_quantity") > 40).select("l_suppkey")
    return a.intersectAll(b).exceptAll(c)
