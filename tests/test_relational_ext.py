"""Behavioral tests for the §2.13 relational extensions — properties
the DuckDB oracle can't see: cross-formulation equivalence (argmax vs
window, decorrelated subquery vs manual join) and reshaping
round-trips (unpivot∘pivot = identity on the long form).
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.registry import load_all

OPS = load_all()


def test_pivot_cells_sum_to_total(spark, sf_dir):
    piv = OPS["op100_pivot"].fn(spark, sf_dir)
    cell_cols = [c for c in piv.columns if c != "o_orderstatus"]
    total = piv.select(
        sum(F.col(c) for c in cell_cols).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "orders").count()


def test_unpivot_pivot_roundtrip(spark, sf_dir):
    """Re-widening the long form recovers the original wide values."""
    long = OPS["op101_unpivot"].fn(spark, sf_dir)
    wide = (
        long.groupBy("p_partkey")
        .agg(
            F.sum(F.when(F.col("metric") == "size", F.col("value"))).alias("size"),
            F.sum(F.when(F.col("metric") == "retailprice", F.col("value"))).alias(
                "retailprice"
            ),
        )
    )
    src = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    assert wide.exceptAll(src).count() == 0
    assert src.exceptAll(wide).count() == 0


def test_correlated_subquery_equals_manual_decorrelation(spark, sf_dir):
    """op102 must return exactly the rows of the hand-decorrelated
    formulation (aggregate on the correlation key + equi-join) — the
    rewrite Catalyst is trusted to perform."""
    got = OPS["op102_subquery_correlated"].fn(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    totals = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_tot")
    )
    manual = (
        o.join(totals, "o_custkey")
        .filter(F.col("o_totalprice").cast("decimal(18,2)") * 2 > F.col("_tot"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    assert got.exceptAll(manual).count() == 0
    assert manual.exceptAll(got).count() == 0


def test_argmax_equals_window_formulation(spark, sf_dir):
    """max_by/min_by must agree with the rank-1-per-partition window
    version it replaces (same data, two plans, identical rows)."""
    got = OPS["op103_agg_argmax"].fn(spark, sf_dir).select(
        "c_mktsegment", "top_customer", "bottom_customer"
    )
    c = load_table(spark, sf_dir, "customer")
    top = (
        c.withColumn(
            "_r", F.row_number().over(
                W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
            )
        )
        .filter(F.col("_r") == 1)
        .select("c_mktsegment", F.col("c_name").alias("top_customer"))
    )
    bot = (
        c.withColumn(
            "_r", F.row_number().over(
                W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").asc())
            )
        )
        .filter(F.col("_r") == 1)
        .select("c_mktsegment", F.col("c_name").alias("bottom_customer"))
    )
    manual = top.join(bot, "c_mktsegment")
    assert got.exceptAll(manual).count() == 0
    assert manual.exceptAll(got).count() == 0
