"""Aggregations — SURVEY.md §2.3 (op16–op26).

Reference analog: the server computes only the hit `total_count`
(`find_datasets` → Mongo count_documents [U]); the rest is relational
completeness. All ops are `groupBy().agg()` — Catalyst plans a partial
(map-side) + final hash aggregate, so at 100 TB the shuffle carries
one row per (partition × group), not the data.

Float determinism: every SUM/AVG over doubles goes through exact
DECIMAL accumulation (see operators/_helpers.py) so results are
order-independent and bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.io import load_table, load_tables
from ocdb_server_spark.operators._helpers import (
    SQL_REVENUE_DEC,
    davg,
    dec,
    dsum,
    iavg,
    isum,
    revenue_dec,
    sql_davg,
    sql_dsum,
    sql_iavg,
    sql_isum,
)
from ocdb_server_spark.registry import register


@register(
    "op16_agg_global",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_davg('l_quantity')} AS avg_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    """,
)
def op16_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global count/sum/avg/min/max (ref: total_count)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        davg("l_quantity").alias("avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "op17_agg_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_isum('l_quantity')} AS sum_qty,
           {sql_isum('l_extendedprice')} AS sum_base_price,
           CAST(SUM({SQL_REVENUE_DEC}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({SQL_REVENUE_DEC} * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
           {sql_iavg('l_quantity')} AS avg_qty,
           {sql_iavg('l_extendedprice')} AS avg_price,
           {sql_iavg('l_discount')} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def op17_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: 2 group keys, 8 aggregates.

    Accumulator choice (measured at sf0.1, interleaved best-of-9):
    all-decimal 163 ms, all-scaled-int64 132 ms (overflows ~sf200 on
    the charge product — rejected), mixed 146 ms. Mixed = scaled-int64
    for the LINEAR fixed-point sums (exact + 100 TB-safe, see
    _helpers.isum) and decimal for the revenue/charge PRODUCT sums
    (whose 1e6-scaled magnitudes exceed int64 at cluster scale).
    All three are bit-identical at sf0.1; mixed keeps exactness at
    every scale."""
    li = load_table(spark, sf_dir, "lineitem")
    charge = revenue_dec() * (F.lit(1) + dec("l_tax", 3, 2))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            isum("l_quantity").alias("sum_qty"),
            isum("l_extendedprice").alias("sum_base_price"),
            F.sum(revenue_dec()).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            iavg("l_quantity").alias("avg_qty"),
            iavg("l_extendedprice").alias("avg_price"),
            iavg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "op18_agg_having",
    oracle=f"""
    SELECT o_custkey, {sql_dsum('o_totalprice')} AS sum_total
    FROM orders
    GROUP BY o_custkey
    HAVING {sql_dsum('o_totalprice')} > 400000.0
    """,
)
def op18_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups filtered on an aggregate (HAVING)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(dsum("o_totalprice").alias("sum_total"))
        .filter(F.col("sum_total") > 400000.0)
    )


@register(
    "op19_agg_count_distinct",
    oracle="""
    SELECT (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM lineitem) AS n_parts,
           (SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) FROM lineitem) AS n_supps,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT DISTINCT l_suppkey, l_returnflag FROM lineitem)) AS n_supp_flag
    """,
)
def op19_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts, incl. multi-column."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_suppkey", "l_returnflag").alias("n_supp_flag"),
    )


@register("op20_agg_approx_count_distinct", oracle=None)  # ROWS: approx ≠ exact oracle
def op20_agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path where exact
    distinct would shuffle every key (Spark-native sketch, mergeable
    map-side; rsd 1%).

    Shape (round 18, guide §1.2): both aggregates run over the
    DISTINCT key set, not the raw column. Values are bit-identical —
    HLL registers are max-folds of a deterministic per-value hash, so
    duplicate inserts are idempotent, and COUNT(key) over the distinct
    non-null keys IS COUNT(DISTINCT key) — but the old one-Aggregate
    form (approx + countDistinct side by side) triggered Catalyst's
    distinct-aggregate rewrite, which materialized a PARTIAL HLL
    SKETCH PER KEY: at rsd 1% the sketch buffer is ~1536 longs, wide
    enough that the HashAggregate drops out of whole-stage codegen,
    and 20k per-key interpreted sketch buffers cost 6.2 s at sf0.1
    (isolated: both-in-one 6.16 s, approx alone 1.91 s, exact alone
    0.25 s). Distinct-first runs the codegen two-phase distinct once
    and updates ONE sketch from 20k unique keys: 1.11 s sweep-best /
    0.86 s isolated, same two output values (equality asserted
    against the one-Aggregate form at all 3 SFs). The residual
    ~0.65 s is the interpreted HLL update itself — at rsd 1% the
    declarative buffer is ~1536 slots and every input row pays the
    full-width interpreted update regardless of partitioning
    (measured flat under coalesce(1)); irreducible without changing
    the op's declared rsd. Same win at 100 TB: the partial-distinct
    map side dedupes before the shuffle either way, but the per-key
    sketch army never exists."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select("l_partkey").distinct()
    return d.agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.count("l_partkey").alias("exact_parts"),
    )


@register(
    "op21_agg_rollup",
    oracle=f"""
    SELECT n_name, c_mktsegment,
           CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
           CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('c_acctbal')} AS sum_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def op21_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation, mktsegment) with grouping flags."""
    t = load_tables(spark, sf_dir, ("customer", "nation"))
    j = t["customer"].join(
        t["nation"], F.col("c_nationkey") == F.col("n_nationkey"), "inner"
    )
    return j.rollup("n_name", "c_mktsegment").agg(
        F.grouping("n_name").cast("bigint").alias("g_nation"),
        F.grouping("c_mktsegment").cast("bigint").alias("g_seg"),
        F.count("*").alias("n"),
        dsum("c_acctbal").alias("sum_bal"),
    )


@register(
    "op22_agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def op22_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.count("*").alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    )


@register(
    "op23_agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('o_totalprice')} AS sum_total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def op23_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "op24_agg_collect_sorted",
    oracle="""
    SELECT r_name,
           array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def op24_agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group sorted value list, surfaced as a joined string so the
    cross-engine compare is representation-stable (NS: multimodal
    assembly — e.g. gathering per-document chunks in order)."""
    t = load_tables(spark, sf_dir, ("nation", "region"))
    j = t["nation"].join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
    return j.groupBy("r_name").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


# Stats computed from exact decimal sums rather than the streaming
# builtin aggregates: Welford-style merge order is nondeterministic
# across partitions, so builtin stddev/corr can differ in the last bits
# between runs AND engines; (n, Σx, Σx², Σxy) in decimal are exact, and
# the closed-form double arithmetic after that is identical in both
# engines. Same asymptotic cost (one partial-agg pass).
_OP25_SQL = """
WITH s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM lineitem
)
SELECT (sxx - sx * sx / n) / (n - 1) AS var_qty,
       sqrt((sxx - sx * sx / n) / (n - 1)) AS std_qty,
       (sxy - sx * sy / n) / (n - 1) AS covar_qp,
       (sxy - sx * sy / n)
         / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_qp
FROM s
"""


@register("op25_agg_stats", oracle=_OP25_SQL)
def op25_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """var_samp / stddev_samp / covar_samp / corr via exact moment sums."""
    li = load_table(spark, sf_dir, "lineitem")
    q = dec("l_quantity", 18, 2)
    p = dec("l_extendedprice", 18, 2)
    s = li.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    return s.select(
        ((sxx - sx * sx / n) / (n - 1)).alias("var_qty"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("std_qty"),
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_qp"),
        (
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n))
        ).alias("corr_qp"),
    )


@register(
    "op26_agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
           ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def op26_agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) median + p90 per group. Both engines use
    linear interpolation at rank (n-1)*q; rounded to 6dp to absorb
    last-bit arithmetic differences."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
    )


@register("op107_agg_approx_percentile", oracle=None)  # ROWS: sketch-based
def op107_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via Spark's built-in quantile sketch
    (approx_percentile with accuracy 10000), alongside the exact values
    so the snapshot pins the sketch's behavior on this data.

    The scale path op26's exact percentile can't take: exact
    percentile_approx=1.0 needs a global sort or full value collection
    per group; the sketch is a bounded-memory mergeable summary — one
    partial per partition, merged on the driver-side final agg, O(1)
    rows shuffled. At 100 TB exact quantiles are off the table; this is
    the operator a production pipeline actually runs.

    Output is four scalar DOUBLE columns (not the arrays the builtins
    return) — the observable surface must stay scalar so row hashing /
    canonicalization works downstream.

    One pass per family (round 18, guide §1.2 — don't compute things
    twice): both quantiles are asked of ONE sketch / ONE counts-map
    via the array form, then unpacked to the same scalar columns.
    Per-quantile calls each built their own identical accumulator
    over the same input (two QuantileSummaries, two percentile
    hash-maps); the array form builds each once and queries it twice
    — values identical by construction (same accumulator state, same
    interpolation), asserted against the per-call form at all 3 SFs.
    Measured 0.73 → 0.66 s at sf0.1 (the scan+partial-agg pass
    dominates at this scale; the halved accumulator work is the
    100 TB-relevant term — two fewer merge trees per partition)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.expr("approx_percentile(l_quantity, array(0.5, 0.9), 10000)").alias("ap"),
        F.expr("percentile(l_quantity, array(0.5, 0.9))").alias("ep"),
    ).select(
        F.col("ap")[0].alias("approx_p50"),
        F.col("ap")[1].alias("approx_p90"),
        F.col("ep")[0].alias("exact_p50"),
        F.col("ep")[1].alias("exact_p90"),
    )
