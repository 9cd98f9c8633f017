"""Scalar functions — SURVEY.md §2.8 (op58–op68).

Reference anchors: SeaBASS parsing normalizes case, trims, splits on
the header delimiter, and parses dates from several layouts
(`ocdb/core/seabass/sb_file_reader.py::SbFileReader` [U]); the
wildcard→regex translation lives in `QueryConverter` [U]. Array /
map / JSON / hash functions are north-star additions for the
embedding + multimodal columns.

Everything here is a built-in `pyspark.sql.functions` expression —
JVM-side, inside whole-stage codegen; no Python in the hot path.

Cross-engine trap handled here (SURVEY.md §4.2.3): on the DuckDB
shipped in this environment, ROUND on doubles is half-AWAY-from-zero
— the same mode as Spark `round` (HALF_UP) — while Spark `bround`
is HALF_EVEN and differs on exactly-representable ties (e.g.
85/128 = 0.6640625: round→0.664063 on both engines, bround→0.664062).
Verified empirically round 13; where rounding appears we use Spark
`round` to match DuckDB's ROUND exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.io import load_table, load_tables
from ocdb_server_spark.operators._helpers import dsum, sql_dsum
from ocdb_server_spark.registry import register


@register(
    "op58_str_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           trim(concat(' ', p_name, ' ')) AS name_trim,
           substr(p_name, 1, 5) AS name_pfx,
           concat(p_name, '|', p_brand) AS name_brand,
           CAST(length(p_name) AS BIGINT) AS name_len,
           replace(p_name, 'red', 'blue') AS name_repl
    FROM part
    """,
)
def op58_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/trim/substr/concat/length/replace (ref: parse-time
    normalization in SbFileReader [U])."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat(F.col("p_name"), F.lit("|"), F.col("p_brand")).alias("name_brand"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.replace(F.col("p_name"), F.lit("red"), F.lit("blue")).alias("name_repl"),
    )


@register(
    "op59_str_split_regexp",
    oracle="""
    SELECT p_partkey,
           string_split(p_name, ' ')[1] AS adj,
           regexp_extract(p_name, '([a-z]+)$', 1) AS noun,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled
    FROM part
    """,
)
def op59_str_split_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split / regexp_extract / regexp_replace (ref: delimiter split and
    $regex compilation [U]). DuckDB regexp_replace needs the 'g' flag to
    match Spark's replace-all semantics."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split(F.col("p_name"), " ").getItem(0).alias("adj"),
        F.regexp_extract(F.col("p_name"), r"([a-z]+)$", 1).alias("noun"),
        F.regexp_replace(F.col("p_name"), r"[aeiou]", "").alias("devoweled"),
    )


@register(
    "op60_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_epoch0,
           CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
)
def op60_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/quarter/dayofweek/date_trunc/datediff/add_months/
    last_day (ref: multi-layout time parsing + interval overlap [U]).
    Convention traps: Spark dayofweek is 1=Sunday, DuckDB's 0=Sunday —
    oracle adds 1; add_months and `+ INTERVAL MONTH` both clamp to
    month end."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch0"),
        F.add_months(F.col("o_orderdate"), 2).alias("plus_2mo"),
        F.last_day(F.col("o_orderdate")).alias("month_end"),
    )


@register(
    "op61_math_funcs",
    oracle="""
    SELECT p_partkey,
           round(p_retailprice, 1) AS price_r1,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           abs(p_size - 25) AS size_dist,
           CAST(p_size % 7 AS BIGINT) AS size_mod,
           CAST(sign(p_size - 25) AS DOUBLE) AS size_sign,
           round(pow(CAST(p_size AS DOUBLE), 2.0), 6) AS size_sq,
           round(sqrt(p_retailprice), 6) AS price_sqrt,
           round(ln(p_retailprice), 6) AS price_ln,
           round(log10(p_retailprice), 6) AS price_log10
    FROM part
    """,
)
def op61_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/floor/ceil/abs/mod/sign/pow/sqrt/ln/log10. Transcendentals
    (pow/ln/log10) are libm-dependent across engines → rounded to 6dp
    with half-away-from-zero on both sides (Spark round == DuckDB
    ROUND; bround's HALF_EVEN diverges on exact ties — round-13
    review)."""
    p = load_table(spark, sf_dir, "part")
    sizei = F.col("p_size").cast("int")
    return p.select(
        "p_partkey",
        F.round(F.col("p_retailprice"), 1).alias("price_r1"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.abs(sizei - 25).alias("size_dist"),
        (sizei % 7).cast("bigint").alias("size_mod"),
        F.signum((sizei - 25).cast("double")).alias("size_sign"),
        F.round(F.pow(F.col("p_size").cast("double"), 2.0), 6).alias("size_sq"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice")), 6).alias("price_ln"),
        F.round(F.log10("p_retailprice"), 6).alias("price_log10"),
    )


@register(
    "op62_array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           words[1] AS first_word,
           array_to_string(words[1:3], ' ') AS first3,
           list_contains(words, 'select') AS has_select,
           array_to_string(list_sort(words), ' ') AS sorted_words
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    """,
)
def op62_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice/array_contains/sort_array over tokenized
    text (NS: embeddings/multimodal plumbing)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("words"))
    return t.select(
        "doc_id",
        F.size("words").cast("bigint").alias("n_words"),
        F.element_at(F.col("words"), 1).alias("first_word"),
        F.array_join(F.slice(F.col("words"), 1, 3), " ").alias("first3"),
        F.array_contains(F.col("words"), "select").alias("has_select"),
        F.array_join(F.sort_array(F.col("words")), " ").alias("sorted_words"),
    )


@register(
    "op63_array_higher_order",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_reduce(list_transform(embedding,
                                                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                  (acc, x) -> acc + x)), 6) AS l2_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(embedding[1] AS DOUBLE) * 2 AS first_x2
    FROM embeddings
    """,
)
def op63_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / aggregate lambdas over the embedding column
    (NS): L2 norm via fold, positive-component count, scaled element.
    Both engines fold left-to-right over per-element double promotions,
    rounded 6dp to absorb last-bit differences."""
    e = load_table(spark, sf_dir, "embeddings")
    sq = F.transform(
        F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
    )
    return e.select(
        "vec_id",
        F.round(
            F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)), 6
        ).alias("l2_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("bigint").alias("n_pos"),
        (F.element_at(F.col("embedding"), 1).cast("double") * 2).alias("first_x2"),
    )


@register("op64_map_funcs", oracle=None)  # ROWS: DuckDB map dialect differs
def op64_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + access: build a kv string, parse with
    str_to_map, read keys/values/lookups (RC; map columns are the
    typed-metadata carrier for multimodal assets)."""
    p = load_table(spark, sf_dir, "part")
    kv = F.concat(
        F.lit("brand="), F.col("p_brand"), F.lit(",type="), F.col("p_type")
    )
    t = p.select("p_partkey", F.str_to_map(kv, F.lit(","), F.lit("=")).alias("m"))
    return t.select(
        "p_partkey",
        F.array_join(F.map_keys(F.col("m")), ",").alias("keys"),
        F.array_join(F.map_values(F.col("m")), ",").alias("vals"),
        F.col("m").getItem("brand").alias("brand"),
        F.col("m").getItem("type").alias("ptype"),
    )


@register(
    "op65_json_extract",
    oracle=f"""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value', 18, 6)} AS sum_value
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) < 50
    GROUP BY 1
    """,
)
def op65_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction + filter + group on the extracted value
    (ref-adjacent: config/JSON in the ws layer [U]; NS multimodal
    metadata)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select(k.alias("k"), "value")
        .filter(F.col("k") < 50)
        .groupBy((F.col("k") % 10).cast("bigint").alias("k_bucket"))
        .agg(F.count("*").alias("n"), dsum("value", 18, 6).alias("sum_value"))
    )


@register(
    "op66_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS tier,
           coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2,
           greatest(c_acctbal, 0.0) AS bal_pos,
           least(c_acctbal, 0.0) AS bal_neg
    FROM customer
    """,
)
def op66_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN tiers, coalesce/nullif, least/greatest."""
    c = load_table(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return c.select(
        "c_custkey",
        tier.alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg2"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_pos"),
        F.least(F.col("c_acctbal"), F.lit(0.0)).alias("bal_neg"),
    )


@register(
    "op67_cast_decimal",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS sum_exact,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def op67_cast_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money math: DECIMAL(12,2) sums surfaced as canonical
    strings (both engines print scale-2 decimals identically, so the
    compare proves exactness rather than float luck)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("string")
        .alias("sum_exact"),
        F.count("*").alias("n"),
    )


@register(
    "op68_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256
    FROM documents
    """,
)
def op68_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content fingerprints (NS dedup primitive). md5 +
    sha256 are oracle-checked; xxhash64 (Spark-only, no DuckDB
    equivalent) is exercised by the MinHash pipeline in op79."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
    )
