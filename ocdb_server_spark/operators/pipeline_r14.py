"""Round-14 operator (SURVEY.md §2.23).

op267 — the GeoJSON serving shape of the reference's flagship search
path, hash-certified: `find_datasets` with `geojson=True` attaches
each hit's location as a GeoJSON Point string (the reference attaches
per-dataset lon/lat point lists to the search result — SURVEY.md §3.1
step 7; search.py builds it with to_json inside codegen). Every prior
search-path certification covered the PREDICATE surface (op07–op15
compile the same expr/bbox/set filters find_datasets composes); the
round-13 verdict's "Next round" item 5 named the RESULT SHAPE — the
GeoJSON point serialization plus the total_count+page envelope — as
the one genuinely uncovered user-visible surface. op267 runs the real
serving entry point end to end and certifies its bytes against DuckDB
json_object/json_array, which emit the same compact JSON (no spaces,
insertion-ordered keys) Spark's to_json emits.

Float discipline: coordinates are derived BIGINT (key arithmetic),
never doubles — cross-engine float-to-string formatting inside JSON is
exactly the divergence class the quantize-first rule exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.plans.expr_compiler import compile_expr
from ocdb_server_spark.registry import register
from ocdb_server_spark.search import (
    DatasetQuery,
    SearchColumns,
    _keyset_after,
    _predicate,
    find_datasets,
)

_OP267_SQL = """
WITH c AS (
  SELECT c_custkey,
         c_mktsegment,
         c_custkey % 360 - 180 AS x,
         (c_custkey * 7) % 180 - 90 AS y
  FROM customer
),
hits AS (
  SELECT * FROM c
  WHERE c_mktsegment = 'BUILDING'
    AND x BETWEEN -120 AND 120
    AND y BETWEEN -60 AND 60
)
SELECT c_custkey, c_mktsegment, x, y,
       CAST(json_object('type', 'Point',
                        'coordinates', json_array(x, y)) AS VARCHAR)
         AS geojson,
       CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS total_count
FROM hits
ORDER BY c_custkey
LIMIT 50
"""


@register(
    "op267_find_datasets_geojson",
    oracle=_OP267_SQL,
    # the registered plan IS the serving surface: the request compiler,
    # the predicate composer, the cursor builder and the page+geojson
    # assembly all live in search.py / plans.expr_compiler — a rewrite
    # there must re-front this op exactly like an oracle edit.
    deps=(find_datasets, _predicate, _keyset_after, compile_expr),
)
def op267_find_datasets_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /datasets?geojson=true, end to end (ref: find_datasets [U]
    attaching per-dataset lon/lat points — SURVEY.md §3.1 step 7):
    customer rows with derived integer lon/lat, queried through the
    REAL serving entry point — a Lucene-ish expr (exact segment
    equality), a bbox region, deterministic order_key paging — with
    geojson=True adding each hit's `{"type":"Point","coordinates":
    [x,y]}` string, and the envelope's total_count stamped on every
    page row. The DuckDB oracle restates the whole request INCLUDING
    the JSON serialization (json_object/json_array produce the same
    compact, insertion-ordered text to_json emits), so the hash gate
    certifies the result's bytes, not just the filtered row set.

    100 TB shape: the expr+bbox predicate compiles into ONE Catalyst
    conjunction pushed to the parquet scan (test_pipeline_r14 asserts
    PushedFilters carries all three columns); total_count is one
    partial-agg count over the pushed-predicate scan; the page plans
    as TakeOrderedAndProject (partial top-50 per partition — no global
    sort materializes) and the GeoJSON string is built by to_json
    INSIDE whole-stage codegen on the 50 surviving rows — serialization
    cost scales with the page, never the corpus. Keyset-cursor paging
    (q.after) composes unchanged for deep pagination."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_custkey") % 360 - 180).alias("x"),
        ((F.col("c_custkey") * 7) % 180 - 90).alias("y"),
    )
    cols = SearchColumns(x="x", y="y", order_key="c_custkey")
    q = DatasetQuery(
        expr="c_mktsegment:BUILDING",
        region=(-120, -60, 120, 60),
        count=50,
        geojson=True,
    )
    res = find_datasets(c, q, cols)
    return res.datasets.withColumn(
        "total_count", F.lit(res.total_count).cast("bigint")
    )
