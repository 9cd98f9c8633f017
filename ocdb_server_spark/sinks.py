"""Serving-table sinks: the reference's submission→publish step
(SURVEY.md §3.2 — `datasets.add_dataset` making records searchable)
as batch MERGE semantics on plain parquet (no Delta dependency in
this environment; the API is the seam where `MERGE INTO` drops in).

`upsert_partitioned` implements keyed upsert with DYNAMIC PARTITION
OVERWRITE: only the partitions touched by the update batch are read,
merged (keep-latest per key), and rewritten — untouched partitions are
never opened. That is the property that makes publish-style upserts
viable on a 100 TB table: cost scales with the update's partition
footprint, not the table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    df.write.partitionBy(partition_col).mode("overwrite").parquet(path)


def upsert_partitioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    partition_col: str,
) -> None:
    """Merge `updates` into the parquet table at `path`: for each key,
    the row with the greatest `order_col` survives (keep-latest — the
    reference's re-submission semantics, op76's policy).

    Only partitions present in `updates` are read and rewritten
    (spark.sql.sources.partitionOverwriteMode=dynamic), so the merge
    cost is bounded by the update's partition footprint."""
    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not touched:
        return
    current = spark.read.parquet(path).filter(F.col(partition_col).isin(touched))
    merged = current.unionByName(updates)
    w = W.partitionBy(*keys).orderBy(F.col(order_col).desc())
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        latest.write.partitionBy(partition_col).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
