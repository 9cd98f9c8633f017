"""Skew mitigation helpers (SURVEY.md §4.2.2).

What Spark already solves — don't re-solve it:
- GROUP BY skew for decomposable aggregates (sum/count/min/max/avg):
  the map-side partial aggregation collapses a hot key to one row per
  input partition before the shuffle. Salting would add a shuffle and
  win nothing. MEASURED (round 10, skew_stress.py --mode=agg): at a
  40%-hot key the two-phase salted form is 1.3-1.7× SLOWER at both
  10× and 100× data while the unsalted spread is already flat (1.4×).
- JOIN skew: AQE's skew-join splitting (enabled in session.py) splits
  oversized partitions at runtime.

What still needs explicit handling at 100 TB:
- A hot key under a WINDOW (top-k per key, collect_list per key):
  every row of the hot key lands in ONE task's sort buffer — partial
  aggregation can't help because the operator isn't decomposable.
  `salted_topk_per_key` is the two-phase fix: per-(key, salt) partial
  top-k bounds each task at k·salts rows per key, then a final top-k
  over the tiny partial set.
- Joins where AQE is unavailable (static plans, some streaming joins):
  `explode_salt_broadcast` replicates the small side per salt so the
  fact's hot key spreads over n_salts tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def salted_topk_per_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    k: int,
    n_salts: int = 16,
) -> DataFrame:
    """Top-k rows per key, skew-proof.

    Phase 1 computes top-k within (keys, salt) — the salt comes from
    spark_partition_id, so a hot key's rows split across up to n_salts
    window tasks and each sorts at most its own slice. Phase 2 re-ranks
    the ≤ k·n_salts survivors per key. Output matches the direct
    single-window top-k row-for-row (tested), but no task ever holds a
    whole hot key.

    order_by must define a total order (include a unique tiebreaker)
    for the result to be deterministic — same requirement the direct
    window has."""
    salt = (F.spark_partition_id() % n_salts).alias("_salt")
    w1 = W.partitionBy(*keys, "_salt").orderBy(*order_by)
    partial = (
        df.select("*", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = W.partitionBy(*keys).orderBy(*order_by)
    return (
        partial.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def explode_salt_broadcast(dim: DataFrame, n_salts: int) -> DataFrame:
    """Replicate each dimension row n_salts times with a `_salt`
    column; join the fact on (key, fact_salt == _salt) where fact_salt
    is `pmod(xxhash64(<any varying col>), n_salts)` — the hot fact key
    then spreads over n_salts tasks. Rarely needed with AQE skew-join
    on; kept for static plans and stream-static joins."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    return dim.select("*", salts)
