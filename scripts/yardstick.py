#!/usr/bin/env python
"""Re-measure the DuckDB yardsticks under bench-equivalent conditions.

Round-5 ADVICE (medium): bench.py's hardcoded YARDSTICK_MS were
measured with op80's query-vector subquery and inline norm computation
in the timed region, while the Spark side moved the vector fetch to
plan build and precomputed corpus norms into the warm cache — an
asymmetry that silently skewed yardstick_ratio_* on any machine.

This script measures each comparable query SYMMETRICALLY to bench.py:

- warm DuckDB views over $SPARK_GRAFT_SF_DIR parquet (default sf0.1),
  one warm-up execution per query, then best-of-7 timed runs;
- materialization via `.arrow()` (the counterpart of bench.py's
  `df.toArrow()`);
- op17/op42/op39/op69 run their REGISTERED oracle SQL verbatim (the
  Spark plans compute from the same raw tables, so the registered SQL
  is already symmetric);
- op80 runs a serving-shape variant mirroring the Spark plan: corpus
  L2 norms precomputed into a materialized table (≈ io.
  load_embeddings_normed in the warm cache) and the query vector
  inlined as literals (fetched once, untimed — ≈ op80's plan-build
  head()). The legacy subquery shape is emitted alongside as
  op80_legacy_inline for transparency.

Output: one JSON line {"yardstick_ms": {...}, "machine": ..., ...}.
Paste yardstick_ms into bench.py's YARDSTICK_MS (with date + machine
annotation) after any methodology change. The numbers are MACHINE- AND
METHODOLOGY-SPECIFIC, not portable constants — bench.py's JSON says so
in yardstick_note.
"""

from __future__ import annotations

import json
import os
import platform
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

COMPARABLE = [
    "op17_agg_groupby",
    "op42_win_row_number_topk_group",
    "op39_join_multiway_star",
    "op69_stream_tumbling",
]

# Serving-shape op80: precomputed norms + literal query vector.
# {qvec_sql} is filled with an inline DOUBLE array literal; en is a
# materialized (vec_id, embedding, nrm) table built before timing.
_OP80_SERVING_SQL = """
WITH z AS (SELECT e.vec_id, e.nrm,
             CAST(unnest(e.embedding) AS DOUBLE) AS x,
             unnest({qvec_sql}) AS y
      FROM en e
      WHERE e.vec_id <> 0),
s AS (SELECT vec_id, ANY_VALUE(nrm) AS nrm, SUM(x*y) AS dot
      FROM z GROUP BY vec_id)
SELECT vec_id, ROUND(dot / (nrm * {qnorm!r}), 6) AS sim
FROM s
ORDER BY sim DESC, vec_id
LIMIT 10
"""


def _best_of(con: duckdb.DuckDBPyConnection, sql: str, reps: int = 7) -> float:
    con.execute(sql).arrow()  # warm-up, untimed
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        con.execute(sql).arrow()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # same repo-root path insert every other script here carries —
    # without it the registry import only resolves under PYTHONPATH
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from ocdb_server_spark.registry import load_all

    ops = load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    out: dict[str, float] = {}
    for name in COMPARABLE:
        out[name] = round(_best_of(con, ops[name].oracle) * 1000, 2)

    # op80 serving shape: precompute norms (the warm-cache counterpart),
    # fetch the query vector once (the plan-build counterpart, untimed).
    con.execute(
        "CREATE TABLE en AS SELECT vec_id, embedding, "
        "sqrt(list_sum(list_transform(embedding, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm "
        "FROM embeddings"
    )
    qvec = con.execute(
        "SELECT embedding FROM embeddings WHERE vec_id = 0"
    ).fetchone()[0]
    qvec = [float(x) for x in qvec]
    qn = 0.0
    for x in qvec:
        qn += x * x
    qn = qn ** 0.5
    qvec_sql = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in qvec) + "]"
    out["op80_sim_cosine_knn"] = round(
        _best_of(con, _OP80_SERVING_SQL.format(qvec_sql=qvec_sql, qnorm=qn))
        * 1000,
        2,
    )
    out["op80_legacy_inline"] = round(
        _best_of(con, ops["op80_sim_cosine_knn"].oracle) * 1000, 2
    )

    print(
        json.dumps(
            {
                "yardstick_ms": out,
                "sf_dir": sf_dir,
                "duckdb": duckdb.__version__,
                "machine": platform.processor() or platform.machine(),
                "cpus": os.cpu_count(),
                "methodology": "warm views, best-of-7, .arrow() fetch; "
                "op80 = precomputed-norm table + literal query vector "
                "(symmetric to bench.py's warm cache + plan-build fetch)",
            }
        )
    )


if __name__ == "__main__":
    main()
