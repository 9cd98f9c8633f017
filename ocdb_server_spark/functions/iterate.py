"""Iterate-to-convergence for DataFrame fixpoints (SURVEY §4; the
round-10 verdict's "native recursive-query surface" item).

Spark has no recursive CTE: unbounded-depth recursions (connected
components, reachability closures, label propagation) are expressed as
a driver loop over a step function. Every hand-rolled version of that
loop has to re-solve the same three traps:

1. LINEAGE GROWTH — each iteration's plan contains the previous one's;
   without truncation the optimizer re-analyzes an exponentially
   deeper tree every round (and a failure recomputes from iteration
   0). `localCheckpoint` after each step keeps the per-iteration plan
   O(1).
2. CONVERGENCE PROBES ARE JOBS — detecting "nothing changed" costs an
   action per iteration; the probe should be the cheapest expression
   of "any difference exists" (LIMIT 1 semantics), not a full count.
3. SILENT NON-CONVERGENCE — exiting on range exhaustion ships labels
   that are NOT a fixpoint; the loop must fail loudly instead
   (op96's round-10 lesson, see connected_components).

`iterate_to_fixpoint` packages the three, plus per-iteration telemetry
(iteration index, probe result, wall seconds) so a 100 TB run's
convergence behavior is observable instead of a black box. op96's
connected_components is the in-repo adopter; bounded fixed-n loops
(op186's 5 PageRank steps, op213's 3 BFS hops) deliberately stay
unrolled — their iteration count is part of their oracle contract and
a convergence probe would add one job per step for nothing.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame


def any_row_differs(old: DataFrame, new: DataFrame) -> int:
    """Default convergence probe: 1 if `new` contains any row not in
    `old` (multiset semantics), else 0 — LIMIT 1 short-circuits the
    scan, so the probe job stops at the first difference. Steps that
    preserve a key column should pass a keyed probe instead (a join on
    the key compares only the evolving columns and prunes the rest;
    see connected_components)."""
    return new.exceptAll(old).limit(1).count()


def _truncate_lineage(df: DataFrame, reliable: bool) -> DataFrame:
    """Per-iteration lineage truncation, two durabilities:

    - local (default): `localCheckpoint` — blocks live in EXECUTOR
      memory/disk with the lineage cut. Fastest, zero external
      storage, the right call in one JVM — but an executor death
      destroys blocks that, lineage gone, CANNOT be recomputed: the
      job fails (measured, scripts/cluster_faultkill.py). Fine where
      the retry story is "re-run the job".
    - reliable: `checkpoint(eager=True)` — blocks are WRITTEN to the
      SparkContext checkpoint directory (shared storage on a real
      cluster: HDFS/S3), so losing any executor mid-loop recomputes
      nothing and loses nothing. The production mode for long
      fixpoints at 1000 executors, bought with one write+read of the
      state per iteration. Requires `sc.setCheckpointDir(...)` —
      checked here so the failure is a clear contract error, not a
      mid-loop Py4J stack."""
    if not reliable:
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        raise ValueError(
            "iterate_to_fixpoint(reliable=True) needs a checkpoint "
            "directory: call spark.sparkContext.setCheckpointDir(...) "
            "with shared storage first (HDFS/S3 on a cluster)"
        )
    return df.checkpoint(eager=True)


def iterate_to_fixpoint(
    state: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    changed: Callable[[DataFrame, DataFrame], int] = any_row_differs,
    max_iter: int = 20,
    checkpoint: bool = True,
    reliable: bool = False,
    telemetry: list[dict] | None = None,
    what: str = "iterate_to_fixpoint",
) -> DataFrame:
    """Apply `step` to `state` until `changed(old, new)` returns 0,
    and return the fixpoint frame.

    - state: initial frame. Checkpointed up front when `checkpoint`
      (the loop references it every probe; an expensive upstream
      lineage would otherwise re-run per iteration).
    - step: pure DataFrame→DataFrame iteration body. Loop-INVARIANT
      frames the body joins against (edge lists, dimension tables)
      should be persisted/checkpointed by the caller ONCE, outside —
      with the same durability as the loop: under reliable=True an
      invariant held only in executor memory is still lost with the
      executor.
    - changed: probe returning 0 iff converged; any-difference
      short-circuit by default.
    - reliable: False (default) truncates lineage with
      localCheckpoint (fast, executor-resident — an executor loss
      mid-loop FAILS the job); True uses directory-backed
      checkpoint() so the loop SURVIVES executor loss (see
      _truncate_lineage; fault-injection-verified in
      scripts/cluster_faultkill.py).
    - telemetry: optional list; one dict per iteration is appended:
      {"iteration", "changed", "seconds"} — "changed" is whatever the
      probe returned (0/1 for the default probe, a change count only
      if the caller's probe counts).
    - raises ValueError on max_iter exhaustion: a non-fixpoint result
      must never ship silently.
    """
    if reliable and not checkpoint:
        # reliable IS a checkpointing strategy: accepting this combo
        # would run with no lineage truncation at all — neither the
        # promised durability nor bounded plans (review finding).
        raise ValueError(
            f"{what}: reliable=True requires checkpoint=True — reliable "
            "durability IS directory-backed checkpointing"
        )
    if checkpoint:
        state = _truncate_lineage(state, reliable)
    n = -1
    for i in range(max_iter):
        t0 = time.time()
        new = step(state)
        if checkpoint:
            new = _truncate_lineage(new, reliable)  # O(1) plan per iter
        n = changed(state, new)
        state = new
        if telemetry is not None:
            telemetry.append(
                {
                    "iteration": i + 1,
                    "changed": n,
                    "seconds": round(time.time() - t0, 4),
                }
            )
        if n == 0:
            return state
    raise ValueError(
        f"{what}: no fixpoint after {max_iter} iterations — the result "
        "is not converged and would be silently wrong; raise max_iter"
    )
