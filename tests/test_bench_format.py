"""bench.py output-format contract.

The driver records only the last ~2000 chars of bench stdout and
json-parses the FINAL line. BENCH_r07 recorded parsed=null because the
single all-detail JSON line outgrew that window and the captured tail
started mid-line. These tests pin the fix: compact_summary() must stay
inside a hard 1800-char budget (leaving headroom for a partial
preceding line inside the same 2000-char window) while carrying the
contract fields, for both the real detail snapshot checked in at HEAD
and a synthetically widened worst case.
"""

import json
import os

import bench

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONTRACT_KEYS = ("metric", "value", "unit", "queries", "sf")
GRADE_KEYS = (
    "yardstick_ratio_raw",
    "yardstick_ratio_floor_adjusted",
    "comparable5_total_sec",
    "comparable5_yardstick_sec",
    "legacy_noop_total_sec",
    "job_floor_sec",
    "job_floor_at_legacy_sec",
    "plan_build_sec",
)


def _detail_fixture():
    with open(os.path.join(ROOT, "bench_detail.json")) as f:
        return json.load(f)


def test_compact_line_fits_capture_window():
    line = bench.compact_summary(_detail_fixture())
    assert len(line) <= 1800
    parsed = json.loads(line)
    for k in CONTRACT_KEYS + GRADE_KEYS:
        assert k in parsed, k
    # per-query dispersion survives at the real sizes
    assert parsed["queries_median"].keys() == parsed["queries"].keys()


def test_compact_line_sheds_rather_than_overflow():
    """Force the shed ladder to actually fire: 30 long-named headline
    queries make the full compact dict overshoot 1800 chars, so
    compact_summary must drop non-contract fields (median first)
    until the line fits — never emit an overlong or unparseable final
    line, and never shed the contract fields."""
    d = dict(_detail_fixture())
    # 25 queries at realistic op-key name lengths (~30 chars): the
    # full compact dict overshoots, but the contract fields alone fit
    # (the ladder can't shed those — compact_summary documents the
    # physical ceiling of ~35 contract-only entries)
    many = {
        f"op{900 + i}_headline_query_name_pad": 123456.7891
        for i in range(25)
    }
    for dk in ("queries", "queries_median", "queries_noop_write_legacy"):
        d[dk] = dict(many)
    # sanity: the unshed line really is over budget, so the ladder runs
    assert len(json.dumps({**d, "detail_file": "x"})) > 1800
    line = bench.compact_summary(d)
    assert len(line) <= 1800
    parsed = json.loads(line)
    for k in CONTRACT_KEYS:
        assert k in parsed, k
    assert parsed["queries"] == many          # contract dict intact
    assert "queries_median" not in parsed     # shed first


def test_main_prints_compact_line_last():
    # static check, no Spark: main()'s final print is the compact line
    import ast
    import inspect

    tree = ast.parse(inspect.getsource(bench.main))
    last = tree.body[0].body[-1]
    assert isinstance(last, ast.Expr)
    call = last.value
    assert isinstance(call, ast.Call) and call.func.id == "print"
    inner = call.args[0]
    assert isinstance(inner, ast.Call)
    assert inner.func.id == "compact_summary"
