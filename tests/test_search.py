"""End-to-end tests of the find_datasets search façade (SURVEY.md §3.1
parity: expr + bbox + time + membership + pagination in one call),
bound to the driver's orders/part tables since the testdata has no geo
columns (same substitution op14 documents)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.search import (
    DatasetQuery,
    SearchColumns,
    find_datasets,
)

PART_COLS = SearchColumns(
    x="p_size",
    y="p_retailprice",
    order_key="p_partkey",
    default_text_fields=("p_name", "p_type"),
)


@pytest.fixture(scope="module")
def part(spark, sf_dir):
    return load_table(spark, sf_dir, "part")


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


def test_expr_only(part):
    res = find_datasets(part, DatasetQuery(expr="p_size:[1 TO 10]"), PART_COLS)
    manual = part.filter(F.col("p_size").between(1, 10)).count()
    assert res.total_count == manual
    assert res.datasets.count() == min(manual, 100)


def test_bbox_matches_manual_filter(part):
    q = DatasetQuery(region=(5, 500.0, 20, 1200.0), count=10_000)
    res = find_datasets(part, q, PART_COLS)
    manual = part.filter(
        F.col("p_size").between(5, 20) & F.col("p_retailprice").between(500.0, 1200.0)
    ).count()
    assert res.total_count == manual
    assert res.datasets.count() == manual


def test_expr_and_bbox_compose(part):
    q = DatasetQuery(expr="p_brand:*Brand*", region=(1, 0.0, 25, 2000.0))
    res = find_datasets(part, q, PART_COLS)
    manual = part.filter(
        F.col("p_brand").like("%Brand%")
        & F.col("p_size").between(1, 25)
        & F.col("p_retailprice").between(0.0, 2000.0)
    ).count()
    assert res.total_count == manual


def test_time_overlap_and_membership(orders):
    cols = SearchColumns(
        t_start="o_orderdate",
        group="o_orderpriority",
        order_key="o_orderkey",
    )
    q = DatasetQuery(
        time=("1995-01-01", "1995-12-31"),
        pgroup=["1-URGENT", "2-HIGH"],
        count=50,
    )
    res = find_datasets(orders, q, cols)
    manual = orders.filter(
        (F.col("o_orderdate") <= "1995-12-31")
        & (F.col("o_orderdate") >= "1995-01-01")
        & F.col("o_orderpriority").isin(["1-URGENT", "2-HIGH"])
    ).count()
    assert res.total_count == manual
    assert res.datasets.count() == min(manual, 50)


def test_pagination_is_deterministic_partition(part):
    q_all = DatasetQuery(expr="p_size:[1 TO 50]", count=10_000)
    total = find_datasets(part, q_all, PART_COLS).total_count
    seen = []
    off, size = 0, 57
    while off < total:
        page = find_datasets(
            part, DatasetQuery(expr="p_size:[1 TO 50]", offset=off, count=size), PART_COLS
        ).datasets.collect()
        seen.extend(r["p_partkey"] for r in page)
        off += size
    assert len(seen) == total
    assert len(set(seen)) == total
    assert seen == sorted(seen)


def test_result_echoes_query(part):
    q = DatasetQuery(expr="p_size:7")
    res = find_datasets(part, q, PART_COLS)
    assert res.query is q


def test_missing_binding_raises(part):
    with pytest.raises(ValueError, match="region"):
        find_datasets(part, DatasetQuery(region=(0, 0, 1, 1)), SearchColumns(order_key="p_partkey"))


def test_search_predicate_pushes_down(part):
    """The whole composed query must reach the scan as pushed filters —
    the design point of compiling params into one Catalyst predicate."""
    q = DatasetQuery(expr="p_brand:*Brand*", region=(1, 0.0, 25, 2000.0))
    from ocdb_server_spark.search import _predicate

    plan = (
        part.filter(_predicate(q, PART_COLS))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pushed = plan.split("PushedFilters:")[1][:400]
    assert "p_size" in pushed and "p_retailprice" in pushed


def test_pgroup_map_expansion(orders):
    """Reference semantics: pgroup names resolve through the
    product-group mapping (ocdb/res/product-groups.json [U]) into
    member names; pname unions in literal members; an unknown group
    contributes nothing when a mapping is configured."""
    cols = SearchColumns(
        group="o_orderpriority",
        order_key="o_orderkey",
        pgroup_map={"rush": ("1-URGENT", "2-HIGH"), "empty_group": ()},
    )
    manual = orders.filter(
        F.col("o_orderpriority").isin(["1-URGENT", "2-HIGH", "5-LOW"])
    ).count()
    res = find_datasets(
        orders, DatasetQuery(pgroup=["rush"], pname=["5-LOW"], count=10), cols
    )
    assert res.total_count == manual
    # unknown group under a configured mapping matches nothing
    assert (
        find_datasets(orders, DatasetQuery(pgroup=["nope"], count=10), cols).total_count
        == 0
    )
    # duplicate members across pgroup and pname dedup cleanly
    res2 = find_datasets(
        orders,
        DatasetQuery(pgroup=["rush"], pname=["1-URGENT"], count=10),
        cols,
    )
    assert res2.total_count == orders.filter(
        F.col("o_orderpriority").isin(["1-URGENT", "2-HIGH"])
    ).count()


def test_reference_param_surface(orders):
    """The remaining reference find_datasets params (mtype, wlmode,
    shallow, wdepth, status, pmode — SURVEY.md §1.2 row 3) compose into
    the same single predicate, bound to testdata columns: status →
    o_orderstatus, wdepth → o_totalprice range, mtype →
    o_orderpriority, plus derived wlmode/shallow columns."""
    df = orders.withColumn(
        "wl",
        F.when(F.col("o_orderkey") % 2 == 0, "multispectral").otherwise(
            "hyperspectral"
        ),
    ).withColumn("sh", F.col("o_orderkey") % 3 == 0)
    cols = SearchColumns(
        order_key="o_orderkey",
        group="o_orderpriority",
        mtype="o_orderpriority",
        wlmode="wl",
        shallow="sh",
        wdepth="o_totalprice",
        status="o_orderstatus",
    )
    q = DatasetQuery(
        mtype="1-URGENT",
        wlmode="multispectral",
        shallow="exclusively",
        wdepth=(1000.0, 100000.0),
        status="F",
        count=10_000,
    )
    manual = df.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("wl") == "multispectral")
        & F.col("sh")
        & F.col("o_totalprice").between(1000.0, 100000.0)
        & (F.col("o_orderstatus") == "F")
    ).count()
    res = find_datasets(df, q, cols)
    assert res.total_count == manual and manual > 0
    # shallow='no' (default) excludes flagged rows
    res_no = find_datasets(df, DatasetQuery(count=10_000), cols)
    assert res_no.total_count == df.filter(~F.col("sh")).count()
    # shallow='yes' disables the filter entirely
    res_yes = find_datasets(df, DatasetQuery(shallow="yes", count=10_000), cols)
    assert res_yes.total_count == df.count()
    # pmode='dont_apply' skips the membership filter but keeps others
    res_pm = find_datasets(
        df,
        DatasetQuery(pgroup=["1-URGENT"], pmode="dont_apply", shallow="yes", count=10_000),
        cols,
    )
    assert res_pm.total_count == df.count()
    # default 'contains' still applies it
    res_ct = find_datasets(
        df, DatasetQuery(pgroup=["1-URGENT"], shallow="yes", count=10_000), cols
    )
    assert res_ct.total_count == df.filter(F.col("o_orderpriority") == "1-URGENT").count()
    # validation: bad enum values and missing bindings raise
    with pytest.raises(ValueError, match="wlmode"):
        find_datasets(df, DatasetQuery(wlmode="nope"), cols)
    with pytest.raises(ValueError, match="shallow"):
        find_datasets(df, DatasetQuery(shallow="maybe"), cols)
    bare = SearchColumns(order_key="o_orderkey")
    with pytest.raises(ValueError, match="mtype"):
        find_datasets(df, DatasetQuery(mtype="x"), bare)
    with pytest.raises(ValueError, match="status"):
        find_datasets(df, DatasetQuery(status="F"), bare)
    with pytest.raises(ValueError, match="wdepth"):
        find_datasets(df, DatasetQuery(wdepth=(0.0, 1.0)), bare)
    # no shallow binding: default is a no-op, 'exclusively' is an error
    assert find_datasets(df, DatasetQuery(count=10), bare).total_count == df.count()
    with pytest.raises(ValueError, match="shallow"):
        find_datasets(df, DatasetQuery(shallow="exclusively"), bare)


def test_geojson_output(part):
    """geojson=True attaches a GeoJSON Point per hit (reference: the
    per-dataset location lists of §3.1 step 7)."""
    import json

    q = DatasetQuery(expr="p_size:[1 TO 5]", count=5, geojson=True)
    res = find_datasets(part, q, PART_COLS)
    rows = res.datasets.collect()
    assert rows and all("geojson" in r.asDict() for r in rows)
    g = json.loads(rows[0]["geojson"])
    assert g["type"] == "Point" and len(g["coordinates"]) == 2
    # bindings missing -> explicit error, not a silent omission
    import pytest as _pt

    with _pt.raises(ValueError):
        find_datasets(
            part,
            DatasetQuery(geojson=True),
            SearchColumns(order_key="p_partkey"),
        )


def test_keyset_cursor_walk_equals_offset_walk(orders):
    """Cursor-paged traversal (after=last sort tuple) must visit
    exactly the rows offset paging visits, in the same total order —
    no dups, no gaps — while each page is a pushed filter + top-k
    instead of a deep skip-scan (round-5 verdict item 6)."""
    cols = SearchColumns(
        order_key="o_orderkey", order_by=("o_orderdate", "o_orderkey")
    )
    q0 = DatasetQuery(expr="o_totalprice:[100000 TO 200000]", count=10_000)
    full = find_datasets(orders, q0, cols)
    expected = [
        (r["o_orderdate"], r["o_orderkey"]) for r in full.datasets.collect()
    ]
    assert full.total_count == len(expected)

    seen, after, size = [], None, 97
    while True:
        q = DatasetQuery(
            expr="o_totalprice:[100000 TO 200000]", count=size, after=after
        )
        res = find_datasets(orders, q, cols)
        rows = res.datasets.collect()
        if not rows:
            break
        seen.extend((r["o_orderdate"], r["o_orderkey"]) for r in rows)
        after = seen[-1]
        assert res.total_count == full.total_count  # total is query-wide
    assert seen == expected


def test_keyset_cursor_predicate_pushes_down(orders):
    """The cursor tuple must land in PushedFilters (the leading
    strict-> component is a plain range predicate) and the page must
    plan as TakeOrderedAndProject — the op193 shape, now in the
    flagship search path."""
    import datetime

    cols = SearchColumns(
        order_key="o_orderkey", order_by=("o_orderdate", "o_orderkey")
    )
    cur = (datetime.datetime(1995, 6, 1), 42)
    res = find_datasets(orders, DatasetQuery(count=20, after=cur), cols)
    plan = res.datasets._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    pushed = plan.split("PushedFilters:")[1][:500]
    assert "o_orderdate" in pushed, f"cursor must push to scan: {pushed}"


def test_keyset_cursor_arity_mismatch_raises(orders):
    cols = SearchColumns(
        order_key="o_orderkey", order_by=("o_orderdate", "o_orderkey")
    )
    with pytest.raises(ValueError, match="cursor"):
        find_datasets(orders, DatasetQuery(after=(1,)), cols)
