"""Round-5g batch: deterministic string aggregation, trailing-window
active users, directed-graph reciprocity. Pins partition-order
independence of the sorted listagg, the exact WAU window algebra on a
gappy day domain, and the closed-form reciprocity ppm."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stringagg_sorted_and_partition_invariant(spark, tmp_path):
    from mxsparkg.contract import contract_queries

    rows = [(i, f"t{i}", "fr", f"s{9 - (i % 4)}", 10) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint")
    df.repartition(13).write.parquet(str(tmp_path / "documents.parquet"))
    out = contract_queries()["agg_stringagg"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.lang, r.sources, r.n_sources) == ("fr", "s6,s7,s8,s9", 4)


def test_wau_window_algebra_gappy_days(spark, tmp_path):
    """u1 active day 0, u2 day 3, u3 day 10. Observed days {0, 3, 10}:
    wau(0) = {u1}; wau(3) = {u1 (0 is within the trailing 7), u2};
    wau(10) = {u3} only (day 3 is 7 days back — outside the 7-day
    trailing window [4, 10]). Non-observed days must be absent."""
    import datetime as dt

    from mxsparkg.contract import contract_queries

    base = dt.datetime(2026, 1, 1, 6, 0, 0)
    rows = [
        (1, base, 1, "view", 0.0, "{}"),
        (2, base + dt.timedelta(days=3), 2, "view", 0.0, "{}"),
        (3, base + dt.timedelta(days=10), 3, "view", 0.0, "{}"),
        (4, base + dt.timedelta(days=10, hours=5), 3, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string")
    df.write.parquet(str(tmp_path / "events.parquet"))
    d0 = (base.date() - dt.date(1970, 1, 1)).days
    got = {
        r.day - d0: r.wau
        for r in contract_queries()["evt_wau"](spark, str(tmp_path)).collect()
    }
    assert got == {0: 1, 3: 2, 10: 1}


def test_reciprocity_closed_form(spark, tmp_path):
    """Flows {1→2, 2→1, 1→3}: n_edges 3, n_recip 2, ppm floor(2e6/3)."""
    from mxsparkg.contract import contract_queries

    # customers c10(nat 1), c20(nat 2); suppliers s1(nat 1), s2(nat 2),
    # s3(nat 3); orders o1 by c10, o2 by c20; lineitems: o1→s2 (1→2),
    # o1→s3 (1→3), o2→s1 (2→1), plus a self-loop o1→s1 (dropped) and a
    # duplicate o1→s2 (distinct collapses it).
    spark.createDataFrame(
        [(10, 1), (20, 2)], "c_custkey bigint, c_nationkey bigint"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "s_suppkey bigint, s_nationkey bigint"
    ).write.parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(
        [(100, 10), (200, 20)], "o_orderkey bigint, o_custkey bigint"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(100, 2), (100, 3), (200, 1), (100, 1), (100, 2)],
        "l_orderkey bigint, l_suppkey bigint",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = contract_queries()["graph_reciprocity"](
        spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_edges, r.n_recip, r.recip_ppm) == (3, 2, 666666)


def test_prefix_sum_rank_equals_window_and_invariant(spark):
    """prefix_sum_rank must equal the single-partition row_number on the
    same total order, under wildly different input layouts (1 vs 17
    partitions) and with empty range partitions possible (n rows <<
    shuffle partitions)."""
    from pyspark.sql import Window

    from mxsparkg.layout import prefix_sum_rank

    rows = [(i, f"k{(i * 37) % 100:03d}") for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, k string")
    w = Window.orderBy("k", "id")
    want = {
        (r.id, r.rn)
        for r in df.select("id", F.row_number().over(w).alias("rn"))
        .collect()
    }
    for layout in (df.coalesce(1), df.repartition(17)):
        got = {
            (r.id, r.rank)
            for r in prefix_sum_rank(layout, ["k", "id"]).collect()
        }
        assert got == want


def test_prefix_sum_rank_no_global_window(spark):
    """The plan must contain NO unpartitioned window sort: every Sort is
    within range partitions; the off-table join is broadcast."""
    from mxsparkg.layout import prefix_sum_rank

    df = spark.range(0, 1000).selectExpr("id", "id % 7 AS k")
    plan = prefix_sum_rank(
        df, ["k", "id"])._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_expire_snapshots_retention_and_crash_safety(spark, tmp_path):
    """3 committed versions, keep_last=1: v1/v2 expired (time travel to
    them now a hard error), v3 intact; a pre-existing TORN dir (data,
    no marker) is swept; keep_last=0 refused."""
    import os

    import pytest as _pytest

    from mxsparkg.kgexport import expire_snapshots, read_snapshot

    root = str(tmp_path / "snaps")
    for v in (1, 2, 3):
        d = f"{root}/v={v}"
        spark.range(v * 10).write.parquet(f"{d}/data")
        with open(f"{d}/_DELTA_ID", "w") as f:
            f.write(f"crawl-{v}")
    # torn write from a crashed job: data, no marker
    spark.range(5).write.parquet(f"{root}/v=9/data")

    with _pytest.raises(ValueError):
        expire_snapshots(root, keep_last=0)
    assert expire_snapshots(root, keep_last=1) == [1, 2]
    assert read_snapshot(spark, root).count() == 30  # v3 alive
    with _pytest.raises(ValueError):
        read_snapshot(spark, root, version=1)
    assert not os.path.exists(f"{root}/v=1")
    assert not os.path.exists(f"{root}/v=9")  # torn dir swept


def test_read_evolved_merges_and_pins(spark, tmp_path):
    """Epoch-1 shards lack `lang`; mergeSchema unions the footers so old
    rows surface lang=NULL; a pinned contract schema does the same and
    also survives the files listing in either order."""
    from mxsparkg.catalog import read_evolved

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "a")], "doc_id bigint, text string"
    ).write.mode("append").parquet(p)
    spark.createDataFrame(
        [(2, "b", "fr")], "doc_id bigint, text string, lang string"
    ).write.mode("append").parquet(p)

    merged = read_evolved(spark, p)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    got = {r.doc_id: r.lang for r in merged.collect()}
    assert got == {1: None, 2: "fr"}

    pinned = read_evolved(
        spark, p, schema_ddl="doc_id bigint, text string, lang string")
    assert {r.doc_id: r.lang for r in pinned.collect()} == got
