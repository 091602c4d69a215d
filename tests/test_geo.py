"""Geo family semantics: the grid-bucketed spatial join must equal the
all-pairs distance join (soundness AND completeness of the 3x3 probe),
kNN must rank true distances, and results must be partitioning-invariant.
Oracle equivalence itself is covered by the full gate
(tests/test_contract_gate.py); these tests pin the geometry."""

from __future__ import annotations

import duckdb

from mxsparkg.geo import (
    GEO_KNN_K,
    GEO_PAIR_CELL_E6,
    GEO_R_E6,
    _PTS_CTE,
    geo_join_cell,
    geo_knn_cell,
)

SF = "/root/testdata/sf0.001"


def _brute_pairs():
    """All-pairs O(n^2) distance join at sf0.001 (1k-ish events) — the
    ground truth the bucketed join must reproduce exactly."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    rows = con.sql(
        f"""WITH {_PTS_CTE}
        SELECT a.pid, b.pid, (a.lat_e6 - b.lat_e6)*(a.lat_e6 - b.lat_e6)
               + (a.lon_e6 - b.lon_e6)*(a.lon_e6 - b.lon_e6)
        FROM cells a JOIN cells b ON a.pid < b.pid
        WHERE (a.lat_e6 - b.lat_e6)*(a.lat_e6 - b.lat_e6)
              + (a.lon_e6 - b.lon_e6)*(a.lon_e6 - b.lon_e6)
              <= {GEO_R_E6}::BIGINT * {GEO_R_E6}"""
    ).fetchall()
    return {(a, b): d for a, b, d in rows}


def test_bucketed_join_equals_brute_force(spark):
    # R <= CELL is the precondition that makes the 3x3 probe complete
    # (the pair join runs on its radius-matched grid)
    assert GEO_R_E6 <= GEO_PAIR_CELL_E6
    got = {
        (r.pid_a, r.pid_b): r.dist2_e6
        for r in geo_join_cell(spark, SF).collect()
    }
    want = _brute_pairs()
    assert got == want
    assert len(got) > 0  # the fixture world is dense enough to mean something


def test_knn_ranks_true_distances(spark):
    rows = geo_knn_cell(spark, SF).collect()
    by_pid: dict = {}
    for r in rows:
        by_pid.setdefault(r.pid_a, []).append((r.k, r.dist2_e6, r.nbr))
    assert by_pid
    for pid, ks in by_pid.items():
        ks.sort()
        assert [k for k, _, _ in ks] == list(range(1, len(ks) + 1)), pid
        assert len(ks) <= GEO_KNN_K
        # distances nondecreasing in rank; ties broken by nbr pid
        for (k1, d1, n1), (k2, d2, n2) in zip(ks, ks[1:]):
            assert (d1, n1) < (d2, n2), pid
    # rank-1 neighbors at distance <= R must be each other's pair-join hit
    pairs = {
        (r.pid_a, r.pid_b) for r in geo_join_cell(spark, SF).collect()
    }
    r2 = GEO_R_E6 * GEO_R_E6
    for pid, ks in by_pid.items():
        _, d, nbr = ks[0]
        if d <= r2:
            assert (min(pid, nbr), max(pid, nbr)) in pairs, pid


def test_pair_fingerprint_partition_invariant(spark):
    df = geo_join_cell(spark, SF)
    fp1 = sorted((r.pid_a, r.pid_b, r.dist2_e6) for r in df.collect())
    fp2 = sorted(
        (r.pid_a, r.pid_b, r.dist2_e6)
        for r in df.repartition(13).collect()
    )
    assert fp1 == fp2


def test_join_plan_is_equi_not_nested_loop(spark):
    plan = geo_join_cell(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bbox_join_equals_brute_force(spark):
    """The bounded cell-cover explode must reproduce the all-pairs
    point-in-box containment exactly (cover completeness: a box's
    partial edge cells are included)."""
    from mxsparkg.geo import (
        GEO_BBOX_MAX_SPAN,
        GEO_CELL_E6,
        GEO_WORLD_E6,
        geo_bbox_join,
    )

    span = GEO_WORLD_E6 - GEO_BBOX_MAX_SPAN - 1
    wmod = GEO_BBOX_MAX_SPAN - GEO_CELL_E6 + 1
    got = {
        (r.region_id, r.pid) for r in geo_bbox_join(spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    con.execute(
        "CREATE VIEW nation AS SELECT * FROM "
        f"read_parquet('{SF}/nation.parquet')"
    )
    # strip the cover join down to the brute-force cross test
    want = {
        (rid, pid)
        for rid, pid in con.sql(
            f"""WITH {_PTS_CTE},
            regions AS (
              SELECT n_nationkey AS region_id,
                     ('0x' || substr(md5(n_nationkey::VARCHAR || ':bbox1'),
                       1, 12))::BIGINT % {span} AS x0,
                     ('0x' || substr(md5(n_nationkey::VARCHAR || ':bbox1'),
                       13, 12))::BIGINT % {span} AS y0,
                     ('0x' || substr(md5(n_nationkey::VARCHAR || ':bbox2'),
                       1, 12))::BIGINT % {wmod} + {GEO_CELL_E6} AS w,
                     ('0x' || substr(md5(n_nationkey::VARCHAR || ':bbox2'),
                       13, 12))::BIGINT % {wmod} + {GEO_CELL_E6} AS h
              FROM nation)
            SELECT r.region_id, p.pid
            FROM pts p, regions r
            WHERE p.lon_e6 BETWEEN r.x0 AND r.x0 + r.w
              AND p.lat_e6 BETWEEN r.y0 AND r.y0 + r.h"""
        ).fetchall()
    }
    assert got == want
    assert got  # non-vacuous at sf0.001


def test_distance_pairs_property_vs_brute_force(spark):
    """Hypothesis: for random small point sets — including coincident
    points, cell-boundary coordinates, and dist == R ties — the grid
    probe at ANY radius-compatible cell size equals the all-pairs
    brute force computed in Python."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mxsparkg.geo import distance_pairs

    coord = st.integers(0, 5000)
    point = st.tuples(coord, coord)

    @settings(max_examples=10, deadline=None)
    @given(
        pts=st.lists(point, min_size=0, max_size=12),
        cell=st.sampled_from([1000, 1500, 2500]),
        r=st.sampled_from([500, 999, 1000]),
    )
    def check(pts, cell, r):
        rows = [(i, la, lo) for i, (la, lo) in enumerate(pts)]
        want = {
            (a, b, (la - lb) ** 2 + (lo - lob) ** 2)
            for a, la, lo in rows
            for b, lb, lob in rows
            if a < b and (la - lb) ** 2 + (lo - lob) ** 2 <= r * r
        }
        if rows:
            df = spark.createDataFrame(
                rows, "pid long, lat_e6 long, lon_e6 long")
        else:
            df = spark.createDataFrame([], "pid long, lat_e6 long, lon_e6 long")
        got = {
            (x.pid_a, x.pid_b, x.dist2_e6)
            for x in distance_pairs(df, cell, r).collect()
        }
        assert got == want

    check()
