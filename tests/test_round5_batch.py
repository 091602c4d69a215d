"""Property tests for the round-5 closing batch (SURVEY §2.11a
T27'/T28'/C1'): semantics the oracle hash alone can't articulate —
attribution window bounds, closed-form revisit tiers, the planted
anomaly firing. Cross-engine value identity is the gate's job
(tests/test_contract_gate.py runs all keys vs DuckDB at sf0.01)."""

from pyspark.sql import functions as F

from mxsparkg.contract import (
    ANOM_DAY,
    ATTR_LOOKBACK_US,
    crawl_revisit,
    evt_anomaly,
    evt_attribution,
)


def test_attribution_window_and_self_exclusion(spark, sf001):
    rows = evt_attribution(spark, sf001).collect()
    assert rows, "no conversions at sf0.001?"
    for r in rows:
        if r["last_ch"] == "none":
            assert r["last_gap_us"] is None
        else:
            # attributed touch is a touch channel, inside the lookback,
            # never the purchase itself (gap 0 is allowed only for a
            # same-microsecond touch, which is still a view/click row)
            assert r["last_ch"] in ("view", "click")
            assert 0 <= r["last_gap_us"] <= ATTR_LOOKBACK_US
        assert r["first_ch"] in ("view", "click", "none")


def test_attribution_first_touch_monotone(spark, sf001):
    # first_ch is a running min over all history: for a user with >= 2
    # conversions, the first-touch channel must be identical on both.
    df = evt_attribution(spark, sf001)
    per_user = (
        df.groupBy("user_id")
        .agg(F.countDistinct("first_ch").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    # first_ch can only CHANGE if the earlier conversion predates the
    # user's first touch (first_ch='none' then a real channel later).
    bad = (
        df.groupBy("user_id")
        .agg(F.collect_set("first_ch").alias("chs"))
        .filter(
            (F.size("chs") > 1)
            & ~F.array_contains("chs", "none")
        )
        .count()
    )
    assert bad == 0, "first-touch flipped between two real channels"
    assert per_user >= 0  # shape sanity


def test_crawl_revisit_closed_form(spark, sf001):
    rows = crawl_revisit(spark, sf001).collect()
    assert rows
    for r in rows:
        assert r["n_snaps"] == 4
        m = r["doc_id"] % 3
        expect = {0: 3, 1: 1, 2: 0}[m]
        assert r["n_changes"] == expect, (r["doc_id"], r["n_changes"])
        assert r["change_ppm"] == expect * 1_000_000 // 3
        assert r["tier"] == {0: 1, 1: 2, 2: 3}[m]


def test_anomaly_planted_burst_fires(spark, sf001):
    rows = evt_anomaly(spark, sf001).collect()
    flagged = {(r["event_type"], r["day"]) for r in rows if r["is_anomaly"]}
    assert ("error", ANOM_DAY) in flagged
    # the integer test is the exact 2-sigma test multiplied by n^2
    for r in rows:
        assert r["is_anomaly"] == int(r["dev2_n2"] > r["thresh_n2"])


def test_entropy_closed_forms(spark, sf001):
    from mxsparkg.datapipe import _LNQ, txt_entropy

    rows = txt_entropy(spark, sf001).collect()
    assert rows
    for r in rows:
        n = r["n_tokens"]
        # 0 <= H <= ln(n), exactly 0 iff one distinct token
        assert 0 <= r["ent_total_n9"] <= n * _LNQ[n]
        assert (r["ent_total_n9"] == 0) == (r["n_distinct"] == 1)
        # all-distinct docs hit the maximum exactly
        if r["n_distinct"] == n:
            assert r["ent_total_n9"] == n * _LNQ[n]
        assert r["ent_per_tok_n9"] == r["ent_total_n9"] // n


def test_conflict_planting_exact(spark, sf001):
    from mxsparkg.kgexport import kg_conflict

    rows = kg_conflict(spark, sf001).collect()
    assert rows
    for r in rows:
        key = int(r["subj"].rsplit(":", 1)[1].rstrip(">"))
        assert key % 17 == 3, "clean customer surfaced as conflict"
        if key % 51 == 3:
            assert r["n_objs"] == 3 and r["sources"] == "src_a,src_b,src_c"
        else:
            assert r["n_objs"] == 2 and r["sources"] == "src_a,src_b"
        assert r["resolved_obj"].startswith("<urn:kg:e:nat:")


def test_walks_follow_real_edges(spark, sf001):
    from mxsparkg.graphquery import (
        MINLABEL_ORDER_MOD,
        WALK_STEPS,
        _copurchase_edges,
        _symmetrize,
        graph_walk,
    )

    walks = graph_walk(spark, sf001).collect()
    assert walks
    sym = _symmetrize(
        _copurchase_edges(spark, sf001, order_mod=MINLABEL_ORDER_MOD),
        "u", "v",
    )
    edges = {(r["src"], r["dst"]) for r in sym.collect()}
    for w in walks:
        nodes = [int(x) for x in w["path"].split(">")]
        assert len(nodes) == WALK_STEPS + 1
        assert nodes[0] == w["walk_id"] and nodes[-1] == w["last_node"]
        for a, b in zip(nodes, nodes[1:]):
            assert (a, b) in edges, f"walk used non-edge {a}->{b}"


def test_abtest_integer_algebra_matches_float_z(spark, sf001):
    """The integer test must agree with the float z-test wherever the
    latter is defined, and the planted lift must read significant at
    sf0.01 (150 users). At sf0.001 there are only ~7 users per arm —
    the lift honestly fails z > 2 there, which is itself asserted."""
    from mxsparkg.contract import evt_abtest

    for sf, expect_sig in ((sf001, 0), ("/root/testdata/sf0.01", 1)):
        r = evt_abtest(spark, sf).collect()[0]
        n1, x1, n2, x2 = r["n1"], r["x1"], r["n2"], r["x2"]
        p = (x1 + x2) / (n1 + n2)
        assert 0 < p < 1, "outcome degenerated; the parity baseline broke"
        p1, p2 = x1 / n1, x2 / n2
        z2 = (p1 - p2) ** 2 / (p * (1 - p) * (1 / n1 + 1 / n2))
        assert r["significant"] == int(z2 > 4.0)
        assert r["significant"] == expect_sig


def test_forecast_wape_matches_python(spark, sf001):
    """The integer WAPE must equal the float WAPE floored to ppm, and the
    seasonal-naive scoring must cover exactly span - 7 days per type."""
    from mxsparkg.contract import evt_forecast

    rows = evt_forecast(spark, sf001).collect()
    assert rows
    for r in rows:
        assert r["n_scored"] >= 1
        wape_float = r["sum_abs_err"] / r["sum_actual"]
        assert r["wape_ppm"] == int(wape_float * 1_000_000) or (
            r["wape_ppm"] == (1_000_000 * r["sum_abs_err"])
            // r["sum_actual"]
        )
        assert r["wape_ppm"] == (1_000_000 * r["sum_abs_err"]) // r["sum_actual"]


def test_source_reliability_geometry(spark, sf001):
    """src_a carries every clean subject (agreeing with itself) so its
    score dominates; all three ppm values are exact floor(1e6 * a / n)."""
    from mxsparkg.kgexport import kg_source_reliability

    rows = {r["source"]: r for r in
            kg_source_reliability(spark, sf001).collect()}
    assert set(rows) == {"src_a", "src_b", "src_c"}
    for r in rows.values():
        assert 0 <= r["n_agree"] <= r["n_claims"]
        assert r["agree_ppm"] == 1_000_000 * r["n_agree"] // r["n_claims"]
    assert rows["src_a"]["agree_ppm"] > rows["src_b"]["agree_ppm"]
    assert rows["src_a"]["agree_ppm"] > rows["src_c"]["agree_ppm"]


def test_diameter_two_sweep_bounds(spark, sf001):
    """Within the hop budget: the bound is in [1, rounds], the second
    sweep reaches at least the first sweep's component, and the sweep-2
    seed really is sweep 1's deterministic argmax."""
    from mxsparkg.graphquery import (
        DIAM_SWEEP_ROUNDS,
        MINLABEL_ORDER_MOD,
        _copurchase_edges,
        _symmetrize,
        bfs_hops,
        graph_diameter,
    )
    import pyspark.sql.functions as F

    r = graph_diameter(spark, sf001).collect()[0]
    assert 1 <= r["diameter_lb"] <= DIAM_SWEEP_ROUNDS
    assert r["n_reached"] >= 2
    sym = _symmetrize(
        _copurchase_edges(spark, sf001, order_mod=MINLABEL_ORDER_MOD),
        "u", "v",
    )
    d1 = bfs_hops(
        sym,
        sym.select(F.col("src").alias("node")).distinct()
        .filter(F.col("node") == r["sweep1_seed"]),
        iters=DIAM_SWEEP_ROUNDS,
    ).collect()
    best = sorted(d1, key=lambda x: (-x["dist"], x["node"]))[0]
    assert best["node"] == r["sweep2_seed"]


def test_walk_pairs_closed_form(spark, sf001):
    """Every walk of L+1 positions emits exactly
    sum over positions of |window-neighborhood| pairs; total =
    n_walks * (2*W*(L+1) - W*(W+1)) for L >= 2W; offsets bounded."""
    from mxsparkg.graphquery import (
        WALK_STEPS,
        WALK_WINDOW,
        graph_walk,
        graph_walk_pairs,
    )
    import pyspark.sql.functions as F

    n_walks = graph_walk(spark, sf001).count()
    pairs = graph_walk_pairs(spark, sf001)
    total = pairs.agg(F.sum("n_pairs")).collect()[0][0]
    L, W = WALK_STEPS, WALK_WINDOW
    expect_per_walk = 2 * W * (L + 1) - W * (W + 1)
    assert total == n_walks * expect_per_walk
    offs = {r["offset"] for r in pairs.select("offset").distinct().collect()}
    assert offs == {o for o in range(-W, W + 1) if o != 0}


def test_fusion_weighted_majority_geometry(spark, sf001):
    """Round 2 only ever re-resolves CONFLICTED subjects, the winning
    vote is positive, and whenever round 2 keeps round 1's answer the
    fused object must be src_a's claim (src_a has the dominant weight
    by the planted geometry)."""
    from mxsparkg.kgexport import kg_conflict, kg_fusion

    fused = {r["subj"]: r for r in kg_fusion(spark, sf001).collect()}
    conflicted = {r["subj"] for r in kg_conflict(spark, sf001).collect()}
    assert set(fused) == conflicted
    for r in fused.values():
        assert r["vote_ppm"] > 0
        assert r["changed_vs_round1"] in (0, 1)


def test_agg_corr_matches_python_float_corr(spark, sf001):
    """The decimal-moment Pearson assembly equals a direct Python
    computation from the raw rows (to 6dp — the emitted rounding)."""
    from mxsparkg.contract import agg_corr

    rows = spark.read.parquet(f"{sf001}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice").collect()
    by = {}
    for r in rows:
        by.setdefault(r.l_returnflag, []).append(
            (int(r.l_quantity), round(r.l_extendedprice * 100)))
    got = {r.l_returnflag: r for r in agg_corr(spark, sf001).collect()}
    for flag, pts in by.items():
        n = len(pts)
        sq = sum(q for q, _ in pts); sp = sum(p for _, p in pts)
        sqq = sum(q * q for q, _ in pts); spp = sum(p * p for _, p in pts)
        sqp = sum(q * p for q, p in pts)
        num = n * sqp - sq * sp
        want = num / ((n * sqq - sq * sq) * (n * spp - sp * sp)) ** 0.5
        assert got[flag].n == n
        assert abs(got[flag].corr_qty_price - want) < 1.5e-6, flag


def test_agg_skew_matches_python_reference(spark, sf001):
    """Skewness g1 = M3·√n / M2^1.5 and excess kurtosis g2 = n·M4/M2² − 3
    from the decimal moments equal a direct Python computation (to 6dp);
    uniform-ish quantities must land near g1 ≈ 0, g2 ≈ −1.2."""
    from mxsparkg.contract import agg_skew

    rows = spark.read.parquet(f"{sf001}/lineitem.parquet").select(
        "l_returnflag", "l_quantity").collect()
    by = {}
    for r in rows:
        by.setdefault(r.l_returnflag, []).append(int(r.l_quantity))
    got = {r.l_returnflag: r for r in agg_skew(spark, sf001).collect()}
    for flag, xs in by.items():
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        g1 = m3 / m2 ** 1.5
        g2 = m4 / m2 ** 2 - 3
        assert abs(got[flag].skewness - g1) < 2e-6, (flag, g1)
        assert abs(got[flag].excess_kurtosis - g2) < 2e-6, (flag, g2)
        assert abs(got[flag].skewness) < 0.3       # uniform-ish corpus
        assert -1.4 < got[flag].excess_kurtosis < -0.9
