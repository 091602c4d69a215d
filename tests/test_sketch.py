"""Property tests for the mergeable-sketch tier (sketch_hll / sketch_cms)
and the evt_gap_fill grid semantics. Cross-engine value identity of the
sketch tables themselves is the gate's job (tests/test_contract_gate.py);
these pin the claims the hash can't articulate: estimator accuracy, the
hard CMS >= bound, and MERGEABILITY — the property that lets a 100-TB run
sketch each partition independently and fold (max for HLL, sum for CMS)
instead of re-shuffling raw keys.
"""

from pyspark.sql import functions as F

from mxsparkg.contract import evt_gap_fill
from mxsparkg.datapipe import (
    CMS_D,
    CMS_W,
    KMV_K,
    KMV_SETS,
    cms_point_query,
    cms_sketch,
    hll_estimate,
    hll_registers,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
    sketch_cms,
    sketch_hll,
    sketch_kmv_jaccard,
)


def _li(spark, sf001):
    return spark.read.parquet(f"{sf001}/lineitem.parquet")


# --------------------------------------------------------------- HLL -----


def test_hll_estimate_within_error(spark, sf001):
    regs = [(r["reg"], r["max_rho"]) for r in sketch_hll(spark, sf001).collect()]
    truth = _li(spark, sf001).select("l_orderkey").distinct().count()
    est = hll_estimate(regs)
    # m=256 -> std err ~6.5%; 3 sigma with headroom
    assert abs(est - truth) / truth < 0.20, (est, truth)


def test_hll_merge_is_cellwise_max(spark, sf001):
    li = _li(spark, sf001)
    whole = {
        r["reg"]: r["max_rho"]
        for r in hll_registers(li, F.col("l_orderkey")).collect()
    }
    halves = [
        {
            r["reg"]: r["max_rho"]
            for r in hll_registers(
                li.filter(F.col("l_orderkey") % 2 == p), F.col("l_orderkey")
            ).collect()
        }
        for p in (0, 1)
    ]
    merged: dict[int, int] = {}
    for h in halves:
        for reg, rho in h.items():
            merged[reg] = max(merged.get(reg, 0), rho)
    assert merged == whole


def test_hll_duplicates_do_not_move_registers(spark, sf001):
    # max() absorbs duplicates: the register table over the raw stream
    # equals the one over the distinct stream — the reason the op needs
    # no pre-distinct shuffle.
    li = _li(spark, sf001)
    raw = sorted(
        (r["reg"], r["max_rho"])
        for r in hll_registers(li, F.col("l_orderkey")).collect()
    )
    dedup = sorted(
        (r["reg"], r["max_rho"])
        for r in hll_registers(
            li.select("l_orderkey").distinct(), F.col("l_orderkey")
        ).collect()
    )
    assert raw == dedup


# --------------------------------------------------------------- CMS -----


def test_cms_point_estimate_never_underestimates(spark, sf001):
    o = spark.read.parquet(f"{sf001}/orders.parquet")
    cells = [
        (r["row_id"], r["col_id"], r["cell"])
        for r in sketch_cms(spark, sf001).collect()
    ]
    truth = {
        str(r["o_custkey"]): r["cnt"]
        for r in o.groupBy("o_custkey").agg(F.count("*").alias("cnt")).collect()
    }
    n_total = sum(truth.values())
    overs = []
    for k, true_cnt in truth.items():
        est = cms_point_query(cells, k)
        assert est >= true_cnt, (k, est, true_cnt)  # the hard CMS bound
        overs.append(est - true_cnt)
    # mean overestimate: expected collision mass per cell is n/W per row,
    # the min over CMS_D rows sits well under one cell's expectation
    assert sum(overs) / len(overs) <= 2 * n_total / CMS_W, (
        sum(overs) / len(overs),
        n_total / CMS_W,
    )


def test_cms_merge_is_cellwise_sum(spark, sf001):
    o = spark.read.parquet(f"{sf001}/orders.parquet")
    whole = {
        (r["row_id"], r["col_id"]): r["cell"]
        for r in cms_sketch(o, F.col("o_custkey")).collect()
    }
    merged: dict[tuple[int, int], int] = {}
    for p in (0, 1):
        half = cms_sketch(
            o.filter(F.col("o_orderkey") % 2 == p), F.col("o_custkey")
        )
        for r in half.collect():
            key = (r["row_id"], r["col_id"])
            merged[key] = merged.get(key, 0) + r["cell"]
    assert merged == whole


def test_cms_unseen_key_can_return_zero_only_if_all_cells_empty(spark, sf001):
    cells = [
        (r["row_id"], r["col_id"], r["cell"])
        for r in sketch_cms(spark, sf001).collect()
    ]
    # with 1500/150 keys in CMS_D x CMS_W cells every cell is occupied, so
    # an unseen key still reads a (small, nonzero) collision estimate —
    # the documented CMS posture: overestimates only, never underestimates
    est = cms_point_query(cells, "never-seen-custkey")
    assert est >= 0
    if len(cells) == CMS_D * CMS_W:
        assert est > 0


# --------------------------------------------------------- gap fill ------


def test_gap_fill_grid_contiguous_and_filled(spark, sf001):
    rows = evt_gap_fill(spark, sf001).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    import datetime as dt

    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["day"])
        days = [dt.date.fromisoformat(r["day"]) for r in rs]
        # contiguous daily grid over the user's own span
        assert (days[-1] - days[0]).days + 1 == len(days), user
        # span starts at a real observation -> never NULL, and every gap
        # row carries the most recent real value forward
        last_real = None
        for r, d in zip(rs, days):
            assert r["val_filled"] is not None, (user, d)
            if r["gap"] == 0:
                last_real = r["val_filled"]
            else:
                assert r["val_filled"] == last_real, (user, d)
        assert rs[0]["gap"] == 0, user


# --------------------------------------------------------------- KMV -----


def _kmv_hashes(spark, sf001, pred):
    df = _li(spark, sf001).filter(F.expr(pred))
    return sorted(
        r.hval for r in kmv_sketch(df, F.col("l_orderkey"), "x").collect()
    )


def test_kmv_merge_is_lossless(spark, sf001):
    """kmin_k(sketch(A) ∪ sketch(B)) == sketch(A ∪ B) EXACTLY — the
    property that lets executors fold partial sketches without touching
    raw keys again."""
    preds = list(KMV_SETS.values())
    a = _kmv_hashes(spark, sf001, preds[0])
    b = _kmv_hashes(spark, sf001, preds[1])
    union_df = _li(spark, sf001).filter(
        F.expr(f"({preds[0]}) OR ({preds[1]})")
    )
    direct = sorted(
        r.hval
        for r in kmv_sketch(union_df, F.col("l_orderkey"), "u").collect()
    )
    assert kmv_merge(a, b) == direct


def test_kmv_estimate_within_std_err(spark, sf001):
    """(k-1)·2^60/h_(k) lands within 4 std errs (4/sqrt(k-2)) of the true
    distinct count for both gate sets and their union."""
    li = _li(spark, sf001)
    preds = list(KMV_SETS.values())
    tol = 4.0 / (KMV_K - 2) ** 0.5
    for pred in preds + [f"({preds[0]}) OR ({preds[1]})"]:
        sub = li.filter(F.expr(pred))
        true_n = sub.select("l_orderkey").distinct().count()
        est = kmv_estimate(_kmv_hashes(spark, sf001, pred))
        assert abs(est - true_n) <= tol * true_n, (pred, est, true_n)


def test_kmv_small_set_is_exact(spark, sf001):
    """|set| < k ⇒ the sketch is exhaustive and the estimate is the exact
    count (the n_rank < k arm of the in-plan estimator)."""
    li = _li(spark, sf001)
    sub = li.filter(F.col("l_orderkey") % 1000 == 7)
    true_n = sub.select("l_orderkey").distinct().count()
    assert true_n < KMV_K
    hvals = sorted(
        r.hval for r in kmv_sketch(sub, F.col("l_orderkey"), "s").collect()
    )
    assert len(hvals) == true_n
    assert kmv_estimate(hvals) == true_n


def test_kmv_jaccard_epilogue_tracks_truth(spark, sf001):
    """The single-row in-plan set-expression estimates stay within loose
    KMV error bounds of the true |A∪B|, Jaccard, and |A∩B| at sf0.001."""
    li = _li(spark, sf001)
    preds = list(KMV_SETS.values())
    a = {r.l_orderkey for r in li.filter(F.expr(preds[0]))
         .select("l_orderkey").distinct().collect()}
    b = {r.l_orderkey for r in li.filter(F.expr(preds[1]))
         .select("l_orderkey").distinct().collect()}
    row = sketch_kmv_jaccard(spark, sf001).collect()[0]
    true_union, true_inter = len(a | b), len(a & b)
    assert abs(row.est_union - true_union) <= 0.55 * true_union
    assert abs(row.jacc_ppm / 1e6 - true_inter / true_union) <= 0.3
    assert abs(row.est_intersection - true_inter) <= 0.6 * true_inter


def test_kmv_jaccard_exhaustive_regime_is_exact(spark, tmp_path):
    """|A∪B| < k ⇒ the merged sketch IS the union: est_union, Jaccard
    denominator, and est_intersection must all be EXACT (the review-found
    regression: dividing by k instead of n_rank in this arm)."""
    import pandas as pd

    # 20 orderkeys: returned = multiples of 2, bulk = multiples of 3
    rows = []
    for ok in range(1, 21):
        rows.append({
            "l_orderkey": ok,
            "l_returnflag": "R" if ok % 2 == 0 else "N",
            "l_quantity": 30.0 if ok % 3 == 0 else 10.0,
        })
    pd.DataFrame(rows).to_parquet(tmp_path / "lineitem.parquet")
    row = sketch_kmv_jaccard(spark, str(tmp_path)).collect()[0]
    a = {ok for ok in range(1, 21) if ok % 2 == 0}
    b = {ok for ok in range(1, 21) if ok % 3 == 0}
    assert row.est_union == len(a | b)
    assert row.n_both == len(a & b)
    assert row.jacc_ppm == 1_000_000 * len(a & b) // len(a | b)
    assert row.est_intersection == len(a & b)
