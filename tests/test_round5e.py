"""Round-5e batch: exact Misra-Gries heavy hitters, SCD2 dimension
build, item co-occurrence, SHACL cardinality, landmark harmonic
centrality, VoID stats. The cross-engine gate certifies the sf0.01
values; these pin the semantics the gate's fixed dataset can't
discriminate — the MG exactness/partition-invariance guarantee, SCD2
interval chaining under tied timestamps, both SHACL violation arms,
the closed-form harmonic sum on a path graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ heavy hitters (MG) --

def test_heavy_hitters_exact_vs_brute_force(spark):
    """The candidate+verify result must equal the plain groupBy HAVING
    answer on a Zipf-ish multiset — including items that sit JUST above
    and just below the N/k threshold."""
    from mxsparkg.datapipe import heavy_hitters_exact

    toks = []
    for i in range(40):
        toks += [f"w{i}"] * (200 if i < 3 else (11 if i < 10 else 1))
    # N = 707; N/k at k=32 -> 22.09: the 200s pass, the 11s and 1s fail
    df = spark.createDataFrame([(t,) for t in toks], "term string")
    got = {
        (r.term, r.cnt)
        for r in heavy_hitters_exact(df, k=32, capacity=64).collect()
    }
    n = len(toks)
    from collections import Counter

    want = {
        (t, c) for t, c in Counter(toks).items() if c * 32 > n
    }
    assert got == want and len(want) == 3


def test_heavy_hitters_partition_invariant(spark):
    """MG candidates vary with the partition layout; the verified RESULT
    must not. Run the same corpus at 1 and 13 partitions."""
    from mxsparkg.datapipe import heavy_hitters_exact

    rows = [(f"t{i % 7}",) for i in range(500)] + [("rare",)] * 3
    df = spark.createDataFrame(rows, "term string")
    a = sorted(
        (r.term, r.cnt)
        for r in heavy_hitters_exact(df.coalesce(1), k=16).collect()
    )
    b = sorted(
        (r.term, r.cnt)
        for r in heavy_hitters_exact(df.repartition(13), k=16).collect()
    )
    assert a == b and len(a) == 7  # each t* ~71 > 503/16; 'rare' excluded


def test_heavy_hitters_capacity_guard(spark):
    """capacity < k voids the merged-summary guarantee — must refuse."""
    from mxsparkg.datapipe import heavy_hitters_exact

    df = spark.createDataFrame([("x",)], "term string")
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, k=32, capacity=8)


# --------------------------------------------------------------- SCD2 --

def test_scd2_interval_chain_and_current_flag(spark, monkeypatch, tmp_path):
    """A user whose attribute goes A→A→B→A must yield three versions
    with back-to-back [valid_from, valid_to) intervals, the middle B
    bounded on both sides, and exactly the last row current."""
    from mxsparkg.contract import contract_queries

    rows = [
        (1, "2024-01-01 00:00:00", 7, "A"),
        (2, "2024-01-02 00:00:00", 7, "A"),   # no change: absorbed
        (3, "2024-01-03 00:00:00", 7, "B"),
        (4, "2024-01-04 00:00:00", 7, "A"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)
    out = contract_queries()["evt_scd2"](spark, str(tmp_path)).collect()
    got = sorted(
        (r.attr, r.valid_from, r.valid_to, r.is_current) for r in out
    )
    assert got == [
        ("A", "2024-01-01 00:00:00", "2024-01-03 00:00:00", 0),
        ("A", "2024-01-04 00:00:00", "9999-12-31 00:00:00", 1),
        ("B", "2024-01-03 00:00:00", "2024-01-04 00:00:00", 0),
    ]


def test_scd2_tied_timestamps_deterministic(spark, tmp_path):
    """Two events at the SAME timestamp: the event_id tiebreak decides
    which attr 'wins' the change ordering; run twice under different
    partitioning and demand identical output."""
    from mxsparkg.contract import contract_queries

    rows = [
        (10, "2024-05-01 12:00:00", 3, "X"),
        (11, "2024-05-01 12:00:00", 3, "Y"),  # same ts, later event_id
        (12, "2024-05-02 12:00:00", 3, "X"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(str(tmp_path / "events.parquet"))
    fn = contract_queries()["evt_scd2"]
    a = sorted(map(tuple, fn(spark, str(tmp_path)).collect()))
    b = sorted(map(tuple, fn(spark, str(tmp_path)).collect()))
    assert a == b
    # X opens at 12:00 (event 10), Y's change point shares the timestamp:
    # the (ts, attr) lead order closes X's first version at the tie.
    attrs = [t[1] for t in a]
    assert attrs.count("X") == 2 and attrs.count("Y") == 1


# ------------------------------------------------------- co-occurrence --

def test_item_cooccur_jaccard_exact(spark, tmp_path):
    """3 users: u1{A,B}, u2{A,B}, u3{A}. pair (A,B): both=2, nA=3, nB=2,
    jaccard = 2/3 -> 666666 ppm exactly (floor)."""
    from mxsparkg.contract import contract_queries

    rows = [
        (1, "2024-01-01 00:00:00", 1, "A"), (2, "2024-01-01 00:00:01", 1, "B"),
        (3, "2024-01-01 00:00:02", 2, "A"), (4, "2024-01-01 00:00:03", 2, "B"),
        (5, "2024-01-01 00:00:04", 3, "A"),
        (6, "2024-01-01 00:00:05", 3, "A"),  # duplicate: distinct kills it
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = contract_queries()["evt_item_cooccur"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.n_both, r.n_a, r.n_b, r.jaccard_ppm) == (
        "A", "B", 2, 3, 2, 666666)


# ---------------------------------------------------------------- SHACL --

def test_shacl_both_arms_and_clean_subjects(spark):
    """min arm (0 edges), max arm (2 edges), clean (exactly 1) — only
    the violations surface, with the right labels and counts."""
    from mxsparkg.kgexport import shacl_cardinality

    subjects = spark.createDataFrame(
        [("s0", "cust"), ("s1", "cust"), ("s2", "cust")],
        "subj string, styp string",
    )
    triples = spark.createDataFrame(
        [("s1", "in_nation", "n1"),
         ("s2", "in_nation", "n1"), ("s2", "in_nation", "n2")],
        "subj string, pred string, obj string",
    )
    cons = spark.createDataFrame(
        [("cust", "in_nation", 1, 1)],
        "styp string, pred string, min_cnt int, max_cnt int",
    )
    got = sorted(
        (r.subj, r.n, r.violation)
        for r in shacl_cardinality(subjects, triples, cons).collect()
    )
    assert got == [("s0", 0, "min"), ("s2", 2, "max")]


def test_shacl_constraint_scoped_by_subject_type(spark):
    """A pred constraint on type 'cust' must not fire for a subject of a
    different type even if that subject lacks the pred entirely."""
    from mxsparkg.kgexport import shacl_cardinality

    subjects = spark.createDataFrame(
        [("s0", "cust"), ("x0", "nat")], "subj string, styp string")
    triples = spark.createDataFrame(
        [("s0", "in_nation", "n1")], "subj string, pred string, obj string")
    cons = spark.createDataFrame(
        [("cust", "in_nation", 1, 1)],
        "styp string, pred string, min_cnt int, max_cnt int",
    )
    assert shacl_cardinality(subjects, triples, cons).count() == 0


# ------------------------------------------------- harmonic centrality --

def test_harmonic_path_graph_closed_form(spark):
    """Path 0-1-2-3-4 (symmetric), landmarks {0, 4}, 3 hops, scale 6.
    node1: d(0)=1, d(4)=3 -> 6+2=8, n_src 2.
    node2: d(0)=2, d(4)=2 -> 3+3=6, n_src 2.
    node3: d(0)=3, d(4)=1 -> 2+6=8, n_src 2.
    Endpoints 0 and 4 must be ABSENT: each sees itself only at d=0
    (excluded) and the opposite landmark at d=4, beyond the 3-hop bound
    — the disconnected/truncation arm harmonic centrality exists for."""
    from mxsparkg.graphquery import harmonic_centrality

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)] + [(i + 1, i) for i in range(4)],
        "src bigint, dst bigint",
    )
    seeds = spark.createDataFrame([(0,), (4,)], "node bigint")
    got = {
        r.node: (r.n_src, r.harmonic_x6)
        for r in harmonic_centrality(edges, seeds).collect()
    }
    assert got == {1: (2, 8), 2: (2, 6), 3: (2, 8)}


def test_harmonic_scale_divisibility_guard(spark):
    from mxsparkg.graphquery import harmonic_centrality

    edges = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    seeds = spark.createDataFrame([(0,)], "node bigint")
    with pytest.raises(ValueError):
        harmonic_centrality(edges, seeds, iters=4, scale=6)  # 6 % 4 != 0
