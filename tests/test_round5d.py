"""Round-5d batch: interval-overlap join, null-safe join, column
profiling, GNN mean message passing, SPARQL OPTIONAL / NOT EXISTS,
takedown cascade. The cross-engine gate certifies the sf0.01 values;
these pin the semantics the gate's fixed dataset can't discriminate —
bucket-boundary exactness, NULL-key matching, the unbound/negation
algebra, isolated-node arms."""

from __future__ import annotations

from pyspark.sql import functions as F


# ------------------------------------------- interval-overlap join ----

def _intervals(spark, rows, lo, hi):
    return spark.createDataFrame(rows, f"id bigint, {lo} bigint, {hi} bigint")


def test_interval_join_equals_brute_force(spark):
    """The bucketized plan must compute the EXACT theta-join pair set —
    including intervals that straddle bucket boundaries (len > bucket:
    multi-bucket explode) and pairs that meet in several buckets
    (collapsed by the caller's distinct)."""
    from mxsparkg.contract import interval_overlap_join

    a_rows = [(i, i * 7, i * 7 + (i * 13 % 50)) for i in range(40)]
    b_rows = [(j, j * 11, j * 11 + (j * 17 % 60)) for j in range(30)]
    a = _intervals(spark, a_rows, "a_lo", "a_hi")
    b = (
        _intervals(spark, b_rows, "b_lo", "b_hi")
        .withColumnRenamed("id", "bid")
    )
    got = {
        (r.id, r.bid)
        for r in interval_overlap_join(a, b, bucket=16)
        .select("id", "bid").distinct().collect()
    }
    want = {
        (ai, bi)
        for (ai, alo, ahi) in a_rows
        for (bi, blo, bhi) in b_rows
        if alo <= bhi and blo <= ahi
    }
    assert got == want and len(want) > 100


def test_interval_join_touching_endpoints_closed(spark):
    """Closed-interval semantics: a_hi == b_lo IS an overlap (one shared
    day); a_hi == b_lo - 1 is not. Both pairs sit inside one bucket so
    the distinction is the filter's, not the bucketing's."""
    from mxsparkg.contract import interval_overlap_join

    a = _intervals(spark, [(1, 10, 20)], "a_lo", "a_hi")
    b = _intervals(
        spark, [(1, 20, 25), (2, 21, 25)], "b_lo", "b_hi"
    ).withColumnRenamed("id", "bid")
    got = [
        r.bid
        for r in interval_overlap_join(a, b).select("bid").collect()
    ]
    assert got == [1]


# ------------------------------------------------- null-safe join ----

def test_nullsafe_join_matches_null_to_null_once(spark):
    """`<=>` must produce exactly ONE row for the NULL⟷NULL key pair
    (not zero like `=`, not a cross product)."""
    a = spark.createDataFrame([("x",), (None,)], "k string")
    b = spark.createDataFrame([("x",), (None,)], "k string") \
        .withColumnRenamed("k", "k2")
    eq = a.join(b, a.k == b.k2).count()
    ns = a.join(b, a.k.eqNullSafe(b.k2)).count()
    assert eq == 1  # plain = drops the NULL key
    assert ns == 2  # null-safe keeps it, exactly once


# ----------------------------------------------- column profiling ----

def test_profile_table_null_and_distinct_counts(spark):
    """The profile's n_null must equal the count of the nulled-out
    sentinel ('P' statuses) and n_distinct must see the surviving two
    statuses — checked against direct aggregation of the same table."""
    from mxsparkg.contract import profile_table

    sf = "/root/testdata/sf0.001"
    prof = {r.col_name: r for r in profile_table(spark, sf).collect()}
    o = spark.read.parquet(f"{sf}/orders.parquet")
    n_p = o.filter(F.col("o_orderstatus") == "P").count()
    st = prof["o_orderstatus"]
    assert st.n_null == n_p
    assert st.n_distinct == 2  # O and F survive the nullif
    ck = prof["o_custkey"]
    assert ck.n_null == 0
    assert int(ck.min_s) <= int(ck.max_s)
    assert {r.n_rows for r in prof.values()} == {o.count()}


# ------------------------------------------- mean message passing ----

def test_msgpass_exact_mean_and_isolated_node(spark):
    """Triangle {1,2,3} with features 10/20/40 plus isolated node 9
    (feature 7): every triangle node averages the full feature set,
    h1 = (10+20+40) div 3 = 23. Node 9 has no edges: the left-join
    null arm must return its own feature unchanged with deg 0."""
    from mxsparkg.graphquery import message_pass_mean

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2)],
        "src bigint, dst bigint",
    )
    feats = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 40), (9, 7)], "node bigint, h0 bigint"
    )
    got = {r.node: (r.deg, r.h1)
           for r in message_pass_mean(edges, feats).collect()}
    assert got[1] == (2, (10 + 20 + 40) // 3)
    assert got[2] == (2, (20 + 10 + 40) // 3)
    assert got[3] == (2, (40 + 10 + 20) // 3)
    assert got[9] == (0, 7)  # isolated: identity, the null arm


def test_msgpass_constant_feature_is_fixpoint(spark):
    """A constant feature vector is a fixpoint of mean aggregation on
    ANY graph — the smoothing sanity check (integer div exact here)."""
    from mxsparkg.graphquery import message_pass_mean

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src bigint, dst bigint"
    )
    feats = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5)], "node bigint, h0 bigint"
    )
    assert {r.h1 for r in message_pass_mean(edges, feats).collect()} == {5}


# --------------------------------------- OPTIONAL / NOT EXISTS ----

def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


def test_bgp_optional_keeps_unbound(spark):
    """OPTIONAL == left outer: subjects missing the optional leg
    survive with w unbound (NULL); subjects with k optional matches
    fan out k times (SPARQL multiset semantics)."""
    from mxsparkg.kgexport import bgp_optional

    t = _triples(spark, [
        ("s1", "req", "a"),
        ("s2", "req", "b"),
        ("s1", "opt", "x"),
        ("s1", "opt", "y"),
    ])
    rows = sorted(
        (r.x, r.v, r.w)
        for r in bgp_optional(t, "req", "opt").collect()
    )
    assert rows == [("s1", "a", "x"), ("s1", "a", "y"), ("s2", "b", None)]


def test_bgp_not_exists_removes_and_preserves_multiplicity(spark):
    """NOT EXISTS removes every row of a flagged subject (even
    multi-valued required legs) and must not dedupe the survivors."""
    from mxsparkg.kgexport import bgp_not_exists

    t = _triples(spark, [
        ("s1", "req", "a"),
        ("s1", "req", "b"),      # multi-valued required leg
        ("s2", "req", "c"),
        ("s2", "flag", "true"),
        ("s2", "flag", "also"),  # multiple flags still remove once
    ])
    rows = sorted(
        (r.x, r.v) for r in bgp_not_exists(t, "req", "flag").collect()
    )
    assert rows == [("s1", "a"), ("s1", "b")]


# ------------------------------------------------ cascade delete ----

def test_cascade_delete_survivors_and_orphans(spark):
    """Survivors are exactly the triples citing a non-deleted url; a
    node is orphaned iff NO surviving triple mentions it — the node
    whose only mention came from the deleted page disappears from the
    survivor-derived node set, while a node also cited elsewhere
    stays."""
    from mxsparkg.kgexport import cascade_delete

    t = spark.createDataFrame(
        [
            ("s1", "p", "only_deleted", "u_del"),
            ("s2", "p", "shared", "u_del"),
            ("s3", "p", "shared", "u_keep"),
        ],
        "subj string, pred string, obj string, url string",
    )
    deleted = spark.createDataFrame([("u_del",)], "url string")
    surv = cascade_delete(t, deleted)
    assert {r.subj for r in surv.collect()} == {"s3"}
    nodes = {
        r.n
        for r in surv.select(F.col("subj").alias("n"))
        .unionByName(surv.select(F.col("obj").alias("n")))
        .distinct().collect()
    }
    assert "only_deleted" not in nodes and "shared" in nodes


# ------------------------------------------------------ k-truss ----

def test_ktruss_rejects_star_keeps_clique(spark):
    """The discrimination that makes the truss stronger than the core:
    a star has edges in zero triangles (every edge dies round 1 at any
    k >= 3) while a 4-clique's edges each close 2 triangles and survive
    k=4 intact — including after recomputation rounds (a clique is its
    own truss fixpoint)."""
    from mxsparkg.graphquery import ktruss_peel

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], "u bigint, v bigint"
    )
    assert ktruss_peel(star, k=4, rounds=1).count() == 0

    clique = spark.createDataFrame(
        [(i, j) for i in range(4) for j in range(i + 1, 4)],
        "u bigint, v bigint",
    )
    out = ktruss_peel(clique, k=4, rounds=3).collect()
    assert len(out) == 6 and all(r.sup == 2 for r in out)


def test_ktruss_cascade_needs_recomputation(spark):
    """A triangle chain glued to a 4-clique: the pendant triangle's
    edges have support 1 (< k-2 = 2) and die round 1; the bridge edge
    into the clique loses its triangle partner and can only die in
    round 2 AFTER support recomputation — the cascade a single-pass
    support filter gets wrong."""
    from mxsparkg.graphquery import ktruss_peel

    clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    # pendant triangle {3, 10, 11} hanging off clique node 3
    pendant = [(3, 10), (3, 11), (10, 11)]
    g = spark.createDataFrame(clique + pendant, "u bigint, v bigint")
    r1 = ktruss_peel(g, k=4, rounds=1)
    r2 = ktruss_peel(g, k=4, rounds=2)
    assert r1.count() == 6  # pendant triangle gone, clique intact
    assert r2.count() == 6 == r1.count()  # clique IS the 4-truss
    # now weaken the clique: remove one clique edge so supports drop
    weak = [e for e in clique if e != (0, 1)]
    g2 = spark.createDataFrame(weak + pendant, "u bigint, v bigint")
    # round 1: edge (2,3) sits in BOTH surviving triangles ({0,2,3} and
    # {1,2,3}) so its support is 2 and it survives while every other
    # edge dies; round 2's recomputation finds its triangles gone and
    # kills it — the two-step cascade a single-pass filter cannot see
    c1 = ktruss_peel(g2, k=4, rounds=1).count()
    c2 = ktruss_peel(g2, k=4, rounds=2).count()
    assert c1 == 1 and c2 == 0


# ------------------------------------------------- Naive Bayes ----

def test_nb_matches_gd_noise_ceiling(spark):
    """The counting classifier must reach the same held-out accuracy as
    the GD-trained linear model: the planted labels carry 5% flips, so
    ~0.95 is the ceiling and both models sit on it. Also pins the
    model's internals: every GOOD marker bucket weighs strongly
    positive, every BAD one strongly negative, and the class-balanced
    corpus buckets stay within the ±1-bit quantization band."""
    from mxsparkg.datapipe import (
        _CLS_BAD,
        _CLS_GOOD,
        _cls_bucket,
        txt_nb_classify,
        txt_nb_train,
    )

    sf = "/root/testdata/sf0.001"
    scored = txt_nb_classify(spark, sf).collect()
    acc = sum(r.correct for r in scored) / len(scored)
    assert acc >= 0.90, acc

    w = {r.bucket: r.w_bits for r in txt_nb_train(spark, sf).collect()}
    # mq8/mq12 are ALSO class-correlated plants (the secondary markers)
    marker_buckets = {
        t: spark.range(1).select(_cls_bucket(F.lit(t))).collect()[0][0]
        for t in _CLS_GOOD + _CLS_BAD + ("mq8", "mq12")
    }
    # marker magnitude ~ floor-log2 of the per-class marker count, so it
    # shrinks with corpus size: >= 3 bits at sf0.001 (~8 train docs per
    # marker), ~10 at sf0.01 — either way far outside the corpus band
    for t in _CLS_GOOD:
        assert w[marker_buckets[t]] >= 3, (t, w[marker_buckets[t]])
    for t in _CLS_BAD:
        assert w[marker_buckets[t]] <= -3, (t, w[marker_buckets[t]])
    corpus_w = [
        v for b, v in w.items() if b not in marker_buckets.values()
    ]
    # the non-marker mass is quantization noise: strictly inside the
    # weakest planted marker's magnitude
    weakest = min(abs(w[b]) for b in marker_buckets.values())
    assert corpus_w and max(abs(v) for v in corpus_w) < weakest


# ----------------------------------------------- UNION BGP / mode ----

def test_bgp_union_is_multiset(spark):
    """UNION keeps both solutions for a subject matching both patterns
    (bag semantics) — the non-dedup the census key certifies at sf."""
    from mxsparkg.kgexport import _bgp_customer_triples  # noqa: F401
    t = _triples(spark, [
        ("s1", "acct_band", "3"),
        ("s1", "flagged", "3"),   # same (subj, v) via BOTH patterns
        ("s2", "acct_band", "1"),
    ])
    leg1 = t.filter(F.col("pred") == "acct_band").select("subj", "obj")
    leg2 = t.filter(F.col("pred") == "flagged").select("subj", "obj")
    both = leg1.unionByName(leg2)
    assert both.count() == 3          # multiset: no collapse
    assert both.distinct().count() == 2


def test_agg_mode_tie_breaks_to_min_value(spark):
    """Two values tied at the max count -> the lexicographic-min value
    wins, deterministically, at any partitioning."""
    from mxsparkg.contract import agg_mode  # noqa: F401 (shape ref)
    d = spark.createDataFrame(
        [("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), ("g1", "c")],
        "lang string, source string",
    )
    cnt = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    mx = cnt.groupBy("lang").agg(F.max("n").alias("n"))
    got = (
        cnt.join(mx, ["lang", "n"])
        .groupBy("lang", "n")
        .agg(F.min("source").alias("mode_source"))
        .collect()
    )
    assert [(r.lang, r.mode_source, r.n) for r in got] == [("g1", "a", 2)]


# ------------------------------------------------- compaction ----

def test_compact_table_preserves_data_and_reduces_files(spark, tmp_path):
    """Compaction must (a) cut the file count to the byte-target
    estimate, (b) leave the DATA bit-identical as a multiset, (c) keep
    a pre-swap copy for crash recovery. Many tiny files -> 1 (the exact
    pre-count is AQE's business — it coalesces the rebalance — so the
    assertion is relative)."""
    import os

    from mxsparkg.catalog import compact_table

    path = str(tmp_path / "t")
    spark.range(40).repartition(40).write.parquet(path)
    before = {
        tuple(r) for r in spark.read.parquet(path).collect()
    }
    n_files_before = len(
        [f for f in os.listdir(path) if f.startswith("part-")]
    )
    assert n_files_before > 10
    stats = compact_table(spark, path, target_bytes=1 << 30)
    assert stats["files_before"] == n_files_before
    assert stats["files_after"] == 1
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert after == before
    # crash-safety window: the old layout is parked next to the table
    assert os.path.isdir(path + ".pre-compact")
