"""Round-5f batch: sweep-line peak concurrency, equi-depth histogram,
asymmetric containment, sorted-neighborhood ER, Z-order layout. Pins
the semantics the sf0.01 gate data can't discriminate: half-open
interval convention at touching boundaries, the ntile remainder rule,
containment direction asymmetry, the SNM window bound vs brute force,
and the z-key's measured pruning advantage over a 1-D sort."""

from __future__ import annotations

from pyspark.sql import functions as F


# ------------------------------------------------------ concurrency --

def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_concurrency_half_open_touching_intervals(spark, tmp_path):
    """Two events exactly 1h apart: the first window closes AT the
    second's open ([t, t+1h) half-open), so peak stays 1. A third event
    30min in overlaps both boundaries -> peak 2, attained at the later
    overlap start."""
    from mxsparkg.contract import contract_queries

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 11:00:00", 1, "view"),  # touches: NOT concurrent
        (3, "2024-01-01 10:30:00", 2, "view"),  # overlaps both
    ]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    out = contract_queries()["evt_concurrency"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.event_type, r.peak, r.peak_ts) == (
        "view", 2, "2024-01-01 10:30:00")


def test_concurrency_types_sweep_independently(spark, tmp_path):
    from mxsparkg.contract import contract_queries

    rows = [
        (1, "2024-01-01 10:00:00", 1, "a"),
        (2, "2024-01-01 10:10:00", 2, "a"),
        (3, "2024-01-01 10:20:00", 3, "a"),
        (4, "2024-01-01 10:00:00", 1, "b"),
    ]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_type: r.peak
        for r in contract_queries()["evt_concurrency"](
            spark, str(tmp_path)).collect()
    }
    assert got == {"a": 3, "b": 1}


# ------------------------------------------------------- equi-depth --

def test_equidepth_remainder_rule_and_bounds(spark, tmp_path):
    """10 rows into 8 buckets: the SQL-standard ntile gives buckets 1-2
    two rows, 3-8 one row; each bucket's [lo, hi] must tile the sorted
    values in order."""
    from mxsparkg.contract import contract_queries

    rows = [
        (i, 1, float(100 + 10 * i), "N", "O", f"1996-0{1 + i % 9}-01")
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_linenumber bigint, l_extendedprice double,"
        " l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.to_date("l_shipdate"))
    df.write.parquet(str(tmp_path / "lineitem.parquet"))
    out = sorted(
        (r.bucket, r.n, r.lo, r.hi)
        for r in contract_queries()["agg_equidepth"](
            spark, str(tmp_path)).collect()
    )
    assert [b for b, *_ in out] == list(range(1, 9))
    assert [n for _, n, *_ in out] == [2, 2, 1, 1, 1, 1, 1, 1]
    # bucket ranges tile the sorted domain without overlap
    his = [hi for *_, hi in out]
    los = [lo for _, _, lo, _ in out]
    assert all(his[i] < los[i + 1] for i in range(7))


# ------------------------------------------------------- containment --

def test_containment_is_asymmetric(spark):
    """Doc A = 5-shingle snippet fully contained in doc B's 40 shingles:
    C(A->B) = 1.0 (1000000 ppm), C(B->A) = 5/40 -> below the 50%
    threshold, so ONLY the A->B direction is reported."""
    from mxsparkg.datapipe import containment_pairs

    words = [f"w{i}" for i in range(42)]  # 40 shingles
    big = " ".join(words)
    small = " ".join(words[10:17])  # 7 tokens -> 5 shingles, all in big
    docs = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id bigint, text string")
    out = {
        (r.a_id, r.b_id): (r.n_common, r.n_a, r.cont_ppm)
        for r in containment_pairs(docs).collect()
    }
    assert out == {(1, 2): (5, 5, 1000000)}


def test_containment_df_cap_lower_bounds(spark):
    """A shingle shared by MORE than max_doc_freq docs is excluded from
    the intersection but stays in the denominator — capped containment
    must only ever go DOWN."""
    from mxsparkg.datapipe import containment_pairs

    shared = "alpha beta gamma"  # one shingle, present in every doc
    docs = spark.createDataFrame(
        [(i, shared) for i in range(5)], "doc_id bigint, text string")
    # df = 5 > cap 3: every pair's only common shingle is capped away
    assert containment_pairs(docs, max_doc_freq=3).count() == 0
    # without the cap every directed pair is a full containment
    got = containment_pairs(docs, max_doc_freq=None).count()
    assert got == 20  # 5*4 directed pairs


# --------------------------------------------- sorted neighborhood --

def test_snm_pairs_equal_brute_force_window(spark):
    """The exploded equi-join must produce EXACTLY the rank-window pair
    set: brute-force ranks in Python, pair anything within 3 positions,
    filter lev <= max_lev."""
    from mxsparkg.graphquery import er_sorted_neighborhood

    names = [
        (1, "apple pie"), (2, "apple pia"), (3, "apple pi"),
        (4, "banana"), (5, "bananas"), (6, "cherry"),
        (7, "apple pie zz"),
    ]
    df = spark.createDataFrame(names, "id bigint, name string")
    got = {
        (r.a_id, r.b_id, r.rank_dist)
        for r in er_sorted_neighborhood(df, window=3, max_lev=4).collect()
    }
    import itertools

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[-1]

    ranked = sorted(names, key=lambda t: (t[1], t[0]))
    want = {
        (ranked[i][0], ranked[j][0], j - i)
        for i, j in itertools.combinations(range(len(ranked)), 2)
        if j - i <= 3 and lev(ranked[i][1], ranked[j][1]) <= 4
    }
    assert got == want and len(want) >= 4


def test_snm_window_bounds_pair_count(spark):
    """n records, window w: at most n*w candidate pairs regardless of
    name skew — the guarantee key-blocking can't give (here ALL names
    identical, which would make one key-block quadratic)."""
    from mxsparkg.graphquery import er_sorted_neighborhood

    df = spark.createDataFrame(
        [(i, "same name") for i in range(50)], "id bigint, name string")
    n = er_sorted_neighborhood(df, window=3, max_lev=10).count()
    assert n == 3 * 50 - (1 + 2 + 3)  # exact: tail ranks lack successors


# ------------------------------------------------------------ z-order --

def test_zorder_interleave_known_values(spark):
    from mxsparkg.layout import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (5, 3), (65535, 65535)],
        "x int, y int",
    )
    got = [r.z for r in df.select(
        zorder_key(F.col("x"), F.col("y")).alias("z")).collect()]
    # morton(5,3) = x bits at even positions (1+16=17... compute:
    # x=5=101 -> bits0,2 set -> positions 0,4 -> 17; y=3=11 -> bits0,1
    # -> positions 1,3 -> 10; total 27
    assert got == [0, 1, 2, 3, 27, 2**32 - 1]


def test_zorder_layout_prunes_box_queries(spark):
    """The measurable claim behind the layout: chunk a 64x64 uniform
    grid into 64 equal files by (a) x-then-y sort, (b) z-key sort; for
    a small centered box predicate, the z-layout must need strictly
    fewer candidate chunks (chunks whose min/max bounding box intersects
    the query box) than the 1-D sort layout."""
    from pyspark.sql import Window

    from mxsparkg.layout import zorder_key

    pts = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x int, y int")

    def candidate_chunks(df, *order_cols):
        chunked = df.withColumn(
            "chunk",
            F.floor((F.row_number().over(Window.orderBy(*order_cols)) - 1)
                    / 64),
        )
        stats = chunked.groupBy("chunk").agg(
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
        ).collect()
        lo, hi = 24, 39  # 16x16 centered box
        return sum(
            1 for r in stats
            if r.x1 >= lo and r.x0 <= hi and r.y1 >= lo and r.y0 <= hi)

    linear = candidate_chunks(pts, "x", "y")
    zsort = candidate_chunks(
        pts.withColumn("z", zorder_key(F.col("x"), F.col("y"), bits=6)),
        "z")
    assert zsort < linear, (zsort, linear)
    assert zsort <= 6 and linear >= 12


# --------------------------------------------- local clustering --

def test_lcc_clique_path_and_degree_one(spark):
    """K4 ∪ path(3): every clique node has LCC exactly 1.0 (10^6 ppm,
    3 triangles / C(3,2)=3 wedges), the path's middle node 0 (wedge but
    no triangle), and its deg-1 endpoints are EMITTED at 0 (absent !=
    zero for a downstream filter)."""
    from mxsparkg.graphquery import local_clustering

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    path = [(10, 11), (11, 12)]
    edges = spark.createDataFrame(k4 + path, "u bigint, v bigint")
    got = {r.node: (r.deg, r.n_tri, r.lcc_ppm)
           for r in local_clustering(edges).collect()}
    for v in range(4):
        assert got[v] == (3, 3, 1000000)
    assert got[11] == (2, 0, 0)
    assert got[10] == (1, 0, 0) and got[12] == (1, 0, 0)
