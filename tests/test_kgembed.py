"""kgembed: exact-integer TransE training.

The contract gate certifies kg_transe value-exactly vs the unrolled
DuckDB CTEs; these tests pin the TRAINING semantics the hash cannot see:
the objective actually decreases, updates are the documented mean-sign
step, and the whole thing is parallelism-invariant (exactness claim).
"""

from pyspark.sql import functions as F

from mxsparkg.kgembed import (
    hinge_loss,
    init_embeddings,
    train_transe,
    transe_epoch,
)


def _toy(spark):
    # 3 entities, 1 pred, 2 triples + hash-free explicit negatives
    pairs = spark.createDataFrame(
        [
            ("a", "p", "x", "y"),
            ("b", "p", "x", "y"),
            ("c", "p", "y", "x"),
        ],
        ["subj", "pred", "obj", "obj_neg"],
    )
    ent = init_embeddings(
        spark.createDataFrame([(e,) for e in "abcxy"], ["id"])
    )
    pred = init_embeddings(spark.createDataFrame([("p",)], ["id"]))
    return pairs, ent, pred


def test_training_reduces_hinge_loss(spark):
    """Hand-built start with ACTIVE hinge on every triple (pos object far,
    corrupted object at distance 0): full-batch descent must reduce the
    integer objective."""
    pairs = spark.createDataFrame(
        [("a", "p", "x", "y"), ("b", "p", "x", "y")],
        ["subj", "pred", "obj", "obj_neg"],
    )
    ent = spark.createDataFrame(
        [
            ("a", 0, 0, 0, 0),
            ("b", 1, 0, 0, 0),
            ("x", 5, 5, 5, 5),   # positive object: far
            ("y", 0, 0, 0, 0),   # corrupted object: at the subjects
        ],
        ["id", "e0", "e1", "e2", "e3"],
    )
    pred = spark.createDataFrame([("p", 0, 0, 0, 0)], ["id", "e0", "e1", "e2", "e3"])
    l0 = hinge_loss(pairs, ent, pred)
    assert l0 > 0
    ent2, pred2 = train_transe(pairs, ent, pred, epochs=4)
    l1 = hinge_loss(pairs, ent2, pred2)
    assert l1 < l0, (l0, l1)


def test_epoch_moves_each_entity_at_most_lr_per_dim(spark):
    pairs, ent, pred = _toy(spark)
    ent2, _ = transe_epoch(pairs, ent, pred)
    before = {r["id"]: r for r in ent.collect()}
    after = {r["id"]: r for r in ent2.collect()}
    for eid, row in after.items():
        for k in range(4):
            # mean-sign step: |Δ| ≤ 1 per dimension per epoch
            assert abs(row[f"e{k}"] - before[eid][f"e{k}"]) <= 1


def test_init_is_deterministic_and_bounded(spark):
    ids = spark.createDataFrame([(f"e{i}",) for i in range(50)], ["id"])
    a = sorted(map(tuple, init_embeddings(ids).collect()))
    b = sorted(map(tuple, init_embeddings(ids).collect()))
    assert a == b
    vals = [v for row in a for v in row[1:]]
    assert all(-8 <= v <= 8 for v in vals)
    assert len(set(vals)) > 3  # not collapsed


def test_predict_ranks_exact_translation_first(spark):
    """Hand-built embeddings where x == a + p exactly: link prediction
    must rank x first with dist 0; ties break on candidate id."""
    from mxsparkg.kgembed import predict_objects

    rows = [
        ("a", 1, 2, 3, 4),
        ("x", 2, 3, 4, 5),   # == a + p  (p = all-ones)
        ("y", 2, 3, 4, 7),   # dist 2
        ("z", 9, 9, 9, 9),
    ]
    ent = spark.createDataFrame(rows, ["id", "e0", "e1", "e2", "e3"])
    pred = spark.createDataFrame([("p", 1, 1, 1, 1)], ["id", "e0", "e1", "e2", "e3"])
    subjects = spark.createDataFrame([("a",)], ["id"])
    cands = spark.createDataFrame([("x",), ("y",), ("z",)], ["id"])
    out = predict_objects(subjects, "p", ent, pred, cands, top_k=2).collect()
    assert [(r["cand"], r["dist"], r["rk"]) for r in out] == [
        ("x", 0, 1), ("y", 2, 2)
    ]


def test_training_improves_hits_at_1(spark):
    """Separable toy (two subjects per true object, shared relation):
    training must not make link-prediction accuracy worse, and on this
    construction it reaches hits@1 above the init value. Deterministic
    (hash init, integer arithmetic) — no flakiness."""
    from mxsparkg.kgembed import hits_at_k, train_transe

    triples = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "x"), ("c", "p", "y"), ("d", "p", "y")],
        ["subj", "pred", "obj"],
    )
    pairs = spark.createDataFrame(
        [("a", "p", "x", "y"), ("b", "p", "x", "y"),
         ("c", "p", "y", "x"), ("d", "p", "y", "x")],
        ["subj", "pred", "obj", "obj_neg"],
    )
    ent = init_embeddings(
        spark.createDataFrame([(e,) for e in "abcdxy"], ["id"])
    )
    pred = init_embeddings(spark.createDataFrame([("p",)], ["id"]))
    cands = spark.createDataFrame([("x",), ("y",)], ["id"])
    h0 = hits_at_k(triples, ent, pred, cands, k=1)
    ent2, pred2 = train_transe(pairs, ent, pred, epochs=6)
    h1 = hits_at_k(triples, ent2, pred2, cands, k=1)
    assert h1 >= h0
    assert h1 >= 0.75, (h0, h1)


def test_training_is_partition_invariant(spark):
    """Exactness claim: same result at different parallelism (the property
    that float gradients would break)."""
    pairs, ent, pred = _toy(spark)
    e1, p1 = train_transe(pairs.repartition(1), ent.repartition(1), pred, epochs=2)
    e8, p8 = train_transe(pairs.repartition(8), ent.repartition(7), pred, epochs=2)
    assert sorted(map(tuple, e1.collect())) == sorted(map(tuple, e8.collect()))
    assert p1.collect() == p8.collect()


def test_distmult_trilinear_score_and_tiebreak(spark):
    """Hand-planted integer embeddings: score(s,r,o) = sum_k s_k r_k o_k,
    higher wins, ties break on cand ASC."""
    from pyspark.sql import functions as F

    from mxsparkg.kgembed import predict_objects_distmult

    ent = spark.createDataFrame(
        [
            ("s1", 1, 2, 0, 0),
            ("s2", -1, 1, 0, 0),
            ("cA", 3, 1, 0, 0),   # s1: (1*2)*3 + (2*1)*1 = 8
            ("cB", 1, 3, 0, 0),   # s1: 2 + 6 = 8 (tie with cA -> cA wins)
            ("cC", 0, 5, 0, 0),   # s1: 0 + 10 = 10 (winner)
        ],
        "id string, e0 long, e1 long, e2 long, e3 long",
    )
    pred = spark.createDataFrame(
        [("rel", 2, 1, 0, 0)], "id string, e0 long, e1 long, e2 long, e3 long"
    )
    subjects = spark.createDataFrame([("s1",), ("s2",)], ["id"])
    cands = spark.createDataFrame([("cA",), ("cB",), ("cC",)], ["id"])
    top2 = {
        (r.subj, r.rk): (r.cand, r.score)
        for r in predict_objects_distmult(
            subjects, "rel", ent, pred, cands, top_k=2
        ).collect()
    }
    assert top2[("s1", 1)] == ("cC", 10)
    assert top2[("s1", 2)] == ("cA", 8)       # 8==8 tie -> cA before cB
    # s2: cA = (-1*2)*3 + (1*1)*1 = -5; cB = -2 + 3 = 1; cC = 0 + 5 = 5
    assert top2[("s2", 1)] == ("cC", 5)
    assert top2[("s2", 2)] == ("cB", 1)


def test_hits_at_k_key_matches_library_metric(spark):
    """The kg_hits_at_k certificate row must agree with the hits_at_k()
    library float on the same trained model (ppm = floor(ratio * 1e6)),
    and n_test must be the customer count."""
    from pyspark.sql import functions as F

    from mxsparkg.kgembed import (
        EPOCHS,
        HITS_K,
        _t,
        _training_pairs,
        hits_at_k,
        init_embeddings,
        kg_hits_at_k,
        train_transe,
    )
    from mxsparkg.kgexport import iri

    sf = "/root/testdata/sf0.001"
    row = kg_hits_at_k(spark, sf).collect()[0]
    cust = _t(spark, sf, "customer")
    nat = _t(spark, sf, "nation")
    cust_ids = cust.select(iri("cust", F.col("c_custkey")).alias("id"))
    nat_ids = nat.select(iri("nat", F.col("n_nationkey")).alias("id"))
    ent = init_embeddings(cust_ids.unionByName(nat_ids))
    pred = init_embeddings(
        spark.createDataFrame([("in_nation",)], ["id"]))
    ent, pred = train_transe(
        _training_pairs(spark, sf), ent, pred, epochs=EPOCHS)
    triples = cust.select(
        iri("cust", F.col("c_custkey")).alias("subj"),
        F.lit("in_nation").alias("pred"),
        iri("nat", F.col("c_nationkey")).alias("obj"),
    )
    ratio = hits_at_k(triples, ent, pred, nat_ids, k=HITS_K)
    assert row.n_test == cust.count()
    assert row.n_hits == round(ratio * row.n_test)
    assert row.hits_ppm == row.n_hits * 1_000_000 // row.n_test
