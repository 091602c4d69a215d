"""G1 connected-components correctness (hand-rolled large/small-star)."""

from pyspark.sql import Row

from mxsparkg.graph import connected_components, sameas_edges


def _cc(spark, edges):
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    rows = connected_components(df).collect()
    return {r["entity_id"]: r["canon_id"] for r in rows}


def test_cc_chain(spark):
    # a-b-c-d chain → all map to a
    got = _cc(spark, [("b", "a"), ("c", "b"), ("d", "c")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_cc_two_components(spark):
    got = _cc(spark, [("a", "b"), ("x", "y"), ("y", "z")])
    assert got["b"] == "a" and got["a"] == "a"
    assert got["x"] == "x" and got["y"] == "x" and got["z"] == "x"


def test_cc_star_and_cycle(spark):
    got = _cc(spark, [("hub", s) for s in ("s1", "s2", "s3")] + [("s1", "s3")])
    assert set(got.values()) == {"hub"}


def test_cc_long_chain_log_rounds(spark):
    n = 64
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n)]
    got = _cc(spark, edges)
    assert set(got.values()) == {"n000"}
    assert len(got) == n + 1


def test_cc_distributed_equals_driver_path(spark):
    """Hybrid strategy property: the distributed alternating-star loop
    (forced via driver_threshold=0) and the driver union-find produce the
    identical canon map."""
    edges = (
        [(f"c{i}", f"c{i+1}") for i in range(20)]          # chain
        + [("hub", f"s{i}") for i in range(10)]            # star
        + [("z1", "z2"), ("z2", "z3"), ("z3", "z1")]       # cycle
    )
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    driver = {(r["entity_id"], r["canon_id"])
              for r in connected_components(df).collect()}
    dist = {(r["entity_id"], r["canon_id"])
            for r in connected_components(df, driver_threshold=0).collect()}
    assert driver == dist


def test_cc_random_graph_paths_agree(spark):
    """Moderate-scale property: on a seeded random graph (3k nodes, mixed
    chains/stars/cycles + singleton-free noise), driver union-find and the
    distributed alternating-star loop produce the identical canon map."""
    import random

    rng = random.Random(42)
    nodes = [f"n{i:04d}" for i in range(3000)]
    edges = []
    for i in range(0, 2400, 3):          # chains of 3
        edges.append((nodes[i], nodes[i + 1]))
        edges.append((nodes[i + 1], nodes[i + 2]))
    for h in range(2400, 2450):          # stars
        for _ in range(8):
            edges.append((nodes[h], nodes[rng.randrange(2450, 3000)]))
    for _ in range(500):                 # random noise edges
        edges.append((nodes[rng.randrange(3000)], nodes[rng.randrange(3000)]))
    df = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges if a != b]
    )
    driver = {(r["entity_id"], r["canon_id"])
              for r in connected_components(df).collect()}
    dist = {(r["entity_id"], r["canon_id"])
            for r in connected_components(df, driver_threshold=0).collect()}
    assert driver == dist and len(driver) > 2000


def test_sameas_edges_chain_within_cluster(spark):
    df = spark.createDataFrame(
        [
            Row(entity_id="a", canon_id="a"),
            Row(entity_id="b", canon_id="a"),
            Row(entity_id="c", canon_id="a"),
            Row(entity_id="x", canon_id="x"),  # singleton → no edges
        ]
    )
    got = {(r["src"], r["dst"]) for r in sameas_edges(df).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_cc_reliable_checkpoint_path(spark, tmp_path):
    """reliable_checkpoint_dir switches per-round lineage truncation from
    localCheckpoint() to durable checkpoint(); results must be identical
    and checkpoint files must actually land in the configured dir."""
    import os

    edges = (
        [(f"c{i}", f"c{i+1}") for i in range(20)]
        + [("hub", f"s{i}") for i in range(10)]
    )
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    local = {(r["entity_id"], r["canon_id"])
             for r in connected_components(df, driver_threshold=0).collect()}
    ckpt_dir = str(tmp_path / "cc_ckpt")
    reliable = {
        (r["entity_id"], r["canon_id"])
        for r in connected_components(
            df, driver_threshold=0, reliable_checkpoint_dir=ckpt_dir
        ).collect()
    }
    assert reliable == local
    assert any(os.scandir(ckpt_dir)), "no reliable checkpoint files written"


def test_cc_salted_joins_identical(spark):
    """join_salts routes the star-step joins through skew.salted_join;
    the canon map must be bit-identical to the unsalted path (salting is
    a physical-plan choice, never a semantics choice) — including on a
    hub-heavy graph, the shape salting exists for."""
    import random

    rng = random.Random(11)
    edges = [("hub", f"leaf{i:05d}") for i in range(1500)]
    edges += [
        (f"m{rng.randrange(400)}", f"m{rng.randrange(400)}")
        for _ in range(600)
    ]
    df = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges if a != b]
    )
    plain = {(r["entity_id"], r["canon_id"])
             for r in connected_components(df, driver_threshold=0).collect()}
    salted = {(r["entity_id"], r["canon_id"])
              for r in connected_components(
                  df, driver_threshold=0, join_salts=8).collect()}
    assert plain == salted and len(plain) > 1500
