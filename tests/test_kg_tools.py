"""kg_tools CLI helpers: dense entity-id assignment and edge typing.

The ops themselves reuse kgexport/kgembed functions covered by the gate
and their own tests; these pin the two CLI-only helpers the embed and
validate/infer ops depend on.
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/jobs")

from kg_tools import _dense_entities, _typed_edges  # noqa: E402


def test_dense_entities_deterministic_dense_and_complete(spark):
    edges = spark.createDataFrame(
        [("b", "p", "a"), ("c", "p", "a"), ("b", "q", "d")],
        ["subj", "pred", "obj"],
    )
    a = sorted(map(tuple, _dense_entities(edges).collect()))
    b = sorted(map(tuple, _dense_entities(edges.repartition(5)).collect()))
    assert a == b                                    # parallelism-invariant
    eids = sorted(r[0] for r in a)
    assert eids == [0, 1, 2, 3]                      # dense 0..n-1
    assert sorted(r[1] for r in a) == ["a", "b", "c", "d"]
    assert all(r[1] == r[2] for r in a)              # obj_neg mirrors id


def test_typed_edges_attaches_both_role_types(spark):
    edges = spark.createDataFrame(
        [("x", "works_for", "y", 3)], ["subj", "pred", "obj", "n_support"]
    )
    nodes = spark.createDataFrame(
        [("x", "pers"), ("y", "org")], ["canon_id", "etype"]
    )
    [row] = _typed_edges(edges, nodes).collect()
    assert (row["styp"], row["otyp"]) == ("pers", "org")
    assert row["n_support"] == 3
