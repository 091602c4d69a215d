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
    # eid == global sort rank of id (the contract the old sort+zipWithIndex
    # implementation gave; the DataFrame-only prefix-sum path must match)
    by_eid = [r[1] for r in sorted(a)]
    assert by_eid == sorted(by_eid)


def test_dense_entities_matches_global_sort_rank_larger(spark):
    """200 distinct ids across many partitions: eid must equal the global
    sort rank exactly (checksum of the id→eid map is the invariant the
    embed op's negative sampler indexes by)."""
    ids = [f"<e:{i:04d}>" for i in range(200)]
    import random

    rng = random.Random(7)
    shuffled = ids[:]
    rng.shuffle(shuffled)
    edges = spark.createDataFrame(
        [(shuffled[i], "p", shuffled[(i + 1) % 200]) for i in range(200)],
        ["subj", "pred", "obj"],
    ).repartition(16)
    got = {r["id"]: r["eid"] for r in _dense_entities(edges).collect()}
    assert got == {v: k for k, v in enumerate(sorted(ids))}


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


def test_export_edges_turtle_blocks_group_and_escape(spark):
    """Turtle export: one block per subject, predicates sorted, IRIs
    url_encoded (form encoding, space → + — same as export_edges_ntriples), terminal ' .' exactly once per block."""
    from mxsparkg.kgexport import export_edges_turtle

    edges = spark.createDataFrame(
        [("a b", "p2", "x"), ("a b", "p1", "y"), ("c", "p1", "x")],
        "subj string, pred string, obj string",
    )
    rows = {r["subj"]: r for r in export_edges_turtle(edges).collect()}
    assert set(rows) == {"<urn:kg:e:a+b>", "<urn:kg:e:c>"}
    ab = rows["<urn:kg:e:a+b>"]
    assert ab["n_preds"] == 2
    # sorted predicate list: p1 before p2, ';'-joined, one terminal dot
    assert ab["block"] == (
        "<urn:kg:e:a+b> <urn:kg:p:p1> <urn:kg:e:y> ;\n"
        "  <urn:kg:p:p2> <urn:kg:e:x> ."
    )
    assert rows["<urn:kg:e:c>"]["block"].endswith(" .")


def test_export_edges_jsonld_documents_parse_and_group(spark):
    """JSON-LD export: one self-contained JSON document per subject,
    predicates and values sorted, IRIs url_encoded bare (no angle
    brackets — JSON-LD keys), every doc valid JSON."""
    import json

    from mxsparkg.kgexport import export_edges_jsonld

    edges = spark.createDataFrame(
        [("a b", "p2", "x"), ("a b", "p1", "y"), ("c", "p1", "x")],
        "subj string, pred string, obj string",
    )
    rows = {r["subj"]: r for r in export_edges_jsonld(edges).collect()}
    assert set(rows) == {"urn:kg:e:a+b", "urn:kg:e:c"}
    ab = rows["urn:kg:e:a+b"]
    assert ab["n_preds"] == 2
    node = json.loads(ab["doc"])
    assert node == {
        "@id": "urn:kg:e:a+b",
        "urn:kg:p:p1": [{"@id": "urn:kg:e:y"}],
        "urn:kg:p:p2": [{"@id": "urn:kg:e:x"}],
    }
    # key order in the serialized text is the sorted predicate order
    assert ab["doc"].index("p1") < ab["doc"].index("p2")
    assert json.loads(rows["urn:kg:e:c"]["doc"])["@id"] == "urn:kg:e:c"
