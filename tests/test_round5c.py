"""Round-5 closing batch: RDFS entailment closure, synchronized Louvain
local-move, Markov stationary distribution, multiset set-ops, star BGP,
RDF-star export. The cross-engine gate (test_contract_gate) certifies the
sf0.01 values; these tests pin the SEMANTICS the gate's fixed dataset
can't discriminate — closure depth/cycles, move optimality, mass
conservation, multiset identities."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------ RDFS closure ----

def _chain_subclass(spark, depth: int):
    rows = [(f"c{i}", f"c{i + 1}") for i in range(depth)]
    return spark.createDataFrame(rows, "sub string, sup string")


def test_subclass_closure_deep_chain(spark):
    """Path doubling closes a depth-8 chain (needs 3 doubling rounds;
    a naive one-hop-per-round loop would need 7): the closure of a
    linear chain c0⊑c1⊑…⊑c8 has n(n+1)/2 pairs."""
    from mxsparkg.kgexport import subclass_closure

    depth = 8
    closed = subclass_closure(_chain_subclass(spark, depth))
    assert closed.count() == depth * (depth + 1) // 2
    # the longest derived edge exists
    assert closed.filter(
        (F.col("sub") == "c0") & (F.col("sup") == f"c{depth}")
    ).count() == 1


def test_subclass_closure_cycle_saturates(spark):
    """A subClassOf cycle saturates to full mutual reachability — the
    RDFS-correct reading (all classes in the cycle are equivalent) and
    still a fixpoint, so cyclic ontologies converge rather than hang;
    the ValueError cap only guards hierarchies deeper than 2^max_iters."""
    from mxsparkg.kgexport import subclass_closure

    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "sub string, sup string"
    )
    closed = subclass_closure(cyc)
    # full 3x3 reachability: every class reaches every class
    assert closed.count() == 9


def test_rdfs_infer_keeps_asserted_types(spark):
    """rdfs9 must ADD supertypes, never drop the asserted type — the
    reflexive closure is the keep mechanism."""
    from mxsparkg.kgexport import rdfs_infer_types

    types = spark.createDataFrame(
        [("i1", "c0"), ("i2", "c1")], "inst string, cls string"
    )
    sub = _chain_subclass(spark, 2)  # c0 ⊑ c1 ⊑ c2
    got = {
        (r.inst, r.cls) for r in rdfs_infer_types(types, sub).collect()
    }
    assert got == {
        ("i1", "c0"), ("i1", "c1"), ("i1", "c2"),
        ("i2", "c1"), ("i2", "c2"),
    }


# -------------------------------------------------- Louvain local move ----

def _planted_two_cliques(spark):
    """Two 4-cliques {0..3} and {4..7} plus one bridge edge 3–4; node 3
    deliberately mislabeled into the right-hand community."""
    edges = [(u, v) for u in range(4) for v in range(u + 1, 4)]
    edges += [(u, v) for u in range(4, 8) for v in range(u + 1, 8)]
    edges += [(3, 4)]
    und = spark.createDataFrame(edges, "u long, v long")
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 4) for i in range(8)], "src long, label long"
    )
    return und, labels


def test_louvain_corrects_planted_mislabel(spark):
    """Node 3 sits in clique {0..3} but starts labeled with the other
    clique: one synchronized pass must move it home (3 intra-clique
    edges vs 1 bridge edge), and must move NOTHING else — every other
    node is already optimally placed."""
    from mxsparkg.graphquery import _symmetrize, louvain_move

    und, labels = _planted_two_cliques(spark)
    sym = _symmetrize(und, "u", "v")
    m = und.count()
    out = louvain_move(sym, labels, m).collect()
    moved = {r.src for r in out if r.moved}
    assert moved == {3}
    lab = {r.src: r.label for r in out}
    assert lab[3] == 0
    assert lab[4] == 4  # the bridge's other endpoint stays


def test_louvain_pass_improves_planted_modularity(spark):
    """The corrected assignment must score strictly higher exact-integer
    modularity than the planted one (same 4m² scaling on both sides)."""
    from mxsparkg.graphquery import (
        _symmetrize,
        louvain_move,
        modularity_stats,
    )

    und, labels = _planted_two_cliques(spark)
    sym = _symmetrize(und, "u", "v")
    m = und.count()

    def q_total(lab_df):
        row = modularity_stats(und, lab_df).select("q_total_4m2").first()
        spark.catalog.clearCache()  # modularity_stats persists its inputs
        return int(row[0])

    before = q_total(labels)
    after = q_total(
        louvain_move(sym, labels, m).select("src", "label")
    )
    assert after > before


def test_louvain_partition_invariant(spark):
    """Synchronized evaluation makes the pass deterministic at any
    parallelism: 1-partition and 8-partition runs agree exactly."""
    from mxsparkg.graphquery import _symmetrize, louvain_move

    und, labels = _planted_two_cliques(spark)
    m = und.count()
    outs = []
    for nparts in (1, 8):
        sym = _symmetrize(und.repartition(nparts), "u", "v")
        outs.append(sorted(
            (r.src, r.label, r.moved)
            for r in louvain_move(sym, labels.repartition(nparts), m)
            .collect()
        ))
    assert outs[0] == outs[1]


# --------------------------------------------- Markov stationary mass ----

def test_markov_mass_conserved_within_floor_dust(spark, sf001):
    """Each power-iteration round loses only floor dust (< 1 unit per
    transition term, ≤ |types|² terms/round): after 3 rounds total mass
    sits within 3·|types|² of MARKOV_SCALE, and p_ppm sums to ~10⁶."""
    from mxsparkg.contract import (
        EVENT_TYPES,
        MARKOV_ITERS,
        MARKOV_SCALE,
        evt_markov_stationary,
    )

    rows = evt_markov_stationary(spark, sf001).collect()
    total = sum(r.mass for r in rows)
    dust_bound = MARKOV_ITERS * len(EVENT_TYPES) ** 2 + len(EVENT_TYPES)
    assert MARKOV_SCALE - dust_bound <= total <= MARKOV_SCALE
    ppm = sum(r.p_ppm for r in rows)
    assert 1_000_000 - len(rows) <= ppm <= 1_000_000


# -------------------------------------------------- multiset set-ops ----

def test_setop_all_multiset_identities(spark, sf001):
    """Bag semantics pinned against independently-computed counts:
    n_except = max(n_a − n_b, 0), n_intersect = min(n_a, n_b) per value."""
    from mxsparkg.contract import SETOP_MOD, setop_all

    li = spark.read.parquet(f"{sf001}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf001}/part.parquet")
    na = {
        r.v: r.n
        for r in li.select((F.col("l_partkey") % SETOP_MOD).alias("v"))
        .groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    nb = {
        r.v: r.n
        for r in pt.select((F.col("p_partkey") % SETOP_MOD).alias("v"))
        .groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        r.v: (r.n_except, r.n_intersect)
        for r in setop_all(spark, sf001).collect()
    }
    for v, (ne, ni) in got.items():
        a, b = na.get(v, 0), nb.get(v, 0)
        assert ne == max(a - b, 0), v
        assert ni == min(a, b), v


# ------------------------------------------------------- RDF-star line ----

def test_rdfstar_line_shape(spark, sf001):
    """Every emitted line is a single well-formed RDF-star annotation:
    quoted triple, support predicate, xsd:integer-typed literal."""
    import re

    from mxsparkg.kgexport import kg_rdfstar

    pat = re.compile(
        r'^<< <urn:kg:e:supp:\d+> <urn:kg:p:supplies> <urn:kg:e:part:\d+>'
        r' >> <urn:kg:p:support> "\d+"'
        r'\^\^<http://www\.w3\.org/2001/XMLSchema#integer> \.$'
    )
    lines = [r.line for r in kg_rdfstar(spark, sf001).collect()]
    assert lines, "rdfstar export empty at sf0.001"
    for ln in lines:
        assert pat.match(ln), ln


# -------------------------------------------------- property path p+ ----

def test_property_path_chain_min_hops(spark):
    """On a 10-node chain with max_hops=4, reach is exactly the pairs
    (i, j) with 1 ≤ j−i ≤ 4 and min_hops = j−i."""
    from mxsparkg.kgexport import property_path

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    got = {(r.src, r.dst): r.hops for r in property_path(e, 4).collect()}
    want = {(i, j): j - i for i in range(10) for j in range(10)
            if 1 <= j - i <= 4 and j <= 9}
    assert got == want


def test_property_path_prefers_direct_edge(spark):
    """A direct edge beats a longer route: with 0→1→2→3 and a shortcut
    0→3, min_hops(0, 3) must be 1."""
    from mxsparkg.kgexport import property_path

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3)], "src long, dst long"
    )
    got = {(r.src, r.dst): r.hops for r in property_path(e, 4).collect()}
    assert got[(0, 3)] == 1
    assert got[(1, 3)] == 2


# --------------------------------------------------- Louvain phase 2 ----

def test_louvain_aggregate_planted(spark):
    """Two 4-cliques + one bridge, correctly labeled: the supernode graph
    is exactly two self-loops of weight 6 and one cut edge of weight 1."""
    from mxsparkg.graphquery import louvain_aggregate

    und, _ = _planted_two_cliques(spark)
    labels = spark.createDataFrame(
        [(i, 0 if i < 4 else 4) for i in range(8)], "src long, label long"
    )
    got = {(r.ca, r.cb): r.weight
           for r in louvain_aggregate(und, labels).collect()}
    assert got == {(0, 0): 6, (4, 4): 6, (0, 4): 1}
