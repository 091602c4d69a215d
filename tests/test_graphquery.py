"""Graph analytics semantics the DuckDB gate can't check: partition-order
invariance of integer PageRank (the whole point of integer mass), known
closed-form answers on planted graphs, and min-label == connected
components at convergence."""

from __future__ import annotations

import pyspark.sql.functions as F

from mxsparkg.graphquery import (
    PR_TOTAL_MASS,
    minlabel_propagate,
    pagerank_exact,
    triangle_stats,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _sym(spark, pairs):
    return _edges(spark, pairs + [(b, a) for a, b in pairs])


def test_pagerank_partition_order_invariance(spark):
    """Integer mass makes PageRank bit-identical under any repartitioning —
    the reproducibility property doubles cannot give (float sums are
    partition-order-dependent)."""
    pairs = [(i, (i * 7 + 3) % 50) for i in range(50) for _ in (0,)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _sym(spark, pairs)
    a = {r.src: r.pr for r in pagerank_exact(e, iters=4).collect()}
    b = {
        r.src: r.pr
        for r in pagerank_exact(e.repartition(13), iters=4).collect()
    }
    c = {
        r.src: r.pr
        for r in pagerank_exact(e.repartition(1), iters=4).collect()
    }
    assert a == b == c
    # mass conservation up to deterministic floor-division loss
    assert 0.98 * PR_TOTAL_MASS < sum(a.values()) <= PR_TOTAL_MASS


def test_pagerank_hub_ranks_highest(spark):
    """Star graph: the hub must out-rank every leaf."""
    e = _sym(spark, [(0, i) for i in range(1, 20)])
    pr = {r.src: r.pr for r in pagerank_exact(e, iters=5).collect()}
    assert pr[0] > max(pr[i] for i in range(1, 20))
    leaf_vals = {pr[i] for i in range(1, 20)}
    assert len(leaf_vals) == 1  # symmetric leaves rank identically


def test_triangle_stats_clique_and_triangle_free(spark):
    """K4: 6 edges, 12 wedges, 4 triangles, clustering exactly 1.0 (1e6
    ppm). A path graph has zero triangles."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    row = triangle_stats(
        spark.createDataFrame(k4, "u long, v long")
    ).first()
    assert (row.n_edges, row.n_wedges, row.n_triangles) == (6, 12, 4)
    assert row.clustering_ppm == 1_000_000
    path = [(i, i + 1) for i in range(5)]
    row2 = triangle_stats(
        spark.createDataFrame(path, "u long, v long")
    ).first()
    assert row2.n_triangles == 0 and row2.clustering_ppm == 0


def test_minlabel_converges_to_components(spark):
    """Two chains + an isolate-pair: after >= diameter rounds every node
    carries its component minimum (== connected components)."""
    chains = [(i, i + 1) for i in range(0, 5)] + [
        (i, i + 1) for i in range(10, 14)
    ] + [(20, 21)]
    e = _sym(spark, chains)
    lab = {
        r.src: r.label for r in minlabel_propagate(e, iters=6).collect()
    }
    assert all(lab[i] == 0 for i in range(0, 6))
    assert all(lab[i] == 10 for i in range(10, 15))
    assert lab[20] == lab[21] == 20
    # truncated at 1 round, far nodes have NOT converged (bounded rounds
    # really are bounded)
    lab1 = {
        r.src: r.label for r in minlabel_propagate(e, iters=1).collect()
    }
    assert lab1[5] == 4


def test_pagerank_weighted_vs_unweighted(spark):
    """weight_col semantics: weight≡1 is bit-identical to the unweighted
    formula; skewing all of a node's out-weight onto one edge routes that
    node's full damped mass there."""
    pairs = [(1, 2), (1, 3), (2, 1), (3, 1)]
    e1 = spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src long, dst long, w long"
    )
    base = {
        r.src: r.pr
        for r in pagerank_exact(
            spark.createDataFrame(pairs, "src long, dst long"), iters=4
        ).collect()
    }
    w1 = {
        r.src: r.pr
        for r in pagerank_exact(e1, iters=4, weight_col="w").collect()
    }
    assert base == w1, "weight=1 must reproduce the unweighted ranks"
    # node 1 sends (almost) everything to 2: 2 must outrank 3 strictly
    skew = spark.createDataFrame(
        [(1, 2, 999), (1, 3, 1), (2, 1, 1), (3, 1, 1)],
        "src long, dst long, w long",
    )
    ws = {r.src: r.pr for r in pagerank_exact(skew, iters=4, weight_col="w").collect()}
    assert ws[2] > ws[3] and ws[2] > w1[2]


def test_kg_salience_and_components_over_pipeline_shapes(spark):
    """kg_salience / kg_components consume the pipeline's edges/nodes
    schemas: a hub entity with the most supported edges ranks first; the
    two planted KG islands come back as two components of the right size."""
    from mxsparkg.graphquery import kg_components, kg_salience

    edges = spark.createDataFrame(
        [
            ("e:hub", "works_for", "e:a", 5, ["u1"]),
            ("e:hub", "works_for", "e:b", 5, ["u2"]),
            ("e:hub", "born_in", "e:c", 5, ["u3"]),
            ("e:a", "knows", "e:b", 1, ["u4"]),
            ("e:x", "knows", "e:y", 2, ["u5"]),
        ],
        "subj string, pred string, obj string, n_support long, urls array<string>",
    )
    nodes = spark.createDataFrame(
        [
            ("e:hub", 15, ["Hub Corp"], "ORG"),
            ("e:a", 3, ["Alice"], "PER"),
            ("e:b", 3, ["Bob"], "PER"),
            ("e:c", 1, ["Cityville"], "LOC"),
            ("e:x", 2, ["X"], "PER"),
            ("e:y", 2, ["Y"], "PER"),
        ],
        "canon_id string, n_mentions long, surface_forms array<string>, etype string",
    )
    top = kg_salience(edges, nodes, iters=6, top_k=3).collect()
    assert top[0].canon_id == "e:hub" and top[0].etype == "ORG"
    assert top[0].surface_forms == ["Hub Corp"]
    comps = kg_components(edges).collect()
    assert sorted(r.n_members for r in comps) == [2, 4]


def test_kcore_peel_matches_pure_python_fixpoint(spark):
    """kcore_peel run with enough rounds equals the textbook sequential
    k-core (repeatedly delete nodes of degree < k) on a deterministic
    random graph — and is invariant to input partitioning."""
    import random

    from mxsparkg.graphquery import kcore_peel

    rng = random.Random(7)
    pairs = sorted({
        tuple(sorted(rng.sample(range(40), 2))) for _ in range(100)
    })

    # sequential oracle: peel to fixpoint
    k = 3
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for x in list(adj):
            if len(adj[x]) < k:
                for y in adj.pop(x):
                    adj[y].discard(x)
                changed = True
    expected = {x: len(ns) for x, ns in adj.items() if ns}

    e = spark.createDataFrame(pairs, "u long, v long")
    # rounds=10 >> peel-cascade depth on 40 nodes → fixpoint; partitioning
    # of the input cannot matter (pure relational ops), so one run suffices
    got = {
        r.node: r.degree
        for r in kcore_peel(e, k=k, rounds=10, checkpoint_every=4).collect()
    }
    assert got == expected


def test_bfs_hops_matches_driver_bfs(spark):
    """bfs_hops == textbook BFS min-hop distances on a random symmetric
    graph, including the truncation semantics (nodes beyond `iters` hops
    absent) and multi-source min (a node reachable from two seeds gets the
    shorter distance)."""
    import collections
    import random

    from mxsparkg.graphquery import bfs_hops

    rng = random.Random(13)
    pairs = sorted({
        tuple(sorted(rng.sample(range(60), 2))) for _ in range(80)
    })
    seeds = [0, 7, 31]

    adj = collections.defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt

    e = _sym(spark, list(pairs))
    seed_df = spark.createDataFrame([(s,) for s in seeds], "node long")
    for iters in (1, 3):
        got = {
            r.node: r.dist
            for r in bfs_hops(e, seed_df, iters=iters).collect()
        }
        expected = {n: d for n, d in dist.items() if d <= iters}
        assert got == expected


def test_ppr_seed_locality_and_mass(spark):
    """Two disconnected components; seeds only in component A: every
    component-B node must end with exactly zero rank (restart mass never
    reaches it), total mass stays ~conserved, and the seed outranks its
    neighbors (rank decays with distance from the restart set)."""
    from mxsparkg.graphquery import PR_TOTAL_MASS, ppr_exact

    edges = spark.createDataFrame(
        # component A: a1 - a2 - a3 chain; component B: b1 - b2
        [("a1", "a2"), ("a2", "a1"), ("a2", "a3"), ("a3", "a2"),
         ("b1", "b2"), ("b2", "b1")],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame([("a1",)], ["src"])
    pr = {r.src: r.pr for r in ppr_exact(edges, seeds, iters=6).collect()}
    assert pr["b1"] == 0 and pr["b2"] == 0
    assert pr["a1"] > pr["a2"] > pr["a3"] > 0
    total = sum(pr.values())
    assert abs(total - PR_TOTAL_MASS) <= 6 * (len(pr) + 6)  # floor-div loss


def test_ppr_with_all_seeds_equals_global_pagerank(spark):
    """Seeds == every node degenerates PPR to global PageRank exactly
    (same integer arithmetic, so bit-identical, not approximately)."""
    from mxsparkg.graphquery import pagerank_exact, ppr_exact

    edges = spark.createDataFrame(
        [("x", "y"), ("y", "x"), ("y", "z"), ("z", "y"), ("z", "x"),
         ("x", "z")],
        ["src", "dst"],
    )
    seeds = edges.select("src").distinct()
    a = sorted(map(tuple, ppr_exact(edges, seeds, iters=4).collect()))
    b = sorted(map(tuple, pagerank_exact(edges, iters=4).collect()))
    assert a == b


def test_hits_roles_and_partition_invariance(spark):
    """Planted directed bipartite graph: hub h0 points at every authority,
    authority a0 is pointed at by every hub — each must top its role's
    ranking; scores are bit-identical under repartitioning (integer L1
    normalization, same property as integer PageRank) and each role's
    mass is conserved up to floor-division loss."""
    from mxsparkg.graphquery import PR_TOTAL_MASS, hits_exact

    pairs = [("h0", f"a{j}") for j in range(8)] + [
        (f"h{i}", "a0") for i in range(1, 6)
    ] + [(f"h{i}", f"a{i}") for i in range(1, 6)]
    e = spark.createDataFrame(pairs, ["src", "dst"])
    out = {(r.node, r.role): r.score for r in hits_exact(e, iters=2).collect()}
    out2 = {
        (r.node, r.role): r.score
        for r in hits_exact(e.repartition(7), iters=2).collect()
    }
    assert out == out2
    hubs = {n: s for (n, role), s in out.items() if role == "hub"}
    auths = {n: s for (n, role), s in out.items() if role == "auth"}
    assert max(hubs, key=hubs.get) == "h0"
    assert max(auths, key=auths.get) == "a0"
    for scores in (hubs, auths):
        assert 0.98 * PR_TOTAL_MASS < sum(scores.values()) <= PR_TOTAL_MASS


def test_er_jaccard_exact_values_and_cap(spark):
    """Known incidence: s1={p1,p2,p3}, s2={p2,p3,p4} → Jaccard 2/4 =
    500000 ppm exactly. With a hot shared neighbor p0 carried by every
    supplier and cap below its degree, p0 must be dropped BEFORE pairing:
    degrees and overlaps are computed on the capped graph, so the result
    is identical to a corpus where p0 never existed."""
    from mxsparkg.graphquery import er_jaccard_candidates

    base = [(1, 11), (1, 12), (1, 13), (2, 12), (2, 13), (2, 14), (3, 99)]
    hot = [(s, 0) for s in (1, 2, 3)]
    sp = spark.createDataFrame(base + hot, ["s", "p"])
    got = {
        (r.s1, r.s2): (r.n_shared, r.jac_ppm)
        for r in er_jaccard_candidates(sp, cap=2).collect()
    }
    assert got == {(1, 2): (2, 500_000)}
    # without the hot part at all, same answer (cap == removal semantics)
    sp_clean = spark.createDataFrame(base, ["s", "p"])
    got_clean = {
        (r.s1, r.s2): (r.n_shared, r.jac_ppm)
        for r in er_jaccard_candidates(sp_clean, cap=2).collect()
    }
    assert got == got_clean


def test_sssp_unit_weights_equals_bfs(spark):
    """With every weight = 1, bounded Bellman-Ford IS bounded BFS: the
    relaxation recurrence degenerates to min-hop. Certifies sssp_relax
    against the independently-tested bfs_hops on a small random graph."""
    import random

    from pyspark.sql import functions as F

    from mxsparkg.graphquery import bfs_hops, sssp_relax

    rnd = random.Random(5)
    edges = list({(rnd.randrange(40), rnd.randrange(40)) for _ in range(120)})
    e = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (7,)], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in sssp_relax(e.withColumn("w", F.lit(1)), seeds, iters=3).collect()
    }
    want = {r["node"]: r["dist"] for r in bfs_hops(e, seeds, iters=3).collect()}
    assert got == want and len(got) > 2


def test_sssp_prefers_cheap_long_path(spark):
    """Two routes 0→3: direct edge of weight 9 vs the 3-edge chain
    0→1→2→3 of total weight 3 — Bellman-Ford must take the chain once
    iters allows it, and report the edge cost before that."""
    from mxsparkg.graphquery import sssp_relax

    e = spark.createDataFrame(
        [(0, 3, 9), (0, 1, 1), (1, 2, 1), (2, 3, 1)], ["src", "dst", "w"]
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    one = {r["node"]: r["dist"] for r in sssp_relax(e, seeds, iters=1).collect()}
    three = {r["node"]: r["dist"] for r in sssp_relax(e, seeds, iters=3).collect()}
    assert one[3] == 9
    assert three[3] == 3


def test_edge_pmi_exact_small_case(spark):
    """Hand-checked incidence: 4 groups; x=1,y=2 always co-occur (n_xy=2,
    d=2 each), hub 9 appears everywhere. pmi_bits = bits(n_xy*N) -
    bits(dx*dy): informative pair (1,2): bits(2*4)-bits(2*2) = 4-3 = 1;
    hub pairs (1,9): bits(2*4)-bits(2*4) = 0 — PMI strictly ranks the
    exclusive pair above the hub pairs even though raw support ties."""
    from mxsparkg.graphquery import edge_pmi

    inc = [(g, 9) for g in range(4)] + [(0, 1), (0, 2), (1, 1), (1, 2)]
    df = spark.createDataFrame(inc, ["g", "e"])
    got = {(r.x, r.y): (r.n_xy, r.pmi_bits) for r in edge_pmi(df).collect()}
    assert got[(1, 2)] == (2, 1)
    assert got[(1, 9)] == (2, 0)
    assert got[(2, 9)] == (2, 0)


def _tarjan(pairs):
    """Sequential Tarjan reference: node → scc_id (min member)."""
    from collections import defaultdict

    g = defaultdict(list)
    nodes = set()
    for a, b in pairs:
        g[a].append(b)
        nodes.add(a)
        nodes.add(b)
    index, low, on, st = {}, {}, set(), []
    out, counter = {}, [0]

    def strong(v):
        stack = [(v, iter(g[v]))]
        index[v] = low[v] = counter[0]
        counter[0] += 1
        st.append(v)
        on.add(v)
        while stack:
            node, it = stack[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    st.append(w)
                    on.add(w)
                    stack.append((w, iter(g[w])))
                    advanced = True
                    break
                elif w in on:
                    low[node] = min(low[node], index[w])
            if advanced:
                continue
            stack.pop()
            if stack:
                parent = stack[-1][0]
                low[parent] = min(low[parent], low[node])
            if low[node] == index[node]:
                comp = []
                while True:
                    w = st.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                cid = min(comp)
                for w in comp:
                    out[w] = cid

    for v in sorted(nodes):
        if v not in index:
            strong(v)
    return out


def test_scc_matches_tarjan_on_crafted_digraph(spark):
    """scc_bounded == sequential Tarjan on a graph exercising every case:
    a 4-cycle, a 2-cycle feeding a chain, a DAG tail, an isolated-ish
    self-reaching pair, and cross-SCC edges that must NOT merge."""
    from mxsparkg.graphquery import scc_bounded

    pairs = [
        (0, 1), (1, 2), (2, 3), (3, 0),      # 4-cycle SCC {0,1,2,3}
        (3, 4), (4, 5),                      # DAG tail: 4, 5 singletons
        (10, 11), (11, 10),                  # 2-cycle SCC {10,11}
        (11, 4),                             # cross edge (no merge back)
        (20, 21), (21, 22),                  # pure chain: all singletons
        (5, 10),                             # chain into the 2-cycle
    ]
    got = {
        r.node: (r.scc_id, r.scc_size)
        for r in scc_bounded(_edges(spark, pairs), rounds=4).collect()
    }
    ref = _tarjan(pairs)
    sizes = {}
    for v, c in ref.items():
        sizes[c] = sizes.get(c, 0) + 1
    assert got == {v: (c, sizes[c]) for v, c in ref.items()}


def test_scc_gate_digraph_is_converged_and_partition_invariant(spark):
    """One extra doubling round must be a no-op on the gate digraph at the
    test sf (the provable-15-hop-diameter claim, machine-checked), and the
    result must be identical under repartitioning."""
    from mxsparkg.graphquery import SCC_ROUNDS, _scc_edges, scc_bounded

    e = _scc_edges(spark, "/root/testdata/sf0.001")
    base = {
        r.node: (r.scc_id, r.scc_size)
        for r in scc_bounded(e, rounds=SCC_ROUNDS).collect()
    }
    extra = {
        r.node: (r.scc_id, r.scc_size)
        for r in scc_bounded(e, rounds=SCC_ROUNDS + 1).collect()
    }
    rep = {
        r.node: (r.scc_id, r.scc_size)
        for r in scc_bounded(e.repartition(13), rounds=SCC_ROUNDS).collect()
    }
    assert base == extra == rep
    assert max(s for _, s in base.values()) >= 2  # real multi-node SCCs


def test_modularity_exact_on_two_triangles_bridge(spark):
    """The textbook case: two triangles joined by one bridge edge, each
    triangle its own community. m=7; per triangle e_c=3 and d_c=7, so
    q_num_4m2 = 4*7*3 - 49 = 35 each, Q = 70/196 = 0.357... — checked in
    exact integer units, plus the bridge must appear in NO community's
    intra count."""
    from mxsparkg.graphquery import modularity_stats

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        ["u", "v"],
    )
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20)],
        ["src", "label"],
    )
    rows = {
        r.label: r
        for r in modularity_stats(edges, labels).collect()
    }
    assert set(rows) == {10, 20}
    for lbl in (10, 20):
        r = rows[lbl]
        assert (r.n_members, r.degree_sum, r.intra_edges, r.m_edges) == (
            3, 7, 3, 7)
        assert r.q_num_4m2 == 4 * 7 * 3 - 7 * 7 == 35
        assert r.q_total_4m2 == 70  # Q = 70 / (4*49) ≈ 0.357
    # ... and a WORSE partition scores lower: everything in one community
    one = spark.createDataFrame(
        [(i, 1) for i in range(1, 7)], ["src", "label"]
    )
    total_one = modularity_stats(edges, one).collect()[0].q_total_4m2
    assert total_one == 4 * 7 * 7 - 14 * 14  # = 0: all-in-one is Q=0
    assert total_one < 70


def test_modularity_gate_key_partition_invariant(spark):
    """graph_modularity's exact integer output must be bit-identical
    under input repartitioning — the determinism claim the integer
    formulation exists for."""
    from mxsparkg.graphquery import (
        MINLABEL_ITERS, MINLABEL_ORDER_MOD, _copurchase_edges, _symmetrize,
        minlabel_propagate, modularity_stats)

    sf = "/root/testdata/sf0.001"
    und = _copurchase_edges(spark, sf, order_mod=MINLABEL_ORDER_MOD)
    lab = minlabel_propagate(_symmetrize(und, "u", "v"),
                             iters=MINLABEL_ITERS)
    a = [tuple(r) for r in modularity_stats(und, lab).collect()]
    b = [
        tuple(r)
        for r in modularity_stats(
            und.repartition(13), lab.repartition(7)
        ).collect()
    ]
    assert a == b and len(a) > 0


def test_linkpred_square_graph_hand_values(spark):
    """Square 1-2-3-4 (no diagonals): the only distance-2 non-edges are
    the diagonals (1,3) and (2,4), each with BOTH opposite corners as
    common neighbors (cn=2) and Jaccard 2/(2+2-2) = 1 exactly."""
    from mxsparkg.graphquery import linkpred_common_neighbors

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4), (3, 4)], ["u", "v"]
    )
    rows = {
        (r.u, r.v): r
        for r in linkpred_common_neighbors(edges, wedge_cap=None).collect()
    }
    assert set(rows) == {(1, 3), (2, 4)}
    for p, r in rows.items():
        assert (r.cn, r.deg_u, r.deg_v, r.jac_ppm) == (2, 2, 2, 1000000)


def test_linkpred_hub_cap_drops_celebrity_wedges(spark):
    """A hub connected to everything manufactures distance-2 candidates
    through itself; with the cap at its degree-1 those wedges vanish and
    only the genuine square diagonals remain (scored on true degrees)."""
    from mxsparkg.graphquery import linkpred_common_neighbors

    sq = [(1, 2), (2, 3), (1, 4), (3, 4)]
    hub = [(i, 9) for i in (1, 2, 3, 4)] + [(5, 9), (6, 9)]
    edges = spark.createDataFrame(sq + hub, ["u", "v"])
    uncapped = {
        (r.u, r.v)
        for r in linkpred_common_neighbors(edges, wedge_cap=None).collect()
    }
    # hub wedges create e.g. (1, 5) via center 9
    assert (1, 5) in uncapped
    capped = {
        (r.u, r.v): r
        for r in linkpred_common_neighbors(edges, wedge_cap=5).collect()
    }
    assert set(capped) == {(1, 3), (2, 4)}
    for p, r in capped.items():
        # cn counts non-hub common neighbors (2), degrees are TRUE (3)
        assert (r.cn, r.deg_u, r.deg_v) == (2, 3, 3)
        assert r.jac_ppm == 2 * 1000000 // (3 + 3 - 2)


def test_assortativity_star_is_minus_one_and_cycle_degenerate(spark):
    """Hand cases: the star K1,3 is PERFECTLY disassortative (r = -1:
    r_num == -r_den), and a constant-degree cycle has zero variance
    (r_den == 0 — the caller's divide-guard case)."""
    from mxsparkg.graphquery import assortativity_sums

    star = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["u", "v"])
    r = assortativity_sums(star).collect()[0]
    assert (r.m_sym, r.s_x, r.s_xx, r.s_xy) == (6, 12, 30, 18)
    assert r.r_num == -36 and r.r_den == 36  # r = -1 exactly
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["u", "v"])
    c = assortativity_sums(cyc).collect()[0]
    assert c.r_num == 0 and c.r_den == 0


def test_traced_paths_hand_case_and_tie_break(spark):
    """Diamond 1→{2,3}→4 with seed {1}: node 4 is at dist 2 and the
    deterministic witness is the (dist, path)-lexicographic minimum —
    through 2, not 3. Unreached node absent."""
    from mxsparkg.graphquery import shortest_paths_traced

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4), (9, 10)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r.node: (r.dist, r.path)
           for r in shortest_paths_traced(edges, seeds, iters=3).collect()}
    assert got == {
        1: (0, "1"), 2: (1, "1>2"), 3: (1, "1>3"), 4: (2, "1>2>4"),
    }


def test_traced_paths_agree_with_bfs_and_are_valid_walks(spark):
    """On the gate graph: traced dist == bfs_hops dist for EVERY node,
    every path starts at a seed, ends at its node, and every consecutive
    pair is a real (symmetric) edge."""
    from mxsparkg.graphquery import (
        BFS_ROUNDS, BFS_SEED_MOD, MINLABEL_ORDER_MOD, _copurchase_edges,
        _symmetrize, bfs_hops, graph_path)

    sf = "/root/testdata/sf0.001"
    und = _copurchase_edges(spark, sf, order_mod=MINLABEL_ORDER_MOD)
    sym = _symmetrize(und, "u", "v")
    seeds_df = (
        sym.select(F.col("src").alias("node"))
        .filter(F.col("node") % BFS_SEED_MOD == 0)
        .distinct()
    )
    seeds = {r.node for r in seeds_df.collect()}
    eset = {(r.src, r.dst) for r in sym.collect()}
    bfs = {r.node: r.dist
           for r in bfs_hops(sym, seeds_df, iters=BFS_ROUNDS).collect()}
    traced = graph_path(spark, sf).collect()
    assert {r.node: r.dist for r in traced} == bfs and len(bfs) > 0
    for r in traced:
        hops = [int(x) for x in r.path.split(">")]
        assert hops[0] in seeds and hops[-1] == r.node
        assert len(hops) == r.dist + 1
        assert all((a, b) in eset for a, b in zip(hops, hops[1:]))


def test_er_edit_plants_blocking_and_cap(spark):
    """Blocked edit-distance ER: every planted 'zz' variant is recovered
    as a lev-2 pair with its original (same block by construction);
    cross-block pairs are never compared (different head noun); a tiny
    cap kills every block."""
    from mxsparkg.graphquery import (
        ER_EDIT_PLANT_OFFSET, er_edit_candidates, kg_er_edit)

    sf = "/root/testdata/sf0.001"
    got = {(r.a_id, r.b_id): r.lev for r in kg_er_edit(spark, sf).collect()}
    import pyspark.sql.functions as F
    planted_ids = [
        r.id for r in spark.read.parquet(f"{sf}/part.parquet")
        .select(F.col("p_partkey").alias("id"))
        .filter(F.col("id") % 29 == 0).collect()
    ]
    assert planted_ids
    for pid in planted_ids:
        assert got.get((pid, pid + ER_EDIT_PLANT_OFFSET)) == 2, pid
    # hand semantics: same noun + same first char compared, others not
    names = spark.createDataFrame(
        [(1, "blue bolt"), (2, "blca bolt"), (3, "new bolt"),
         (4, "blue ring")],
        ["id", "name"],
    )
    pairs = {(r.a_id, r.b_id): r.lev
             for r in er_edit_candidates(names).collect()}
    assert pairs == {(1, 2): 2}  # 3: first char differs; 4: noun differs
    assert er_edit_candidates(names, block_cap=1).count() == 0


def test_er_edit_cap_invariance_below_cap(spark):
    """House cap property (same as the LSH/df caps): below the cap the
    candidate set is IDENTICAL with the cap on or off."""
    from mxsparkg.graphquery import kg_er_edit

    sf = "/root/testdata/sf0.001"
    import mxsparkg.graphquery as gq

    with_cap = {(r.a_id, r.b_id, r.lev)
                for r in kg_er_edit(spark, sf).collect()}
    orig = gq.ER_EDIT_BLOCK_CAP
    try:
        gq.ER_EDIT_BLOCK_CAP = None  # default arg binds at call site below
        from mxsparkg.graphquery import er_edit_candidates
        import pyspark.sql.functions as F

        p = spark.read.parquet(f"{sf}/part.parquet").select(
            F.col("p_partkey").alias("id"), F.col("p_name").alias("name"))
        plants = p.filter(F.col("id") % 29 == 0).select(
            (F.col("id") + gq.ER_EDIT_PLANT_OFFSET).alias("id"),
            F.concat(F.substring("name", 1, 2), F.lit("zz"),
                     F.expr("substring(name, 3)")).alias("name"))
        no_cap = {(r.a_id, r.b_id, r.lev)
                  for r in er_edit_candidates(
                      p.unionByName(plants), block_cap=10**9).collect()}
    finally:
        gq.ER_EDIT_BLOCK_CAP = orig
    assert with_cap == no_cap and len(with_cap) > 0


# ------------------------------------------------ stress centrality --


def _stress(spark, und_pairs, seeds=None, iters=3):
    """und_pairs: undirected edges; seeds default to all nodes."""
    from pyspark.sql import functions as F

    from mxsparkg.graphquery import stress_centrality

    both = [(a, b) for a, b in und_pairs] + [(b, a) for a, b in und_pairs]
    e = _edges(spark, both)
    nodes = sorted({x for p in und_pairs for x in p})
    sd = spark.createDataFrame(
        [(n,) for n in (seeds if seeds is not None else nodes)],
        "node long",
    )
    return {
        r["node"]: (r["n_src"], r["stress_paths"])
        for r in stress_centrality(e, sd, iters=iters).collect()
    }


def test_stress_path_graph_closed_form(spark):
    # a-b-c: ordered pairs (a,c),(c,a) pass through b -> stress 2;
    # endpoints are never interior
    got = _stress(spark, [(1, 2), (2, 3)])
    assert got == {2: (2, 2)}


def test_stress_triangle_is_empty(spark):
    # every pair is adjacent: no shortest path has an interior node
    assert _stress(spark, [(1, 2), (2, 3), (1, 3)]) == {}


def test_stress_star_center_counts_ordered_leaf_pairs(spark):
    # K1,3: center 0 carries all 3*2 ordered leaf pairs
    got = _stress(spark, [(0, 1), (0, 2), (0, 3)])
    assert got == {0: (3, 6)}


def test_stress_diamond_sigma_split(spark):
    # a(1)-b(2), a-c(3), b-d(4), c-d: two shortest a->d paths, one
    # through each middle node (sigma split, not double-count); plus
    # b,c are interior to (b<->c via a or d? no - b-c distance 2 via a
    # OR d, sigma_bc = 2, both interiors count)
    got = _stress(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
    # interiors: for (1,4)+(4,1): b and c each 1+1; for (2,3)+(3,2):
    # a and d each carry one path each direction -> 2
    assert got == {1: (2, 2), 2: (2, 2), 3: (2, 2), 4: (2, 2)}


def test_stress_seed_sampling_subsets(spark):
    # path a-b-c with seeds={a}: only the (a,c) direction is seen
    got = _stress(spark, [(1, 2), (2, 3)], seeds=[1])
    assert got == {2: (1, 1)}


def test_weighted_pagerank_differs_and_conserves_mass(spark):
    """kg_pagerank_weighted vs kg_pagerank on sf0.001: the lineitem
    multiplicities are non-uniform, so the weighted split must actually
    move mass (different top-25 pr values), while total mass stays
    conserved within the documented floor-rounding loss."""
    from mxsparkg.graphquery import (
        PR_TOTAL_MASS,
        kg_pagerank,
        kg_pagerank_weighted,
    )

    sf = "/root/testdata/sf0.001"
    w = {r["node"]: r["pr"] for r in kg_pagerank_weighted(spark, sf).collect()}
    u = {r["node"]: r["pr"] for r in kg_pagerank(spark, sf).collect()}
    assert w and u
    assert w != u  # weights are live, not a re-label of the uniform run
    # top-25 of a conserved 10^12 distribution: every entry well under
    # total, every entry positive
    assert all(0 < v < PR_TOTAL_MASS for v in w.values())


# --------------------------------------------------------------- MSF -----


def _kruskal(edges):
    """Pure-Python Kruskal under the same (w, u, v) total order the
    distributed Borůvka uses — the certification reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    norm = {}
    for u, v, w in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        norm[(a, b)] = min(norm.get((a, b), w), w)
    out = []
    for (u, v), w in sorted(norm.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v, w))
    return sorted(out)


def _msf(spark, rows):
    from mxsparkg.graphquery import minimum_spanning_forest

    df = spark.createDataFrame(rows, "u string, v string, w long")
    stats = {}
    got = sorted(
        (r.u, r.v, r.w)
        for r in minimum_spanning_forest(df, stats=stats).collect()
    )
    return got, stats


def test_msf_ring_closed_form(spark):
    """Ring of n nodes, weight = index: the forest is every edge except
    the heaviest (the unique cycle's max edge)."""
    n = 12
    rows = [
        (f"n{i:02d}", f"n{(i + 1) % n:02d}", 100 + i) for i in range(n)
    ]
    got, stats = _msf(spark, rows)
    want = _kruskal(rows)
    assert got == want
    assert len(got) == n - 1
    assert all(w != 100 + n - 1 for _, _, w in got)
    assert 1 <= stats["rounds"] <= 5


def test_msf_matches_kruskal_on_random_graphs(spark):
    """Seeded random multigraphs with duplicate edges, parallel weights,
    self-loops, and multiple components: distributed Borůvka == Kruskal
    under the shared total order, at two input partitionings."""
    import random

    rng = random.Random(4242)
    rows = []
    for comp in range(3):
        nodes = [f"c{comp}_n{i}" for i in range(rng.randint(4, 14))]
        for _ in range(30):
            u, v = rng.choice(nodes), rng.choice(nodes)
            rows.append((u, v, rng.randint(1, 9)))
    want = _kruskal(rows)
    from mxsparkg.graphquery import minimum_spanning_forest

    for parts in (2, 16):
        df = spark.createDataFrame(
            rows, "u string, v string, w long").repartition(parts)
        got = sorted(
            (r.u, r.v, r.w)
            for r in minimum_spanning_forest(df).collect()
        )
        assert got == want, parts
    # forest property: |edges| = |nodes| - |components| per component
    nodes = {x for u, v, _ in rows if u != v for x in (u, v)}
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v, _ in want:
        adj[u].add(v)
        adj[v].add(u)
    seen, n_comp = set(), 0
    for s in nodes:
        if s in seen:
            continue
        n_comp += 1
        stack = [s]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            stack.extend(adj[x] - seen)
    assert len(want) == len(nodes) - n_comp


def test_msf_empty_and_self_loop_only(spark):
    got, _ = _msf(spark, [("a", "a", 5)])
    assert got == []
