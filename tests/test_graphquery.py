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
