"""Modularity scale exercise (SURVEY.md §2.10 G12): run modularity_stats
on a MILLION-node ring-of-cliques — the classic modularity test graph —
generated DISTRIBUTED (spark.range; the driver never holds the graph),
with the TRUE community assignment, and verify the exact closed form:

  c = n/4 cliques of 4 nodes (nodes 4i..4i+3, all 6 intra edges), ring
  bridges (4i+1) -> 4(i+1) mod n. So m = 6c + c = 7c; per community
  e_c = 6, d_c = 3+3+4+4 = 14 (two bridge endpoints), hence
  q_num_4m2 = 24m - 196 for EVERY community and
  q_total_4m2 = c * (24m - 196) exactly.

A wrong intra count, degree sum, m, or a single lost community anywhere
in the distributed plan changes the total. Walls at two parallelism
levels evidence the all-hash-join shape; the certified claim is
EXACTNESS at scale (the integer formulation is a pure function of the
graph at any partitioning).

Usage: python jobs/bench_modularity.py [--nodes 1000000] [--cores 8,32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _graph(spark, n: int):
    from pyspark.sql import functions as F

    v = spark.range(n).select(F.col("id").alias("v"))
    # intra-clique: v -> w for every w > v in v's block (3/2/1 edges for
    # v%4 = 0/1/2 — exactly 6 per block). v%4 == 3 is filtered BEFORE the
    # sequence: sequence(v+1, v) would DESCEND ([v+1, v]) and leak a
    # spurious cross-block edge (the same ANSI descending-sequence trap
    # as _bpe_pair_counts)
    intra = (
        v.filter(F.col("v") % 4 != 3)
        .select(
            "v",
            F.explode(
                F.expr("sequence(v + 1, (v div 4) * 4 + 3)")
            ).alias("w"),
        )
    )
    bridges = v.filter(F.col("v") % 4 == 1).select(
        "v", ((F.col("v") + 3) % n).alias("w")  # 4i+1 -> 4(i+1) mod n
    )
    edges = intra.unionByName(bridges).select(
        F.least("v", "w").alias("u"), F.greatest("v", "w").alias("v")
    ).distinct()
    labels = spark.range(n).select(
        F.col("id").alias("src"), (F.col("id") / 4).cast("long").alias("label")
    )
    return edges, labels


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "GRAPH.md"))
    args = ap.parse_args()
    n = args.nodes
    assert n % 4 == 0
    c = n // 4
    m = 7 * c
    want_per = 24 * m - 196
    want_total = c * want_per

    from mxsparkg.session import get_spark

    results = []
    for cores in [int(x) for x in args.cores.split(",")]:
        spark = get_spark(
            master=f"local[{cores}]",
            shuffle_partitions=max(16, cores * 2),
            app_name=f"bench-modularity-{cores}",
        )
        spark.sparkContext.setLogLevel("ERROR")
        edges, labels = _graph(spark, n)
        from mxsparkg.graphquery import assortativity_sums, modularity_stats

        t0 = time.time()
        rows = modularity_stats(edges, labels, top_k=20).collect()
        wall = time.time() - t0
        # second exact certificate on the same graph: the ring of
        # 4-cliques has closed-form degree assortativity r = -1/6
        # (per clique degrees 4,4,3,3: m_sym=14c, s_x=50c, s_xx=182c,
        # s_xy=178c -> r_num=-8c^2, r_den=48c^2)
        a = assortativity_sums(edges).collect()[0]
        assert (a.m_sym, a.s_x, a.s_xx, a.s_xy) == (
            14 * c, 50 * c, 182 * c, 178 * c), a
        assert (a.r_num, a.r_den) == (-8 * c * c, 48 * c * c)
        assert rows[0].m_edges == m, (rows[0].m_edges, m)
        for r in rows:
            assert (r.n_members, r.degree_sum, r.intra_edges) == (4, 14, 6), r
            assert r.q_num_4m2 == want_per, (r.q_num_4m2, want_per)
        assert rows[0].q_total_4m2 == want_total, (
            rows[0].q_total_4m2, want_total)
        results.append((cores, wall))
        print(f"[modularity] local[{cores}]: {wall:.1f}s "
              f"q_total={rows[0].q_total_4m2} EXACT "
              f"(Q = {want_total / (4 * m * m):.6f})")
        spark.stop()

    q = want_total / (4 * m * m)
    lines = [
        "",
        f"## graph_modularity at scale: {n:,}-node ring of 4-cliques, "
        "closed form EXACT",
        "",
        f"{c:,} cliques bridged in a ring (m = {m:,}): every community's "
        f"q_num_4m2 must equal 24m − 196 = {want_per:,} and the global "
        f"total must equal c·(24m − 196) = {want_total:,} "
        f"(Q = {q:.6f}) — asserted in-run at every parallelism. A wrong "
        "intra count, degree, m, or one lost community anywhere in the "
        "distributed plan breaks the equality; the integer formulation "
        "makes the score a pure function of the graph, independent of "
        "partitioning.",
        "",
        "| cores | wall |",
        "|---|---|",
    ] + [f"| local[{cc}] | {w:.1f}s |" for cc, w in results]
    lines += [
        "",
        "Cost shape: one degree groupBy + the edge⋈label⋈label hash join "
        "+ two map-side-combined aggregates — no windows, no sorts, two "
        "driver scalars. Regenerate: `python jobs/bench_modularity.py`.",
    ]
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"[modularity] appended to {args.out}")


if __name__ == "__main__":
    main()
