"""Deterministic random-walk corpus scale exercise (SURVEY.md §2.10 G16):
run graphquery.random_walks over a million-node ring generated DISTRIBUTED
(spark.range — the driver never holds the graph), then verify the three
properties that matter at 100 TB:

  1. partition-order invariance: the SAME walk corpus, row-for-row, under
     a different input partitioning — the md5-driven hop choice is a pure
     function of (graph, seed), which is the op's whole reason to exist
     (F.rand walks are neither reproducible nor partitioning-stable);
  2. exactness: a sample of the distributed walks recomputed hop-by-hop in
     plain Python from the same md5 arithmetic matches EXACTLY (not just
     statistically) — every hop on the ring is a +-1 choice, so one wrong
     code path anywhere shows up as a diverged path;
  3. coverage/shape: every seed emits exactly one complete walk of
     steps+1 nodes, all edges real.

Graph: ring of n nodes (i <-> (i+1) mod n): constant degree 2, so the
frontier⋈adjacency join is skew-free by construction and the measured wall
is pure round machinery — the honest number for an op whose per-round cost
is frontier-sized, not edge-sized (contrast bench_graph's hub-skewed
PageRank where the edge list dominates).

Usage: python jobs/bench_walk.py [--cores 16] [--nodes 1000000]
       [--seed-mod 10] [--steps 8] [--out BENCH/GRAPH.md]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _py_walk(seed: int, n: int, steps: int) -> str:
    """Driver-side reference: the same md5 arithmetic as random_walks,
    on the ring whose sorted neighbor list of i is [min, max] of
    {(i-1) % n, (i+1) % n} — matching sort_array(collect_set(dst))."""
    cur, path = seed, str(seed)
    for t in range(1, steps + 1):
        nbrs = sorted({(cur - 1) % n, (cur + 1) % n})
        h = hashlib.md5(f"{seed}|{t}|{cur}".encode()).hexdigest()
        cur = nbrs[int(h[:6], 16) % len(nbrs)]
        path += f">{cur}"
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--seed-mod", type=int, default=10)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--sample", type=int, default=1_000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "GRAPH.md"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mxsparkg.graphquery import random_walks
    from mxsparkg.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]",
        shuffle_partitions=2 * args.cores,
        app_name="bench-walk",
    )
    spark.sparkContext.setLogLevel("WARN")
    n = args.nodes

    # ring edges, both directions, generated distributed
    ids = spark.range(n)
    edges = ids.select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    ).unionByName(
        ids.select(
            ((F.col("id") + 1) % n).alias("src"), F.col("id").alias("dst")
        )
    )
    seeds = ids.filter(F.col("id") % args.seed_mod == 0).select(
        F.col("id").alias("node")
    )
    n_seeds = n // args.seed_mod + (1 if n % args.seed_mod else 0)

    t0 = time.time()
    walks = random_walks(edges, seeds, steps=args.steps)
    rows = walks.collect()
    wall = time.time() - t0
    assert len(rows) == n_seeds, (len(rows), n_seeds)

    # 1. partition-order invariance: shuffle the edge list into a hostile
    # layout and re-run — the corpus must be identical as a SET
    walks2 = random_walks(
        edges.repartition(7, "dst"), seeds.repartition(3), steps=args.steps
    )
    s1 = {(r["walk_id"], r["path"]) for r in rows}
    s2 = {(r["walk_id"], r["path"]) for r in walks2.collect()}
    assert s1 == s2, "walk corpus changed under repartitioning"

    # 2. exact hop-by-hop agreement with the driver-side reference on an
    # evenly spaced sample of walks
    stride = max(1, len(rows) // args.sample)
    checked = 0
    for r in sorted(rows, key=lambda r: r["walk_id"])[::stride]:
        assert r["path"] == _py_walk(r["walk_id"], n, args.steps), r
        checked += 1

    # 3. shape: complete walks over real ring edges
    for r in rows[:: stride * 10]:
        nodes = [int(x) for x in r["path"].split(">")]
        assert len(nodes) == args.steps + 1
        for a, b in zip(nodes, nodes[1:]):
            assert (b - a) % n in (1, n - 1), f"non-ring hop {a}->{b}"

    line = (
        f"- walk corpus: {n:,}-node ring, {n_seeds:,} walks x "
        f"{args.steps} hops on local[{args.cores}]: wall {wall:.1f}s, "
        f"partition-invariant EXACT, {checked} walks recomputed "
        f"hop-by-hop in Python EXACT"
    )
    print(line)
    if args.out and os.path.exists(args.out):
        with open(args.out, "a") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
