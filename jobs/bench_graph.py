"""Integer-mass PageRank scale exercise (SURVEY.md §2.10 G3): run
pagerank_exact on a multi-million-edge hub-skewed directed graph generated
DISTRIBUTED (spark.range + multiplicative hashing — the driver never holds
the edge list), then verify the three properties that matter at 100 TB:

  1. partition-order invariance: the SAME ranks, bit-for-bit, under a
     different input partitioning — the property float PageRank cannot give
     and the reason the implementation uses integer mass units;
  2. mass conservation: sum(pr) within the analytic floor-division loss
     bound (each round loses < n_nodes + n_edges units);
  3. structure sanity: the planted celebrity hub (10% of all edges point
     at node 0) ranks first.

Graph: src = id % n_nodes (every node has out-edges — no dangling mass),
dst = Knuth-hash(id) % n_nodes, except every 10th edge is redirected to
node 0 (the hub). Deterministic, no data files.

Usage: python jobs/bench_graph.py [--cores 16] [--nodes 1000000]
       [--edges 10000000] [--iters 5] [--out BENCH/GRAPH.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "GRAPH.md"))
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from mxsparkg.graphquery import PR_TOTAL_MASS, pagerank_exact
    from mxsparkg.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]", app_name="bench-graph-pagerank"
    )
    spark.sparkContext.setLogLevel("ERROR")

    n, e = args.nodes, args.edges
    # src mixes a round-robin sweep (guarantees near-full node coverage)
    # with a hashed stream (makes out-degrees irregular, so floor-division
    # rounding is actually exercised — a uniform-outdegree graph divides
    # exactly and the loss bound would be checked vacuously)
    edges = spark.range(e).select(
        F.when(F.col("id") % 3 == 0, (F.col("id") * 2246822519) % n)
        .otherwise(F.col("id") % n)
        .alias("src"),
        F.when(F.col("id") % 10 == 0, F.lit(0))
        .otherwise((F.col("id") * 2654435761) % n)
        .alias("dst"),
    )

    t0 = time.time()
    pr = pagerank_exact(edges, iters=args.iters).persist()
    stats = pr.agg(
        F.sum("pr").alias("mass"),
        F.count(F.lit(1)).alias("n_nodes"),
        F.max_by("src", "pr").alias("top_node"),
        F.max("pr").alias("top_pr"),
    ).collect()[0]
    wall = time.time() - t0

    # partition-order invariance, checked EXACTLY: same ranks from a
    # differently-partitioned input (anti-join both ways must be empty)
    pr2 = pagerank_exact(edges.repartition(97, "dst"), iters=args.iters)
    diff = (
        pr.join(pr2, ["src", "pr"], "full_outer")
        .filter(F.col("src").isNull() | F.col("pr").isNull())
        .count()
    )
    mism = pr.join(pr2.withColumnRenamed("pr", "pr2"), "src").filter(
        F.col("pr") != F.col("pr2")
    ).count()

    loss = PR_TOTAL_MASS - stats.mass
    loss_bound = args.iters * (stats.n_nodes + e) + stats.n_nodes
    lines = [
        "# BENCH/GRAPH — integer-mass PageRank at 10M edges",
        "",
        f"Hub-skewed directed graph, generated distributed: {n:,} nodes, "
        f"{e:,} edges, every 10th edge redirected to node 0 "
        f"(~{e // 10:,} in-edges on the hub).",
        "",
        "| metric | value |",
        "| --- | --- |",
        f"| iterations | {args.iters} |",
        f"| wall (local[{args.cores}], incl. edge gen + persist) | {wall:.2f}s |",
        f"| edges/sec through the iteration joins | "
        f"{int(e * args.iters / wall):,} |",
        f"| total mass kept | {stats.mass:,} of {PR_TOTAL_MASS:,} |",
        f"| floor-div loss | {loss:,} (analytic bound {loss_bound:,}) "
        f"{'OK' if 0 <= loss <= loss_bound else 'VIOLATION'} |",
        f"| top node | {stats.top_node} (planted hub: 0) "
        f"{'OK' if stats.top_node == 0 else 'VIOLATION'} |",
        f"| rank mismatch under repartition(97, dst) | {mism + diff} rows "
        f"{'(EXACT — bit-identical)' if mism + diff == 0 else 'VIOLATION'} |",
        "",
        "The invariance row is the scale claim: integer mass units make the",
        "ranking a pure function of the graph — the same job on local[4] or",
        "1000 executors, any partitioning, produces byte-identical output,",
        "so lineage, resume and cross-run diffing stay exact. Per-iteration",
        "cost is one shuffle-hash join of the edge list against the",
        "(rank, outdeg) node table + one bigint-sum groupBy — both",
        "map-side combinable, hub skew handled by AQE skew-split.",
        "",
        f"Regenerate: `python jobs/bench_graph.py --cores {args.cores}"
        f" --nodes {n} --edges {e} --iters {args.iters}`",
        "",
    ]
    out = "\n".join(lines)
    print(out)
    with open(args.out, "w") as f:
        f.write(out)
    spark.stop()
    if mism + diff != 0 or stats.top_node != 0 or not (
        0 <= loss <= loss_bound
    ):
        sys.exit(1)


if __name__ == "__main__":
    main()
