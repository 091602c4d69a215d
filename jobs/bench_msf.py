"""Minimum-spanning-forest scale exercise (round 5i): distributed
Borůvka (graphquery.minimum_spanning_forest — the product code path) on
a single N-node cycle with DETERMINISTIC pseudo-random md5 weights.

Why this shape: a one-cycle graph has a weight-order-free closed form —
the MSF is every edge EXCEPT the cycle's maximum-weight edge — while the
hash weights scramble the pick order so contraction takes multiple
Borůvka rounds (an index-ordered ring degenerates to one round: every
node's lighter incident edge covers all but the heaviest edge
immediately). Certified:

  |forest| == N-1,  weight == Σw − max(w)   (exact integers)

plus the same numbers at a second input partitioning. Appends a section
to BENCH/GRAPH.md and prints one JSON line.

Usage: python jobs/bench_msf.py [--nodes 500000] [--cores 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "GRAPH.md"))
    args = ap.parse_args()
    n = args.nodes

    from pyspark.sql import functions as F

    from mxsparkg.graphquery import minimum_spanning_forest
    from mxsparkg.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]",
        shuffle_partitions=max(16, args.cores * 2),
        app_name="bench-msf",
    )
    spark.sparkContext.setLogLevel("ERROR")

    def ring(parts: int):
        return spark.range(0, n, 1, parts).select(
            F.format_string("n%08d", F.col("id")).alias("u"),
            F.format_string("n%08d", (F.col("id") + 1) % n).alias("v"),
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("msfw|"),
                                   F.col("id").cast("string"))
                          .cast("binary")), 1, 8),
                16, 10,
            ).cast("long").alias("w"),
        )

    tot = ring(32).agg(
        F.sum("w").alias("s"), F.max("w").alias("m")).collect()[0]
    want_weight = tot.s - tot.m

    results = []
    for parts in (7, max(16, args.cores * 2)):
        t0 = time.time()
        stats: dict = {}
        msf = minimum_spanning_forest(ring(parts), stats=stats)
        row = msf.agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum("w").alias("weight"),
        ).collect()[0]
        wall = round(time.time() - t0, 1)
        assert row.n_edges == n - 1, (row.n_edges, n - 1)
        assert row.weight == want_weight, (row.weight, want_weight)
        results.append({"parts": parts, "wall": wall,
                        "rounds": stats["rounds"]})
        print(f"[msf] parts={parts}: {wall}s, {stats['rounds']} rounds, "
              f"{row.n_edges} edges EXACT", file=sys.stderr)

    out = {"ok": True, "nodes": n, "forest_edges": n - 1,
           "runs": results, "cores": args.cores}
    print(json.dumps(out))

    lines = [
        "",
        f"## Borůvka MSF at scale: {n:,}-node hash-weighted cycle, "
        "closed-form EXACT (round 5i)",
        "",
        f"One cycle ⇒ the forest is every edge except the max-weight one "
        f"regardless of weight order: |forest| = {n - 1:,} and "
        "weight = Σw − max(w), asserted exactly at two input "
        "partitionings. md5 weights scramble the pick order so "
        "contraction is genuinely multi-round "
        f"({results[0]['rounds']} rounds), exercising the per-round "
        "min-struct pick + component contraction through "
        "connected_components.",
        "",
        "| input partitions | wall | rounds |",
        "|---|---|---|",
    ] + [
        f"| {r['parts']} | {r['wall']}s | {r['rounds']} |"
        for r in results
    ] + [
        f"\nRegenerate: `python jobs/bench_msf.py --nodes {n} "
        f"--cores {args.cores}`",
    ]
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
