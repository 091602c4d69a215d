"""Sorted-neighborhood ER scale exercise (round 5f): 1M base names +
50,000 planted near-duplicate variants, closed-form plant recovery.

Names are "name_%07d" (every one unique, lexicographic == numeric
order); every 20th gets a " zz"-appended variant that sorts IMMEDIATELY
after its original — so the closed-form certificate is: all 50,000
(original -> variant) pairs appear at rank_dist exactly 1 with edit
distance exactly 3, under any input partitioning.

Checks:
  1. plant recovery EXACT: 50,000/50,000 pairs at (rank_dist 1, lev 3);
  2. partition invariance: identical full pair set fingerprint at 7 and
     64 input partitions (rank is a total order; the exploded equi-join
     cannot depend on layout);
  3. the n*w candidate bound holds (window join never quadratic even
     though SORT-ADJACENT names are maximally similar here).

Appends a markdown section to BENCH/GRAPH.md.

Usage: python jobs/bench_snm.py [--cores 16] [--n 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLANT_MOD = 20
PLANT_OFFSET = 100_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "GRAPH.md"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mxsparkg.graphquery import er_sorted_neighborhood
    from mxsparkg.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]",
        shuffle_partitions=max(16, args.cores * 2),
        app_name="bench-snm",
    )
    spark.sparkContext.setLogLevel("ERROR")

    def names(parts: int):
        base = spark.range(0, args.n, 1, parts).select(
            F.col("id"),
            F.format_string("name_%07d", F.col("id")).alias("name"),
        )
        plants = base.filter(F.col("id") % PLANT_MOD == 0).select(
            (F.col("id") + PLANT_OFFSET).alias("id"),
            F.concat(F.col("name"), F.lit(" zz")).alias("name"),
        )
        return base.unionByName(plants)

    results = {}
    for parts in (7, 64):
        t0 = time.time()
        pairs = er_sorted_neighborhood(names(parts), window=3, max_lev=3)
        agg = pairs.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                ((F.col("rank_dist") == 1) & (F.col("lev") == 3)
                 & (F.col("b_id") == F.col("a_id") + PLANT_OFFSET))
                .cast("bigint")
            ).alias("n_plant_pairs"),
            F.bit_xor(F.xxhash64("a_id", "b_id", "rank_dist", "lev"))
            .alias("fp"),
        ).collect()[0]
        results[parts] = (
            agg["n_pairs"], agg["n_plant_pairs"], agg["fp"],
            time.time() - t0,
        )

    (np7, plant7, fp7, wall7) = results[7]
    (np64, plant64, fp64, wall64) = results[64]
    n_records = args.n + args.n // PLANT_MOD
    bound = 3 * n_records
    ok = (
        plant7 == args.n // PLANT_MOD
        and (np7, plant7, fp7) == (np64, plant64, fp64)
        and np7 <= bound
    )
    lines = [
        "",
        f"## Sorted-neighborhood ER scale exercise ({n_records:,} names, "
        f"local[{args.cores}])",
        "",
        f"- plant recovery EXACT: {plant7:,}/{args.n // PLANT_MOD:,} "
        "(original, ' zz'-variant) pairs at rank_dist 1 / lev 3",
        f"- partition-invariant: {(np7, plant7, fp7) == (np64, plant64, fp64)} "
        "(full pair-set xxhash fingerprint identical at 7 and 64 input "
        "partitions)",
        f"- candidate pairs {np7:,} <= n*w bound {bound:,} — never "
        "quadratic even with maximally-similar sort neighbors",
        f"- wall: {wall7:.1f}s (7 parts) / {wall64:.1f}s (64 parts); the "
        "rank is one global window sort at this scale — the 10^12-name "
        "path swaps in the range-partitioned two-phase prefix-sum rank "
        "(jobs/kg_tools.py), same ranks, no single-partition window",
        "",
    ]
    with open(args.out, "a") as f:
        f.write("\n".join(lines))
    print(json.dumps({"ok": ok, "n_pairs": np7, "plant_pairs": plant7,
           "wall_7p": round(wall7, 1), "wall_64p": round(wall64, 1)}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
