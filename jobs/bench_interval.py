"""Interval-overlap join scale exercise (SURVEY.md §2.3 J11): run
contract.interval_overlap_join over two MILLION-row interval tables
generated distributed (spark.range — the driver never holds a row), with
the pair set and overlap mass CLOSED-FORM by construction, plus a planted
pathological interval that covers the whole timeline — the hot-bucket
skew case the bucketized plan must survive (a giant interval explodes to
every bucket; at 10^12 rows you split such intervals at ingest, but the
plan itself must stay correct and non-quadratic when one slips through).

Geometry (disjoint 10-day lattice):
  A_i = [10i, 10i+5]             for i in 0..N-1
  B_j = [10j+3, 10j+7]           for j in 0..N-1   (overlaps A_j ONLY,
                                  3 shared days; B_j.hi < A_{j+1}.lo)
  B_giant = [0, 10N+9]           (overlaps EVERY A_i, 6 shared days each)

Closed forms: pairs = 2N, overlap-day mass = 3N + 6N = 9N. Each lattice
interval spans <= 2 buckets (len 5/4 vs bucket 32), the giant spans all
~10N/32 of them — the explode is the documented cost of interval length,
never of table size.

Checks: (1) exact pair count and mass vs closed form; (2) partition-order
invariance under a hostile repartitioning; (3) wall clock on local[N].

Usage: python jobs/bench_interval.py [--cores 16] [--rows 1000000]
       [--out BENCH/JOINS.md]
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
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "JOINS.md"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mxsparkg.contract import interval_overlap_join
    from mxsparkg.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]",
        shuffle_partitions=2 * args.cores,
        app_name="bench-interval",
    )
    spark.sparkContext.setLogLevel("WARN")
    n = args.rows

    a = spark.range(n).select(
        F.col("id").alias("aid"),
        (F.col("id") * 10).alias("a_lo"),
        (F.col("id") * 10 + 5).alias("a_hi"),
    )
    lattice_b = spark.range(n).select(
        F.col("id").alias("bid"),
        (F.col("id") * 10 + 3).alias("b_lo"),
        (F.col("id") * 10 + 7).alias("b_hi"),
    )
    giant = spark.range(1).select(
        F.lit(-1).cast("long").alias("bid"),
        F.lit(0).cast("long").alias("b_lo"),
        F.lit(10 * n + 9).cast("long").alias("b_hi"),
    )
    b = lattice_b.unionByName(giant)

    def run(a_df, b_df):
        pairs = (
            interval_overlap_join(a_df, b_df)
            .select(
                "aid", "bid",
                (F.least("a_hi", "b_hi") - F.greatest("a_lo", "b_lo") + 1)
                .alias("ov"),
            )
            .distinct()
        )
        row = pairs.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("ov").alias("mass"),
        ).collect()[0]
        return row["n_pairs"], row["mass"]

    t0 = time.time()
    n_pairs, mass = run(a, b)
    wall = time.time() - t0

    assert n_pairs == 2 * n, (n_pairs, 2 * n)
    assert mass == 9 * n, (mass, 9 * n)

    # partition-order invariance under a hostile layout
    n2, m2 = run(a.repartition(7, "a_hi"), b.repartition(3))
    assert (n2, m2) == (n_pairs, mass)

    line = (
        f"- interval join: {n:,} x {n:,}+1 intervals (one planted "
        f"whole-timeline giant) on local[{args.cores}]: wall {wall:.1f}s, "
        f"pairs == 2N and overlap mass == 9N closed-form EXACT, "
        f"partition-invariant"
    )
    print(line)
    if args.out:
        header = (
            "# BENCH/JOINS — relational-join scale exercises\n\n"
            "Closed-form million-row exercises for the join-strategy "
            "layer (the graph ops' bench_cc/bench_walk discipline).\n\n"
        )
        if not os.path.exists(args.out):
            with open(args.out, "w") as f:
                f.write(header)
        with open(args.out, "a") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
