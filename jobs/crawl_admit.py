"""Crawl admission — the fetch-loop front door as a spark-submit
surface (the north-rule deployment shape, like jobs/pipeline.py):

  spark-submit --master local[8] --py-files /tmp/mxsparkg.zip \\
      jobs/crawl_admit.py --frontier <parquet with url[,priority]> \\
      --robots <parquet host,prefix,allow> \\
      [--delays <parquet host,delay_ms>] [--delay-ms 1000] \\
      [--priority-col priority] [--out admitted_dir]

Chains the certified admission layer over production tables: host/path
extraction (JVM parse_url — no Python), RFC 9309 longest-match
allow/deny against the robots rules (broadcast; `crawl_robots` gate-key
semantics), then per-host politeness scheduling (slot × crawl-delay;
`crawl_schedule` semantics) for the admitted rows. Emits ONE JSON line
with admission counts, per-host queue stats, and the wall; --out writes
the scheduled frontier as parquet for the fetcher.

Scale shape: one broadcast join + one map-side-combinable struct-max
groupBy for admission; one host-partitioned window for scheduling
(bounded per host by the upstream tier cut — crawl_revisit). The
frontier is never collected; stats come from one aggregate pass.
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
    ap.add_argument("--frontier", required=True,
                    help="parquet with a url column (extra cols ride)")
    ap.add_argument("--robots", required=True,
                    help="parquet with host, prefix, allow (1=allow)")
    ap.add_argument("--delays", default=None,
                    help="optional parquet with host, delay_ms")
    ap.add_argument("--delay-ms", type=int, default=1000,
                    help="default crawl delay when --delays misses")
    ap.add_argument("--priority-col", default=None,
                    help="frontier column to order fetches by (desc)")
    ap.add_argument("--out", default=None,
                    help="write the admitted, scheduled frontier here")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mxsparkg.session import get_spark
    from mxsparkg.weblinks import politeness_schedule, robots_admit

    spark = get_spark(
        master=args.master or "local[8]",
        shuffle_partitions=32,
        app_name="mxsparkg-crawl-admit",
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    frontier = spark.read.parquet(args.frontier)
    # JVM-side URL split; RFC 9309 matches on path-with-query
    q = F.parse_url("url", F.lit("QUERY"))
    frontier = frontier.withColumn(
        "host", F.parse_url("url", F.lit("HOST"))
    ).withColumn(
        "path",
        F.concat(
            F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit("/")),
            F.when(q.isNotNull(), F.concat(F.lit("?"), q))
            .otherwise(F.lit("")),
        ),
    ).filter(F.col("host").isNotNull())
    rules = spark.read.parquet(args.robots)
    admitted = robots_admit(frontier, rules)
    delays = spark.read.parquet(args.delays) if args.delays else None
    sched = politeness_schedule(
        admitted.filter(F.col("allowed") == 1),
        delays=delays,
        default_delay_ms=args.delay_ms,
        priority_col=args.priority_col,
    )
    if args.out:
        sched.write.mode("overwrite").parquet(args.out)
        sched = spark.read.parquet(args.out)  # stats from what was written
    stats = sched.groupBy("host").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("fetch_at_ms").alias("span_ms"),
    ).agg(
        F.count(F.lit(1)).alias("n_hosts"),
        F.sum("n").alias("n_admitted"),
        F.max("n").alias("max_host_queue"),
        F.max("span_ms").alias("max_span_ms"),
    ).collect()[0]
    n_frontier = frontier.count()
    denied = admitted.filter(F.col("allowed") == 0).count()
    print(json.dumps({
        "n_frontier": n_frontier,
        "n_admitted": int(stats["n_admitted"] or 0),
        "n_denied": denied,
        "n_hosts": int(stats["n_hosts"] or 0),
        "max_host_queue": int(stats["max_host_queue"] or 0),
        "max_span_ms": int(stats["max_span_ms"] or 0),
        "wall_sec": round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
