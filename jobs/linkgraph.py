"""spark-submit surface for the hyperlink-graph side of the crawl
(mxsparkg/weblinks.py):

  spark-submit --py-files mxsparkg.zip jobs/linkgraph.py \
      --pages <pages parquet | WARC dir> [--pages-format warc] \
      --out <dir> [--op links|hosts|rank] [--iters 10]

ops:
  links   (src, dst, anchor) resolved hyperlink edges — one Arrow pass,
          html never shuffles
  hosts   weighted inter-host graph (src_host, dst_host, n_links)
  rank    integer-mass PageRank over the host graph (authority table)
  aliases anchor-text alias candidates per destination (distinct-source
          support, min 2, top 5 per dst) — feeds the pipeline --aliases
  frontier next fetch list: new URLs minus --crawled, per-host cap
          (--cap), ordered by in-link support — closes the crawl loop

Prints one JSON line {op, rows, wall_sec, out}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--pages-format", default="parquet",
                    choices=["parquet", "warc"])
    ap.add_argument("--op", default="hosts",
                    choices=["links", "hosts", "rank", "aliases",
                             "frontier"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--crawled", default=None,
                    help="parquet with a url column: already-fetched set "
                         "for --op frontier (default: this crawl's own "
                         "pages — discover-only-new mode)")
    ap.add_argument("--cap", type=int, default=100,
                    help="per-host frontier cap (--op frontier)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from mxsparkg.session import get_spark
    from mxsparkg.weblinks import extract_links, host_graph

    spark = get_spark(master=args.master, app_name=f"linkgraph-{args.op}")
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()

    if args.pages_format == "warc":
        from mxsparkg.warc import read_warc

        pages = read_warc(spark, args.pages)
    else:
        pages = spark.read.parquet(args.pages)
    links = extract_links(pages)
    if args.op == "links":
        out_df = links
    elif args.op == "hosts":
        out_df = host_graph(links)
    elif args.op == "aliases":
        from mxsparkg.weblinks import anchor_aliases

        out_df = anchor_aliases(links)
    elif args.op == "frontier":
        from mxsparkg.weblinks import next_frontier

        crawled = (
            spark.read.parquet(args.crawled)
            if args.crawled
            else pages.select("url")
        )
        out_df = next_frontier(links, crawled, per_host_cap=args.cap)
    else:
        from pyspark.sql import functions as F

        from mxsparkg.graphquery import pagerank_exact

        hosts = host_graph(links)
        out_df = pagerank_exact(
            hosts.select(
                F.col("src_host").alias("src"),
                F.col("dst_host").alias("dst"),
                F.col("n_links").alias("_w"),
            ),
            iters=args.iters,
            weight_col="_w",
        ).withColumnRenamed("src", "host")
    out_df.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({
        "op": args.op, "rows": n,
        "wall_sec": round(time.time() - t0, 2), "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
