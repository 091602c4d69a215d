"""Geo/spatial family as a spark-submit surface (the north-rule
deployment shape, like jobs/crawl_admit.py):

  spark-submit --master local[8] --py-files /tmp/mxsparkg.zip \\
      jobs/geo_tools.py --op pairs --points <parquet pid,lat_e6,lon_e6> \\
      [--cell-e6 300000] [--r-e6 300000] [--k 3] \\
      [--regions <parquet region_id,x0,y0,x1,y1>] [--out DIR]

ops (all over an integer-microdegree points table):
  density   occupied-cell histogram — the planning table (GEO1); also
            prints the candidate-row forecast for this cell size
            (geo.candidate_count), the number a planner checks BEFORE
            launching the join
  pairs     distance self-join within --r-e6 via the 3x3 grid probe
            (GEO2; requires r <= cell, asserted)
  knn       --k nearest neighbors per point among the 3x3 neighborhood
            (GEO3 semantics at the chosen cell size)
  bbox      point-in-region containment against --regions boxes (GEO4;
            cover explode bounded by each box's own cell span)

Emits ONE JSON line with counts + wall; --out writes the result parquet.
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
    ap.add_argument("--op", required=True,
                    choices=["density", "pairs", "knn", "bbox"])
    ap.add_argument("--points", required=True,
                    help="parquet with pid, lat_e6, lon_e6")
    ap.add_argument("--cell-e6", type=int, default=300_000)
    ap.add_argument("--r-e6", type=int, default=300_000)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--regions", default=None,
                    help="parquet with region_id, x0, y0, x1, y1 "
                         "(required for --op bbox)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if args.op == "bbox" and not args.regions:
        ap.error("--op bbox requires --regions")

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mxsparkg.geo import (
        _d2,
        _probe_side,
        _with_cells,
        candidate_count,
        distance_pairs,
    )
    from mxsparkg.session import get_spark

    spark = get_spark(
        master=args.master or "local[8]",
        shuffle_partitions=32,
        app_name=f"geo-{args.op}",
    )
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()
    pts = spark.read.parquet(args.points).select(
        "pid", "lat_e6", "lon_e6")
    stats: dict = {"op": args.op, "cell_e6": args.cell_e6}

    if args.op == "density":
        out_df = (
            _with_cells(pts, args.cell_e6)
            .groupBy("cell_x", "cell_y")
            .agg(
                F.count(F.lit(1)).alias("n_points"),
                F.min("pid").alias("min_pid"),
            )
        )
        stats["candidate_rows_forecast"] = candidate_count(
            pts, args.cell_e6)
    elif args.op == "pairs":
        out_df = distance_pairs(pts, args.cell_e6, args.r_e6)
        stats["r_e6"] = args.r_e6
    elif args.op == "knn":
        cells = _with_cells(pts, args.cell_e6)
        cand = (
            _probe_side(cells).join(
                cells.select(
                    F.col("pid").alias("pid_b"),
                    F.col("lat_e6").alias("lat_b"),
                    F.col("lon_e6").alias("lon_b"),
                    "cell_x", "cell_y",
                ),
                ["cell_x", "cell_y"],
            )
            .filter(F.col("pid_a") != F.col("pid_b"))
            .withColumn("dist2_e6", _d2())
        )
        w = Window.partitionBy("pid_a").orderBy("dist2_e6", "pid_b")
        out_df = (
            cand.withColumn("k", F.row_number().over(w).cast("int"))
            .filter(F.col("k") <= args.k)
            .select("pid_a", "k", F.col("pid_b").alias("nbr"), "dist2_e6")
        )
        stats["k"] = args.k
    else:  # bbox
        boxes = spark.read.parquet(args.regions).select(
            "region_id", "x0", "y0", "x1", "y1")
        # per-region cell cover via sequence(): each row explodes into
        # exactly ITS OWN box's cells (no driver collect, no global-max
        # literal arrays, empty regions table -> empty cover), which is
        # the 'bounded by the box's own span' contract for real
        cover = (
            boxes
            .withColumn(
                "cell_x",
                F.explode(F.expr(
                    f"sequence(x0 div {args.cell_e6}, x1 div {args.cell_e6})"
                )),
            )
            .withColumn(
                "cell_y",
                F.explode(F.expr(
                    f"sequence(y0 div {args.cell_e6}, y1 div {args.cell_e6})"
                )),
            )
            .select("region_id", "x0", "y0", "x1", "y1",
                    "cell_x", "cell_y")
        )
        out_df = (
            _with_cells(pts, args.cell_e6)
            .join(cover, ["cell_x", "cell_y"])
            .filter(
                (F.col("lon_e6") >= F.col("x0"))
                & (F.col("lon_e6") <= F.col("x1"))
                & (F.col("lat_e6") >= F.col("y0"))
                & (F.col("lat_e6") <= F.col("y1"))
            )
            .select("region_id", "pid", "lat_e6", "lon_e6")
        )
        span = boxes.agg(
            F.coalesce(
                F.max(F.greatest(
                    F.expr(f"x1 div {args.cell_e6} - x0 div {args.cell_e6}"),
                    F.expr(f"y1 div {args.cell_e6} - y0 div {args.cell_e6}"),
                )),
                F.lit(0),
            ).alias("m")
        ).collect()[0].m
        stats["max_span_cells"] = int(span)

    if args.out:
        out_df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        n = out_df.count()
    stats["rows"] = n
    stats["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
