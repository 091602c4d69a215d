"""spark-submit surface for KG consumer analytics (graphquery.py) over the
pipeline's materialized output:

  spark-submit --py-files mxsparkg.zip jobs/graph_analytics.py \
      --op salience --edges <out>/edges [--nodes <out>/nodes] \
      --out <dir> [--iters 10] [--top-k 100]

ops:
  salience    support-weighted integer-mass PageRank over the subj/obj
              graph, top-k entities (+ type/surface forms when --nodes)
  triangles   triangle census + global clustering coefficient (ppm)
  components  convergent CC component-size census (canonicalization QA)
  scc         strongly connected components of the DIRECTED subj→obj graph
              (sameAs/redirect cycle discovery; bounded doubling closure
              with a runtime convergence witness — see graphquery.scc_bounded)
  modularity  exact integer modularity of --iters-round min-label
              communities on the undirected subj/obj graph — per-community
              q_num_4m2 plus the global total (see modularity_stats)
  linkpred    top --top-k predicted links: non-edges at distance 2 ranked
              by common non-hub neighbors + exact-ppm Jaccard (the
              structural complement to kg_tools --op predict)
  assortativity  one-row exact degree-correlation moments of the
              undirected subj/obj graph (r = r_num/r_den offline)
  walk        deterministic DeepWalk-style random-walk corpus over the
              symmetrized subj/obj graph (md5-driven hops — reproducible;
              --iters = walk length, --seed-mod = seed sampling rate)
  louvain     min-label init + ONE synchronized Louvain local-move pass
              over the undirected subj/obj graph: writes the full
              (src, label, moved) assignment (--iters = init rounds)
  coarsen     Louvain phase-2 supernode graph of the min-label communities:
              (ca, cb, weight) with self-loop rows carrying intra mass
  ktruss      bounded k-truss peel of the undirected subj/obj graph
              (--top-k = k, --iters = peel rounds): surviving oriented
              edges with their triangle support — the density screen
              that rejects hub-and-spoke noise k-core keeps
  msgpass     one GNN-style integer mean message-passing round over the
              undirected subj/obj graph, features = support-sum per node:
              (node, deg, h1)

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
    ap.add_argument("--op", required=True,
                    choices=["salience", "triangles", "components", "scc",
                             "modularity", "linkpred", "assortativity",
                             "walk", "louvain", "coarsen", "ktruss",
                             "msgpass", "msf"])
    ap.add_argument("--edges", required=True,
                    help="pipeline edges parquet (subj, pred, obj, n_support)")
    ap.add_argument("--nodes", default=None,
                    help="pipeline nodes parquet (canon_id, etype, ...)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top-k", type=int, default=100)
    ap.add_argument("--seed-mod", type=int, default=10,
                    help="walk op: start a walk from ~1/mod of nodes")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mxsparkg import graphquery as gq
    from mxsparkg.session import get_spark

    spark = get_spark(master=args.master, app_name=f"graph-{args.op}")
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()

    edges = spark.read.parquet(args.edges)
    if args.op == "salience":
        nodes = spark.read.parquet(args.nodes) if args.nodes else None
        out_df = gq.kg_salience(
            edges, nodes, iters=args.iters, top_k=args.top_k
        )
    elif args.op == "triangles":
        # orient the subj/obj graph as u < v for the census
        out_df = gq.triangle_stats(
            edges.select(
                F.least("subj", "obj").alias("u"),
                F.greatest("subj", "obj").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
    elif args.op == "scc":
        out_df = gq.scc_bounded(
            edges.select(F.col("subj").alias("src"),
                         F.col("obj").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct(),
            rounds=args.iters,
        )
    elif args.op == "modularity":
        und = (
            edges.select(
                F.least("subj", "obj").alias("u"),
                F.greatest("subj", "obj").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        lab = gq.minlabel_propagate(
            gq._symmetrize(und, "u", "v"), iters=args.iters
        )
        out_df = gq.modularity_stats(und, lab, top_k=args.top_k)
    elif args.op == "linkpred":
        und = (
            edges.select(
                F.least("subj", "obj").alias("u"),
                F.greatest("subj", "obj").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        out_df = gq.linkpred_common_neighbors(und, top_k=args.top_k)
    elif args.op == "walk":
        # DeepWalk-style corpus: --iters hops per walk, one walk per node
        # whose md5 lands in the 1/--seed-mod sample (deterministic; no
        # F.rand) — see graphquery.random_walks
        sym = (
            edges.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
            .unionByName(
                edges.select(F.col("obj").alias("src"),
                             F.col("subj").alias("dst"))
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        seeds = (
            sym.select(F.col("src").alias("node"))
            .distinct()
            .filter(
                F.conv(
                    F.substring(F.md5(F.col("node").cast("binary")), 1, 6),
                    16, 10,
                ).cast("long") % args.seed_mod == 0
            )
        )
        out_df = gq.random_walks(sym, seeds, steps=args.iters)
    elif args.op == "msf":
        # MAXIMUM-support spanning backbone: the consumer of a KG edge
        # skeleton wants the best-corroborated tree, so the MSF cost is
        # w = -n_support (min total cost == max total support); the
        # output restores the positive n_support column
        we = edges.select(
            F.col("subj").alias("u"), F.col("obj").alias("v"),
            (-F.coalesce(F.col("n_support"), F.lit(1)).cast("long"))
            .alias("w"),
        )
        out_df = gq.minimum_spanning_forest(we).select(
            "u", "v", (-F.col("w")).alias("n_support"))
    elif args.op in ("louvain", "coarsen"):
        und = (
            edges.select(
                F.least("subj", "obj").alias("u"),
                F.greatest("subj", "obj").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        sym = gq._symmetrize(und, "u", "v").persist()
        lab = gq.minlabel_propagate(sym, iters=args.iters)
        if args.op == "louvain":
            m_edges = und.count()
            out_df = gq.louvain_move(sym, lab, m_edges)
        else:
            out_df = gq.louvain_aggregate(und, lab)
    elif args.op == "ktruss":
        oriented = (
            edges.select(
                F.least("subj", "obj").alias("u"),
                F.greatest("subj", "obj").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        out_df = gq.ktruss_peel(
            oriented, k=max(3, args.top_k), rounds=args.iters
        )
    elif args.op == "msgpass":
        sym = (
            edges.select(F.col("subj").alias("src"),
                         F.col("obj").alias("dst"))
            .unionByName(
                edges.select(F.col("obj").alias("src"),
                             F.col("subj").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        feats = (
            edges.select(F.col("subj").alias("node"), "n_support")
            .unionByName(
                edges.select(F.col("obj").alias("node"), "n_support"))
            .groupBy("node")
            .agg(F.sum("n_support").cast("long").alias("h0"))
        )
        out_df = gq.message_pass_mean(sym, feats)
    elif args.op == "assortativity":
        und = (
            edges.select(
                F.least("subj", "obj").alias("u"),
                F.greatest("subj", "obj").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        out_df = gq.assortativity_sums(und)
    else:
        out_df = gq.kg_components(edges)
    out_df.write.mode("overwrite").parquet(args.out)

    n = spark.read.parquet(args.out).count()
    print(json.dumps({
        "op": args.op, "rows": n,
        "wall_sec": round(time.time() - t0, 2), "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
