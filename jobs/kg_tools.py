"""spark-submit surface for the KG output-stage tools (kgexport.py /
kgembed.py) over the pipeline's materialized tables:

  spark-submit --py-files mxsparkg.zip jobs/kg_tools.py \
      --op ntriples --edges <out>/edges --out <dir>

ops:
  ntriples   serialize edges to RDF N-Triples text shards (percent-encoded
             IRIs; each shard independently a valid N-Triples doc)
  validate   domain/range violations: edges typed via the nodes table's
             etype, checked against --constraints parquet
             (pred, styp, otyp) by broadcast anti-join
  infer      mine the dominant (pred, styp, otyp) signatures from the same
             typed edges (the constraint table `validate` consumes)
  diff       add/del delta between two edges snapshots (--edges vs
             --edges-prev) on (subj, pred, obj)
  embed      train exact-integer TransE embeddings on the edges table;
             writes ent/ and pred/ parquet under --out
  predict    link prediction with trained embeddings (--emb = embed's
             --out): top-k candidate objects per subject of --pred,
             candidates = the objects observed for that predicate
  nquads     provenance N-Quads from the pipeline TRIPLES table (pass it
             as --edges): 4th term = the source page as a graph IRI
  jsonld     compacted JSON-LD node objects from the edges table, one
             JSON document per subject per line (JSON-Lines shards)
  entail     OWL inverseOf/symmetric entailment over the edges table
             (--inverses (pred, ipred) parquet; asserted-wins dedup)
  snapshot   time-travel read of a version-dir table written by --op
             apply (--snapshots root, --version N, default latest) —
             the in-sandbox `VERSION AS OF`
  apply      idempotent merge of a --op diff delta into a version-dir
             snapshot table at --out (--delta-id = exactly-once key;
             --edges seeds v=1 on an empty root; Iceberg MERGE INTO is
             the production equivalent)
  bgp        2-hop basic-graph-pattern match over the edges table:
             ?x --p1 ?y --p2 ?z (paths parquet at --out)
  turtle     serialize edges to Turtle subject blocks (sorted ';'-joined
             predicate lists; every shard independently valid Turtle)

Prints one JSON line {op, rows, wall_sec, out}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _typed_edges(edges, nodes):
    """Attach styp/otyp from the nodes table (canon_id → etype): two
    equi-joins, broadcast when nodes is small relative to edges."""
    from pyspark.sql import functions as F

    et = nodes.select(F.col("canon_id").alias("_id"), F.col("etype"))
    return (
        edges.join(et.withColumnRenamed("etype", "styp"),
                   edges.subj == F.col("_id")).drop("_id")
        .join(et.withColumnRenamed("etype", "otyp"),
              edges.obj == F.col("_id")).drop("_id")
    )


def _dense_entities(edges):
    """(eid, id, obj_neg) with dense 0..n-1 eids over the distinct entity
    set, in global id sort order, DataFrame-only — the
    mxsparkg.layout.prefix_sum_rank primitive (range-partition + counted
    offsets + within-partition row_number; only driver traffic is
    n_partitions longs), which that module documents and the
    fn_rank_global gate key certifies against the window oracle."""
    from pyspark.sql import functions as F

    from mxsparkg.layout import prefix_sum_rank

    ids = (
        edges.select(F.col("subj").alias("id"))
        .unionByName(edges.select(F.col("obj").alias("id")))
        .distinct()
    )
    return prefix_sum_rank(ids, "id", rank_col="_rank").select(
        (F.col("_rank") - 1).alias("eid"),
        F.col("id"),
        F.col("id").alias("obj_neg"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", required=True,
                    choices=["conflicts", "reliability", "ntriples", "nquads", "turtle", "jsonld", "entail", "validate",
                             "infer", "diff", "embed", "predict", "apply",
                             "bgp", "snapshot", "expire"])
    ap.add_argument("--delta", default=None,
                    help="state_diff output parquet (op, subj, pred, obj) "
                         "for --op apply")
    ap.add_argument("--delta-id", default=None,
                    help="idempotency key for --op apply (e.g. crawl id): "
                         "re-submitting the same id is a no-op")
    ap.add_argument("--key-cols", default=None,
                    help="comma-separated upsert key for --op apply "
                         "(default: full row)")
    ap.add_argument("--emb", default=None,
                    help="embed op's --out dir (ent/ + pred/) for --op predict")
    ap.add_argument("--pred", default=None,
                    help="predicate to predict objects for (--op predict)")
    ap.add_argument("--p1", default=None,
                    help="hop-1 predicate for --op bgp")
    ap.add_argument("--p2", default=None,
                    help="hop-2 predicate for --op bgp")
    ap.add_argument("--top-k", type=int, default=3)
    ap.add_argument("--edges", default=None,
                    help="pipeline edges parquet (subj, pred, obj, ...); "
                         "required for every op except snapshot")
    ap.add_argument("--snapshots", default=None,
                    help="version-dir root written by --op apply, for "
                         "--op snapshot")
    ap.add_argument("--keep", type=int, default=2,
                    help="retained snapshot count for --op expire")
    ap.add_argument("--version", type=int, default=None,
                    help="snapshot version to time-travel to "
                         "(--op snapshot; default latest)")
    ap.add_argument("--edges-prev", default=None,
                    help="previous snapshot for --op diff")
    ap.add_argument("--nodes", default=None,
                    help="pipeline nodes parquet (canon_id, etype, ...)")
    ap.add_argument("--constraints", default=None,
                    help="(pred, styp, otyp) parquet for --op validate")
    ap.add_argument("--inverses", default=None,
                    help="(pred, ipred) parquet for --op entail "
                         "(default: the module's gate ontology)")
    ap.add_argument("--out", default=None)  # required below except for --op expire
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    # per-op required flags: fail with a usage error, not an opaque
    # TypeError from spark.read.parquet(None) three stages later
    required = {
        "validate": ["nodes", "constraints"],
        "infer": ["nodes"],
        "diff": ["edges_prev"],
        "predict": ["emb", "pred"],
        "apply": ["delta", "delta_id"],
        "bgp": ["p1", "p2"],
        "snapshot": ["snapshots"],
        "expire": ["snapshots"],
    }
    if args.op not in ("snapshot", "expire"):
        required.setdefault(args.op, [])
        required[args.op] = ["edges"] + list(required[args.op])
    missing = [
        "--" + f.replace("_", "-")
        for f in required.get(args.op, ())
        if getattr(args, f) is None
    ]
    if args.op != "expire" and args.out is None:
        missing.append("--out")
    if missing:
        ap.error(f"--op {args.op} requires {' '.join(missing)}")

    from pyspark.sql import functions as F

    from mxsparkg import kgexport as kx
    from mxsparkg.session import get_spark

    spark = get_spark(master=args.master, app_name=f"kg-{args.op}")
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()

    edges = spark.read.parquet(args.edges) if args.edges else None
    if args.op == "expire":
        # retention GC: no Spark job at all — manifest/file ops only
        expired = kx.expire_snapshots(args.snapshots, keep_last=args.keep)
        print(json.dumps({
            "op": "expire", "expired": expired, "keep": args.keep,
            "wall_sec": round(time.time() - t0, 2),
        }))
        spark.stop()
        return
    if args.op == "snapshot":
        out_df = kx.read_snapshot(spark, args.snapshots, args.version)
        out_df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    elif args.op == "conflicts":
        preds = args.pred.split(",") if args.pred else None
        out_df = kx.detect_conflicts(edges, preds)
        out_df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    elif args.op == "reliability":
        # --edges here is the pipeline TRIPLES table (subj,pred,obj,url)
        out_df = kx.source_reliability(edges)
        out_df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    elif args.op == "ntriples":
        kx.export_edges_ntriples(edges).select("line").write.mode(
            "overwrite").text(args.out)
        n = spark.read.text(args.out).count()
    elif args.op == "nquads":
        # provenance export: --edges here is the pipeline TRIPLES table
        # (subj, pred, obj, url) — the graph term is the source page
        kx.export_triples_nquads(edges).select("line").write.mode(
            "overwrite").text(args.out)
        n = spark.read.text(args.out).count()
    elif args.op == "turtle":
        kx.export_edges_turtle(edges).select("block").write.mode(
            "overwrite").text(args.out)
        # blocks are multi-line ('; '-continuation lines); exactly one
        # line per block carries the terminal ' .'
        n = (
            spark.read.text(args.out)
            .filter(F.col("value").endswith(" ."))
            .count()
        )
    elif args.op == "entail":
        inv = None
        if args.inverses:
            inv = {
                r["pred"]: r["ipred"]
                for r in spark.read.parquet(args.inverses).collect()
            }
        out_df = kx.owl_inverse_closure(
            edges.select("subj", "pred", "obj"), inv)
        out_df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    elif args.op == "jsonld":
        kx.export_edges_jsonld(edges).select("doc").write.mode(
            "overwrite").text(args.out)
        # one self-contained JSON document per line (JSON-Lines shards)
        n = spark.read.text(args.out).count()
    elif args.op == "validate":
        typed = _typed_edges(edges, spark.read.parquet(args.nodes))
        cons = spark.read.parquet(args.constraints)
        out_df = kx.validate_triples(
            typed.select("subj", "pred", "obj", "styp", "otyp"), cons)
        out_df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    elif args.op == "infer":
        typed = _typed_edges(edges, spark.read.parquet(args.nodes))
        kx.infer_schema(
            typed.select("pred", "styp", "otyp")
        ).write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    elif args.op == "diff":
        prev = spark.read.parquet(args.edges_prev)
        cols = ["subj", "pred", "obj"]
        out_df = kx.state_diff(prev.select(cols), edges.select(cols))
        out_df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    elif args.op == "apply":
        # idempotent snapshot merge: --out is the version-dir root, --edges
        # seeds v=1 when the root is empty, --delta-id gives exactly-once
        kc = args.key_cols.split(",") if args.key_cols else None
        delta = spark.read.parquet(args.delta)
        # the snapshot tracks exactly the columns the delta carries: the
        # diff op projects to (subj, pred, obj), so the seed base must too
        dcols = [c for c in delta.columns if c != "op"]
        res = kx.merge_snapshot(
            spark, args.out, delta, args.delta_id, key_cols=kc,
            base=edges.select(dcols))
        n = res["rows"]
    elif args.op == "bgp":
        out_df = kx.bgp_2hop(
            edges.select("subj", "pred", "obj"), args.p1, args.p2)
        out_df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    elif args.op == "predict":
        from mxsparkg import kgembed as ke

        ent = spark.read.parquet(os.path.join(args.emb, "ent"))
        pred = spark.read.parquet(os.path.join(args.emb, "pred"))
        rel = edges.filter(F.col("pred") == args.pred)
        subjects = rel.select(F.col("subj").alias("id")).distinct()
        cands = rel.select(F.col("obj").alias("id")).distinct()
        out_df = ke.predict_objects(
            subjects, args.pred, ent, pred, cands, top_k=args.top_k)
        out_df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:  # embed
        from mxsparkg import kgembed as ke

        ents = _dense_entities(edges).persist()
        n_ent = ents.count()
        triples = edges.select("subj", "pred", "obj")
        pairs = kx.negative_sample(
            triples, ents.select("eid", "obj_neg"), n_entities=n_ent)
        ent0 = ke.init_embeddings(ents.select("id"))
        pred0 = ke.init_embeddings(
            triples.select(F.col("pred").alias("id")).distinct())
        ent, pred = ke.train_transe(pairs, ent0, pred0, epochs=args.epochs)
        ent.write.mode("overwrite").parquet(os.path.join(args.out, "ent"))
        pred.write.mode("overwrite").parquet(os.path.join(args.out, "pred"))
        n = n_ent

    print(json.dumps({
        "op": args.op, "rows": n,
        "wall_sec": round(time.time() - t0, 2), "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
