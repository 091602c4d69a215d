"""Training job (lifecycle B, SURVEY.md §3.3): mine transduction rules from
an annotated corpus and write the model.

  spark-submit --py-files mxsparkg.zip jobs/train.py \
      --corpus <annotated.parquet> --out <rules_dir> \
      [--min-support-frac 0.02] [--max-len 6] [--min-confidence 0.5]

Writes <out>/rules.parquet and prints one JSON summary line.
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
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-support-frac", type=float, default=0.02)
    ap.add_argument("--max-len", type=int, default=6)
    ap.add_argument("--min-support", type=int, default=3)
    ap.add_argument("--min-confidence", type=float, default=0.5)
    ap.add_argument("--topk-per-context", type=int, default=3)
    ap.add_argument("--seed-relations", default=None,
                    help="seed KG parquet (subj_norm, pred, obj_norm): also "
                         "mine predicate patterns by distant supervision "
                         "→ <out>/pred_patterns.parquet")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from mxsparkg.mining import mine_predicates, mine_rules
    from mxsparkg.session import get_spark

    spark = get_spark(master=args.master, app_name="mxsparkg-train")
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    ann = spark.read.parquet(args.corpus)
    rules = mine_rules(
        ann,
        min_support_frac=args.min_support_frac,
        max_len=args.max_len,
        min_support=args.min_support,
        min_confidence=args.min_confidence,
        topk_per_context=args.topk_per_context,
    )
    out_path = os.path.join(args.out, "rules.parquet")
    rules.write.mode("overwrite").parquet(out_path)
    n = spark.read.parquet(out_path).count()
    summary = {
        "rules": n,
        "corpus_lines": ann.count(),
        "wall_sec": round(time.time() - t0, 2),
        "out": out_path,
    }
    if args.seed_relations:
        seed = spark.read.parquet(args.seed_relations)
        pats = mine_predicates(ann, seed)
        pp_path = os.path.join(args.out, "pred_patterns.parquet")
        pats.write.mode("overwrite").parquet(pp_path)
        summary["pred_patterns"] = spark.read.parquet(pp_path).count()
        summary["pred_patterns_out"] = pp_path
        summary["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
