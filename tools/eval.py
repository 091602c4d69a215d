"""Triple-level P/R/F evaluation CLI (the campaign-style scoring surface,
SURVEY.md §3.1 'Evaluation' lifecycle).

  python tools/eval.py --pred /tmp/kg/triples --gold <gold_triples.parquet>
  python tools/eval.py --pred /tmp/kg/triples --gold ... --keys subj,pred,obj

Prints one JSON line {precision, recall, f1, n_pred, n_gold, n_common}.
Pure pyarrow+duckdb — no Spark session needed to score."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", required=True, help="parquet file/dir of predicted triples")
    ap.add_argument("--gold", required=True, help="parquet file/dir of gold triples")
    ap.add_argument("--keys", default="subj,pred,obj,url",
                    help="comparison key columns (must exist in both)")
    args = ap.parse_args()

    import duckdb

    keys = args.keys.split(",")
    cols = ", ".join(keys)
    con = duckdb.connect()

    def load(path: str, name: str) -> int:
        import os

        # isdir, not "has a dot": directories like out.v1/ or sf0.1/ must
        # still get the recursive glob
        glob = f"{path}/**/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {name} AS SELECT DISTINCT {cols} "
            f"FROM read_parquet('{glob}')"
        )
        return con.execute(f"SELECT count(*) FROM {name}").fetchone()[0]

    n_pred = load(args.pred, "pred")
    n_gold = load(args.gold, "gold")
    n_common = con.execute(
        "SELECT count(*) FROM (SELECT * FROM pred INTERSECT SELECT * FROM gold)"
    ).fetchone()[0]
    p = n_common / n_pred if n_pred else 0.0
    r = n_common / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    print(json.dumps({
        "precision": round(p, 4), "recall": round(r, 4), "f1": round(f1, 4),
        "n_pred": n_pred, "n_gold": n_gold, "n_common": n_common,
    }))


if __name__ == "__main__":
    main()
