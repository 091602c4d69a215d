"""Table profiler — the data-quality pass an ingest runs before trusting
a new snapshot, as a spark-submit surface (the north-rule deployment
shape, like jobs/pipeline.py):

  spark-submit --master local[8] --py-files /tmp/mxsparkg.zip \\
      jobs/table_profile.py --table <parquet path or dir> \\
      [--key <col to sketch>] [--hot-keys k1,k2] [--out profile_dir]

Emits ONE JSON line: row count, per-column null/min/max from one
aggregate scan, and — when --key names a column — the mergeable-sketch
profile over it: HLL register table → distinct estimate (6.5% envelope,
one 256-key Exchange regardless of table size) and the Count-Min table
→ point frequency estimates for --hot-keys. Exact countDistinct is
deliberately NOT run here: at the 10^12-row target the sketches ARE the
profile (the profile_table key documents the same swap); the exact path
is one `SELECT count(DISTINCT ...)` away when the table is small enough
to care. With --out, the register/cell tables are written as parquet so
later runs (or the streaming folder, mxsparkg/streaming.py
start_sketch_stream) can MERGE instead of rescan — max for HLL, sum for
CMS, the algebra pinned by tests/test_sketch.py.
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
    ap.add_argument("--table", required=True, help="parquet file or dir")
    ap.add_argument("--key", default=None,
                    help="column to sketch (HLL distinct + CMS counts)")
    ap.add_argument("--hot-keys", default=None,
                    help="comma-separated values to point-query in the CMS")
    ap.add_argument("--out", default=None,
                    help="write hll/ + cms/ parquet sketch tables here")
    ap.add_argument("--expect", default=None,
                    help="comma-separated expectations kind:col[:arg] — "
                         "not_null:c | range_min:c:lo | in_set:c:a|b|c "
                         "| regexp:c:pattern | unique:c")
    ap.add_argument("--master", default=None,
                    help="override spark master (default: active session "
                         "or local[8])")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mxsparkg.datapipe import (
        cms_point_query,
        cms_sketch,
        hll_estimate,
        hll_registers,
    )
    from mxsparkg.session import get_spark

    spark = get_spark(
        master=args.master or "local[8]",
        shuffle_partitions=32,
        app_name="mxsparkg-profile",
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    df = spark.read.parquet(args.table)
    # one aggregate scan for every per-column stat (the profile_table
    # shape: sibling aggregates, no per-column jobs). Numeric columns
    # also accumulate power sums for distribution-shape diagnostics
    # (mean/std/skewness/excess kurtosis — double accumulation is fine
    # for DIAGNOSTICS; the certified whole-bit path for shape stats is
    # the agg_skew key's decimal-128 discipline on quantized columns).
    from pyspark.sql.types import NumericType

    numeric = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, NumericType)
    ]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in df.columns:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.min(F.col(c).cast("string")).alias(f"mn_{c}"))
        aggs.append(F.max(F.col(c).cast("string")).alias(f"mx_{c}"))
    for c in numeric:
        x = F.col(c).cast("double")
        for k in (1, 2, 3, 4):
            aggs.append(F.sum(F.pow(x, k)).alias(f"s{k}_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()
    n_rows = row["n_rows"]
    cols = {
        c: {
            "nulls": n_rows - row[f"nn_{c}"],
            "min": row[f"mn_{c}"],
            "max": row[f"mx_{c}"],
        }
        for c in df.columns
    }
    import math

    for c in numeric:
        n = row[f"nn_{c}"]
        if not n or row[f"s1_{c}"] is None:
            continue
        s1, s2, s3, s4 = (row[f"s{k}_{c}"] for k in (1, 2, 3, 4))
        if not all(math.isfinite(s) for s in (s1, s2, s3, s4)):
            # a NaN/Inf value poisons every power sum; emit a flag
            # instead of NaN tokens that break the one-JSON-line contract
            cols[c]["shape"] = "non-finite values present"
            continue
        mu = s1 / n
        m2 = s2 / n - mu * mu
        if m2 <= 0:
            cols[c]["mean"] = round(mu, 6)
            cols[c]["std"] = 0.0
            continue
        m3 = s3 / n - 3 * mu * s2 / n + 2 * mu ** 3
        m4 = s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n - 3 * mu ** 4
        cols[c].update({
            "mean": round(mu, 6),
            "std": round(m2 ** 0.5, 6),
            "skewness": round(m3 / m2 ** 1.5, 6),
            "excess_kurtosis": round(m4 / (m2 * m2) - 3, 6),
        })

    out: dict = {
        "table": args.table,
        "n_rows": n_rows,
        "columns": cols,
    }
    if args.key:
        key = F.col(args.key)
        regs_df = hll_registers(df, key)
        cells_df = cms_sketch(df, key)
        if args.out:
            regs_df.write.mode("overwrite").parquet(f"{args.out}/hll")
            cells_df.write.mode("overwrite").parquet(f"{args.out}/cms")
            regs_df = spark.read.parquet(f"{args.out}/hll")
            cells_df = spark.read.parquet(f"{args.out}/cms")
        regs = [(r["reg"], r["max_rho"]) for r in regs_df.collect()]
        cells = [
            (r["row_id"], r["col_id"], r["cell"]) for r in cells_df.collect()
        ]
        out["key"] = args.key
        out["hll_distinct_est"] = round(hll_estimate(regs))
        out["hll_registers_hit"] = len(regs)
        if args.hot_keys:
            out["cms_est"] = {
                k: cms_point_query(cells, k)
                for k in args.hot_keys.split(",")
            }
        if args.out:
            out["sketches_out"] = args.out
    if args.expect:
        from mxsparkg.datapipe import check_expectations

        specs = []
        for item in args.expect.split(","):
            parts = item.split(":", 2)
            kind, col = parts[0], parts[1]
            if kind in ("not_null", "unique"):
                specs.append((kind, col))
            elif kind == "range_min":
                specs.append((kind, col, float(parts[2])))
            elif kind == "in_set":
                specs.append((kind, col, parts[2].split("|")))
            elif kind == "regexp":
                specs.append((kind, col, parts[2]))
            else:
                raise SystemExit(f"unknown expectation kind {kind!r}")
        out["expectations"] = {
            r["exp_name"]: r["n_violations"]
            for r in check_expectations(df, specs).collect()
        }
    out["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
