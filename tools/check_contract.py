"""Local replica of the driver's correctness gate: run every queries()[k]
on Spark and oracle_sql()[k] on DuckDB over the same parquet dir; compare
row-count + order-insensitive value hash. Usage:

  python tools/check_contract.py [--sf /root/testdata/sf0.01] [--keys k1,k2]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-rounded values; normalize -0.0 and float repr drift
        return repr(round(v + 0.0, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def table_hash(rows: list[dict]) -> tuple[int, str]:
    if not rows:
        return 0, "empty"
    cols = sorted(rows[0].keys())
    lines = sorted("|".join(canon_cell(r[c]) for c in cols) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--keys", default=None)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from mxsparkg.session import get_spark

    spark = get_spark("local[8]", shuffle_partitions=16, app_name="contract-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    keys = args.keys.split(",") if args.keys else list(qs)
    n_pass = n_fail = n_rowsonly = 0
    for k in keys:
        t0 = time.time()
        try:
            sdf = qs[k](spark, args.sf)
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {k}: spark error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if k not in oracles:
            print(f"ROWS  {k}: {len(srows)} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            drel = con.sql(oracles[k])
            dcols = [c.lower() for c in drel.columns]
            drows = [dict(zip(dcols, row)) for row in drel.fetchall()]
        except Exception as e:
            print(f"FAIL  {k}: duckdb error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        sn, sh = table_hash([{c.lower(): v for c, v in r.items()} for r in srows])
        dn, dh = table_hash(drows)
        scols = sorted(c.lower() for c in (srows[0].keys() if srows else []))
        dcols_s = sorted(dcols) if drows else scols
        ok = (sn, sh) == (dn, dh) and scols == dcols_s
        status = "PASS" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        extra = "" if ok else f" spark=({sn},{sh},{scols}) duck=({dn},{dh},{dcols_s})"
        print(f"{status}  {k}: {sn} rows [{time.time()-t0:.1f}s]{extra}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only "
          f"of {len(keys)} keys")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
