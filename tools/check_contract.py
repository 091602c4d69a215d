"""Local replica of the driver's correctness gate: run every queries()[k]
on Spark and oracle_sql()[k] on DuckDB over the same parquet dir; compare
row-count + order-insensitive value hash. The comparison logic lives in
mxsparkg/gate.py and is ALSO executed by tests/test_contract_gate.py on
every pytest run. Usage:

  python tools/check_contract.py [--sf /root/testdata/sf0.01] [--keys k1,k2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--keys", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from mxsparkg.gate import compare_key, duckdb_conn
    from mxsparkg.session import get_spark

    spark = get_spark("local[8]", shuffle_partitions=16, app_name="contract-check")
    con = duckdb_conn(args.sf)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    keys = args.keys.split(",") if args.keys else list(qs)
    tally = {"pass": 0, "fail": 0, "rows-only": 0}
    for k in keys:
        t0 = time.time()
        r = compare_key(spark, con, qs, oracles, k, args.sf)
        tally[r["status"]] += 1
        tag = {"pass": "PASS", "fail": "FAIL", "rows-only": "ROWS"}[r["status"]]
        extra = f" {r['detail']}" if r["detail"] else ""
        print(f"{tag}  {k}: {r['rows']} rows [{time.time()-t0:.1f}s]{extra}")
    print(f"\n{tally['pass']} pass, {tally['fail']} fail, "
          f"{tally['rows-only']} rows-only of {len(keys)} keys")
    spark.stop()
    sys.exit(1 if tally["fail"] else 0)


if __name__ == "__main__":
    main()
