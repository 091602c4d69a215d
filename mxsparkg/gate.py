"""Shared logic of the driver's correctness gate: run queries()[k] on Spark
and oracle_sql()[k] on DuckDB over the same parquet tables; compare
row-count + column set + order-insensitive value hash. Used by BOTH
tools/check_contract.py (CLI) and tests/test_contract_gate.py (the
CI-enforced full-gate run), so every registered key is machine-checked on
every `pytest` run — including keys a driver round happens not to cover.
"""

from __future__ import annotations

import hashlib
import math
import os

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


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


def duckdb_conn(sf_dir: str):
    """DuckDB connection with the driver's table views registered."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def compare_key(spark, con, queries, oracles, key: str, sf_dir: str) -> dict:
    """One gate row: {key, status ('pass'|'fail'|'rows-only'), rows, detail}."""
    try:
        sdf = queries[key](spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001 - gate reports, caller decides
        return {"key": key, "status": "fail", "rows": -1,
                "detail": f"spark error: {str(e).splitlines()[0][:200]}"}
    if key not in oracles:
        return {"key": key, "status": "rows-only", "rows": len(srows),
                "detail": ""}
    try:
        drel = con.sql(oracles[key])
        dcols = [c.lower() for c in drel.columns]
        drows = [dict(zip(dcols, row)) for row in drel.fetchall()]
    except Exception as e:  # noqa: BLE001
        return {"key": key, "status": "fail", "rows": len(srows),
                "detail": f"duckdb error: {str(e).splitlines()[0][:200]}"}
    sn, sh = table_hash([{c.lower(): v for c, v in r.items()} for r in srows])
    dn, dh = table_hash(drows)
    scols = sorted(c.lower() for c in (srows[0].keys() if srows else []))
    dcols_s = sorted(dcols) if drows else scols
    ok = (sn, sh) == (dn, dh) and scols == dcols_s
    detail = (
        "" if ok
        else f"spark=({sn},{sh},{scols}) duck=({dn},{dh},{dcols_s})"
    )
    return {"key": key, "status": "pass" if ok else "fail", "rows": sn,
            "detail": detail}
