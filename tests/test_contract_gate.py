"""CI-enforced full oracle gate (SURVEY.md §5.2 tier 2): EVERY key
registered in __spark_entry__.queries() is compared against its DuckDB
oracle at sf0.01 on every pytest run — the same check the driver runs,
so keys the driver's round happens not to exercise stay machine-verified
rather than judge-goodwill-verified.

Marked slow (it is the longest test in the suite); run it alone with
  pytest tests/test_contract_gate.py -q
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from mxsparkg.gate import compare_key, duckdb_conn

SF = "/root/testdata/sf0.01"

# Keys that legitimately have no SQL oracle (approx sketches, fixture-backed
# scans). Anything NOT in this list must carry an oracle_sql() entry — a new
# rows-only key without a declared reason fails the gate.
EXPECTED_ROWS_ONLY = {
    "agg_approx_distinct",   # approx sketch values differ across engines
    "scan_annotated",        # fixture-backed, no sf table
    "agg_approx_percentile",  # GK summary vs t-digest not value-comparable;
    # error bound vs exact pinned by test_contract_gate's bound test below
}


@pytest.mark.slow
def test_full_oracle_gate_sf001(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_conn(SF)
    fails, rows_only = [], []
    for k in qs:
        r = compare_key(spark, con, qs, oracles, k, SF)
        if r["status"] == "fail":
            fails.append(f"{k}: {r['detail']}")
        elif r["status"] == "rows-only":
            rows_only.append(k)
            assert r["rows"] >= 0, k
    assert not fails, "oracle gate failures:\n" + "\n".join(fails)
    assert set(rows_only) == EXPECTED_ROWS_ONLY, (
        "rows-only key set drifted (add an oracle_sql() entry or declare "
        f"the exception): {sorted(rows_only)}"
    )
    # every oracle key must actually be registered as a query too
    assert set(oracles) <= set(qs)


def test_approx_percentile_error_bound(spark):
    """The quality certificate behind the rows-only agg_approx_percentile
    key: the one-pass Greenwald-Khanna estimate must sit within its
    documented RANK error (<= n/accuracy per group) of the exact sorted
    values — checked by rank, not by value, because a rank-epsilon
    guarantee says nothing about value distance on a gappy distribution.
    Each group's estimate at quantile q must be a value whose rank r in
    the group's sorted multiset satisfies |r - q*n| <= n/accuracy + 1."""
    import duckdb

    from mxsparkg.contract import APPROX_PCT_ACCURACY, contract_queries

    got = {
        r["l_returnflag"]: r
        for r in contract_queries()["agg_approx_percentile"](spark, SF)
        .collect()
    }
    con = duckdb.connect()
    for flag, row in got.items():
        vals = [
            v for (v,) in con.execute(
                f"SELECT l_quantity FROM '{SF}/lineitem.parquet' "
                f"WHERE l_returnflag = ? ORDER BY 1", [flag]
            ).fetchall()
        ]
        n = len(vals)
        tol = n / APPROX_PCT_ACCURACY + 1
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
                       (0.9, "p90")):
            est = row[col]
            # rank range the estimate occupies in the sorted multiset
            lo = sum(1 for v in vals if v < est)
            hi = sum(1 for v in vals if v <= est)
            target = q * n
            assert lo - tol <= target <= hi + tol, (
                f"{flag} {col}: est {est} occupies ranks [{lo},{hi}] "
                f"vs target {target} (n={n}, tol={tol})"
            )
