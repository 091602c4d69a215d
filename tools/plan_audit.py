"""Registry-wide plan-hygiene audit: build EVERY key in
__spark_entry__.queries() at a small sf and scan its physical plan for
the two disqualifying join shapes (CartesianProduct,
BroadcastNestedLoopJoin) plus row-at-a-time Python (BatchEvalPython —
Arrow-batched stages plan as ArrowEvalPython/MapInArrow and are fine).

tests/test_plans.py pins 21 representative shapes on every CI run; this
audit is the BLANKET sweep run per milestone (iterative keys execute
real rounds while building their result, so it costs a gate-scale run —
too heavy for every pytest invocation). Results append a summary row to
BENCH/PLANS.md by hand.

Usage: python tools/plan_audit.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BAD = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")

# Keys whose flagged shapes are INTENTIONAL and bounded — each BNLJ /
# CartesianProduct here has a build side that is 1 row (a scalar
# ride-along: corpus totals, iteration mass constants) or model-sized
# (a query set, class table, or embedding grid), never corpus-sized.
# A NEW key showing up in the audit must either come out clean or be
# added here with its reason — silence is not an option.
ALLOWED = {
    "ann_topk_cosine": "5-row query set broadcast with theta (!=) cond",
    "ann_pq_topk": "5-row query set broadcast with theta (!=) cond",
    "evt_funnel": "1-row step totals ride along for rate columns",
    "graph_reciprocity": "1-row edge total rides along for ppm",
    "graph_triangles": "1-row triangle/wedge totals ride along",
    "kg_distmult": "model-sized candidate grid (entities x dims)",
    "kg_hits_at_k": "model-sized eval grid: test triples x candidates",
    "kg_pagerank": "1-row mass/N constants per iteration",
    "kg_pagerank_weighted": "1-row mass/N constants per iteration",
    "kg_ppr": "1-row seed-mass constants per iteration",
    "kg_shacl_card": "1-row corpus totals for the violation rates",
    "kg_transe": "model-sized training grid (batch x dim unroll)",
    "kg_transe_predict": "model-sized candidate x dim scoring grid",
    "txt_nb_train": "1-row class-prior totals ride along",
    "txt_nb_classify": "1-row class-prior totals ride along",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from mxsparkg.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]",
        shuffle_partitions=16,
        app_name="plan-audit",
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    hits: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    t0 = time.time()
    for i, (key, fn) in enumerate(sorted(qs.items())):
        try:
            df = fn(spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - audit reports, not dies
            errors[key] = str(e).splitlines()[0][:120]
            continue
        bad = [b for b in BAD if b in plan]
        if bad:
            hits[key] = bad
        if (i + 1) % 40 == 0:
            print(f"[audit] {i + 1}/{len(qs)} keys planned "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
    print(f"[audit] {len(qs)} keys in {time.time() - t0:.0f}s: "
          f"{len(hits)} flagged, {len(errors)} errors", file=sys.stderr)
    unexplained = {k: v for k, v in hits.items() if k not in ALLOWED}
    for k, v in sorted(hits.items()):
        note = ALLOWED.get(k, "*** UNEXPLAINED ***")
        print(f"FLAG {k}: {', '.join(v)}  [{note}]")
    for k, v in sorted(errors.items()):
        print(f"ERR  {k}: {v}")
    stale = sorted(set(ALLOWED) - set(hits))
    if stale:
        print(f"STALE whitelist entries (no longer flagged): {stale}")
    if not unexplained and not errors:
        print(f"CLEAN: {len(qs) - len(hits)}/{len(qs)} keys free of "
              f"{'/'.join(BAD)}; {len(hits)} whitelisted "
              "(1-row ride-alongs / model-sized grids)")
    else:
        sys.exit(1)


if __name__ == "__main__":
    main()
