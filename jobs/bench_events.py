"""Event-family scale exercise (round 5i): gap sessionization at 10^8
events through the PRODUCT code path (contract.sessionize_us — the same
function behind the evt_sessionize gate key), with a closed-form EXACT
certificate and a two-parallelism throughput measurement.

Synthetic stream (spark.range — the driver never holds the data):
USERS users × EPU events each. Even users fire every 10 minutes (all
gaps < the 30-minute session gap ⇒ exactly ONE session of EPU events);
odd users fire every 45 minutes (every gap > the gap ⇒ EPU singleton
sessions). So the session table is known in closed form:

  sessions       = USERS/2 · (1 + EPU)
  events covered = Σ n_events = N                       (no event lost)
  max n_events   = EPU  (even users), min = 1 (odd users)

checked EXACTLY, plus an xor fingerprint over (user, session_no,
n_events, t_start) compared across two input layouts per level (7 vs
max(16, 2*cores) partitions — the window is a total order per user, so
layout must not move a session boundary).
The same run at two local[] levels evidences the north-rule scaling
criterion for the one-Exchange window shape.

Appends a section to BENCH/HEAVY.md and prints one JSON line.

Usage: python jobs/bench_events.py [--events 100000000] [--cores 8,32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GAP_US = 1800 * 1_000_000          # the contract's 30-minute gap
SPACING_EVEN = 600 * 1_000_000     # 10 min  -> one session per user
SPACING_ODD = 2700 * 1_000_000     # 45 min  -> all-singleton sessions


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=100_000_000)
    ap.add_argument("--users", type=int, default=1_000_000)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "HEAVY.md"))
    args = ap.parse_args()
    n, users = args.events, args.users
    assert n % users == 0 and users % 2 == 0
    epu = n // users
    want_sessions = users // 2 * (1 + epu)

    from pyspark.sql import functions as F

    from mxsparkg.contract import sessionize_us
    from mxsparkg.session import get_spark

    runs = []
    for cores in [int(x) for x in args.cores.split(",")]:
        spark = get_spark(
            master=f"local[{cores}]",
            shuffle_partitions=max(16, cores * 2),
            app_name=f"bench-events-{cores}",
        )
        spark.sparkContext.setLogLevel("ERROR")

        def stream(parts: int):
            r = spark.range(0, n, 1, parts)
            u = F.col("id") % users
            k = F.expr(f"id div {users}")
            spacing = F.when(u % 2 == 0, F.lit(SPACING_EVEN)).otherwise(
                F.lit(SPACING_ODD)
            )
            return r.select(
                u.alias("user_id"),
                F.col("id").alias("event_id"),
                (k * spacing).alias("_us"),
                F.lit(1.0).alias("value"),
            )

        fps = []
        wall = None
        layouts = (7, max(16, cores * 2))
        for parts in layouts:
            t0 = time.time()
            sess = sessionize_us(stream(parts), GAP_US)
            row = sess.agg(
                F.count(F.lit(1)).alias("n_sessions"),
                F.sum("n_events").alias("covered"),
                F.max("n_events").alias("max_n"),
                F.min("n_events").alias("min_n"),
                F.bit_xor(
                    F.xxhash64("user_id", "session_no", "n_events",
                               "t_start_us")
                ).alias("fp"),
            ).collect()[0]
            w = time.time() - t0
            wall = w if wall is None else min(wall, w)
            assert row.n_sessions == want_sessions, (
                row.n_sessions, want_sessions)
            assert row.covered == n
            assert row.max_n == epu and row.min_n == 1
            fps.append(row.fp)
        assert fps[0] == fps[1], "session set depends on input layout"
        runs.append((cores, wall))
        print(f"[events] local[{cores}]: {wall:.1f}s "
              f"({n / wall / 1e6:.1f}M events/s), "
              f"{want_sessions:,} sessions EXACT", file=sys.stderr)
        spark.stop()

    (c0, w0), (c1, w1) = runs[0], runs[-1]
    eff = (n / w1) / (n / w0) / (c1 / c0)
    stats = {
        "ok": True, "events": n, "users": users,
        "sessions": want_sessions,
        "walls": {str(c): round(w, 1) for c, w in runs},
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(stats))

    lines = [
        "",
        f"## sessionization at scale: {n:,} events, closed-form EXACT "
        "(round 5i)",
        "",
        f"{users:,} users × {epu} events (even users 10-min spacing → one "
        f"{epu}-event session; odd users 45-min spacing → {epu} singleton "
        f"sessions): the product sessionize_us path must emit exactly "
        f"{want_sessions:,} sessions covering all {n:,} events — asserted, "
        "with the session-set xor fingerprint identical at "
        f"{layouts[0]} vs {layouts[1]} input "
        "partitions. One user-partitioned sort Exchange carries both "
        "windows; per-user buffer is that user's events, never the stream.",
        "",
        "| cores | wall | events/s |",
        "|---|---|---|",
    ] + [
        f"| local[{c}] | {w:.1f}s | {n / w / 1e6:.1f}M |" for c, w in runs
    ] + [
        f"\nScaling efficiency local[{c0}]→local[{c1}]: {eff:.3f} of ideal.",
    ]
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
