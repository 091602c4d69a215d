"""Sketch-tier scale exercise (SURVEY.md §2 T39'/T40'): build the
deterministic HLL register table and the Count-Min cell table over a
100M-row DISTRIBUTED synthetic stream (spark.range; the driver never
holds the data) at two parallelism levels, and certify:

- HLL: estimate within the m=256 error envelope of the EXACT known
  distinct count (every range id is unique — truth is closed-form, no
  second distinct pass needed), registers identical at both core counts
  (the sketch is a pure function of the value set).
- CMS: point estimate for a planted hot key (30% of all rows) is >= its
  exact closed-form count (the hard CMS bound) and within the collision
  envelope; cells identical at both core counts.
- Throughput scales: the build is one map-side-combinable Exchange, so
  rows/s should track cores (the north-rule N->4N criterion, evidenced
  at two local[] levels as BENCH/BASELINE.md does).

Usage: python jobs/bench_sketch.py [--rows 100000000] [--cores 8,32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "SKETCH.md"))
    args = ap.parse_args()
    n = args.rows
    assert n % 10 == 0
    hot_true = 3 * n // 10          # ids with id % 10 < 3 -> 'hot'
    cold_keys = 1_000_003           # the rest spread over ~1M cold keys

    from pyspark.sql import functions as F

    from mxsparkg.datapipe import (
        CMS_W,
        KMV_HSPACE,
        cms_point_query,
        cms_sketch,
        hll_estimate,
        hll_registers,
    )
    from mxsparkg.session import get_spark

    # KMV scale arm: k=1024 (std err ~3.1%) built the PRODUCTION way —
    # a hash-threshold prefilter (T sized for ~8k expected survivors)
    # replaces the gate key's global rank window entirely; bottom-k of
    # the survivors equals bottom-k overall iff survivors >= k (asserted)
    kmv_k = 1024
    kmv_t = KMV_HSPACE // n * 8192

    def kmv_bottomk(df) -> list[int]:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmv|k"), F.col("id").cast("string"))
                      .cast("binary")), 1, 15),
            16, 10,
        ).cast("long")
        surv = sorted(
            r.hval
            for r in df.select(h.alias("hval"))
            .filter(F.col("hval") < kmv_t)
            .distinct()
            .collect()
        )
        assert len(surv) >= kmv_k, (len(surv), kmv_k)
        return surv[:kmv_k]

    hll_runs: list[tuple[int, float]] = []
    cms_runs: list[tuple[int, float]] = []
    kmv_runs: list[tuple[int, float]] = []
    hll_state = None
    cms_state = None
    kmv_state = None
    hll_err = 0.0
    kmv_err = 0.0
    hot_est = 0
    for cores in [int(x) for x in args.cores.split(",")]:
        spark = get_spark(
            master=f"local[{cores}]",
            shuffle_partitions=max(16, cores * 2),
            app_name=f"bench-sketch-{cores}",
        )
        spark.sparkContext.setLogLevel("ERROR")
        base = spark.range(n)

        t0 = time.time()
        regs = sorted(
            (r["reg"], r["max_rho"])
            for r in hll_registers(
                base, F.concat(F.lit("k"), F.col("id"))
            ).collect()
        )
        hll_wall = time.time() - t0
        est = hll_estimate(regs)
        hll_err = abs(est - n) / n
        # m=256 -> std err 6.5%; this one deterministic draw must land
        # well inside 3 sigma
        assert hll_err < 0.20, (est, n)
        if hll_state is None:
            hll_state = regs
        else:
            # the register table is a pure function of the value set —
            # parallelism must not move a single register
            assert regs == hll_state

        ck = F.when(F.col("id") % 10 < 3, F.lit("hot")).otherwise(
            F.concat(F.lit("c"), (F.col("id") % cold_keys))
        )
        t0 = time.time()
        cells = sorted(
            (r["row_id"], r["col_id"], r["cell"])
            for r in cms_sketch(base, ck).collect()
        )
        cms_wall = time.time() - t0
        hot_est = cms_point_query(cells, "hot")
        assert hot_est >= hot_true, (hot_est, hot_true)  # hard CMS bound
        # collision envelope: cold mass is 0.7n over CMS_W columns per
        # row; the min over 4 rows stays under ~2 cells of expectation
        assert hot_est - hot_true <= 2 * (n - hot_true) // CMS_W, (
            hot_est, hot_true)
        if cms_state is None:
            cms_state = cells
        else:
            assert cells == cms_state

        t0 = time.time()
        kmv = kmv_bottomk(base)
        kmv_wall = time.time() - t0
        kmv_est = (kmv_k - 1) * KMV_HSPACE // kmv[-1]
        kmv_err = abs(kmv_est - n) / n
        assert kmv_err < 4.0 / (kmv_k - 2) ** 0.5, (kmv_est, n)
        if kmv_state is None:
            kmv_state = kmv
        else:
            assert kmv == kmv_state  # pure function of the value set
        # lossless merge at scale: bottom-k of the two halves' sketches
        # == the whole sketch
        lo = kmv_bottomk(base.filter(F.col("id") < n // 2))
        hi = kmv_bottomk(base.filter(F.col("id") >= n // 2))
        assert sorted(set(lo) | set(hi))[:kmv_k] == kmv

        hll_runs.append((cores, hll_wall))
        cms_runs.append((cores, cms_wall))
        kmv_runs.append((cores, kmv_wall))
        print(
            f"[sketch] local[{cores}]: hll {hll_wall:.1f}s "
            f"({n / hll_wall / 1e6:.1f}M rows/s, est err {hll_err:.3%}) "
            f"cms {cms_wall:.1f}s ({n / cms_wall / 1e6:.1f}M rows/s, "
            f"hot over-est {hot_est - hot_true:,}) "
            f"kmv {kmv_wall:.1f}s (est err {kmv_err:.3%})"
        )
        spark.stop()

    lines = [
        "",
        f"## sketch tier at scale: {n:,} rows, registers/cells "
        "parallelism-identical (round 5g)",
        "",
        f"HLL over {n:,} UNIQUE keys: estimate error {hll_err:.2%} "
        "(m=256 envelope 6.5%), register table bit-identical at every "
        "core count. CMS with a planted 30%-mass hot key "
        f"(true {hot_true:,}): point estimate {hot_est:,} — never below "
        "truth (the hard bound), overshoot inside the cold-mass/W "
        "collision envelope; cell table bit-identical at every core "
        "count. Both builds are one map-side-combinable pass (HLL: one "
        "256-key Exchange; CMS: + one vocabulary-sized re-sum), so the "
        "wall is pure expression throughput — the shape that scales "
        "with executors at 10^12 rows.",
        "",
        "| cores | hll wall | hll rows/s | cms wall | cms rows/s |",
        "|---|---|---|---|---|",
    ]
    for (cc, hw), (_, cw) in zip(hll_runs, cms_runs):
        lines.append(
            f"| local[{cc}] | {hw:.1f}s | {n / hw / 1e6:.1f}M "
            f"| {cw:.1f}s | {n / cw / 1e6:.1f}M |"
        )
    if len(hll_runs) >= 2:
        (c0, w0), (c1, w1) = hll_runs[0], hll_runs[-1]
        eff = (n / w1) / (n / w0) / (c1 / c0)
        lines.append(
            f"\nHLL scaling efficiency local[{c0}]→local[{c1}]: "
            f"{eff:.3f} of ideal."
        )
    lines.append(
        f"\nKMV bottom-k (k={kmv_k}, round 5i) built the production "
        "way — hash-threshold prefilter instead of a global rank window "
        f"(bottom-k of survivors == bottom-k overall, asserted): "
        f"estimate err {kmv_err:.2%} (std err ~3.1%), sketch "
        "parallelism-identical, and the half∪half lossless-merge "
        "property holds at full scale. Walls: "
        + ", ".join(f"local[{c}] {w:.1f}s" for c, w in kmv_runs) + "."
    )
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
