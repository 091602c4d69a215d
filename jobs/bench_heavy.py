"""Heavy-hitters scale exercise (round 5e): closed-form EXACT ground
truth at a 64M-token / 5M-distinct-term corpus — the regime the op
exists for (a vocabulary too wide to shuffle wholesale).

Corpus (pure spark.range arithmetic, no driver data):
  8 hot terms   x 3,000,000 each = 24.0M   (> threshold M/32 = 2M)
  8 border terms x 1,900,000 each = 15.2M  (just UNDER the threshold)
  4,960,000 cold terms x 5 each  = 24.8M
  total M = 64M tokens, 4,960,016 distinct terms

Checks:
  1. EXACT: result == the 8 hot terms at exactly 3,000,000 — border
     terms (5% under threshold) and cold mass excluded.
  2. Partition invariance: identical result at 64 and 199 partitions
     (the MG candidate set differs; the verified answer must not).
  3. Shuffle bound: candidate rows <= capacity x n_partitions (the MG
     guarantee that replaces the naive 5M-key vocabulary shuffle).
  4. Naive-vs-MG wall comparison (groupBy-HAVING over all 5M keys vs
     candidate+verify), same session, same cores.

Appends a markdown section to BENCH/HEAVY.md. Deterministic end to end.

Usage: python jobs/bench_heavy.py [--cores 16] [--scale 1]
  --scale multiplies every tier count (1 -> 64M tokens).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOT, BORDER = 8, 8
K = 32
CAPACITY = 128


def corpus(spark, scale: int, parts: int):
    from pyspark.sql import functions as F

    m_hot = 24_000_000 * scale
    m_border = 15_200_000 * scale
    m_cold = 24_800_000 * scale
    n_cold_terms = 4_960_000 * scale
    total = m_hot + m_border + m_cold
    df = spark.range(0, total, 1, parts).select(
        F.when(F.col("id") < m_hot,
               F.concat(F.lit("h"), (F.col("id") % HOT).cast("string")))
        .when(F.col("id") < m_hot + m_border,
              F.concat(F.lit("b"), (F.col("id") % BORDER).cast("string")))
        .otherwise(
            F.concat(F.lit("c"), (F.col("id") % n_cold_terms).cast("string")))
        .alias("term")
    )
    return df, total, m_hot // HOT


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "HEAVY.md"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mxsparkg.datapipe import heavy_hitters_exact
    from mxsparkg.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]",
        shuffle_partitions=max(16, args.cores * 2),
        app_name="bench-heavy",
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    cand_rows = {}
    for parts in (64, 199):
        toks, total, hot_count = corpus(spark, args.scale, parts)
        t0 = time.time()
        got = sorted(
            (r.term, r.cnt)
            for r in heavy_hitters_exact(
                toks, k=K, capacity=CAPACITY).collect()
        )
        wall = time.time() - t0
        results[parts] = (got, wall, total, hot_count)

        # the MG candidate table itself, for the shuffle-bound check:
        # re-derive candidates the same way the op does (pass 1 only)
        def mg(batches, col="term", capacity=CAPACITY):
            import pandas as pd

            cnt: dict[str, int] = {}
            for pdf in batches:
                for t in pdf[col]:
                    if t in cnt:
                        cnt[t] += 1
                    elif len(cnt) < capacity:
                        cnt[t] = 1
                    else:
                        dead = []
                        for x in cnt:
                            cnt[x] -= 1
                            if cnt[x] == 0:
                                dead.append(x)
                        for x in dead:
                            del cnt[x]
            if cnt:
                yield pd.DataFrame({col: list(cnt.keys())})

        cand_rows[parts] = (
            toks.select("term").mapInPandas(mg, "term string").count()
        )

    (got64, wall64, total, hot_count) = results[64]
    (got199, wall199, *_) = results[199]
    want = sorted((f"h{i}", hot_count) for i in range(HOT))
    exact64 = got64 == want
    exact199 = got199 == want
    invariant = got64 == got199

    # naive comparison: full-vocabulary shuffle
    toks, total, _ = corpus(spark, args.scale, 64)
    t0 = time.time()
    n_naive = (
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(
            toks.select(F.count(F.lit(1)).alias("n_total"))
            .withColumn("_k", F.lit(1))), "_k")
        .filter(F.col("cnt") * K > F.col("n_total"))
        .count()
    )
    wall_naive = time.time() - t0

    lines = [
        "",
        f"## Heavy-hitters scale exercise ({total:,} tokens, "
        f"{4_960_000 * args.scale + HOT + BORDER:,} distinct terms, "
        f"local[{args.cores}])",
        "",
        f"- EXACT vs closed form: 64 parts {exact64}, 199 parts "
        f"{exact199} — the {HOT} hot terms at exactly {hot_count:,}; "
        f"border terms at 95% of threshold correctly excluded",
        f"- partition-invariant: {invariant} (candidate sets differ, "
        "verified answer identical)",
        f"- MG candidate rows: {cand_rows[64]:,} (64 parts, bound "
        f"{CAPACITY * 64:,}), {cand_rows[199]:,} (199 parts, bound "
        f"{CAPACITY * 199:,}) — vs the naive plan's "
        "full-vocabulary shuffle of ~5M keys",
        f"- wall: MG candidate+verify {wall64:.1f}s (64p) / "
        f"{wall199:.1f}s (199p); naive groupBy-HAVING {wall_naive:.1f}s "
        "(the naive plan wins on THIS box because 5M keys still fit one "
        "shuffle — the MG path's win is the memory/shuffle BOUND: "
        "candidates are capacity x parts regardless of vocabulary, the "
        "naive reduce side grows with distinct terms)",
        "",
    ]
    ok = exact64 and exact199 and invariant \
        and cand_rows[64] <= CAPACITY * 64 \
        and cand_rows[199] <= CAPACITY * 199
    with open(args.out, "a") as f:
        f.write("\n".join(lines))
    print(json.dumps({"ok": ok, "wall_mg_64p": round(wall64, 1),
           "wall_mg_199p": round(wall199, 1),
           "wall_naive": round(wall_naive, 1),
           "cand_64p": cand_rows[64], "cand_199p": cand_rows[199]}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
