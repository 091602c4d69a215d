"""Million-triple TransE training exercise (records → BENCH/EMBED.md).

Synthesizes a deterministic hub-skewed KG (no external data), trains the
exact-integer TransE of mxsparkg/kgembed.py for --epochs full-batch
epochs, and prints one JSON line with per-epoch walls plus an exactness
checksum. Run it twice at different --master levels: the checksum must be
IDENTICAL — the all-integer design means parallelism changes the wall,
never the model.

Graph shape (why): subjects are drawn uniformly from n_entities, objects
from a power-ish head of 1,000 hub entities, and 10% of triples hit ONE
celebrity object — the hub stress for the per-entity gradient groupBy
(a celebrity collects ~100k gradient contributions per epoch; the sum is
map-side combinable, so it streams instead of buffering).

  spark-submit --py-files /tmp/mxsparkg.zip jobs/bench_embed.py \
      --triples 1000000 --entities 100000 --epochs 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--triples", type=int, default=1_000_000)
    ap.add_argument("--entities", type=int, default=100_000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mxsparkg.kgembed import hinge_loss, init_embeddings, transe_epoch
    from mxsparkg.kgexport import negative_sample
    from mxsparkg.session import get_spark

    spark = get_spark(master=args.master, app_name="bench-embed")
    spark.sparkContext.setLogLevel("WARN")
    n_e, n_t = args.entities, args.triples

    # deterministic synthetic KG: xxhash64-driven draws (no RNG state; no
    # DuckDB oracle here, so the cheaper JVM hash is fine)
    head = min(1000, n_e)  # object head never exceeds the entity space
    t = spark.range(n_t).select(
        F.concat(F.lit("e"), (F.xxhash64(F.col("id")) % n_e + n_e) % n_e)
        .alias("subj"),
        F.concat(F.lit("p"), F.pmod(F.col("id"), F.lit(3))).alias("pred"),
        F.when(
            F.pmod(F.col("id"), F.lit(10)) == 0, F.lit("e0")  # celebrity
        ).otherwise(
            F.concat(
                F.lit("e"),
                (F.xxhash64(F.col("id") + n_t) % head + head) % head,
            )
        ).alias("obj"),
    )
    ents = spark.range(n_e).select(
        F.col("id").cast("int").alias("eid"),
        F.concat(F.lit("e"), F.col("id")).alias("obj_neg"),
    )
    pairs = negative_sample(t, ents, n_entities=n_e).persist()
    n_pairs = pairs.count()
    ent = init_embeddings(
        spark.range(n_e).select(F.concat(F.lit("e"), F.col("id")).alias("id"))
    ).localCheckpoint(eager=True)
    pred = init_embeddings(
        spark.createDataFrame([("p0",), ("p1",), ("p2",)], ["id"])
    ).localCheckpoint(eager=True)

    l0 = hinge_loss(pairs, ent, pred)
    walls = []
    for _ in range(args.epochs):
        t0 = time.time()
        ent, pred = transe_epoch(pairs, ent, pred)
        ent = ent.localCheckpoint(eager=True)   # materialize = epoch wall
        pred = pred.localCheckpoint(eager=True)
        walls.append(round(time.time() - t0, 2))
    l1 = hinge_loss(pairs, ent, pred)

    # exactness checksum over the full trained model (order-insensitive)
    # checksum over the FULL trained model (entity + predicate rows);
    # bit_xor: ANSI-safe (bigint sum of hashes overflows)
    chk = ent.unionByName(pred).select(
        F.bit_xor(F.xxhash64("id", "e0", "e1", "e2", "e3")).alias("h")
    ).collect()[0]["h"]
    print(json.dumps({
        "triples": n_t, "pairs": n_pairs, "entities": n_e,
        "epochs": args.epochs, "epoch_walls_sec": walls,
        "loss_before": l0, "loss_after": l1,
        "model_checksum": chk,
        "cores": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
