"""U8/S6 — per-partition lineage + metrics rows (north_rule requirement).

Each materialized stage gets metrics rows: one per output partition
(partition_id, rows_out, input files feeding the stage) plus a stage-level
row with wall time. Computed as a cheap Spark job over the already-written
parquet (spark_partition_id + input_file_name are JVM-side — no Python).
Appended to <checkpoint_root>/_metrics as parquet.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "stage string, partition_id int, rows_out bigint, "
    "input_files array<string>, wall_ms double, ts double"
)


def partition_metrics(df: DataFrame, stage: str, wall_ms: float) -> DataFrame:
    per_part = (
        df.select(
            F.spark_partition_id().alias("partition_id"),
            F.input_file_name().alias("_f"),
        )
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("rows_out"),
            F.array_sort(F.collect_set("_f")).alias("input_files"),
        )
    )
    return per_part.select(
        F.lit(stage).alias("stage"),
        "partition_id",
        "rows_out",
        "input_files",
        F.lit(float(wall_ms)).alias("wall_ms"),
        F.lit(time.time()).alias("ts"),
    )


def append_metrics(spark: SparkSession, root: str, df: DataFrame,
                   stage: str, wall_ms: float) -> None:
    out = os.path.join(root, "_metrics")
    partition_metrics(df, stage, wall_ms).write.mode("append").parquet(out)


def read_metrics(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, "_metrics"))
