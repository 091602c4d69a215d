"""J8 — explicit skew handling (SURVEY.md §2.3 J8; north_rule demands it).

Web corpora are Zipf-skewed by host (the fixture generator plants a top host
holding ≥20% of rows). Two tools:

1. repartition_salted — spread a hot key across S sub-partitions before a
   heavy per-key stage (detect/per-host UDFs). Deterministic salt =
   pmod(xxhash64(stable cols), S), so results are reproducible and the
   partition-invariance property test holds.
2. salted_join — big-side salt × small-side explode(S replicas), classic
   skew-join; AQE skewJoin stays on as backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, cols: list[str], n_salts: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    )


def repartition_salted(df: DataFrame, key: str, n_partitions: int,
                       n_salts: int = 16, salt_on: list[str] | None = None) -> DataFrame:
    """Repartition by (key, salt) so one hot key spans n_salts partitions.
    salt_on defaults to all non-key columns' hash → deterministic."""
    salt_on = salt_on or [c for c in df.columns if c != key]
    salted = with_salt(df, salt_on, n_salts)
    return salted.repartition(n_partitions, F.col(key), F.col("_salt")).drop("_salt")


def salted_join(big: DataFrame, small: DataFrame, on: str, n_salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join robust to hot keys in `big`: replicate `small` ×n_salts."""
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    out = big_s.join(small_s, on=[on, "_salt"], how=how)
    return out.drop("_salt")
