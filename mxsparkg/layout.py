"""Data-layout primitives for shuffle elimination at scale: bucketed table
writes and bucket-co-located joins.

At 100 TB the single biggest avoidable cost is re-shuffling the same fact
table on the same key for every join: a 10^12-row pages/triples table
joined repeatedly on url/canon_id pays a full network shuffle per query.
Bucketing amortizes that shuffle into the WRITE: `bucketBy(n, key)` +
`sortBy(key)` hashes rows into n files per partition at write time, and
Spark's scan reports the resulting HashPartitioning to the planner, so a
join of two tables bucketed on the same key with the same bucket count
plans as a SortMergeJoin with NO Exchange on either side (asserted in
tests/test_layout.py). Repeat consumers read pre-partitioned, pre-sorted
data — the 'co-located join' every warehouse doc recommends for star joins
against big fact tables.

Sandbox note: bucketed tables require a session catalog (saveAsTable, not
path writes). The in-memory Derby catalog used here is single-session; on
a real cluster the same calls target the shared metastore / Iceberg
catalog (Iceberg buckets via hidden partition transforms instead —
`bucket(n, key)` in the PARTITIONED BY clause; no jar in this sandbox
[ENV], documented in catalog.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write df as a bucketed (and bucket-sorted) managed parquet table.

    Pick n_buckets so one bucket of the LARGER table fits an executor's
    memory at target scale (10^12 rows / 10^4 buckets ≈ 10^8 rows per
    bucket is too big; production tables this size use 2^12-2^14 buckets).
    Both sides of a co-located join must use the same key and count."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    merge_hint: bool = False,
) -> DataFrame:
    """Join two same-key/same-count bucketed tables. The plan this produces
    (and the test asserts): FileScan reports the bucket spec → planner sees
    matching HashPartitioning on both sides → SortMergeJoin with zero
    Exchange operators. A per-partition Sort remains (Spark ≥3 does not
    trust bucket-file sort order unless the legacy
    bucketedTableScan.outputOrdering flag is on and each bucket is one
    file) — that sort is local and spill-safe; the eliminated NETWORK
    shuffle is the scale win. On 1000 executors this is the difference
    between a cluster-wide shuffle of the fact table per query and a
    purely local merge per bucket.

    `merge_hint` forces the SortMergeJoin path: at production scale two
    fact tables exceed the broadcast threshold and SMJ is what the planner
    picks anyway; at test scale everything fits a broadcast, so the hint is
    how the test exercises the big-big plan ('Bucketed: false (disabled by
    query planner)' appears whenever a broadcast made bucketing moot)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    if merge_hint:
        left, right = left.hint("merge"), right.hint("merge")
    return left.join(right, on)


def zorder_key(x, y, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative int columns into
    one sort key: bit i of x lands at position 2i, bit i of y at 2i+1.
    Sorting/range-partitioning by the z-key before writing gives every
    file a small bounding BOX in (x, y) instead of a thin stripe in one
    dimension — so min/max file statistics (parquet row-group stats,
    Iceberg manifest ranges) prune candidate files for 2-D predicates
    (`x BETWEEN a AND b AND y BETWEEN c AND d`), the data-skipping
    layout trick behind DELTA/Iceberg OPTIMIZE ZORDER. Pure integer
    bit-arithmetic (shift/and/multiply by power-of-two literals), bit-
    identical in any engine; `bits` caps each dimension at 2^bits-1 —
    callers bucket wider domains first (e.g. `% 65536`).

    locality proof: tests/test_round5f.py sorts a uniform grid by z-key
    vs by x alone and asserts the box-query candidate-chunk fraction
    drops; the fn_zorder gate key pins the interleave values themselves
    cross-engine."""
    from pyspark.sql import functions as F

    terms = []
    for i in range(bits):
        terms.append(F.shiftright(x, i).bitwiseAND(F.lit(1))
                     * F.lit(1 << (2 * i)))
        terms.append(F.shiftright(y, i).bitwiseAND(F.lit(1))
                     * F.lit(1 << (2 * i + 1)))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("bigint")


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as portable SQL (DuckDB oracle side)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def prefix_sum_rank(df, order_cols, rank_col: str = "rank"):
    """Global 1-based rank by `order_cols` WITHOUT a single-partition
    window — the scalable form of row_number() OVER (ORDER BY ...), and
    the generalization of jobs/kg_tools._dense_entities: range-partition
    on the order columns (every row in partition p sorts before every
    row in p+1), count each partition (driver traffic = n_partitions
    longs, nothing else), prefix-sum the counts into per-partition
    offsets, and add a WITHIN-partition row_number. The global sort, the
    counts, and the ranks all stay distributed; at 10^12 rows the only
    serial step is the n_partitions-long Python loop.

    `order_cols` must be a total order (append a unique key) or ranks of
    tied rows are partition-layout-dependent. The returned plan
    references a persisted intermediate (the partition stamp must be
    observed identically by the counts job and the rank job); single-
    shot-per-session posture, same as the datapipe pair ops.

    Certified against the engine row_number oracle by the
    fn_rank_global gate key; partition-invariance property-tested."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if isinstance(order_cols, str):
        order_cols = [order_cols]
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    stamped = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = sorted(
        (r["_pid"], r["c"])
        for r in stamped.groupBy("_pid").agg(
            F.count(F.lit(1)).alias("c")).collect()
    )
    offsets, acc = [], 0
    for pid, c in counts:
        offsets.append((pid, acc))
        acc += c
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off bigint")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        stamped.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("bigint"))
        .drop("_pid", "_rn", "_off")
    )
