"""Bucketed-layout shuffle elimination: the co-located join plan must have
ZERO Exchange operators (the write amortized the shuffle), and its results
must equal the plain shuffled join."""

from __future__ import annotations

import pyspark.sql.functions as F

from mxsparkg.layout import bucketed_join, save_bucketed

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_eliminates_exchange(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    embs = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), F.size("embedding").alias("dim")
    )
    save_bucketed(docs, "b_docs", "doc_id", n_buckets=8)
    save_bucketed(embs, "b_embs", "doc_id", n_buckets=8)
    try:
        joined = bucketed_join(spark, "b_docs", "b_embs", "doc_id",
                               merge_hint=True)
        joined.collect()  # materialize so executedPlan is final (AQE)
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan, plan
        # same results as the shuffled path
        plain = docs.join(embs, "doc_id")
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
        # and the same SMJ over plain parquet DOES shuffle — the assertion
        # above is not vacuously true of any merge join at this size
        plain_smj = docs.hint("merge").join(embs.hint("merge"), "doc_id")
        plain_smj.collect()
        assert "ShuffleExchange" in _plan(plain_smj).replace(
            "Exchange hashpartitioning", "ShuffleExchange hashpartitioning"
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_embs")


def test_bucketed_agg_also_skips_exchange(spark):
    """Pre-bucketing serves aggregation too: groupBy on the bucket key
    reuses the write-time partitioning instead of shuffling."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    save_bucketed(docs, "b_docs_agg", "doc_id", n_buckets=8)
    try:
        agg = (
            spark.table("b_docs_agg")
            .groupBy("doc_id")
            .agg(F.sum("n_chars").alias("c"))
        )
        agg.collect()
        assert "Exchange" not in _plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_docs_agg")
