"""Guards for planted-row-id constants: planted synthetic ids (dedup /
redact / decontam non-vacuity plants) must never alias a REAL row id at ANY
shipped fixture scale, or the dedup decision conflates two different rows.

Regression for the r3 advice finding: SEMDEDUP_PLANT_OFFSET was 1000 while
sf0.1 embeddings carry vec_id up to 1999 — planted ids 1000-1024 aliased
real vectors, invisible at the sf0.001/sf0.01 gate scales. This test runs
at every SF present on disk so a future bigger fixture fails loudly here
instead of silently corrupting dedup_semantic's drop set.
"""
import os

import pytest

from mxsparkg.datapipe import SEMDEDUP_PLANT_OFFSET, MINHASH_PLANT_OFFSET

SF_DIRS = [
    d for d in (
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ) if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_semdedup_plant_offset_above_all_vec_ids(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    max_id = emb.agg({"vec_id": "max"}).head()[0]
    assert max_id < SEMDEDUP_PLANT_OFFSET, (
        f"{sf_dir}: max vec_id {max_id} >= SEMDEDUP_PLANT_OFFSET "
        f"{SEMDEDUP_PLANT_OFFSET} — planted ids would alias real vectors"
    )
    # the planted block itself must also stay clear of a *second* plant
    assert max_id + SEMDEDUP_PLANT_OFFSET < 2 * SEMDEDUP_PLANT_OFFSET


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_doc_plant_offset_above_all_doc_ids(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    max_id = docs.agg({"doc_id": "max"}).head()[0]
    assert max_id < MINHASH_PLANT_OFFSET, (
        f"{sf_dir}: max doc_id {max_id} >= doc plant offset"
    )
