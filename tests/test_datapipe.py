"""Training-data pipeline ops: near-dup detection on planted duplicates,
LSH recall, text analysis sanity. The DuckDB value-equality of every op is
covered by tools/check_contract.py; these tests check the *semantics* the
oracle can't (does MinHash actually find near-dups?)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mxsparkg.datapipe import (
    ann_lsh_bucket,
    ann_topk_cosine,
    dedup_exact,
    minhash_candidate_pairs,
    minhash_signatures,
    mm_decode_stub,
    txt_langid,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted(spark):
    """12 docs: 0/1 near-identical (one token changed), 2/3 identical,
    rest unrelated word salads (deterministic)."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    near = base.replace("theta", "THETA2")
    rows = [
        (0, base), (1, near), (2, "copy copy " + base), (3, "copy copy " + base),
    ]
    words = base.split()
    for i in range(4, 12):
        # interleave doc-unique tokens so no 3-gram is shared across docs
        salad = " ".join(
            f"{words[(i * 7 + j * 3) % len(words)]} w{i}_{j}"
            for j in range(20)
        )
        rows.append((i, f"unrelated{i} {salad} tail{i}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_planted_near_dups(planted):
    sig = minhash_signatures(planted)
    pairs = minhash_candidate_pairs(sig, min_est_jaccard=0.5)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert (0, 1) in got       # near-identical pair recalled
    assert (2, 3) in got       # exact pair recalled
    # unrelated docs don't collide at est>=0.5
    assert all(a < 4 and b < 4 for a, b in got)


def test_minhash_exact_dup_full_signature_match(planted):
    sig = {r.doc_id: tuple(r[f"s{i}"] for i in range(8))
           for r in minhash_signatures(planted).collect()}
    assert sig[2] == sig[3]
    assert sig[0] != sig[4]


def test_dedup_exact_groups(spark, planted):
    import mxsparkg.datapipe as dp
    orig = dp._docs
    try:
        dp._docs = lambda s, sf: planted
        out = {r.keep_doc_id: r.n_copies for r in dedup_exact(spark, "").collect()}
    finally:
        dp._docs = orig
    assert out[2] == 2          # identical pair collapsed
    assert out[0] == 1 and out[1] == 1


def test_ann_topk_self_excluded_and_sorted(spark):
    rows = ann_topk_cosine(spark, SF).collect()
    assert len(rows) == 50
    by_q = {}
    for r in rows:
        assert r.vec_id != r.q_id
        by_q.setdefault(r.q_id, []).append((r.rank, r.cosine))
    for q, rk in by_q.items():
        rk.sort()
        cosines = [c for _, c in rk]
        assert cosines == sorted(cosines, reverse=True)
        assert [r for r, _ in rk] == list(range(1, 11))


def test_lsh_bucket_deterministic(spark):
    a = {(r.vec_id, r.bucket) for r in ann_lsh_bucket(spark, SF).collect()}
    b = {(r.vec_id, r.bucket) for r in ann_lsh_bucket(spark, SF).collect()}
    assert a == b
    assert all(len(bk) == 8 and set(bk) <= {"0", "1"} for _, bk in a)


def test_ivf_probe_recall_vs_bruteforce(spark):
    """IVF with 4/16 probes must recover a meaningful fraction of the
    brute-force top-10 (plumbing check; on random vectors recall ≈ the
    probed corpus fraction, far above zero)."""
    from mxsparkg.datapipe import ann_ivf_topk

    brute = {(r.q_id, r.vec_id) for r in ann_topk_cosine(spark, SF).collect()}
    ivf = {(r.q_id, r.vec_id) for r in ann_ivf_topk(spark, SF).collect()}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.15
    # every IVF hit must be a real vector pair, self excluded
    assert all(q != v for q, v in ivf)


def test_langid_prefers_en_on_en_salad(spark):
    rows = txt_langid(spark, SF).collect()
    # driver docs contain 'the'/'a' from the shared vocab → en or und
    assert all(r.pred_lang in ("en", "und", "fr", "es", "de") for r in rows)
    assert sum(r.pred_lang == "en" for r in rows) > len(rows) * 0.5


def test_mm_decode_stub_schema_and_determinism(spark):
    rows = mm_decode_stub(spark, SF).collect()
    assert len(rows) == 500
    for r in rows[:20]:
        assert r.media_type == {0: "image", 1: "audio", 2: "video"}[r.doc_id % 3]
        assert r.width == 160 + (r.n_bytes % 8) * 80
        assert (r.n_frames == 1) == (r.media_type != "video") or r.n_bytes % 24 == 0
