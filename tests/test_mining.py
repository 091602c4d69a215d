"""M1/M2 mining: PrefixSpan → contiguous recount → scored rules, validated
by tagging the annotated fixture corpus with the MINED model and scoring
span P/R vs gold (north_rule: ≥0.95; achieved: 1.0). Slow-ish (PrefixSpan
is multi-pass) — one module-scoped mining run shared by all tests."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from fixtures.generate import ensure_fixtures
from mxsparkg.lexicons import build_lexicons
from mxsparkg.mining import (
    _count_contiguous,
    mine_rules,
    rules_to_model,
    sequences_df,
)
from mxsparkg.model import PREDICATE_PATTERNS
from mxsparkg.textcore import build_trie, parse_annotated, tag_text


@pytest.fixture(scope="module")
def fixture_dir():
    return ensure_fixtures("tiny")


@pytest.fixture(scope="module")
def mined_model(spark, fixture_dir):
    ann = spark.read.parquet(f"{fixture_dir}/annotated.parquet")
    rules = mine_rules(ann, min_support_frac=0.02, max_len=6)
    return rules_to_model(rules)


def test_count_contiguous_semantics():
    seq = [["a", "x"], ["<pers>"], ["b"], ["</pers>"], ["a", "x"]]
    assert _count_contiguous(seq, ["<pers>", "b", "</pers>"]) == 1
    assert _count_contiguous(seq, ["a", "<pers>", "b", "</pers>"]) == 1
    # gap (PrefixSpan-style) does NOT count as contiguous
    assert _count_contiguous(seq, ["a", "b"]) == 0
    # marker item only matches a marker element, not a token
    assert _count_contiguous(seq, ["<pers>", "<pers>"]) == 0
    assert _count_contiguous([["a"], ["a"]], ["a"]) == 2


def test_sequences_roundtrip(spark, fixture_dir):
    ann = spark.read.parquet(f"{fixture_dir}/annotated.parquet").limit(5)
    rows = sequences_df(ann).collect()
    assert len(rows) == 5
    for r in rows:
        flat = [x for cell in r.sequence for x in cell]
        opens = [x for x in flat if x.startswith("<") and not x.startswith("</")]
        closes = [x for x in flat if x.startswith("</")]
        assert len(opens) == len(closes)


def test_mined_rules_well_formed(mined_model):
    assert len(mined_model) > 50
    ids = [r["rule_id"] for r in mined_model]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    for r in mined_model:
        pat = r["pattern"]
        opens = [i for i, x in enumerate(pat)
                 if x.startswith("<") and not x.startswith("</")]
        closes = [i for i, x in enumerate(pat) if x.startswith("</")]
        assert len(opens) == 1 and len(closes) == 1
        assert closes[0] > opens[0] + 1
        assert pat[opens[0]] == f"<{r['etype']}>"
        assert pat[closes[0]] == f"</{r['etype']}>"


def test_mined_rules_subsume_core_default_patterns(mined_model):
    """The mined set must rediscover the load-bearing hand-written patterns
    (model.py promises subsumption): the core pers/org/loc transductions."""
    mined = {tuple(r["pattern"]) for r in mined_model}
    core = [
        ("<pers>", "FIRSTNAME", "SURNAME", "</pers>"),
        ("FUNCWORD", "<pers>", "SURNAME", "</pers>"),
        ("<org>", "ORGWORD", "Xxx", "</org>"),
        ("<org>", "Xxx", "ORGWORD", "</org>"),
        ("<loc>", "TOPONYM", "</loc>"),
    ]
    missing = [p for p in core
               if not any(set(p) <= set(m) and _subseq(p, m) for m in mined)]
    assert not missing, missing


def _subseq(small: tuple, big: tuple) -> bool:
    it = iter(big)
    return all(x in it for x in small)


def test_mined_model_tagger_parity(mined_model, fixture_dir):
    """north_rule: same entity spans/types as the gold annotation, P/R≥0.95
    (Etape/Ester2-style evaluation, SURVEY.md §5.1)."""
    lex = build_lexicons()
    trie = build_trie(mined_model)
    tbl = pq.read_table(f"{fixture_dir}/annotated.parquet").to_pylist()
    gold_tbl = pq.read_table(f"{fixture_dir}/gold_spans.parquet").to_pylist()
    gold = {(g["doc_id"], g["start"], g["end"], g["etype"]) for g in gold_tbl}
    pred = set()
    for row in tbl:
        clean, _ = parse_annotated(row["raw"])
        mentions, _ = tag_text(clean, trie, lex, PREDICATE_PATTERNS)
        for m in mentions:
            pred.add((row["doc_id"], m["m_start"], m["m_end"], m["etype"]))
    tp = len(pred & gold)
    precision, recall = tp / len(pred), tp / len(gold)
    assert precision >= 0.95
    assert recall >= 0.95


def test_guarded_collect_caps_model_size(spark):
    """Driver-OOM guard: model-sized collects probe the row count first and
    fail fast with an actionable error instead of collecting an unbounded
    candidate set (a pathological min_support would otherwise OOM the
    driver mid-collect)."""
    import pytest

    from mxsparkg.mining import guarded_collect

    df = spark.range(100).toDF("id")
    assert len(guarded_collect(df, "small model", max_rows=100)) == 100
    with pytest.raises(ValueError, match="small model"):
        guarded_collect(df, "small model", max_rows=99)
