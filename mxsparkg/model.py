"""Default transduction-rule model + predicate patterns.

A rule is an mXS-style transduction pattern: a sequence of generalization
items with one <etype>…</etype> marker pair (markers are sequence items —
the core mXS representation, see SURVEY.md §1.1). This hand-written set is
the v0 model; mining.py learns an equivalent set from the annotated fixture
corpus with PrefixSpan and must subsume it (tested in tests/test_mining.py).
"""

from __future__ import annotations

DEFAULT_RULES: list[dict] = [
    # persons
    {"pattern": ["FUNCWORD", "<pers>", "FIRSTNAME", "SURNAME", "</pers>"],
     "etype": "pers", "score": 4.0, "rule_id": 1},
    {"pattern": ["FUNCWORD", "<pers>", "SURNAME", "</pers>"],
     "etype": "pers", "score": 3.0, "rule_id": 2},
    {"pattern": ["<pers>", "FIRSTNAME", "SURNAME", "</pers>"],
     "etype": "pers", "score": 2.5, "rule_id": 3},
    # organizations ("société Axiom", "the Boreal institute" → head word + name)
    {"pattern": ["<org>", "ORGWORD", "Xxx", "</org>"],
     "etype": "org", "score": 2.0, "rule_id": 4},
    {"pattern": ["<org>", "Xxx", "ORGWORD", "</org>"],
     "etype": "org", "score": 2.0, "rule_id": 5},
    # locations
    {"pattern": ["<loc>", "TOPONYM", "</loc>"],
     "etype": "loc", "score": 1.5, "rule_id": 6},
    # functions/titles (standalone, lower priority than pers context use)
    {"pattern": ["<func>", "FUNCWORD", "</func>"],
     "etype": "func", "score": 0.5, "rule_id": 7},
]

PREDICATE_PATTERNS: list[dict] = [
    {"pred": "works_for", "pattern": ["<pers>", "travaille", "pour", "la", "<org>"]},
    {"pred": "works_for", "pattern": ["<pers>", "travaille", "pour", "<org>"]},
    {"pred": "works_for", "pattern": ["<pers>", "works", "for", "the", "<org>"]},
    {"pred": "works_for", "pattern": ["<pers>", "works", "for", "<org>"]},
    {"pred": "leads", "pattern": ["<pers>", "dirige", "la", "<org>"]},
    {"pred": "leads", "pattern": ["<pers>", "dirige", "<org>"]},
    {"pred": "leads", "pattern": ["<pers>", "leads", "the", "<org>"]},
    {"pred": "leads", "pattern": ["<pers>", "leads", "<org>"]},
    {"pred": "visits", "pattern": ["<pers>", "visite", "<loc>"]},
    {"pred": "visits", "pattern": ["<pers>", "visits", "<loc>"]},
    {"pred": "meets", "pattern": ["<pers>", "rencontre", "<pers>"]},
    {"pred": "meets", "pattern": ["<pers>", "meets", "<pers>"]},
    {"pred": "based_in", "pattern": ["<org>", "est", "basée", "à", "<loc>"]},
    {"pred": "based_in", "pattern": ["<org>", "is", "based", "in", "<loc>"]},
]
