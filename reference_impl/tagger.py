"""Single-node, dependency-free reference pipeline (the oracle).

The reference checkout at /root/reference was EMPTY (SURVEY.md §0), so this
module IS the reference the Spark pipeline is validated against (north_rule:
triple P/R ≥ 0.95 vs reference). It is a small, slow, obviously-correct
pure-Python implementation of the mXS-style algorithm: extract → tokenize →
generalize → trie rule matching → conflict resolution → predicate pairing →
dictionary linking → alias canonicalization → triples.

It deliberately shares mxsparkg.textcore so the byte-identity invariant
(extracted text per url) holds by construction.
"""

from __future__ import annotations

from mxsparkg import textcore
from mxsparkg.lexicons import build_lexicons
from mxsparkg.model import DEFAULT_RULES, PREDICATE_PATTERNS


def canon_from_aliases(alias_pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find over alias-cluster pairs; canon = min id of the component.

    Same semantics as mxsparkg.graph.connected_components (component-min),
    so the single-node oracle and the Spark CC agree by definition.
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in alias_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def link_surface(surface_norm: str, dictionary: dict[str, list[tuple[str, float]]]) -> str:
    """Dictionary linking: best prior wins; NIL id for unknown surfaces."""
    cands = dictionary.get(surface_norm)
    if not cands:
        return "nil:" + textcore.sha2_text(surface_norm)[:16]
    return max(cands, key=lambda c: (c[1], c[0]))[0]


def link_surface_ctx(
    surface_norm: str,
    ctx_tokens: list[str],
    dictionary: dict[str, list[tuple[str, float, list[str]]]],
    context_weight: float = 1.0,
) -> tuple[str, float]:
    """Context-aware linking (U4 oracle): score = prior + w × overlap where
    overlap = |distinct ctx ∩ context_words| / max(|context_words|, 1).
    Mirrors mxsparkg.link.link_mentions (array_intersect is distinct-based);
    tie-break (score, entity_id) max — identical to the W1 window order."""
    cands = dictionary.get(surface_norm)
    if not cands:
        return "nil:" + textcore.sha2_text(surface_norm)[:16], 0.0
    ctx = set(ctx_tokens)

    def score(c):
        _id, prior, cw = c
        ov = len(ctx & set(cw)) / max(len(cw), 1)
        return prior + context_weight * ov

    best = max(cands, key=lambda c: (score(c), c[0]))
    return best[0], score(best)


def run_reference(
    pages: list[dict],
    rules: list[dict] | None = None,
    pred_patterns: list[dict] | None = None,
    dictionary: dict[str, list[tuple[str, float]]] | None = None,
    canon_map: dict[str, str] | None = None,
) -> dict[str, list[dict]]:
    """pages: [{url, html(bytes) or text, lang}] → {mentions, triples}.

    Triples carry canonical entity ids when dictionary/canon_map given,
    else normalized surfaces.
    """
    lex = build_lexicons()
    trie = textcore.build_trie(rules or DEFAULT_RULES)
    preds = pred_patterns or PREDICATE_PATTERNS
    dictionary = dictionary or {}
    canon_map = canon_map or {}

    all_mentions: list[dict] = []
    all_triples: list[dict] = []
    for page in pages:
        url = page["url"]
        text = page.get("text")
        if text is None:
            text = textcore.pinned_extract(page["html"])
        mentions, triples = textcore.tag_text(text, trie, lex, preds)
        for m in mentions:
            m = dict(m, url=url)
            all_mentions.append(m)
        for t in triples:
            subj = link_surface(t["subj"], dictionary) if dictionary else t["subj"]
            obj = link_surface(t["obj"], dictionary) if dictionary else t["obj"]
            all_triples.append({
                "subj": canon_map.get(subj, subj),
                "pred": t["pred"],
                "obj": canon_map.get(obj, obj),
                "url": url,
                "conf": t["conf"],
            })
    return {"mentions": all_mentions, "triples": all_triples}


def triple_prf(pred: set[tuple], gold: set[tuple]) -> tuple[float, float, float]:
    if not pred or not gold:
        return 0.0, 0.0, 0.0
    tp = len(pred & gold)
    p = tp / len(pred)
    r = tp / len(gold)
    f = 2 * p * r / (p + r) if (p + r) else 0.0
    return p, r, f
