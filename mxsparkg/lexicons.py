"""Built-in lexicons for mXS-style token generalization.

mXS generalizes surface tokens through a hierarchy: surface → lowercase →
lexicon categories (first-name lists, toponyms, trigger words) → shape
classes (reconstructed from mXS's published papers; reference checkout empty,
SURVEY.md §0). These lists are small, seeded, and self-contained — no
external downloads. They double as the vocabulary for the fixture generator,
so mined rules transfer between training and tagging fixtures.

Categories emitted (uppercase items, disjoint from lowercased surfaces):
  FIRSTNAME  — given names (fr + en)
  SURNAME    — family names used by the fixture grammar
  TOPONYM    — city/country names
  ORGWORD    — organization head-words / suffixes
  FUNCWORD   — titles/functions preceding persons (président, docteur, ...)
  PREDWORD   — verbs/prepositions used by predicate patterns
"""

from __future__ import annotations

FIRSTNAMES = [
    "jean", "marie", "pierre", "claire", "luc", "anne", "paul", "julie",
    "marc", "sophie", "louis", "emma", "hugo", "alice", "victor", "nina",
    "john", "mary", "peter", "susan", "david", "laura", "james", "karen",
    "robert", "linda", "michael", "sarah", "thomas", "julia",
]

SURNAMES = [
    "martin", "bernard", "dubois", "moreau", "laurent", "simon", "michel",
    "garcia", "roux", "fournier", "smith", "johnson", "brown", "wilson",
    "taylor", "clark", "lewis", "walker", "hall", "young",
]

TOPONYMS = [
    "paris", "lyon", "marseille", "toulouse", "nantes", "lille", "bordeaux",
    "strasbourg", "rennes", "grenoble", "london", "berlin", "madrid", "rome",
    "geneva", "brussels", "vienna", "dublin", "lisbon", "amsterdam",
    "france", "germany", "spain", "italy", "belgium",
]

ORGWORDS = [
    "société", "institut", "université", "banque", "groupe", "agence",
    "ministère", "laboratoire", "fondation", "compagnie", "company",
    "institute", "university", "bank", "group", "agency", "ministry",
    "laboratory", "foundation", "corporation",
]

FUNCWORDS = [
    "président", "présidente", "ministre", "directeur", "directrice",
    "docteur", "professeur", "monsieur", "madame", "général", "sénateur",
    "president", "minister", "director", "doctor", "professor", "mister",
    "senator", "chairman",
]

PREDWORDS = [
    "travaille", "dirige", "visite", "rencontre", "fonde", "rejoint",
    "basée", "située", "installée", "works", "leads", "visits", "meets",
    "founded", "joins", "based", "located", "pour", "chez", "for", "at", "à",
    "in", "en",
]

_CATEGORIES = {
    "FIRSTNAME": FIRSTNAMES,
    "SURNAME": SURNAMES,
    "TOPONYM": TOPONYMS,
    "ORGWORD": ORGWORDS,
    "FUNCWORD": FUNCWORDS,
    "PREDWORD": PREDWORDS,
}


def build_lexicons() -> dict[str, list[str]]:
    """word(lower) → sorted list of category items. Deterministic."""
    out: dict[str, list[str]] = {}
    for cat, words in sorted(_CATEGORIES.items()):
        for w in words:
            out.setdefault(w, [])
            if cat not in out[w]:
                out[w].append(cat)
    for w in out:
        out[w] = sorted(out[w])
    return out
