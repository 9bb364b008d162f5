"""Fixed gazetteer of planted entity surfaces (FIXTURES.md §1).

The synthetic transcript generator plants these surfaces at known offsets, so
golden mentions are known by construction.  The rule tagger (the pinned
stand-in for the reference NER predictions — SURVEY.md §0/§5.3) recognizes
exactly this gazetteer, giving a deterministic "reference output" for the
P/R >= 0.95 gate.

Includes a CJK subset to exercise char-level tagging like the reference's
Chinese corpora (reference data/example.train family, reconstructed).
"""

from __future__ import annotations

PER = (
    "Alice Chen",
    "Bob Okafor",
    "Carol Diaz",
    "Deng Wei",
    "Erik Larsen",
    "Fatima Noor",
    "张伟",
    "李娜",
)
LOC = (
    "Nanjing",
    "Oslo",
    "Cape Town",
    "Kyoto",
    "Lima",
    "南京",
    "北京",
)
ORG = (
    "Acme Corp",
    "NJU",
    "Globex",
    "Initech",
    "Wayne Enterprises",
    "南京大学",
)

SURFACE2TYPE: dict[str, str] = {}
for _s in PER:
    SURFACE2TYPE[_s] = "PER"
for _s in LOC:
    SURFACE2TYPE[_s] = "LOC"
for _s in ORG:
    SURFACE2TYPE[_s] = "ORG"

ALL_SURFACES = tuple(SURFACE2TYPE)

# Alias table for entity linking (FIXTURES.md §3): canonical entities with
# alternate surfaces, incl. near-duplicate forms that drive canonicalization
# merges and an ambiguous alias shared by two entities.
#   (entity_id, canonical, alias, type)
ALIASES: tuple[tuple[int, str, str, str], ...] = (
    (1, "Alice Chen", "Alice Chen", "PER"),
    (1, "Alice Chen", "A. Chen", "PER"),
    (2, "Bob Okafor", "Bob Okafor", "PER"),
    (2, "Bob Okafor", "B. Okafor", "PER"),
    (3, "Carol Diaz", "Carol Diaz", "PER"),
    (4, "Deng Wei", "Deng Wei", "PER"),
    (4, "Deng Wei", "张伟", "PER"),  # cross-script alias
    (5, "Erik Larsen", "Erik Larsen", "PER"),
    (6, "Fatima Noor", "Fatima Noor", "PER"),
    (7, "李娜", "李娜", "PER"),
    (10, "Nanjing", "Nanjing", "LOC"),
    (10, "Nanjing", "南京", "LOC"),
    (11, "Oslo", "Oslo", "LOC"),
    (12, "Cape Town", "Cape Town", "LOC"),
    (13, "Kyoto", "Kyoto", "LOC"),
    (14, "Lima", "Lima", "LOC"),
    (15, "北京", "北京", "LOC"),
    (20, "Acme Corp", "Acme Corp", "ORG"),
    (20, "Acme Corp", "ACME corp.", "ORG"),
    (21, "NJU", "NJU", "ORG"),
    (21, "NJU", "南京大学", "ORG"),
    # Ambiguous alias: "Lima" is also an ORG nickname -> cosine disambiguates.
    (22, "Lima Systems", "Lima", "ORG"),
    (23, "Globex", "Globex", "ORG"),
    (24, "Initech", "Initech", "ORG"),
    (25, "Wayne Enterprises", "Wayne Enterprises", "ORG"),
)
