"""BIO tag-sequence <-> span folding (reference E1 semantics, SURVEY.md §2).

Re-implements the semantics of the reference's ``utils.get_entity`` /
``get_PER_entity`` family (reference ``utils.py:~20-100`` (R), reconstructed):
scan a BIO tag sequence aligned with a char sequence and fold maximal spans.

Pinned edge-case semantics (FIXTURES.md §2; the reference mount was empty so
these are our frozen, documented decisions — SURVEY.md §0):

- ``B-X`` always opens a new span (closing any open span, including an
  adjacent same-type span: ``B-PER I-PER B-PER`` -> two PER spans).
- ``I-X`` extends an open span **of the same type**; an orphan ``I-X`` (no
  open span, or an open span of a different type) OPENS a new span of type X
  (lenient convention; deterministic).
- Any other tag (``O`` or malformed) closes the open span.
- A span still open at sequence end is emitted (span-closed-at-end case).

Spans carry [start, end) char offsets so mentions are locatable in the turn.
"""

from __future__ import annotations

from ner_ray.schemas import TAG2LABEL

Span = tuple[str, str, int, int]  # (surface, type, start, end_exclusive)


def fold_bio(chars: list[str], tags: list[str]) -> list[Span]:
    """Fold an aligned (chars, tags) pair into typed spans."""
    spans: list[Span] = []
    open_type: str | None = None
    start = 0
    for i, tag in enumerate(tags):
        if tag.startswith("B-"):
            if open_type is not None:
                spans.append(("".join(chars[start:i]), open_type, start, i))
            open_type = tag[2:]
            start = i
        elif tag.startswith("I-"):
            t = tag[2:]
            if open_type != t:
                if open_type is not None:
                    spans.append(("".join(chars[start:i]), open_type, start, i))
                open_type = t  # orphan I-X opens a span
                start = i
        else:
            if open_type is not None:
                spans.append(("".join(chars[start:i]), open_type, start, i))
                open_type = None
    if open_type is not None:
        spans.append(("".join(chars[start:]), open_type, start, len(tags)))
    return spans


def spans_to_bio(length: int, spans: list[tuple[int, int, str]]) -> list[str]:
    """Inverse: [start,end) typed spans -> BIO tags (for fixtures/goldens)."""
    tags = ["O"] * length
    for start, end, typ in spans:
        if start < 0 or end > length or start >= end:
            raise ValueError(f"bad span ({start},{end}) for length {length}")
        tags[start] = f"B-{typ}"
        for i in range(start + 1, end):
            tags[i] = f"I-{typ}"
    return tags


def validate_tags(tags: list[str]) -> None:
    for t in tags:
        if t not in TAG2LABEL:
            raise ValueError(f"unknown tag {t!r}")
