"""Char/surface normalization (reference P1 semantics, SURVEY.md §2).

``normalize_char`` reproduces the reference's ``sentence2id`` preprocessing
(reference ``data.py:~78-92`` (R), reconstructed): every digit char maps to
``<NUM>``, every ASCII letter to ``<ENG>``, everything else passes through;
unknown chars fall back to ``<UNK>`` at vocab-lookup time.  This must be
bit-stable: the per-turn text-equality invariant (BASELINE.json input_hint)
is checked against it.

``normalize_surface`` is the engine-side key used for canonicalization
grouping (B6): casefold, strip, collapse internal whitespace, drop trailing
punctuation — so "Acme Corp" and "ACME corp." share a surface-form key.
"""

from __future__ import annotations

import re

PAD = "<PAD>"
UNK = "<UNK>"
NUM = "<NUM>"
ENG = "<ENG>"
SPECIALS = (PAD, UNK, NUM, ENG)

_WS = re.compile(r"\s+")
_TRAIL_PUNCT = re.compile(r"[\.\,\;\:\!\?]+$")


def normalize_char(ch: str) -> str:
    """Reference P1: digit -> <NUM>, ASCII letter -> <ENG>, else identity.

    Mirrors the reference's explicit ``'A' <= c <= 'Z'`` /
    ``'a' <= c <= 'z'`` ASCII-letter check and ``str.isdigit()``
    digit check (so full-width unicode digits also map to <NUM>, as in the
    reference).
    """
    if ch.isdigit():
        return NUM
    if ("A" <= ch <= "Z") or ("a" <= ch <= "z"):
        return ENG
    return ch


def normalize_chars(text: str) -> list[str]:
    """Per-char normalized sequence for a turn (tagger input ids source)."""
    return [normalize_char(c) for c in text]


def chars_to_ids(chars: list[str], word2id: dict[str, int]) -> list[int]:
    """Vocab lookup with <UNK> fallback, after P1 normalization."""
    unk = word2id[UNK]
    return [word2id.get(normalize_char(c), unk) for c in chars]


def normalize_surface(surface: str) -> str:
    """Surface-form key for canonicalization grouping (B6)."""
    s = _WS.sub(" ", surface.strip())
    s = _TRAIL_PUNCT.sub("", s)
    return s.casefold()
