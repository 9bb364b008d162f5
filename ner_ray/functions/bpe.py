"""Byte-pair-encoding tokenizer: distributed word counting, classic merge
training, actor-pool application.

Public-knowledge algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units"; the reference engine has no
tokenizer-training equivalent — beyond-reference LLM-pipeline operator).

Scale shape
-----------
Training has two parts with very different sizes:

* **Word counting is corpus-sized** and runs distributed: per-block word
  count partials (``map_batches``) folded by one ``groupby(word)`` — only
  ``(word, count)`` rows ever shuffle, never documents.
* **The merge loop is vocabulary-sized** and runs on the driver over the
  collected word-count dict — the standard implementation shape (the corpus
  never participates in a merge round; HuggingFace `tokenizers` trains the
  same way).  Distinct-word counts grow sublinearly (Heaps' law) but are
  unbounded in principle, so the collect is gated by ``max_vocab_words``:
  the top-N words by (count, word) are kept, which for BPE is the standard
  frequency-truncation used before training and keeps the driver load
  bounded and DETERMINISTIC (ties broken by word).

Application broadcasts the learned merge ranks once and encodes inside an
actor pool with a per-actor word→pieces memo (the WordPiece stage's memo
pattern, ``stages/tagger.py``): Zipf's law makes the memo hit rate extreme,
so per-word cost amortizes to a dict lookup.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"[a-z0-9]+")  # the corpus-analytics idiom
END = "</w>"


def word_pieces(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with trained merge ranks (greedy lowest-rank-first,
    the canonical BPE apply loop)."""
    pieces = list(word) + [END]
    while len(pieces) > 1:
        best, best_rank = None, None
        for i in range(len(pieces) - 1):
            r = ranks.get((pieces[i], pieces[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        pieces = pieces[:best] + [pieces[best] + pieces[best + 1]] + pieces[best + 2 :]
    return pieces


def train_merges(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training over a word-count dict: repeatedly merge the
    most frequent adjacent pair.  Ties break by pair lexicographic order so
    training is deterministic under any dict ordering."""
    splits = {w: list(w) + [END] for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, pieces in splits.items():
            c = word_counts[w]
            for i in range(len(pieces) - 1):
                p = (pieces[i], pieces[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for w, pieces in splits.items():
            i, out = 0, []
            while i < len(pieces):
                if (
                    i + 1 < len(pieces)
                    and pieces[i] == best[0]
                    and pieces[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            splits[w] = out
    return merges


def encode_reference(text: str | None, merges: list[tuple[str, str]]) -> list[str]:
    """Single-process reference encoder (tests compare the distributed
    actor-pool stage against this)."""
    ranks = {p: i for i, p in enumerate(merges)}
    out: list[str] = []
    for w in TOKEN_RE.findall((text or "").lower()):
        out.extend(word_pieces(w, ranks))
    return out
