"""P2 — distributed vocabulary build (reference ``vocab_build`` semantics).

Reference (``data.py:~40-75`` (R), SURVEY.md §2 P2): count every normalized
char over the corpus, prune chars with count < ``min_count`` (specials are
never pruned), assign contiguous ids with ``<PAD>`` = 0 and ``<UNK>`` last.

Ray-Data-first shape: the count is **pre-aggregated inside map_batches** (one
(char, partial_count) row per distinct char per block) before the global
``groupby().sum()`` shuffle, so the all-to-all exchange moves at most
|alphabet| rows per block instead of one row per character of the corpus —
the combiner pattern the 100 TB design requires.  The finalize step is
driver-side because a vocabulary is small by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ner_ray.functions.normalize import ENG, NUM, PAD, SPECIALS, UNK, normalize_char


def build_vocab(ds: Dataset, text_col: str = "text", min_count: int = 1) -> dict[str, int]:
    """Distributed char-count vocab over a text column."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in batch[text_col].to_pylist():
            if text is None:
                continue
            for ch in text:
                c = normalize_char(ch)
                counts[c] = counts.get(c, 0) + 1
        return pa.table(
            {
                "char": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("char")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # |alphabet| rows — safe to materialize
    )
    return finalize_vocab(dict(zip(agg["char"], agg["n"])), min_count=min_count)


def finalize_vocab(counts: dict[str, int], min_count: int = 1) -> dict[str, int]:
    """Deterministic id assignment (reference semantics; order pinned by
    (count desc, char) so the build is reproducible across runs/shardings)."""
    kept = [
        c
        for c, n in counts.items()
        if c not in SPECIALS and (n >= min_count or c in (NUM, ENG))
    ]
    kept.sort(key=lambda c: (-counts[c], c))
    word2id = {PAD: 0}
    for c in kept:
        word2id[c] = len(word2id)
    for s in (NUM, ENG):
        if s not in word2id:
            word2id[s] = len(word2id)
    word2id[UNK] = len(word2id)
    return word2id


def vocab_codepoint_arrays(word2id: dict[str, int]) -> tuple[np.ndarray, np.ndarray]:
    """(sorted codepoints, ids) arrays for vectorized lookup of 1-char keys."""
    cps, ids = [], []
    for ch, i in word2id.items():
        if len(ch) == 1:
            cps.append(ord(ch))
            ids.append(i)
    order = np.argsort(cps)
    return np.asarray(cps, dtype=np.int64)[order], np.asarray(ids, dtype=np.int64)[order]
