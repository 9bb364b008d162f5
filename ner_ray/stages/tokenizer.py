"""BPE tokenizer as Ray Data stages: distributed word counting feeding the
vocabulary-sized driver merge loop, then an actor-pool encoder.

See functions/bpe.py for the algorithm and the scale rationale (corpus-sized
work distributed, vocabulary-sized work on the driver, bounded + determinized
by frequency truncation).
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

from ner_ray.functions.bpe import TOKEN_RE, train_merges, word_pieces
from ner_ray.utils import pool_size


def bpe_word_counts(
    ds: Dataset, text_col: str = "text", max_vocab_words: int = 200_000
) -> dict[str, int]:
    """Corpus word counts, distributed: per-block Counter partials ->
    ``groupby(word)`` sum -> top-``max_vocab_words`` by (count desc, word
    asc).  The collect is bounded by the truncation, never corpus-sized;
    the (count, word) tie-break makes the kept set deterministic."""

    def block_counts(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter[str] = Counter()
        for x in t[text_col].to_pylist():
            c.update(TOKEN_RE.findall((x or "").lower()))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "count": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(block_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("count", alias_name="count"))
        .sort(["count", "word"], descending=[True, False])
        .limit(max_vocab_words)
        .to_pandas()
    )
    return dict(zip(counts["word"], counts["count"].astype(int)))


def bpe_train(
    ds: Dataset,
    n_merges: int,
    text_col: str = "text",
    max_vocab_words: int = 200_000,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges over a corpus Dataset."""
    return train_merges(bpe_word_counts(ds, text_col, max_vocab_words), n_merges)


class BpeEncoder:
    """Actor-pool BPE encoder: merge ranks built once per actor in
    ``__init__`` (passed BY VALUE — small, and ObjectRef constructor args
    break actor restarts, ray#53727), per-word memo for the Zipf head.
    Emits per-doc token statistics."""

    def __init__(self, merges: list[tuple[str, str]], id_col: str, text_col: str):
        # JSON-roundtripped merges arrive as lists; ranks need tuples
        self._ranks = {tuple(p): i for i, p in enumerate(merges)}
        self._memo: dict[str, int] = {}
        self._id, self._text = id_col, text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import math

        n_words, n_pieces = [], []
        for x in t[self._text].to_pylist():
            words = TOKEN_RE.findall((x or "").lower())
            total = 0
            for w in words:
                n = self._memo.get(w)
                if n is None:
                    n = len(word_pieces(w, self._ranks))
                    self._memo[w] = n
                total += n
            n_words.append(len(words))
            n_pieces.append(total)
        ppw = [
            math.floor(p * 1000000 / w + 0.5) if w else 0
            for p, w in zip(n_pieces, n_words)
        ]
        return pa.table(
            {
                self._id: t[self._id],
                "n_words": pa.array(n_words, pa.int64()),
                "n_pieces": pa.array(n_pieces, pa.int64()),
                "pieces_per_word_micro": pa.array(ppw, pa.int64()),
            }
        )


def bpe_tokenize(
    ds: Dataset,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Apply trained merges corpus-wide (actor pool, stats per doc)."""
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={"merges": merges, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=pool_size(),
    )
