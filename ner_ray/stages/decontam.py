"""Benchmark decontamination: flag corpus documents that share a word
n-gram with an evaluation/benchmark set.

The standard training-data hygiene step (GPT-3 Appendix C / Llama-style
"13-gram overlap" filtering): any document whose text contains an n-gram
that also occurs in a held-out benchmark is contaminated and must be
dropped (or at least flagged) before training.  Reference repo has no
equivalent (confirmed-by-absence, SURVEY §2 Part B preamble); this is one
of the beyond-reference LLM-pipeline operators the engine adds.

Scale shape
-----------
The benchmark side is *small by nature* (eval sets are thousands of docs
against a 100 TB corpus), so the default path builds the benchmark's
distinct-shingle set with per-block partials (set-union mergeable — the
Bloom/HLL partial pattern), collects it ONCE on the driver, and broadcasts
it via ``ray.put``; the corpus pass is then a stateless ``map_batches``
with zero shuffle.  Like every driver fast path in this engine the
collect is gated by a count threshold: above ``driver_threshold`` distinct
benchmark shingles the operator falls back to a fully distributed plan —
corpus docs explode to distinct ``(doc_id, shingle)`` rows, hash-join
against the distinct benchmark shingles, and a ``groupby(doc_id).count()``
yields the hit count (the join + one narrow shuffle; nothing
document-sized moves, only shingle rows).  Both paths are equality-gated
by pytest (tests/test_round3b.py) — the minhash/canonicalize hybrid
discipline.

Tokenization is the corpus-analytics idiom shared with q43/q44:
``[a-z0-9]+`` over ``lower(text)`` (DuckDB twin:
``regexp_extract_all(lower(text), '[a-z0-9]+')``).
"""

from __future__ import annotations

import re

import pyarrow as pa
from ray.data import Dataset

TOKEN_RE = re.compile(r"[a-z0-9]+")  # = queries._TFIDF_TOKEN / SQL twin idiom


def _doc_shingles(text: str | None, n: int) -> set[str]:
    """Distinct space-joined word n-grams of one document (empty for null
    text or docs shorter than ``n`` tokens — mirrors the twin's empty
    list-comprehension range)."""
    if text is None:
        return set()
    toks = TOKEN_RE.findall(text.lower())
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def benchmark_shingles(benchmark: Dataset, n: int, text_col: str = "text") -> Dataset:
    """Distinct shingles of the benchmark set as a 1-column Dataset.

    Per-block set-union partials, then one narrow ``groupby`` over shingle
    strings to make them globally distinct — only shingles (tens of bytes)
    ever move, never documents."""

    def block_distinct(t: pa.Table) -> pa.Table:
        s: set[str] = set()
        for x in t[text_col].to_pylist():
            s |= _doc_shingles(x, n)
        return pa.table({"shingle": pa.array(sorted(s), pa.string())})

    return (
        benchmark.map_batches(block_distinct, batch_format="pyarrow")
        .groupby("shingle")
        .count()
        .select_columns(["shingle"])
    )


def decontaminate(
    corpus: Dataset,
    benchmark: Dataset,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    driver_threshold: int = 2_000_000,
) -> Dataset:
    """``(doc_id, n_hits)`` for every corpus document sharing at least one
    distinct word ``n``-gram with the benchmark set.

    ``n_hits`` counts the document's DISTINCT contaminated shingles (the
    quantity the GPT-3-style filters threshold on).  Clean documents emit
    no row — the caller anti-joins on ``doc_id`` to drop contaminated docs,
    which keeps this operator's output tiny at corpus scale.
    """
    bench = benchmark_shingles(benchmark, n, text_col=text_col)
    n_bench = bench.count()

    if n_bench <= driver_threshold:
        import ray as _ray

        bset = frozenset(
            bench.to_pandas()["shingle"].to_list()
        )  # <= threshold rows by construction
        ref = _ray.put(bset)

        def score(t: pa.Table) -> pa.Table:
            bs = _ray.get(ref)
            ids, hits = [], []
            for i, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
                k = len(_doc_shingles(x, n) & bs)
                if k:
                    ids.append(i)
                    hits.append(k)
            return pa.table(
                {id_col: pa.array(ids, pa.int64()), "n_hits": pa.array(hits, pa.int64())}
            )

        return corpus.map_batches(score, batch_format="pyarrow")

    # distributed fallback: explode per-doc distinct shingles, join, count
    from ray.data.aggregate import Count

    from ner_ray.stages.joins import hash_join

    def explode(t: pa.Table) -> pa.Table:
        ids, sh = [], []
        for i, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            for s in _doc_shingles(x, n):
                ids.append(i)
                sh.append(s)
        return pa.table(
            {id_col: pa.array(ids, pa.int64()), "shingle": pa.array(sh, pa.string())}
        )

    pairs = corpus.map_batches(explode, batch_format="pyarrow")
    joined = hash_join(
        pairs,
        bench,
        on="shingle",
        left_schema=pa.schema([(id_col, pa.int64()), ("shingle", pa.string())]),
        right_schema=pa.schema([("shingle", pa.string())]),
    )
    # (doc_id, shingle) rows are distinct per doc and bench shingles are
    # globally distinct, so a plain count is the distinct-hit count
    return (
        joined.groupby(id_col)
        .aggregate(Count(alias_name="n_hits"))
        .select_columns([id_col, "n_hits"])
    )
