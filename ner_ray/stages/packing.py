"""Sequence packing: bin documents into fixed token budgets for training.

LLM pre-training consumes fixed-length rows; feeding one short document per
row wastes the budget, so pipelines PACK documents: walk an ordered stream
and close the current bin when the next document would overflow it
(next-fit).  Each packed bin becomes one training row.

Distribution model — packing is order-dependent, so it cannot be a free
shuffle-anywhere op.  The unit of sequential work here is a *packing
domain*: ``(stratum, domain)`` where ``domain`` splits a stratum's documents
into contiguous id ranges.  Documents are hash-partitioned to their domain's
group (one ``groupby.map_groups`` shuffle), each group packs independently
in id order, and bin ids are globally unique by construction
(``{stratum}#{domain}#{seq}``).  With ``n_domains=1`` the result equals
global next-fit per stratum (what the DuckDB recursive-CTE twin checks);
at 100 TB you raise ``n_domains`` so every domain's group fits a worker —
bins never span domains, which changes *which* bins form but not the
packing contract (every bin ≤ budget unless a single oversize document
forms its own bin).

Cost shape: one shuffle of (id, stratum, n_tokens) — three narrow columns,
never the text — then a linear scan per group.  The per-document next-fit
scan is a Python loop over a numpy int array: next-fit is inherently a
sequential recurrence (bin fill resets on overflow), so there is no
vectorized closed form; the loop touches two ints per document and is
orders of magnitude cheaper than the upstream tokenization that produced
``n_tokens``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _pack_group(df, budget: int):
    """Next-fit over one packing domain (rows pre-sorted by id upstream)."""
    import pandas as pd

    df = df.sort_values("_pack_id", kind="mergesort").reset_index(drop=True)
    toks = df["_pack_tokens"].to_numpy(dtype=np.int64)
    bins = np.empty(len(toks), dtype=np.int64)
    cur_bin, cur_fill = 0, 0
    for i, t in enumerate(toks):
        if cur_fill > 0 and cur_fill + t > budget:
            cur_bin += 1
            cur_fill = 0
        cur_fill += int(t)
        bins[i] = cur_bin
    out = pd.DataFrame(
        {
            "doc_id": df["_pack_id"],
            "stratum": df["_pack_stratum"],
            "n_tokens": toks,
            "domain": df["_pack_domain"],
            "bin_seq": bins,
        }
    )
    # bin_fill = the bin's final token total, attached to every member row
    out["bin_fill"] = out.groupby("bin_seq")["n_tokens"].transform("sum")
    return out


def pack_sequences(
    ds: Dataset,
    id_col: str,
    token_col: str,
    budget: int,
    stratum_col: str | None = None,
    n_domains: int = 1,
    domain_block: int = 4096,
) -> Dataset:
    """Assign every document to a packed bin of at most ``budget`` tokens.

    Input: a dataset bearing ``id_col`` (orderable, unique), ``token_col``
    (precomputed token counts — run tokenization upstream where the text
    lives) and optionally ``stratum_col`` (pack strata separately, e.g. one
    stream per source).  Output columns: ``doc_id, stratum, n_tokens,
    domain, bin_seq, bin_fill, bin_id`` — one row per input document;
    ``bin_id`` is the globally unique packed-row key.

    A document alone larger than ``budget`` keeps its own bin (callers chunk
    oversize documents upstream if they must hard-cap; silently dropping
    data is not this operator's call).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch[id_col]
        strat = (
            pc.cast(batch[stratum_col], pa.string())
            if stratum_col is not None
            else pa.array([""] * batch.num_rows, pa.string())
        )
        # id-range striping -> domains: blocks of ``domain_block`` consecutive
        # ids go to the same domain, so each domain packs ordered runs of the
        # stratum rather than an interleaved shred of it (fewer
        # partially-filled bins at block seams than per-id round-robin)
        if n_domains > 1:
            blk = pc.divide(pc.cast(ids, pa.int64()), domain_block)
            # pyarrow.compute has no modulo kernel: x - (x // n) * n
            dom = pc.cast(
                pc.subtract(blk, pc.multiply(pc.divide(blk, n_domains), n_domains)),
                pa.int32(),
            )
        else:
            dom = pa.array([0] * batch.num_rows, pa.int32())
        return pa.table(
            {
                "_pack_id": ids,
                "_pack_stratum": strat,
                "_pack_tokens": pc.cast(batch[token_col], pa.int64()),
                "_pack_domain": dom,
            }
        )

    packed = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["_pack_stratum", "_pack_domain"])
        .map_groups(lambda df: _pack_group(df, budget), batch_format="pandas")
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bin_id = pc.binary_join_element_wise(
            pc.cast(batch["stratum"], pa.string()),
            pc.cast(batch["domain"], pa.string()),
            pc.cast(batch["bin_seq"], pa.string()),
            "#",
        )
        return batch.append_column("bin_id", pc.cast(bin_id, pa.string()))

    return packed.map_batches(finish, batch_format="pyarrow")


def sequence_chunks(
    ds: Dataset,
    chunk_tokens: int,
    n_domains: int = 4,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> Dataset:
    """Fixed-length training-sequence chunking (the GPT-2/3 "concatenate
    and slice" layout): documents are laid end-to-end in id order and the
    stream is cut every ``chunk_tokens`` tokens; a document straddling a cut
    yields one output row per chunk it overlaps.

    Same distribution model as next-fit packing above: the sequential unit
    is a *domain* (``id % n_domains``); each domain concatenates its docs in
    id order independently, so chunk ids are ``(domain, chunk_id)`` pairs
    and a domain's narrow rows — ``(id, n_tokens)``, never text — fit a
    worker at any corpus size by raising ``n_domains``.  Unlike next-fit,
    the scan here has a vectorized closed form (cumsum + interval/stride
    intersection), so the per-group cost is pure numpy.

    Output: ``(id_col, domain, chunk_id, tok_start, tok_end)`` with
    domain-global token offsets; a doc's rows partition ``[start, end)``.
    Docs with zero tokens are absent (they occupy no stream positions).
    """

    def chunk_group(df) -> "pd.DataFrame":
        import pandas as pd

        df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = df[tokens_col].to_numpy(dtype=np.int64)
        ids = df[id_col].to_numpy(dtype=np.int64)
        dom = np.int64(df["domain"].iloc[0])
        end = np.cumsum(n)
        start = end - n
        first = start // chunk_tokens
        last = (end - 1) // chunk_tokens
        reps = (last - first + 1).astype(np.int64)
        doc_ix = np.repeat(np.arange(len(n), dtype=np.int64), reps)
        # per-row chunk id: first[doc] + offset within the doc's chunk range
        base = np.repeat(first, reps)
        offs = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        chunk = base + offs
        ts = np.maximum(start[doc_ix], chunk * chunk_tokens)
        te = np.minimum(end[doc_ix], (chunk + 1) * chunk_tokens)
        return pd.DataFrame(
            {
                id_col: ids[doc_ix],
                "domain": np.full(len(doc_ix), dom, np.int64),
                "chunk_id": chunk,
                "tok_start": ts,
                "tok_end": te,
            }
        )

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(t[id_col], pa.int64())
        toks = pc.cast(t[tokens_col], pa.int64())
        keep = pc.greater(toks, 0)
        tt = pa.table({id_col: ids, tokens_col: toks}).filter(keep)
        # numpy % on the abs value: non-negative domain even for a stray
        # negative id (Python/numpy % of a negative differs from SQL's)
        dom = np.abs(tt[id_col].to_numpy(zero_copy_only=False)) % n_domains
        return tt.append_column("domain", pa.array(dom.astype("int64")))

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("domain")
        .map_groups(chunk_group, batch_format="pandas")
    )


def sliding_chunks(
    ds: Dataset,
    chunk_tokens: int,
    stride: int,
    n_domains: int = 4,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> Dataset:
    """Overlapping sliding-window chunking (the RAG / long-context-eval
    layout): like :func:`sequence_chunks`, documents are laid end-to-end in
    id order per domain, but windows of ``chunk_tokens`` start every
    ``stride`` tokens (``stride < chunk_tokens`` ⇒ consecutive windows
    overlap by ``chunk_tokens - stride``).  ``stride == chunk_tokens``
    degenerates to the non-overlapping layout.

    Output: ``(id_col, domain, chunk_id, tok_start, tok_end)`` — one row
    per (doc × window) overlap, where ``[tok_start, tok_end)`` is the
    intersection of the doc's stream span with window ``chunk_id``'s
    ``[chunk_id*stride, chunk_id*stride + chunk_tokens)``.  Same scale
    shape as ``sequence_chunks``: narrow rows, one domain shuffle, closed-
    form vectorized emission (a doc spanning ``[s, e)`` overlaps windows
    ``k ∈ [max(0, (s-size)//stride + 1), (e-1)//stride]`` — the dividend
    is kept non-negative so floor and truncating division agree, which is
    what lets the DuckDB twin (``//`` truncates) replicate it exactly).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")

    def chunk_group(df) -> "pd.DataFrame":
        import pandas as pd

        df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = df[tokens_col].to_numpy(dtype=np.int64)
        ids = df[id_col].to_numpy(dtype=np.int64)
        dom = np.int64(df["domain"].iloc[0])
        end = np.cumsum(n)
        start = end - n
        first = np.where(start < chunk_tokens, 0, (start - chunk_tokens) // stride + 1)
        last = (end - 1) // stride
        reps = (last - first + 1).astype(np.int64)
        doc_ix = np.repeat(np.arange(len(n), dtype=np.int64), reps)
        base = np.repeat(first, reps)
        offs = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        chunk = base + offs
        ts = np.maximum(start[doc_ix], chunk * stride)
        te = np.minimum(end[doc_ix], chunk * stride + chunk_tokens)
        return pd.DataFrame(
            {
                id_col: ids[doc_ix],
                "domain": np.full(len(doc_ix), dom, np.int64),
                "chunk_id": chunk,
                "tok_start": ts,
                "tok_end": te,
            }
        )

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(t[id_col], pa.int64())
        toks = pc.cast(t[tokens_col], pa.int64())
        keep = pc.greater(toks, 0)
        tt = pa.table({id_col: ids, tokens_col: toks}).filter(keep)
        dom = np.abs(tt[id_col].to_numpy(zero_copy_only=False)) % n_domains
        return tt.append_column("domain", pa.array(dom.astype("int64")))

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("domain")
        .map_groups(chunk_group, batch_format="pandas")
    )
