"""B4 — triple extraction within conv_id-windowed turn sequences.

Pinned deterministic semantics (this engine's spec; the golden triples table
is frozen from the same rules — FIXTURES.md §4):

**Same-turn (pattern) triples** — for each pair of *adjacent* mentions (a, b)
in one turn (ordered by start offset), the text strictly between them is
stripped/lowercased and looked up in ``PRED_LEXICON`` (the
dependency/role-pattern stand-in; BASELINE.json:6
"co-occurrence/dependency-pattern triple extraction").  A hit emits
``(a.surface, pred, b.surface)`` with confidence 1.0; a miss emits the
co-occurrence triple ``(a.surface, co_occurs_with, b.surface)`` with
confidence 0.8.  This is a **stateless map_batches** over turn-mention rows:
no shuffle at all — the 100 TB hot path stays embarrassingly parallel.

**Cross-turn (window) triples** — for mentions a in turn t and b in turn t'
with 0 < t' - t < ``window``, emit
``(a.surface, co_mentioned_with, b.surface)`` with confidence 0.5.  Runs as
``groupby(conv_id, chunk).map_groups`` over **salted chunks**
(stages.order_restore.add_salted_chunks): a window is emitted only by the
chunk that OWNS its anchor (earlier) turn, and the first window-1 turns of
the next chunk are replicated as lookahead — exact cross-chunk semantics, no
duplicates, mega-conversation skew fanned out across reducers.  The text
column is dropped before this shuffle so the all-to-all exchange moves only
the narrow mention structs.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

from ner_ray import schemas
from ner_ray.stages.order_restore import add_salted_chunks

PRED_LEXICON: dict[str, str] = {
    "works at": "works_at",
    "visited": "visited",
    "met": "met",
    "is based in": "based_in",
    "joined": "joined",
    "after leaving": "left",
    "announced a partnership with": "partner_of",
    "reports to": "reports_to",
    "said the office in": "office_in",
}

CO_OCCURS = "co_occurs_with"
CO_MENTIONED = "co_mentioned_with"

_TRIPLE_COLS = ("subj", "pred", "obj", "conv_id", "turn_idx", "confidence")


def _triples_table(rows: dict[str, list]) -> pa.Table:
    return pa.table(
        {
            "subj": pa.array(rows["subj"], pa.string()),
            "pred": pa.array(rows["pred"], pa.string()),
            "obj": pa.array(rows["obj"], pa.string()),
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "confidence": pa.array(rows["confidence"], pa.float32()),
        },
        schema=schemas.TRIPLES,
    )


def _norm_between(text: str) -> str:
    return " ".join(text.strip(" \t.,;:!?").split()).lower()


def _extract_pattern_triples_rows(batch: pa.Table) -> pa.Table:
    """Row-loop reference implementation of the same-turn semantics (kept as
    the equality oracle for the vectorized path; not on the hot path)."""
    rows: dict[str, list] = {k: [] for k in _TRIPLE_COLS}
    conv = batch["conv_id"].to_pylist()
    turn = batch["turn_idx"].to_pylist()
    texts = batch["text"].to_pylist()
    mentions = batch["mentions"].to_pylist()
    for c, ti, text, ms in zip(conv, turn, texts, mentions):
        if not ms or len(ms) < 2:
            continue
        ms = sorted(ms, key=lambda m: m["start"])
        for a, b in zip(ms, ms[1:]):
            between = _norm_between(text[a["end"] : b["start"]])
            pred = PRED_LEXICON.get(between)
            conf = 1.0 if pred else 0.8
            rows["subj"].append(a["surface"])
            rows["pred"].append(pred or CO_OCCURS)
            rows["obj"].append(b["surface"])
            rows["conv_id"].append(c)
            rows["turn_idx"].append(ti)
            rows["confidence"].append(conf)
    return _triples_table(rows)


def extract_pattern_triples(batch: pa.Table) -> pa.Table:
    """Same-turn pattern + co-occurrence triples (stateless, no shuffle).

    Vectorized: rows with <2 mentions are dropped with one Arrow filter
    (typically most of a transcript corpus), per-row mention ordering comes
    from ONE global ``np.lexsort`` over (row, start), and adjacent pairs /
    surfaces / conv ids fan out via ``take``.  Only the between-text lexicon
    probe remains Python — a slice + dict.get per PAIR (not per turn).
    Output is identical to ``_extract_pattern_triples_rows`` (sort is stable
    on equal starts, matching ``sorted``; tested on the fixture corpus)."""
    import numpy as np
    import pyarrow.compute as pc

    ments_col = batch["mentions"]
    batch = batch.filter(pc.greater_equal(pc.list_value_length(ments_col), 2))
    if batch.num_rows == 0:
        return _triples_table({k: [] for k in _TRIPLE_COLS})
    ments = batch["mentions"]
    if isinstance(ments, pa.ChunkedArray):
        ments = ments.combine_chunks()
    flat = ments.values
    lens = pc.list_value_length(ments).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    starts = pc.struct_field(flat, "start").to_numpy(zero_copy_only=False).astype(np.int64)
    ends = pc.struct_field(flat, "end").to_numpy(zero_copy_only=False).astype(np.int64)
    row_of = np.repeat(np.arange(len(lens)), lens)
    # stable per-row ordering by start (== sorted(ms, key=start) per row)
    perm = np.lexsort((starts, row_of))

    pair_local, n_pairs = _ranges(lens - 1)
    if n_pairs == 0:
        return _triples_table({k: [] for k in _TRIPLE_COLS})
    I = np.repeat(np.arange(len(lens)), lens - 1)
    a_idx = perm[offs[I] + pair_local]
    b_idx = perm[offs[I] + pair_local + 1]
    a_end = ends[a_idx]
    b_start = starts[b_idx]

    texts = batch["text"].to_pylist()
    preds: list[str] = []
    conf = np.full(n_pairs, 0.8, dtype=np.float32)
    lex = PRED_LEXICON
    norm = _norm_between
    for k in range(n_pairs):
        p = lex.get(norm(texts[I[k]][a_end[k] : b_start[k]]))
        if p is None:
            preds.append(CO_OCCURS)
        else:
            preds.append(p)
            conf[k] = 1.0

    flat_surf = pc.struct_field(flat, "surface")
    return pa.table(
        {
            "subj": pc.cast(pc.take(flat_surf, pa.array(a_idx)), pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj": pc.cast(pc.take(flat_surf, pa.array(b_idx)), pa.string()),
            "conv_id": pc.cast(pc.take(batch["conv_id"], pa.array(I)), pa.string()),
            "turn_idx": pc.cast(pc.take(batch["turn_idx"], pa.array(I)), pa.int32()),
            "confidence": pa.array(conf, pa.float32()),
        },
        schema=schemas.TRIPLES,
    )


def add_group_key(batch: pa.Table, n_buckets: int = 8192) -> pa.Table:
    """Pre-shuffle prep for the window groupby: drop mention-less turns (they
    can be neither window anchor nor target — typically a large fraction of a
    transcript corpus never enters the all-to-all), compress ``(conv_id,
    chunk)`` into ONE int64 ``gkey``, and assign a ``bucket`` that packs MANY
    salt cells per shuffle group — Ray's per-group dispatch costs ~50µs, so
    grouping by the raw (conv, chunk) key at 10^8 conversations would spend
    more time dispatching than extracting.  The extractor re-segments inside
    each bucket (vectorized), so bucketing changes no output.  crc32
    collisions across conversations are handled by conv-boundary
    segmentation there too."""
    import zlib

    import numpy as np
    import pyarrow.compute as pc

    batch = batch.filter(pc.greater(pc.list_value_length(batch["mentions"]), 0))
    convs = batch["conv_id"].to_pylist()
    chunks = batch["chunk"].to_pylist()
    cache: dict[str, int] = {}
    keys = np.empty(len(convs), dtype=np.int64)
    for i, (c, k) in enumerate(zip(convs, chunks)):
        h = cache.get(c)
        if h is None:
            h = zlib.crc32(c.encode())
            cache[c] = h
        keys[i] = (h << 24) ^ k
    # Bucket = Fibonacci-mix of the full gkey, NOT ``gkey % n_buckets``: the
    # raw key is ``(crc32 << 24) ^ chunk`` and ``crc32 << 24`` vanishes modulo
    # any bucket count dividing 2^24, so a plain modulo sent every short
    # conversation (chunk 0) to bucket 0 — measured as ONE reducer holding
    # 91% of the shuffle and a 9.8s straggler in a stage whose mean task is
    # 80ms.
    mixed = keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    bucket = ((mixed >> np.uint64(17)) % np.uint64(n_buckets)).astype(np.int64)
    batch = batch.append_column("gkey", pa.array(keys, pa.int64()))
    return batch.append_column("bucket", pa.array(bucket, pa.int64()))


def _ranges(counts):
    """Vectorized concatenation of ``[0..counts[p])`` ranges: the local index
    within each range, for all ranges at once."""
    import numpy as np

    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), total
    starts = np.cumsum(counts) - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts), total


def make_window_extractor(window: int):
    """Per-``gkey`` group fn emitting cross-turn window triples (one group =
    one (conv_id, chunk) salt cell, modulo rare crc32 collisions, which are
    segmented below so windows never cross conversations).

    Fully vectorized: pair indices come from cumsum/repeat arithmetic (no
    Python loop over pairs), and the mention fanout + string materialization
    run as Arrow ``take`` over the group's flat surface array — per-triple
    cost is a few vectorized ops, not a numpy call per pair.
    """

    def extract(group: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        if "gkey" not in group.column_names:  # direct unit use: one salt cell
            group = group.append_column(
                "gkey", pa.array([0] * group.num_rows, pa.int64())
            )
        group = group.sort_by(
            [("gkey", "ascending"), ("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        n = group.num_rows
        if n == 0:
            return _triples_table({k: [] for k in _TRIPLE_COLS})
        turns = group["turn_idx"].to_numpy().astype(np.int64)
        owned = group["owned"].to_numpy(zero_copy_only=False).astype(bool)
        gkeys = group["gkey"].to_numpy().astype(np.int64)
        ments = group["mentions"]
        if isinstance(ments, pa.ChunkedArray):
            ments = ments.combine_chunks()
        flat_surf = pc.struct_field(ments.values, "surface")  # group's mentions, flat
        offsets = ments.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offsets)
        offs = offsets[:-1]
        conv_col = group["conv_id"]

        # segment = one (conv_id, chunk) salt cell: boundary where gkey
        # changes, or (crc32-collision guard) where conv_id changes
        new_seg = np.concatenate([[True], gkeys[1:] != gkeys[:-1]])
        if not new_seg.all():
            conv_np = np.asarray(group["conv_id"].to_pylist(), dtype=object)
            new_seg[1:] |= conv_np[1:] != conv_np[:-1]
        seg_id = np.cumsum(new_seg) - 1

        # per-row window end (exclusive) confined to the row's segment,
        # vectorized across all segments: offset turns by segment id so
        # searchsorted never crosses a boundary
        BIG = np.int64(1) << 33
        aug = seg_id * BIG + turns
        his = np.searchsorted(aug, aug + window, side="left")
        pair_counts = np.clip(his - np.arange(1, n + 1), 0, None)
        pair_counts[~owned] = 0  # windows are anchored at owned turns only
        local, n_pairs = _ranges(pair_counts)
        if n_pairs == 0:
            return _triples_table({k: [] for k in _TRIPLE_COLS})
        I = np.repeat(np.arange(n, dtype=np.int64), pair_counts)
        J = I + 1 + local

        # mention fanout per pair: li*lj triples, a outer (//) b inner (%)
        li, lj = lens[I], lens[J]
        K = li * lj
        t_local, m = _ranges(K)
        if m == 0:
            return _triples_table({k: [] for k in _TRIPLE_COLS})
        LJ = np.repeat(lj, K)
        subj_idx = np.repeat(offs[I], K) + t_local // LJ
        obj_idx = np.repeat(offs[J], K) + t_local % LJ
        row_of_triple = np.repeat(I, K)

        subj = pc.take(flat_surf, pa.array(subj_idx))
        obj = pc.take(flat_surf, pa.array(obj_idx))
        conv = pc.take(conv_col, pa.array(row_of_triple))
        tid = turns[row_of_triple].astype(np.int32)
        return pa.table(
            {
                "subj": subj,
                "pred": pa.array(np.full(m, CO_MENTIONED, dtype=object), pa.string()),
                "obj": obj,
                "conv_id": conv,
                "turn_idx": pa.array(tid, pa.int32()),
                "confidence": pa.array(np.full(m, 0.5, dtype=np.float32), pa.float32()),
            },
            schema=schemas.TRIPLES,
        )

    return extract


def extract_triples(
    turn_mentions: Dataset,
    window: int = 3,
    chunk_turns: int = 256,
) -> Dataset:
    """Full B4: pattern triples (map) ∪ window triples (salted group-shuffle)."""
    from ner_ray.utils import pool_size

    pattern = turn_mentions.map_batches(extract_pattern_triples, batch_format="pyarrow")
    if window <= 1:
        return pattern
    narrow = turn_mentions.drop_columns(["text"])  # keep the shuffle payload narrow
    chunked = add_salted_chunks(narrow, chunk_turns=chunk_turns, window=window)
    keyed = chunked.map_batches(add_group_key, batch_format="pyarrow")
    # Coalesce to ~one block per CPU before the all-to-all: the sort shuffle's
    # fixed overhead grows with INPUT block count (measured 4.1s at 128 input
    # blocks vs 0.8s at 32 for the same 590k rows at 32 CPUs) — the fine
    # read/tagger blocking that keeps the actor pool busy is wrong for the
    # exchange, and reducers re-split by bucket anyway.
    keyed = keyed.repartition(pool_size()[1])
    cross = keyed.groupby("bucket").map_groups(
        make_window_extractor(window), batch_format="pyarrow"
    )
    return pattern.union(cross)
