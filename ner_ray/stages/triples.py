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


def extract_pattern_triples(batch: pa.Table) -> pa.Table:
    """Same-turn pattern + co-occurrence triples (stateless, no shuffle)."""
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


def add_group_key(batch: pa.Table) -> pa.Table:
    """Pre-shuffle prep for the window groupby: drop mention-less turns (they
    can be neither window anchor nor target — typically a large fraction of a
    transcript corpus never enters the all-to-all) and compress the
    ``(conv_id, chunk)`` key into ONE int64 ``gkey`` so the shuffle sorts
    int64s, not strings.  crc32 collisions across conversations are handled
    by per-conversation segmentation inside the extractor."""
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
    return batch.append_column("gkey", pa.array(keys, pa.int64()))


def make_window_extractor(window: int):
    """Per-``gkey`` group fn emitting cross-turn window triples (one group =
    one (conv_id, chunk) salt cell, modulo rare crc32 collisions, which are
    segmented out below so windows never cross conversations)."""

    def _emit(turns, owned, surfs, conv_id, subj_p, obj_p, tid_p, conv_p):
        import numpy as np

        his = np.searchsorted(turns, turns + window, side="left")
        n = len(turns)
        for i in range(n):
            if not owned[i]:
                continue  # windows are anchored at owned turns only
            si = surfs[i]
            for j in range(i + 1, int(his[i])):
                if turns[j] == turns[i]:
                    continue
                sj = surfs[j]
                # nested-loop order preserved: a outer (repeat), b inner (tile)
                subj_p.append(np.repeat(si, len(sj)))
                obj_p.append(np.tile(sj, len(si)))
                tid_p.append(np.full(len(si) * len(sj), turns[i], dtype=np.int64))
                conv_p.append(conv_id)

    def extract(group: pa.Table) -> pa.Table:
        import numpy as np

        group = group.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        n = group.num_rows
        if n == 0:
            return _triples_table({k: [] for k in _TRIPLE_COLS})
        turns = group["turn_idx"].to_numpy().astype(np.int64)
        owned = group["owned"].to_numpy(zero_copy_only=False)
        convs = group["conv_id"].to_pylist()
        mentions = group["mentions"].to_pylist()
        surfs = [np.array([m["surface"] for m in ms], dtype=object) for ms in mentions]
        subj_p, obj_p, tid_p, conv_p = [], [], [], []
        if convs[0] == convs[-1]:  # fast path: one conversation (the norm)
            _emit(turns, owned, surfs, convs[0], subj_p, obj_p, tid_p, conv_p)
        else:  # crc32 collision: segment per conversation
            conv_arr = np.asarray(convs, dtype=object)
            bounds = np.flatnonzero(conv_arr[1:] != conv_arr[:-1]) + 1
            for seg in np.split(np.arange(n), bounds):
                s = slice(seg[0], seg[-1] + 1)
                _emit(turns[s], owned[s], surfs[s.start : s.stop], convs[seg[0]],
                      subj_p, obj_p, tid_p, conv_p)
        if not subj_p:
            return _triples_table({k: [] for k in _TRIPLE_COLS})
        subj = np.concatenate(subj_p)
        obj = np.concatenate(obj_p)
        tid = np.concatenate(tid_p)
        conv_col = np.concatenate(
            [np.full(len(sp), c, dtype=object) for sp, c in zip(subj_p, conv_p)]
        )
        m = len(subj)
        return pa.table(
            {
                "subj": pa.array(subj, pa.string()),
                "pred": pa.array(np.full(m, CO_MENTIONED, dtype=object), pa.string()),
                "obj": pa.array(obj, pa.string()),
                "conv_id": pa.array(conv_col, pa.string()),
                "turn_idx": pa.array(tid.astype(np.int32), pa.int32()),
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
    pattern = turn_mentions.map_batches(extract_pattern_triples, batch_format="pyarrow")
    if window <= 1:
        return pattern
    narrow = turn_mentions.drop_columns(["text"])  # keep the shuffle payload narrow
    chunked = add_salted_chunks(narrow, chunk_turns=chunk_turns, window=window)
    keyed = chunked.map_batches(add_group_key, batch_format="pyarrow")
    cross = keyed.groupby("gkey").map_groups(
        make_window_extractor(window), batch_format="pyarrow"
    )
    return pattern.union(cross)
