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


def make_window_extractor(window: int):
    """Per-(conv_id, chunk) group fn emitting cross-turn window triples."""

    def extract(group: pa.Table) -> pa.Table:
        group = group.sort_by([("turn_idx", "ascending")])
        turn = group["turn_idx"].to_pylist()
        owned = group["owned"].to_pylist()
        conv = group["conv_id"].to_pylist()
        mentions = group["mentions"].to_pylist()
        rows: dict[str, list] = {k: [] for k in _TRIPLE_COLS}
        n = len(turn)
        for i in range(n):
            if not owned[i] or not mentions[i]:
                continue  # windows are anchored at owned turns only
            for j in range(i + 1, n):
                dt = turn[j] - turn[i]
                if dt <= 0:
                    continue  # duplicate turn rows cannot occur; safety
                if dt >= window:
                    break
                for a in mentions[i]:
                    for b in mentions[j]:
                        rows["subj"].append(a["surface"])
                        rows["pred"].append(CO_MENTIONED)
                        rows["obj"].append(b["surface"])
                        rows["conv_id"].append(conv[i])
                        rows["turn_idx"].append(turn[i])
                        rows["confidence"].append(0.5)
        return _triples_table(rows)

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
    cross = chunked.groupby(["conv_id", "chunk"]).map_groups(
        make_window_extractor(window), batch_format="pyarrow"
    )
    return pattern.union(cross)
