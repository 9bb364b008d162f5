"""B2 — stable per-conversation turn-order restore, skew-safe (SURVEY.md §2).

The transcripts table arrives in arbitrary row order (the fixture writes it
shuffled on purpose).  Downstream windowed stages need turns grouped by
``conv_id`` and ordered by ``turn_idx``; the north rule requires the shuffle
that achieves this to survive **mega-conversation skew** by salting
(BASELINE.json:6: "salting conv_id partitions before the groupby-sort shuffle
that restores stable turn ordering").

Two code paths:

- ``sort_conversations(ds)`` — global range-partitioned
  ``ds.sort(["conv_id", "turn_idx"])``.  Ray's sort splits even a
  mega-conversation across range partitions, so no single reducer holds a
  whole hot conversation.  Use when a globally ordered output table is the
  product (e.g. the per-turn text-equality check).

- ``add_salted_chunks(ds, chunk_turns, window)`` — the skew-safe grouping
  used by the windowed triple extractor (B4).  Each conversation is cut into
  fixed-size chunks of ``chunk_turns`` turns; the group key becomes
  ``(conv_id, chunk)``, so a mega-conversation fans out over many reducers
  instead of landing on one.  The first ``window - 1`` turns of chunk k+1 are
  **replicated** into chunk k with ``owned = False`` (lookahead rows): a
  window anchored at turn t is emitted only by the chunk that OWNS t, so
  cross-chunk windows are computed exactly once — no duplicate and no lost
  triples at chunk edges (SURVEY.md §7 hard part 1).  The replication factor
  is (window-1)/chunk_turns, i.e. a few percent for sane settings.

At 100 TB scale this matters because a single agent conversation can hold
millions of turns; group-by-conv_id alone would serialize on it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

DEFAULT_CHUNK_TURNS = 256


def sort_conversations(ds: Dataset) -> Dataset:
    """Globally restore stable (conv_id, turn_idx) order."""
    return ds.sort(["conv_id", "turn_idx"])


def add_salted_chunks(
    ds: Dataset, chunk_turns: int = DEFAULT_CHUNK_TURNS, window: int = 1
) -> Dataset:
    """Add ``chunk:int32`` and ``owned:bool`` columns; replicate lookahead rows.

    Rows with ``owned == False`` are lookahead copies that only provide
    window context; stages must anchor emission on owned rows.
    ``window == 1`` means no cross-turn lookahead (no replication).
    """
    salt_chunk_batch(pa.schema([("turn_idx", pa.int32())]).empty_table(),
                     chunk_turns, window)  # validate args eagerly
    return ds.map_batches(
        lambda b: salt_chunk_batch(b, chunk_turns, window), batch_format="pyarrow"
    )


def salt_chunk_batch(
    batch: pa.Table, chunk_turns: int = DEFAULT_CHUNK_TURNS, window: int = 1
) -> pa.Table:
    """Batch-level body of ``add_salted_chunks`` (pure per-row: chunk id from
    turn_idx, lookahead replication by filter+concat) — exposed so the KG
    pipeline can FUSE the salting into the tagger pass."""
    if chunk_turns < 1:
        raise ValueError("chunk_turns must be >= 1")
    if window < 1:
        raise ValueError("window must be >= 1")
    lookahead = window - 1
    if lookahead >= chunk_turns:
        raise ValueError("window - 1 must be < chunk_turns so lookahead spans at most one chunk")
    turn = batch["turn_idx"]
    chunk = pc.cast(pc.floor(pc.divide(pc.cast(turn, pa.float64()), chunk_turns)), pa.int32())
    owned = batch.append_column("chunk", chunk).append_column(
        "owned", pa.array(np.ones(batch.num_rows, dtype=bool))
    )
    if lookahead == 0:
        return owned
    # Lookahead copies: turns in the first `lookahead` positions of a
    # chunk > 0 are replicated into the previous chunk as context.
    pos_in_chunk = pc.subtract(turn, pc.multiply(pc.cast(chunk, pa.int32()), chunk_turns))
    mask = pc.and_(pc.less(pos_in_chunk, lookahead), pc.greater(chunk, 0))
    ctx = batch.filter(mask)
    ctx_chunk = pc.cast(
        pc.subtract(
            pc.cast(
                pc.floor(pc.divide(pc.cast(ctx["turn_idx"], pa.float64()), chunk_turns)),
                pa.int32(),
            ),
            1,
        ),
        pa.int32(),
    )
    ctx = ctx.append_column("chunk", ctx_chunk).append_column(
        "owned", pa.array(np.zeros(ctx.num_rows, dtype=bool))
    )
    return pa.concat_tables([owned, ctx])


def sorted_group(table: pa.Table) -> pa.Table:
    """Sort one (conv_id, chunk) group by turn_idx (used inside map_groups)."""
    return table.sort_by([("turn_idx", "ascending")])
