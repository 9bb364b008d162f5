"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Generates the engine's primary input — the Parquet transcripts table with the
exact shape mandated by ``BASELINE.json`` ``input_hint``:

    conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
    ts:timestamp[us]

Properties:

- **Pure function of (seed, conv_index)** — each conversation is generated
  independently from its own ``numpy`` Generator, so generation distributes
  over Ray tasks and any subset regenerates bit-identically.
- Turn text comes from a template grammar over the fixed gazetteer
  (``fixtures.gazetteer``), so golden mentions/triples are known by
  construction.
- Conversation 0 is a **mega-conversation** holding ~10% of all turns, to
  exercise the salted skew handling of the order-restore + window stages
  (BASELINE.json:6 "salting conv_id partitions").
- Rows are **emitted shuffled** (not in (conv_id, turn_idx) order) so the
  order-restore stage is actually tested; ``ts`` is consistent with
  ``turn_idx``.
- No wall-clock anywhere: ``ts`` = fixed epoch base + deterministic offsets.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ner_ray import schemas
from ner_ray.fixtures import gazetteer as gz

EPOCH_BASE_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

# Template grammar.  ``slots`` name gazetteer pools; surfaces are substituted
# at known offsets.  Patterns with a verb between two entities feed the
# dependency-pattern triple extractor (SURVEY.md §2 B4).
TEMPLATES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("{0} works at {1}.", ("PER", "ORG")),
    ("{0} visited {1} last week.", ("PER", "LOC")),
    ("{0} met {1} to review the plan.", ("PER", "PER")),
    ("{0} is based in {1}.", ("ORG", "LOC")),
    ("{0} joined {1} after leaving {2}.", ("PER", "ORG", "ORG")),
    ("the meeting with {0} is confirmed.", ("PER",)),
    ("shipping the package to {0} tomorrow.", ("LOC",)),
    ("{0} announced a partnership with {1}.", ("ORG", "ORG")),
    ("please run the search and summarize the results.", ()),
    ("ok, done. anything else?", ()),
    ("searching the archive for the requested records.", ()),
    ("{0} said the office in {1} reports to {2}.", ("PER", "LOC", "ORG")),
)

ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "summarize", "lookup", "calc")


@dataclass(frozen=True)
class TranscriptConfig:
    n_convs: int = 50
    seed: int = 42
    max_turns: int = 40
    min_turns: int = 2
    mega_frac: float = 0.10  # fraction of all turns placed in conv 0

    def turns_for(self, conv_index: int) -> int:
        """Deterministic turn count per conversation (seeded Zipf, clipped)."""
        if conv_index == 0:
            # Mega-conversation: ~mega_frac of the expected total rows.
            approx_rest = self.n_convs * 6  # E[clipped zipf] ~ 6
            return max(50, int(approx_rest * self.mega_frac / (1 - self.mega_frac)))
        rng = np.random.default_rng((self.seed << 20) ^ conv_index)
        z = int(rng.zipf(1.7))
        return int(np.clip(z + self.min_turns - 1, self.min_turns, self.max_turns))


def _pool(kind: str) -> tuple[str, ...]:
    return {"PER": gz.PER, "LOC": gz.LOC, "ORG": gz.ORG}[kind]


def gen_conversation(conv_index: int, cfg: TranscriptConfig) -> dict[str, list]:
    """Generate one conversation's rows (pure; independent of other convs)."""
    rng = np.random.default_rng((cfg.seed << 21) ^ (conv_index * 2 + 1))
    n_turns = cfg.turns_for(conv_index)
    conv_id = f"conv-{conv_index:06d}"
    step_us = int(5_000_000 + (conv_index % 7) * 1_000_000)
    base_us = EPOCH_BASE_US + conv_index * 10_000_000_000

    cols: dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for t in range(n_turns):
        ti = int(rng.integers(0, len(TEMPLATES)))
        tmpl, slots = TEMPLATES[ti]
        fills = []
        for kind in slots:
            pool = _pool(kind)
            s = pool[int(rng.integers(0, len(pool)))]
            # "{PER} met {PER}" with identical surfaces is degenerate; redraw once.
            if fills and s == fills[-1] and len(pool) > 1:
                s = pool[int(rng.integers(0, len(pool)))]
            fills.append(s)
        text = tmpl.format(*fills)
        role = ROLES[int(rng.integers(0, len(ROLES)))]
        tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else ""
        cols["conv_id"].append(conv_id)
        cols["turn_idx"].append(t)
        cols["role"].append(role)
        cols["text"].append(text)
        cols["tool"].append(tool)
        cols["ts"].append(base_us + t * step_us)
    return cols


def _concat_shuffled(parts: list[dict[str, list]], seed: int) -> pa.Table:
    cols: dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for p in parts:
        for k, v in p.items():
            cols[k].extend(v)
    n = len(cols["conv_id"])
    perm = np.random.default_rng(seed ^ 0x5EED).permutation(n)
    arrays = {
        "conv_id": pa.array(np.asarray(cols["conv_id"], dtype=object)[perm], pa.string()),
        "turn_idx": pa.array(np.asarray(cols["turn_idx"], dtype=np.int64)[perm], pa.int32()),
        "role": pa.array(np.asarray(cols["role"], dtype=object)[perm], pa.string()),
        "text": pa.array(np.asarray(cols["text"], dtype=object)[perm], pa.string()),
        "tool": pa.array(np.asarray(cols["tool"], dtype=object)[perm], pa.string()),
        "ts": pa.array(np.asarray(cols["ts"], dtype=np.int64)[perm], pa.timestamp("us")),
    }
    return pa.table(arrays, schema=schemas.TRANSCRIPTS)


def make_transcripts_table(cfg: TranscriptConfig | None = None) -> pa.Table:
    """Driver-side generation (test scale). Rows are shuffled."""
    cfg = cfg or TranscriptConfig()
    parts = [gen_conversation(i, cfg) for i in range(cfg.n_convs)]
    return _concat_shuffled(parts, cfg.seed)


def write_transcripts(out_dir: str, cfg: TranscriptConfig | None = None, shards: int = 8) -> str:
    """Distributed generation via Ray Data: shard the conv-index range over
    tasks, each shard writes one shuffled parquet file.  Scales to bench-size
    corpora without driver memory; bit-identical regardless of shard count.
    """
    import os

    import ray.data as rd

    cfg = cfg or TranscriptConfig()
    os.makedirs(out_dir, exist_ok=True)

    def gen_shard(batch: dict[str, np.ndarray]) -> pa.Table:
        parts = [gen_conversation(int(i), cfg) for i in np.sort(batch["id"])]
        seed = cfg.seed ^ int(batch["id"].min())
        return _concat_shuffled(parts, seed)

    (
        rd.range(cfg.n_convs, override_num_blocks=shards)
        .map_batches(gen_shard, batch_format="numpy", batch_size=max(1, cfg.n_convs // shards))
        .write_parquet(out_dir)
    )
    return out_dir
