"""JSONL transcript source: newline-delimited JSON -> the mandated
transcripts schema (BASELINE.json input_hint).

Transcript interchange commonly ships as JSONL (one turn or one conversation
per line).  This source normalizes both layouts to the canonical
``schemas.TRANSCRIPTS`` shape so every downstream stage is format-agnostic:

- turn-per-line: ``{"conv_id", "turn_idx", "role", "text", "tool"?, "ts"?}``
- conversation-per-line: ``{"conv_id", "turns": [{"role", "text", ...}, ...]}``
  (turn_idx assigned by position)

Missing ``tool`` -> ""; missing/epoch ``ts`` -> timestamp[us] (epoch seconds
or micros accepted, heuristically: values < 10^12 are seconds).
Distribution unit = file line blocks via ``ray.data.read_json`` (turn lines)
or whole files (conversation lines — a conversation must not split).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from ner_ray import schemas


def _to_ts_us(v) -> int:
    if v is None:
        return 0
    v = int(v)
    return v * 1_000_000 if v < 1_000_000_000_000 else v


def _rows_to_table(rows: list[dict]) -> pa.Table:
    cols = {k: [] for k in schemas.TRANSCRIPTS.names}
    for r in rows:
        cols["conv_id"].append(str(r["conv_id"]))
        cols["turn_idx"].append(int(r["turn_idx"]))
        cols["role"].append(str(r.get("role", "")))
        cols["text"].append(str(r.get("text", "")))
        cols["tool"].append(str(r.get("tool") or ""))
        cols["ts"].append(_to_ts_us(r.get("ts")))
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        },
        schema=schemas.TRANSCRIPTS,
    )


def read_transcripts_jsonl(paths: str | list[str], layout: str = "turns") -> Dataset:
    """Read JSONL transcripts into the canonical schema.

    ``layout="turns"``: one turn object per line (line-splittable -> blocks).
    ``layout="conversations"``: one conversation per line with a ``turns``
    list; parsed per file so a conversation never splits mid-line-block.
    """
    if layout == "turns":
        raw = rd.read_json(paths)

        def norm(batch: pa.Table) -> pa.Table:
            return _rows_to_table(batch.to_pylist())

        return raw.map_batches(norm, batch_format="pyarrow")

    if layout != "conversations":
        raise ValueError(f"unknown layout {layout!r}")

    import json

    files = rd.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for data in batch["bytes"].to_pylist():
            for line in data.decode("utf-8").splitlines():
                if not line.strip():
                    continue
                conv = json.loads(line)
                for i, t in enumerate(conv.get("turns", [])):
                    rows.append(
                        {
                            "conv_id": conv["conv_id"],
                            "turn_idx": t.get("turn_idx", i),
                            **{k: t.get(k) for k in ("role", "text", "tool", "ts")},
                        }
                    )
        return _rows_to_table(rows)

    return files.map_batches(parse, batch_format="pyarrow")


def write_transcripts_jsonl(ds: Dataset, out_dir: str) -> list[str]:
    """Parallel sink: each task writes its own JSONL shard (turn-per-line);
    the driver only collects the (path, n_rows) manifest, never the data.

    ``ts`` is serialized by casting the Arrow timestamp[us] column to int64
    epoch micros — tz-independent (calling ``datetime.timestamp()`` on the
    naive Python values would re-interpret them in the host's local zone and
    shift every value on a non-UTC machine).

    Idempotent at the DIRECTORY level: shard names carry a content digest
    plus a per-attempt nonce (a digest alone would coalesce byte-identical
    blocks into one file and silently drop the duplicate rows), each shard
    writes to a temp name and ``os.replace``s into place (atomic), the driver
    clears stale ``part-*.jsonl`` from ``out_dir`` before launching, and
    after the run prunes any part file NOT in the returned manifest — so a
    retried task's orphaned first attempt never survives.  Assumes
    ``out_dir`` is on a filesystem shared by the workers (tasks create it
    themselves).
    """
    import glob
    import hashlib
    import json
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    for stale in glob.glob(os.path.join(out_dir, "part-*.jsonl")):
        os.remove(stale)

    def write_shard(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts_us = pc.cast(batch["ts"], pa.int64()).to_pylist()
        rows = batch.drop_columns(["ts"]).to_pylist()
        lines = []
        for r, t in zip(rows, ts_us):
            r["ts"] = int(t) if t is not None else 0
            lines.append(json.dumps(r, ensure_ascii=False) + "\n")
        payload = "".join(lines).encode("utf-8")
        digest = hashlib.blake2b(payload, digest_size=12).hexdigest()
        os.makedirs(out_dir, exist_ok=True)  # workers may see it first
        # digest + attempt nonce: two byte-identical blocks get two files
        p = os.path.join(out_dir, f"part-{digest}-{uuid.uuid4().hex[:8]}.jsonl")
        tmp = f"{p}.tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, p)
        return pa.table(
            {"path": pa.array([p], pa.string()), "n_rows": pa.array([batch.num_rows], pa.int64())}
        )

    manifest = ds.map_batches(write_shard, batch_format="pyarrow", batch_size=None).to_pandas()
    if "path" not in manifest.columns:  # empty dataset: Ray never ran the fn
        return []
    paths = sorted(manifest["path"])
    # prune orphans from retried tasks: only the successful attempt's path is
    # in the manifest Ray returned
    keep = set(paths)
    for f in glob.glob(os.path.join(out_dir, "part-*.jsonl")):
        if f not in keep:
            os.remove(f)
    return paths
