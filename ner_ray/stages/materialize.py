"""B8/B9/B10 — graph materialize, lineage manifests, checkpoint/resume.

North-star semantics (BASELINE.json:6,14): "the final graph materializes as
partitioned Parquet (subj, pred, obj) triple tables with per-partition
lineage manifests and checkpointed stage outputs for resumable re-runs" /
"per-partition lineage + metrics".

Design (SURVEY.md §4, "Checkpoint/resume" row — Ray Data has task retries but
no cross-run story, so this is explicit):

- Every checkpointed stage writes ``<root>/<stage>/data/*.parquet`` through a
  temp directory + atomic ``os.replace`` rename, then a ``manifest.json``
  recording the **input signature** (paths + fragment sizes + config), the
  output files with per-file row counts (read back from Parquet footers — a
  metadata-only pass, no data re-read), and totals.  Metrics (B9) come from
  these manifests for free.
- ``run_stage`` skips a stage when a manifest exists AND its signature equals
  the current one — resume = re-running the driver script; finished stages
  load instantly, the first stale stage recomputes.  A changed input fragment
  set changes the signature, so stale checkpoints can never be silently
  reused (SURVEY.md §7 hard part 4).
- The final graph is partitioned by ``part = hash(subj) % n`` so (a) a
  re-run touches only missing partitions' files, (b) downstream consumers can
  prune by subject key range.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd
from ray.data import Dataset


def input_signature(obj) -> str:
    """Stable hash of any JSON-able description of stage inputs + config."""
    blob = json.dumps(obj, sort_keys=True, default=str).encode()
    return hashlib.blake2b(blob, digest_size=16).hexdigest()


def parquet_files_signature(paths: list[str]) -> list[dict]:
    """Fragment-level identity of a parquet input: path + size + mtime-free."""
    out = []
    for p in sorted(paths):
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                # pin traversal order: os.walk visits subdirectories in
                # scandir order, which is filesystem-dependent — an rsynced
                # copy of the same bytes would otherwise change the
                # signature and silently void every checkpoint
                _dirs.sort()
                for f in sorted(files):
                    if f.endswith(".parquet"):
                        fp = os.path.join(root, f)
                        out.append({"path": fp, "bytes": os.path.getsize(fp)})
        elif os.path.exists(p):
            out.append({"path": p, "bytes": os.path.getsize(p)})
    return out


def _scan_outputs(data_dir: str) -> list[dict]:
    files = []
    for root, _dirs, names in os.walk(data_dir):
        for n in sorted(names):
            if not n.endswith(".parquet"):
                continue
            fp = os.path.join(root, n)
            meta = pq.ParquetFile(fp).metadata
            files.append(
                {
                    "path": os.path.relpath(fp, data_dir),
                    "rows": meta.num_rows,
                    "bytes": os.path.getsize(fp),
                }
            )
    return files


def write_checkpoint(
    ds: Dataset,
    stage_dir: str,
    signature: str,
    partition_cols: list[str] | None = None,
    extra: dict | None = None,
) -> dict:
    """Write a stage output atomically + its lineage manifest; returns manifest."""
    tmp = f"{stage_dir}.tmp-{uuid.uuid4().hex[:8]}"
    data_tmp = os.path.join(tmp, "data")
    os.makedirs(data_tmp, exist_ok=True)
    t0 = time.perf_counter()
    if partition_cols:
        ds.write_parquet(data_tmp, partition_cols=partition_cols)
    else:
        ds.write_parquet(data_tmp)
    elapsed = time.perf_counter() - t0
    files = _scan_outputs(data_tmp)
    if not files:
        # a 0-row dataset may write no files at all; persist one empty
        # schema-bearing parquet so rd.read_parquet(data_dir) stays valid
        # (an all-empty increment in an incremental build hits this)
        import pyarrow as pa
        import pyarrow.parquet as pq

        sch = ds.schema()
        if sch is not None:
            empty = pa.table(
                {n: pa.array([], t) for n, t in zip(sch.names, sch.types)}
            )
        else:
            # schema unknowable (e.g. a row-UDF filtered everything): a
            # zero-column parquet still keeps rd.read_parquet(data_dir) valid
            empty = pa.table({})
        pq.write_table(empty, os.path.join(data_tmp, "empty-0.parquet"))
        files = _scan_outputs(data_tmp)
    manifest = {
        "signature": signature,
        "files": files,
        "row_count": sum(f["rows"] for f in files),
        "partition_cols": partition_cols or [],
        "write_seconds": round(elapsed, 3),
        **(extra or {}),
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.exists(stage_dir):
        shutil.rmtree(stage_dir)
    os.replace(tmp, stage_dir)
    return manifest


def read_manifest(stage_dir: str) -> dict | None:
    mf = os.path.join(stage_dir, "manifest.json")
    if not os.path.exists(mf):
        return None
    with open(mf) as f:
        return json.load(f)


def run_stage(
    name: str,
    ckpt_root: str,
    signature: str,
    build,
    partition_cols: list[str] | None = None,
) -> tuple[Dataset, dict]:
    """Compute-or-load one checkpointed stage.

    Returns ``(dataset_read_from_checkpoint, manifest)``; ``manifest["skipped"]``
    tells whether the stage was resumed from a prior run.
    """
    stage_dir = os.path.join(ckpt_root, name)
    manifest = read_manifest(stage_dir)
    data_dir = os.path.join(stage_dir, "data")
    if manifest is not None and manifest.get("signature") == signature:
        manifest = {**manifest, "skipped": True}
        return rd.read_parquet(data_dir), manifest
    ds = build()
    manifest = write_checkpoint(ds, stage_dir, signature, partition_cols=partition_cols)
    manifest["skipped"] = False
    return rd.read_parquet(data_dir), manifest


def add_subject_partition(ds: Dataset, num_partitions: int = 16) -> Dataset:
    """Add ``part = hash(subj) % n`` for partitioned final-graph layout.

    Subjects are Zipfian canonical names, so the blake2b runs per DISTINCT
    value (dictionary_encode + take — the linker/rewrite hot-path pattern),
    not per row: the final graph is the largest persisted table and a
    per-row Python hash loop would dominate its write stage."""

    def add(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arr = batch["subj"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        enc = pc.dictionary_encode(arr)
        dpart = pa.array(
            [
                int.from_bytes(hashlib.blake2b(s.encode(), digest_size=4).digest(), "big")
                % num_partitions
                for s in enc.dictionary.to_pylist()
            ],
            pa.int32(),
        )
        return batch.append_column("part", pc.take(dpart, enc.indices))

    return ds.map_batches(add, batch_format="pyarrow")


def compact_checkpoint(stage_dir: str, target_rows_per_file: int = 1_000_000) -> dict:
    """Small-file compaction for a checkpointed stage output — the
    operational pass a long incremental run needs: every ``update_kg``
    increment appends more small parquet files per partition, and at
    10^12-turn scale read planning over millions of tiny files dominates.
    Rewrites the stage's data into ``ceil(rows / target_rows_per_file)``
    right-sized files while preserving rows, schema, the hive partition
    layout, and — critically — the stage SIGNATURE, so resume semantics
    are untouched (a subsequent ``run_stage`` with the same signature
    still skips).

    Distributed and restart-safe: one Ray Data read -> sort by the
    partition columns (co-locates each partition's rows into contiguous
    blocks so the partitioned write emits ~one file per partition chunk)
    -> order-preserving repartition -> the same atomic tmp-dir +
    ``os.replace`` + manifest contract as ``write_checkpoint`` (the
    source directory is only replaced after the compacted copy is fully
    written).  Returns the new manifest (``compacted: True``).
    """
    import math

    manifest = read_manifest(stage_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest under {stage_dir}")
    data_dir = os.path.join(stage_dir, "data")
    pcols = manifest.get("partition_cols") or []
    ds = rd.read_parquet(data_dir)
    nrows = int(manifest.get("row_count") or 0)
    nfiles = max(1, math.ceil(max(nrows, 1) / target_rows_per_file))
    if pcols:
        ds = ds.sort(pcols)
    ds = ds.repartition(nfiles)
    new = write_checkpoint(
        ds,
        stage_dir,
        manifest["signature"],
        partition_cols=pcols or None,
        extra={
            "compacted": True,
            "files_before": len(manifest.get("files", [])),
            "target_rows_per_file": target_rows_per_file,
        },
    )
    return new
