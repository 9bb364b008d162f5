"""CSV transcript source: delimited text -> the mandated transcripts schema
(BASELINE.json input_hint), completing the B1 format set (Parquet native,
JSONL, CSV) so every downstream stage stays format-agnostic.

Expected header: ``conv_id, turn_idx, role, text, tool, ts`` (extra columns
are dropped; ``tool`` may be absent -> "").  ``ts`` accepts an integer epoch
(seconds or micros, heuristically: values < 10^12 are seconds — the JSONL
source's rule), an already-parsed Arrow timestamp, or an ISO-8601 string.
Distribution unit = file blocks via ``ray.data.read_csv`` (Arrow CSV reader,
vectorized parse); normalization is one zero-copy-friendly ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from ner_ray import schemas


def _normalize(t: pa.Table) -> pa.Table:
    def col(name: str, default: str = "") -> pa.Array:
        if name in t.column_names:
            c = t[name]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            return pc.fill_null(pc.cast(c, pa.string()), default)
        return pa.array([default] * t.num_rows, pa.string())

    ts = t["ts"]
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    if pa.types.is_timestamp(ts.type):
        ts_us = pc.cast(ts, pa.timestamp("us"))
    elif pa.types.is_integer(ts.type):
        v = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.where(v < 1_000_000_000_000, v * 1_000_000, v)
        ts_us = pa.array(v, pa.timestamp("us"))
    else:
        # ISO-8601 string
        ts_us = pc.cast(
            pc.strptime(pc.cast(ts, pa.string()), format="%Y-%m-%d %H:%M:%S", unit="us"),
            pa.timestamp("us"),
        )
    return pa.table(
        {
            "conv_id": col("conv_id"),
            "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
            "role": col("role"),
            "text": col("text"),
            "tool": col("tool"),
            "ts": ts_us,
        },
        schema=schemas.TRANSCRIPTS,
    )


def read_transcripts_csv(paths: str | list[str], **read_csv_kwargs) -> Dataset:
    """Read CSV transcript files into the canonical transcripts Dataset."""
    return rd.read_csv(paths, **read_csv_kwargs).map_batches(
        _normalize, batch_format="pyarrow"
    )
