"""B7 — exact triple deduplication with provenance merge.

One output row per distinct ``(subj, pred, obj)``; ``n_support`` counts
supporting extractions, ``confidence`` keeps the max, ``conv_ids`` keeps a
small provenance sample (capped, deterministic order).

Scale shape: a **combiner** first collapses duplicates inside every batch via
Arrow's hash ``group_by`` (vectorized max/count/distinct — no pandas
conversion, no per-group Python), so whatever follows moves partial
aggregates, not the raw extraction stream — at 100 TB the window extractor
emits heavily repeated co-mention pairs, and this pre-aggregation is the
difference between shuffling terabytes and gigabytes.  The final combine is
hybrid (same rationale as canonicalize): below ``driver_threshold`` partial
rows the merge happens driver-side with zero shuffle; above it, the keyed
``groupby().map_groups`` shuffle distributes the merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from ner_ray import schemas

PROVENANCE_CAP = 5
KEY = ["subj", "pred", "obj"]


def _partial(batch: pa.Table) -> pa.Table:
    """Per-block combiner: one row per distinct triple in the block."""
    g = batch.group_by(KEY).aggregate(
        [("confidence", "max"), ("confidence", "count"), ("conv_id", "distinct")]
    )
    # cap provenance deterministically (rows here = distinct-in-block, small)
    convs = [sorted(lst)[:PROVENANCE_CAP] for lst in g["conv_id_distinct"].to_pylist()]
    return pa.table(
        {
            "subj": g["subj"],
            "pred": g["pred"],
            "obj": g["obj"],
            "confidence": g["confidence_max"],
            "n_support": pa.compute.cast(g["confidence_count"], pa.int64()),
            "conv_ids": pa.array(convs, pa.list_(pa.string())),
        }
    )


def _merge_pdf(pdf: pd.DataFrame) -> pa.Table:
    """Combine partials (pandas; used driver-side and per shuffle group)."""
    rows: dict[tuple, list] = {}
    for subj, pred, obj, conf, n, convs in zip(
        pdf["subj"], pdf["pred"], pdf["obj"], pdf["confidence"], pdf["n_support"], pdf["conv_ids"]
    ):
        k = (subj, pred, obj)
        cur = rows.get(k)
        if cur is None:
            rows[k] = [float(conf), int(n), set(convs)]
        else:
            cur[0] = max(cur[0], float(conf))
            cur[1] += int(n)
            cur[2].update(convs)
    keys = sorted(rows)
    return pa.table(
        {
            "subj": pa.array([k[0] for k in keys], pa.string()),
            "pred": pa.array([k[1] for k in keys], pa.string()),
            "obj": pa.array([k[2] for k in keys], pa.string()),
            "confidence": pa.array([rows[k][0] for k in keys], pa.float32()),
            "n_support": pa.array([rows[k][1] for k in keys], pa.int64()),
            "conv_ids": pa.array(
                [sorted(rows[k][2])[:PROVENANCE_CAP] for k in keys], pa.list_(pa.string())
            ),
        },
        schema=schemas.DEDUP_TRIPLES,
    )


def dedup_triples(triples: Dataset, driver_threshold: int = 200_000) -> Dataset:
    """Exact dedup over (subj, pred, obj) with provenance (DEDUP_TRIPLES)."""
    partials = triples.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if partials.count() <= driver_threshold:
        return rd.from_arrow(_merge_pdf(partials.to_pandas()))

    def merge_group(g: pa.Table) -> pa.Table:
        # stay in Arrow: list<string> provenance columns round-trip poorly
        # through Ray's pandas tensor extension
        return _merge_pdf(g.to_pandas())

    return partials.groupby(KEY).map_groups(merge_group, batch_format="pyarrow")
