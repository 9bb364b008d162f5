"""B7 — exact triple deduplication with provenance merge.

One output row per distinct ``(subj, pred, obj)``; ``n_support`` counts
supporting extractions, ``confidence`` keeps the max, ``conv_ids`` keeps a
small provenance sample (capped, deterministic order).

Scale shape: a **combiner** first collapses duplicates inside every batch via
``map_batches`` (vectorized pandas groupby), so the hash-partition shuffle on
the triple key moves partial aggregates, not the raw extraction stream — at
100 TB the window extractor emits heavily repeated co-mention pairs, and this
pre-aggregation is the difference between shuffling terabytes and gigabytes.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ner_ray import schemas

PROVENANCE_CAP = 5
KEY = ["subj", "pred", "obj"]


def _partial(batch: pd.DataFrame) -> pd.DataFrame:
    g = batch.groupby(KEY, sort=False)
    out = g.agg(
        confidence=("confidence", "max"),
        n_support=("confidence", "size"),
        conv_ids=("conv_id", lambda s: sorted(set(s))[:PROVENANCE_CAP]),
    ).reset_index()
    return out


def _merge(group: pd.DataFrame) -> pd.DataFrame:
    convs: set[str] = set()
    for lst in group["conv_ids"]:
        convs.update(lst)
    return pd.DataFrame(
        {
            "subj": [group["subj"].iloc[0]],
            "pred": [group["pred"].iloc[0]],
            "obj": [group["obj"].iloc[0]],
            "confidence": [float(group["confidence"].max())],
            "n_support": [int(group["n_support"].sum())],
            "conv_ids": [sorted(convs)[:PROVENANCE_CAP]],
        }
    )


def _cast(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "subj": pa.compute.cast(batch["subj"], pa.string()),
            "pred": pa.compute.cast(batch["pred"], pa.string()),
            "obj": pa.compute.cast(batch["obj"], pa.string()),
            "confidence": pa.compute.cast(batch["confidence"], pa.float32()),
            "n_support": pa.compute.cast(batch["n_support"], pa.int64()),
            "conv_ids": pa.compute.cast(batch["conv_ids"], pa.list_(pa.string())),
        },
        schema=schemas.DEDUP_TRIPLES,
    )


def dedup_triples(triples: Dataset) -> Dataset:
    """Exact dedup over (subj, pred, obj) with provenance (DEDUP_TRIPLES)."""
    partials = triples.map_batches(_partial, batch_format="pandas")
    merged = partials.groupby(KEY).map_groups(_merge, batch_format="pandas")
    return merged.map_batches(_cast, batch_format="pyarrow")
