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
    """Combine partials (pandas groupby, vectorized max/sum; the Python list
    union runs only once per DISTINCT triple — used driver-side and per
    shuffle group)."""
    if not len(pdf):
        return schemas.DEDUP_TRIPLES.empty_table()
    g = pdf.groupby(KEY, sort=True)
    conf = g["confidence"].max()
    ns = g["n_support"].sum()
    convs = g["conv_ids"].agg(
        lambda s: sorted({c for lst in s for c in lst})[:PROVENANCE_CAP]
    )
    keys = conf.index
    return pa.table(
        {
            "subj": pa.array(keys.get_level_values(0), pa.string()),
            "pred": pa.array(keys.get_level_values(1), pa.string()),
            "obj": pa.array(keys.get_level_values(2), pa.string()),
            "confidence": pa.array(conf.to_numpy(), pa.float32()),
            "n_support": pa.array(ns.to_numpy(), pa.int64()),
            "conv_ids": pa.array(convs.tolist(), pa.list_(pa.string())),
        },
        schema=schemas.DEDUP_TRIPLES,
    )


def _merge_block(batch: pa.Table) -> pa.Table:
    return _merge_pdf(batch.to_pandas())


def dedup_triples(
    triples: Dataset, driver_threshold: int = 1_000_000, tree_threshold: int = 300_000
) -> Dataset:
    """Exact dedup over (subj, pred, obj) with provenance (DEDUP_TRIPLES).

    Three-level combine: per-block Arrow partials always; above
    ``tree_threshold`` partial rows a TREE round first re-merges the partials
    in a handful of parallel tasks (each block's output collapses to its
    distinct keys), so the vectorized driver merge only ever sees
    ``distinct x few-blocks`` rows; above ``driver_threshold`` the merge is a
    distributed keyed shuffle instead."""
    partials = triples.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n = partials.count()
    if n > driver_threshold:

        def merge_group(g: pa.Table) -> pa.Table:
            # stay in Arrow: list<string> provenance columns round-trip poorly
            # through Ray's pandas tensor extension
            return _merge_pdf(g.to_pandas())

        return partials.groupby(KEY).map_groups(merge_group, batch_format="pyarrow")
    if n > tree_threshold:
        partials = (
            partials.repartition(8)
            .map_batches(_merge_block, batch_format="pyarrow")
            .materialize()
        )
    return rd.from_arrow(_merge_pdf(partials.to_pandas()))
