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
rows the merge happens driver-side with zero shuffle; above it, a bucketed
keyed shuffle distributes the merge (see ``dedup_triples``).
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
    """Combine partials — fully vectorized.  The provenance union is an
    explode -> drop_duplicates -> per-key cumcount cap (all C-speed); a
    per-distinct-key Python ``set`` union here was the serial tail of the
    whole dedup stage (1.8s driver-side on the bench corpus, and it GREW
    with cluster width because more blocks -> more partial rows)."""
    if not len(pdf):
        return schemas.DEDUP_TRIPLES.empty_table()
    g = pdf.groupby(KEY, sort=True)
    conf = g["confidence"].max()
    ns = g["n_support"].sum()
    ex = pdf[KEY + ["conv_ids"]].explode("conv_ids", ignore_index=True)
    ex = ex.dropna(subset=["conv_ids"])  # empty provenance lists explode to NaN
    ex = ex.drop_duplicates().sort_values(KEY + ["conv_ids"], kind="stable")
    keep = ex.groupby(KEY, sort=False).cumcount() < PROVENANCE_CAP
    ex = ex[keep]
    convs = ex.groupby(KEY, sort=True)["conv_ids"].agg(list)
    convs = convs.reindex(conf.index)
    convs = convs.apply(lambda v: v if isinstance(v, list) else [])
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


def dedup_triples(
    triples: Dataset, driver_threshold: int = 1_000_000, num_buckets: int | None = None
) -> Dataset:
    """Exact dedup over (subj, pred, obj) with provenance (DEDUP_TRIPLES).

    Two-level combine: per-block Arrow partials always; at or below
    ``driver_threshold`` partial rows the (vectorized) merge happens
    driver-side with zero shuffle, above it the partials hash-bucket on the
    triple key and each bucket merges in its own task.  Buckets — not
    ``groupby(KEY)`` — because Ray's ``map_groups`` dispatch costs ~50us per
    group and the triple key is high-cardinality at scale; ~4 buckets/CPU
    keeps dispatch O(cluster) while the in-bucket merge stays vectorized."""
    partials = triples.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return merge_dedup_partials(partials, driver_threshold, num_buckets)


def merge_dedup_partials(
    partials: Dataset, driver_threshold: int = 1_000_000, num_buckets: int | None = None
) -> Dataset:
    """Final combine over DEDUP_TRIPLES-shaped partial aggregates — the merge
    half of ``dedup_triples``, public because every dedup aggregate is
    DISTRIBUTIVE (sum n_support, max confidence, min-5 provenance union), so
    independently deduped row sets (e.g. per-increment graphs in an
    incremental build, or a rewritten already-deduped graph whose keys
    collided) merge into exactly the from-scratch result."""
    partials = partials.materialize()
    n = partials.count()
    if n <= driver_threshold:
        return rd.from_arrow(_merge_pdf(partials.to_pandas()))

    from ner_ray.utils import pool_size

    B = num_buckets or 4 * pool_size()[1]

    def add_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ner_ray.utils import stable_hash64

        joined = pc.binary_join_element_wise(
            batch["subj"], batch["pred"], batch["obj"], "\x00"
        )
        # stable_hash64, NOT plain hash_array: the \x00-joined key REQUIRES
        # the NUL-safe categorize=False path (see utils.stable_hash64)
        h = stable_hash64(joined) % B
        return batch.append_column("bucket", pa.array(h.astype(np.int64)))

    def merge_bucket(g: pa.Table) -> pa.Table:
        # stay in Arrow on the way in: list<string> provenance columns
        # round-trip poorly through Ray's pandas tensor extension
        return _merge_pdf(g.drop_columns(["bucket"]).to_pandas())

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def triple_provenance(
    canon_triples: Dataset, turn_ts: Dataset, num_buckets: int | None = None
) -> Dataset:
    """Per-triple temporal provenance over the PRE-dedup canonical stream:
    one row per distinct ``(subj, pred, obj)`` with ``n_support`` (supporting
    extractions), ``n_convs`` (distinct source conversations), and
    ``first_ts_us`` / ``last_ts_us`` (the time range of supporting turns) —
    the lineage record an incremental 10^12-turn build consults to age,
    re-verify, or time-slice graph edges.

    ``turn_ts`` is the narrow ``(conv_id, turn_idx, ts_us)`` side read
    directly from the transcript source (3 columns, never the text).

    Scale shape: ONE bucketed join on (conv_id, turn_idx) attaches turn
    timestamps, then the dedup combiner pattern — per-block Arrow
    ``group_by`` partials at (triple, conv) grain, a single triple-key
    bucket shuffle, and a two-level vectorized in-bucket merge (first
    re-combine (triple, conv) partials, then fold conversations per
    triple).  Every aggregate is distributive (sum/min/max/count-distinct
    via the (triple, conv) grain), so block layout never changes the
    result.
    """
    import pyarrow.compute as pc

    from ner_ray.stages.joins import hash_join
    from ner_ray.utils import pool_size, stable_hash64

    j = hash_join(canon_triples, turn_ts, on=["conv_id", "turn_idx"])
    B = num_buckets or 4 * pool_size()[1]

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["subj", "pred", "obj", "conv_id"]).aggregate(
            [("ts_us", "min"), ("ts_us", "max"), ("conv_id", "count")]
        )
        joined = pc.binary_join_element_wise(g["subj"], g["pred"], g["obj"], "\x00")
        h = stable_hash64(joined) % B  # NUL-safe (see utils.stable_hash64)
        return pa.table(
            {
                "subj": g["subj"],
                "pred": g["pred"],
                "obj": g["obj"],
                "conv_id": g["conv_id"],
                "first": g["ts_us_min"],
                "last": g["ts_us_max"],
                "n": pc.cast(g["conv_id_count"], pa.int64()),
                "bucket": pa.array(h.astype(np.int64)),
            }
        )

    def merge_bucket(g: pa.Table) -> pa.Table:
        byconv = g.group_by(["subj", "pred", "obj", "conv_id"]).aggregate(
            [("first", "min"), ("last", "max"), ("n", "sum")]
        )
        out = byconv.group_by(["subj", "pred", "obj"]).aggregate(
            [
                ("n_sum", "sum"),
                ("conv_id", "count"),
                ("first_min", "min"),
                ("last_max", "max"),
            ]
        )
        return pa.table(
            {
                "subj": out["subj"],
                "pred": out["pred"],
                "obj": out["obj"],
                "n_support": pc.cast(out["n_sum_sum"], pa.int64()),
                "n_convs": pc.cast(out["conv_id_count"], pa.int64()),
                "first_ts_us": pc.cast(out["first_min_min"], pa.int64()),
                "last_ts_us": pc.cast(out["last_max_max"], pa.int64()),
            }
        )

    return (
        j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )
