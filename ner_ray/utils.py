"""Small shared runtime helpers."""

from __future__ import annotations

_configured = False


def configure_context() -> None:
    """Engine-wide DataContext tuning, applied once per process.

    Push-based sort shuffle: measurably better reduce-side parallelism for
    the groupby/sort exchanges on wide clusters (window-triples stage:
    1.6x 8->32-CPU scaling vs 1.2x with the pull-based default, and ~15%
    faster absolute at 32 CPUs).  Called from the pipeline/query entry
    modules; safe to call repeatedly.
    """
    global _configured
    if _configured:
        return
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    DataContext.get_current().shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    _configured = True


def pool_size(min_actors: int = 1) -> tuple[int, int]:
    """Default actor-pool ``concurrency`` for stateful ``map_batches`` stages:
    autoscale from ``min_actors`` up to the cluster's CPU count.

    A hardcoded cap (the old ``(1, 8)``) silently throttles every actor-pool
    stage on clusters wider than the cap — the scaling-efficiency killer when
    the same job runs at N and 4N CPUs.  Reading the cluster size at plan
    time keeps the pool proportional to the cluster.
    """
    import ray

    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    else:  # planning before ray.init (tests, doc examples): modest default
        cpus = 8
    # min = cpus/4: the autoscaling pool ramps too slowly for short stages if
    # it starts at 1 actor, but reserving the whole cluster as minimum would
    # starve concurrent pools in a fused pipeline.
    return (max(min_actors, cpus // 4), max(8, cpus))


def heavy_pool_size() -> int:
    """Pool sizing for the single heaviest stage of a pipeline (the flagship
    tagger): a FIXED pool of ``cpus - 2`` actors (2 CPUs reserved for the
    upstream read tasks, whose total work is seconds).

    Measured (216k-conv BERT flagship, pinned 32 cores): the previous
    autoscaling pool ``(cpus//2, cpus)`` averaged ~21 busy actors out of 32
    — the ramp decision lag dominated the stage and added ±20% run-to-run
    variance (30-56s); a fixed ``cpus-2`` pool runs the same stage in
    28.1-28.6s.  Fixed width is safe here BECAUSE every composition puts a
    ``materialize()`` barrier between two heavy pools (build_kg pins
    turn_mentions; kg_tagger_eval pins gold tags), so two fixed pools never
    coexist and cannot re-create the measured 3/4 + 1/4 min-actor live-lock
    that motivated the old autoscaling shape."""
    import ray

    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    else:
        cpus = 8
    # clamp to cpus-1 so a <=3-CPU cluster keeps one slot free for the
    # upstream read tasks (a pool equal to the whole cluster recreates the
    # read-starvation hang the docstring above describes)
    return min(max(2, cpus - 2), max(1, cpus - 1))


def stable_hash64(values) -> "np.ndarray":
    """Content-stable uint64 hash of a key array — THE bucket-hash
    primitive for keyed shuffles.

    Always ``pandas.util.hash_array(..., categorize=False)``: the default
    ``categorize=True`` path factorizes first, and pandas' string hash
    table compares C strings, so two DISTINCT keys that share a prefix
    before an interior NUL byte (e.g. ``"a\\x00p\\x00x"`` vs
    ``"a\\x00p\\x00y"`` — exactly the shape of ``\\x00``-joined composite
    keys) collide in the factorize and both inherit the hash of whichever
    appeared FIRST in the block.  That makes the bucket assignment
    BLOCK-ORDER-DEPENDENT: the same key lands in different buckets in
    different blocks and a bucketed merge emits duplicates (observed on
    the triple-provenance combiner).  ``categorize=False`` hashes every
    full string directly; for NUL-free input the values are bit-identical
    to the categorize path, so existing hash-partitioned layouts are
    unchanged.

    Accepts a pyarrow Array/ChunkedArray, numpy array, pandas Series, or
    list; nulls must be handled by the caller (bloom._key_hash64 wraps
    this with null scattering).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.to_numpy(zero_copy_only=False)
    elif isinstance(values, pd.Series):
        values = values.to_numpy()
    elif not hasattr(values, "dtype"):
        values = np.asarray(values, dtype=object)
    return pd.util.hash_array(values, categorize=False).astype(np.uint64)
