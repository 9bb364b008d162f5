"""Bloom-filter pre-filtered semi/anti joins.

The classic distributed-engine plan for ``WHERE EXISTS`` against a build
side too large to broadcast as an exact key set: sketch the build side's
keys into a fixed-size bit array (one streaming pass, partial bitmaps
OR-combine — the sketch is mergeable like MinHash signatures), broadcast
the *bitmap* (``num_bits/8`` bytes regardless of build-side row count),
prune the probe side with it, and exact-verify only the survivors.

Why this matters at scale: the exact verification join is the only
all-to-all exchange, and after Bloom pruning it moves ``true matches +
FPR x |probe|`` rows instead of ``|probe|`` rows.  At the default
``num_bits=2^22, num_hashes=4`` the FPR stays under ~1% up to ~500k
distinct build keys (p ~= (1 - e^(-kn/m))^k), so a 1%-selective EXISTS
shuffles ~2% of the probe side instead of all of it.  Semantics stay
EXACT because Bloom filters have no false negatives: every true match
survives pruning, and the verify join removes the false positives.

Hashing is ``pandas.util.hash_pandas_object`` (deterministic across
processes for ints and strings — fixed default hash key) with
Kirsch–Mitzenmacher double hashing for the k probe positions, all
vectorized in numpy; no per-row Python in either pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# Driver-side OR-combine reads at most this many partial bitmaps; the
# map_batches pass upstream pre-reduces block bitmaps down to this count so
# driver traffic is bounded by COMBINE_PARTS x num_bits/8 bytes (4 MiB at
# the defaults), independent of build-side size.
_COMBINE_PARTS = 8


def _key_hash64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable uint64 hash of a key column (int or string), vectorized.

    Nulls are hashed on the DROPPED subset and scattered back (null slots
    get 0): ``to_pandas`` on an int column WITH a null yields float64, and
    ``hash_pandas_object`` then hashes every OTHER value in the block
    differently than in a null-free block — which would give the Bloom
    filter false negatives (probed: hash of key 5 changed when a null
    shared its block).  Callers are responsible for null SEMANTICS (a null
    key never matches in SQL EXISTS); this function only guarantees the
    non-null hashes are block-content-independent."""
    from ner_ray.utils import stable_hash64

    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if a.null_count:
        valid = ~np.asarray(pc.is_null(a))
        h = stable_hash64(pd.Series(a.drop_null().to_pandas()))
        out = np.zeros(len(a), dtype=np.uint64)
        out[valid] = h
        return out
    return stable_hash64(pd.Series(a.to_pandas()))


def _valid_mask(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return ~np.asarray(pc.is_null(a))


def _positions(h: np.ndarray, num_bits: int, num_hashes: int) -> list[np.ndarray]:
    """Kirsch–Mitzenmacher: position_i = (h1 + i*h2) mod m.  ``h2`` is forced
    odd so with a power-of-two ``m`` the probe sequence never degenerates."""
    m = np.uint64(num_bits)
    h1 = h % m
    h2 = ((h >> np.uint64(33)) << np.uint64(1)) | np.uint64(1)
    return [((h1 + np.uint64(i) * h2) % m).astype(np.int64) for i in range(num_hashes)]


def _set_bits(bitmap: np.ndarray, idx: np.ndarray) -> None:
    # bitwise_or.at is the unbuffered form — duplicate indices within one
    # batch (routine for key columns) still all land.
    np.bitwise_or.at(
        bitmap,
        idx >> 6,
        np.left_shift(np.uint64(1), (idx & 63).astype(np.uint64)),
    )


def _test_bits(bitmap: np.ndarray, idx: np.ndarray) -> np.ndarray:
    return (
        (bitmap[idx >> 6] >> (idx & 63).astype(np.uint64)) & np.uint64(1)
    ).astype(bool)


def build_bloom_bitmap(
    build: Dataset, key: str, num_bits: int = 1 << 22, num_hashes: int = 4
) -> np.ndarray:
    """One streaming pass over the build side -> uint64[num_bits/64] bitmap.

    Per-block bitmaps are pre-reduced to ``_COMBINE_PARTS`` partials by a
    second (tiny) map_batches before the driver ORs them, so the driver
    never sees O(num_blocks) x bitmap-size bytes.
    """
    assert num_bits % 64 == 0 and (num_bits & (num_bits - 1)) == 0, "num_bits: power of two"
    words = num_bits // 64

    def block_bitmap(t: pa.Table) -> pa.Table:
        bm = np.zeros(words, dtype=np.uint64)
        # null build keys never match in SQL EXISTS — they must not set bits
        t = t.filter(pc.is_valid(t[key]))
        if t.num_rows:
            h = _key_hash64(t[key])
            for idx in _positions(h, num_bits, num_hashes):
                _set_bits(bm, idx)
        return pa.table({"bitmap": pa.array([bm.tobytes()], pa.binary())})

    def or_combine(t: pa.Table) -> pa.Table:
        bm = np.zeros(words, dtype=np.uint64)
        for payload in t["bitmap"].to_pylist():
            bm |= np.frombuffer(payload, dtype=np.uint64)
        return pa.table({"bitmap": pa.array([bm.tobytes()], pa.binary())})

    parts = (
        build.map_batches(block_bitmap, batch_format="pyarrow", batch_size=None)
        .repartition(_COMBINE_PARTS)
        .map_batches(or_combine, batch_format="pyarrow", batch_size=None)
    )
    bm = np.zeros(words, dtype=np.uint64)
    for row in parts.iter_rows():
        bm |= np.frombuffer(row["bitmap"], dtype=np.uint64)
    return bm


def bloom_semi_join(
    probe: Dataset,
    build: Dataset,
    on: str,
    build_on: str | None = None,
    *,
    anti: bool = False,
    num_bits: int = 1 << 22,
    num_hashes: int = 4,
    exact: bool = True,
    probe_schema: pa.Schema | None = None,
) -> Dataset:
    """EXISTS / NOT EXISTS with Bloom pruning and (default) exact verify.

    ``probe`` keeps rows whose ``on`` key appears (``anti``: does not
    appear) in ``build[build_on or on]``.  ``exact=False`` skips the verify
    join and returns the pruned-only result — approximate for semi (false
    positives at the documented FPR survive); for anti the pruned-only
    result *under*-keeps (Bloom false positives are wrongly dropped), so
    anti always verifies unless the caller explicitly opts out.

    Pass ``probe_schema`` when ``probe`` is a lazy chain (same rationale as
    ``joins.hash_join``: ``Dataset.schema()`` on an un-executed plan runs
    the whole upstream pipeline just to learn column types).
    """
    import ray

    from ner_ray.stages.joins import hash_join

    bkey = build_on or on
    bitmap = build_bloom_bitmap(
        build.select_columns([bkey]), bkey, num_bits=num_bits, num_hashes=num_hashes
    )
    bitmap_ref = ray.put(bitmap)

    # The probe is STATELESS (the bitmap is read-only shared memory), so it
    # runs as a task pool, not an actor pool: per-task ``ray.get`` of a
    # driver-owned object is a zero-copy plasma lookup (numpy maps the
    # buffer in place), each node fetches the bitmap once, and there is no
    # actor to restart — sidestepping ray#53727 (an ObjectRef in actor
    # constructor kwargs makes the actor unrestartable if the ref's owner
    # dies), which bit the flagship tagger pool in round 2.
    def probe_pass(keep_misses: bool) -> Dataset:
        def bloom_probe(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            bm = ray.get(bitmap_ref)
            h = _key_hash64(t[on])
            # null probe keys are definite misses (EXISTS false / NOT
            # EXISTS true), never bitmap lookups
            maybe = _valid_mask(t[on])
            for idx in _positions(h, num_bits, num_hashes):
                maybe &= _test_bits(bm, idx)
            return t.filter(pa.array(~maybe if keep_misses else maybe))

        return probe.map_batches(bloom_probe, batch_format="pyarrow")

    if anti and not exact:
        # approximate anti: keep definite misses only (under-keeps by FPR).
        return probe_pass(True)

    if anti:
        # exact anti consumes the probe chain TWICE (survivors + misses);
        # pin it so a lazy upstream plan runs once — only the (cheap)
        # bitmap test repeats per partition, not the upstream compute
        probe = probe.materialize()

    survivors = probe_pass(False)
    if not exact:
        return survivors

    ps = probe_schema
    if ps is None:
        s = probe.schema()
        # pandas-backed datasets report numpy dtypes / Python classes here,
        # not Arrow types — normalize so the join schemas stay Arrow.
        def as_arrow(t):
            if isinstance(t, pa.DataType):
                return t
            try:
                return pa.from_numpy_dtype(np.dtype(t))
            except (TypeError, pa.ArrowNotImplementedError):
                return pa.string()

        ps = pa.schema([(n, as_arrow(t)) for n, t in zip(s.names, s.types)])
    if "__bloom_cnt__" in ps.names:
        raise ValueError("probe side already has a __bloom_cnt__ column")

    # exact verify: distinct build keys (a groupby count, key column only)
    # joined against the Bloom survivors.  Only survivors shuffle.
    def as_probe_key(t: pa.Table) -> pa.Table:
        cnt = pa.array(np.ones(t.num_rows, dtype=np.int64))
        return pa.table({on: t[bkey].cast(ps.field(on).type), "__bloom_cnt__": cnt})

    distinct = (
        build.select_columns([bkey])
        .map_batches(as_probe_key, batch_format="pyarrow")
        .groupby(on)
        .max("__bloom_cnt__")
    )
    dschema = pa.schema([(on, ps.field(on).type), ("max(__bloom_cnt__)", pa.int64())])

    if not anti:
        joined = hash_join(
            survivors, distinct, on=on, how="inner", left_schema=ps, right_schema=dschema
        )
        return joined.select_columns(ps.names)

    # anti: definite misses pass immediately; Bloom-positive rows need the
    # exact check (left join, keep the null-count rows).
    misses = probe_pass(True)
    joined = hash_join(
        survivors, distinct, on=on, how="left", left_schema=ps, right_schema=dschema
    )

    def keep_nulls(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["max(__bloom_cnt__)"])).select(ps.names)

    verified = joined.map_batches(keep_nulls, batch_format="pyarrow")
    return misses.union(verified)
