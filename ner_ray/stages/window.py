"""Per-key ordered window functions, pivot, and set operations.

Window functions (``row_number`` / ``lag`` / cumulative and moving sums) are
the classic "ORDER BY inside PARTITION BY" shape: one hash shuffle on the
partition key, then a per-group mergesort — the same plan DuckDB/Spark run,
and the only shape that avoids a GLOBAL sort (a per-key window never needs
cross-key order, so sorting the whole 100 TB stream would be pure waste).
The partitioning assumption, as with ``sessionize``/``asof_gap_join``: one
key's rows fit in a worker's heap (per-user event streams; bound upstream if
a key can be pathological).

Sums are computed over INTEGER micro-units (``floor(x * 1e6 + 0.5)``, the
``retrieval.py`` idiom) so cumulative addition is exact and order-free
across engines — a float running sum would disagree with the oracle in the
last ulp whenever the window segment-tree adds in a different order.

Pivot is a two-level distributive fold: each block pivots locally
(vectorized pandas groupby over the fixed category list), then ONE small
``groupby(key)`` sums the partials — the shuffle carries |keys| x |cats|
numbers, never rows.  Set ops (INTERSECT / EXCEPT over key tuples) are a
tagged union + per-key flag-OR: both relations stream through a single
shuffle and both answers fall out of one pass (the SQL twin needs two).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Max


def to_micros(x: np.ndarray) -> np.ndarray:
    """float64 -> int64 micro-units, identical IEEE ops to the SQL twin's
    ``CAST(floor(x * 1000000 + 0.5) AS BIGINT)`` (floor(+0.5) rather than
    round(): DuckDB rounds half-away-from-zero, numpy half-even — floor of
    the same double is the one idiom both engines compute bit-identically)."""
    return np.floor(x.astype(np.float64) * 1e6 + 0.5).astype(np.int64)


def window_funcs(
    ds: Dataset,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    id_col: str,
    moving_rows: int = 4,
) -> Dataset:
    """Per-key ordered window: row_number, lag, cumulative sum, moving sum.

    Emits one row per input row: ``(id_col, key_col, rn, lag_value_micro,
    cum_value_micro, mov_value_micro)`` where ``rn`` is 1-based within the
    key ordered by ``order_cols`` (which must be a deterministic total order
    within each key — include a tiebreaker id), ``lag`` is the previous
    row's value (null for the first), ``cum`` the running sum, and ``mov``
    the sum of the trailing ``moving_rows`` rows including the current one
    (SQL ``ROWS BETWEEN moving_rows-1 PRECEDING AND CURRENT ROW``).
    """

    # Bucketed Arrow-native kernel (round 5; was groupby(key).map_groups
    # over pandas frames): keys hash into ``num_buckets`` buckets, ONE
    # key-shuffle on the bucket co-locates whole keys, and each bucket is
    # processed in a single segmented numpy pass — dispatch is ~num_buckets
    # calls instead of |keys| calls, and no Arrow→pandas→Arrow round trip.
    # Memory contract (stronger than the per-key one): a BUCKET's rows fit
    # a worker's heap — size num_buckets so |rows|/num_buckets does.
    num_buckets = 1024

    def bucketize(t: pa.Table) -> pa.Table:
        from ner_ray.utils import stable_hash64

        h = stable_hash64(t[key_col])  # NUL-safe (see utils.stable_hash64)
        return t.append_column("_bkt", pa.array((h % num_buckets).astype(np.int64)))

    sort_keys = [(c, "ascending") for c in [key_col, *order_cols]]

    def win_block(g: pa.Table) -> pa.Table:
        g = g.sort_by(sort_keys)
        keys = g[key_col].to_numpy(zero_copy_only=False)
        v = to_micros(g[value_col].to_numpy(zero_copy_only=False))
        n = len(v)
        pos = np.arange(n, dtype=np.int64)
        newseg = np.r_[True, keys[1:] != keys[:-1]]
        seg_start = np.maximum.accumulate(np.where(newseg, pos, 0))
        rn = pos - seg_start + 1
        cum_g = np.cumsum(v)
        base = np.where(seg_start > 0, cum_g[np.maximum(seg_start - 1, 0)], 0)
        cum = cum_g - base
        # trailing window: subtract the cumsum just before max(seg_start,
        # i - W + 1) — the segment guard the per-group form got for free
        j = np.maximum(seg_start, pos - moving_rows + 1)
        mov = cum_g - np.where(j > 0, cum_g[np.maximum(j - 1, 0)], 0)
        lag = np.empty(n, np.int64)
        if n:
            lag[0] = 0
            lag[1:] = v[:-1]
        return pa.table(
            {
                id_col: g[id_col],
                key_col: g[key_col],
                "rn": pa.array(rn, pa.int64()),
                "lag_value_micro": pa.array(lag, pa.int64(), mask=newseg),
                "cum_value_micro": pa.array(cum, pa.int64()),
                "mov_value_micro": pa.array(mov, pa.int64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(win_block, batch_format="pyarrow")
    )


def rank_in_shard(
    ds: Dataset,
    shard_col: str,
    order_cols: list[str],
    keep_cols: list[str],
) -> Dataset:
    """Deterministic in-shard positions: one key shuffle on ``shard_col`` +
    a per-shard mergesort over ``order_cols`` assigns ``pos`` 1..n.  The
    training data-loader shuffle shape: shards are the unit a loader reads,
    positions define the reproducible intra-shard order — no RNG state, no
    global sort (shards never need cross-shard order).  ``order_cols`` must
    be a total order (include a unique id as tiebreaker).  Per-shard rows
    must fit a worker's heap: pick shard counts so |rows| / shards does
    (the same contract as every per-group op here)."""

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        out = {c: g[c].to_numpy() for c in [shard_col] + keep_cols}
        out["pos"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return pd.DataFrame(out)

    cols = keep_cols + [shard_col, "pos"]
    return (
        ds.groupby(shard_col)
        .map_groups(rank, batch_format="pandas")
        .select_columns(cols)
    )


def pivot_agg(
    ds: Dataset,
    key_col: str,
    pivot_col: str,
    categories: list[str],
    value_col: str,
) -> Dataset:
    """Pivot ``pivot_col`` into per-category count and micro-sum columns.

    ``categories`` is the FIXED output column list (unknown categories fold
    into ``other``) — a pivot whose columns depend on the data would need a
    full pre-pass; pinning them keeps this a single streaming fold.  Output:
    ``(key_col, n_<cat>, sum_<cat>_micro, ...)`` — counts and exact integer
    micro-sums, distributive, so block partials merge by plain Sum.
    """
    cats = list(categories) + ["other"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cat = pd.Categorical(
            np.where(df[pivot_col].isin(categories), df[pivot_col], "other"),
            categories=cats,
        )
        v = to_micros(df[value_col].to_numpy())
        g = pd.DataFrame({key_col: df[key_col].to_numpy(), "_c": cat, "_v": v})
        piv_n = g.pivot_table(index=key_col, columns="_c", values="_v", aggfunc="size", fill_value=0, observed=False)
        piv_s = g.pivot_table(index=key_col, columns="_c", values="_v", aggfunc="sum", fill_value=0, observed=False)
        out = pd.DataFrame({key_col: piv_n.index.to_numpy()})
        for c in cats:
            out[f"n_{c}"] = piv_n[c].to_numpy().astype(np.int64)
            out[f"sum_{c}_micro"] = piv_s[c].to_numpy().astype(np.int64)
        return out

    # merge partials with a bucketed segmented-reduceat kernel, NOT
    # groupby().aggregate(Sum x8): Ray 2.49's Aggregate degrades badly with
    # many aggregates (measured on these exact partials: 8 Sums over 64
    # blocks x 970 users = 22.4 s vs 1.1 s for the same sort shuffle +
    # per-group pandas sum — the merge loop re-walks blocks per aggregate).
    # Bucketing (the window_funcs round-5 pattern) cuts dispatch from
    # |keys| map_groups calls to ~num_buckets, each one sorted numpy pass.
    val_cols = [f"{p}{c}{s}" for c in cats for p, s in (("n_", ""), ("sum_", "_micro"))]
    num_buckets = 1024

    def add_bucket(t: pa.Table) -> pa.Table:
        from ner_ray.utils import stable_hash64

        h = stable_hash64(t[key_col])  # NUL-safe (see utils.stable_hash64)
        return t.append_column("_bkt", pa.array((h % num_buckets).astype(np.int64)))

    def merge_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_bkt"])
        if g.num_rows == 0:
            return g
        g = g.sort_by([(key_col, "ascending")])
        keys = g[key_col].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        cols = {key_col: g[key_col].take(pa.array(starts))}
        for c in val_cols:
            v = g[c].to_numpy(zero_copy_only=False).astype(np.int64)
            cols[c] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    # batch_size coalesces small upstream blocks so each partial folds ~64k
    # rows: the shuffle then carries ~|keys| rows per TASK, not per block
    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def set_ops(left: Dataset, right: Dataset, on: str | list[str]) -> Dataset:
    """INTERSECT / EXCEPT (distinct) over key tuples, both in ONE pass.

    Tags each side with a presence flag, unions, and takes per-key flag
    maxima — one shuffle computes membership in both relations, from which
    every set op is a filter: output is ``(keys..., op)`` with ``op`` in
    ``{'both', 'left_only', 'right_only'}`` (INTERSECT = both, EXCEPT =
    left_only, reverse EXCEPT = right_only).
    """
    keys = [on] if isinstance(on, str) else list(on)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {k: t[k] for k in keys}
            cols["_l"] = pa.array(np.full(n, 1 - side, np.int8))
            cols["_r"] = pa.array(np.full(n, side, np.int8))
            return pa.table(cols)

        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    flags = both.groupby(keys).aggregate(Max("_l", alias_name="_l"), Max("_r", alias_name="_r"))

    def label(t: pa.Table) -> pa.Table:
        l = t["max(_l)" if "max(_l)" in t.column_names else "_l"]
        r = t["max(_r)" if "max(_r)" in t.column_names else "_r"]
        lb = pc.cast(l, pa.bool_())
        rb = pc.cast(r, pa.bool_())
        op = pc.if_else(
            pc.and_(lb, rb),
            pa.scalar("both"),
            pc.if_else(lb, pa.scalar("left_only"), pa.scalar("right_only")),
        )
        cols = {k: t[k] for k in keys}
        cols["op"] = op
        return pa.table(cols)

    return flags.map_batches(label, batch_format="pyarrow")
