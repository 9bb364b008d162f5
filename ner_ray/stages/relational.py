"""B11 — relational building blocks: broadcast joins, windows, rounding.

These are the oracle-facing wrappers over Ray Data primitives
(``__ray_entry__.py`` correctness gate).  The key scale pattern is
``broadcast_join``: dimension tables (customer, nation, part, supplier) are
``ray.put`` ONCE and every map task does a vectorized pandas merge against
the shared copy — a fact-table scan never shuffles for a small-side join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ner_ray.utils import pool_size


def broadcast_join(
    ds: Dataset,
    small: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
    columns: list[str] | None = None,
) -> Dataset:
    """Join a large Dataset against a broadcast small side (no shuffle).

    The small side ships once via ``ray.put`` as an Arrow table; every batch
    runs an in-memory Arrow (acero) hash join — blocks stay zero-copy Arrow
    end to end (a pandas merge here would force every downstream shuffle to
    convert pandas blocks, which measurably slows the groupbys that follow).
    """
    import ray

    if columns is not None:
        keys = [on] if isinstance(on, str) else list(on)
        small = small[list(dict.fromkeys(keys + columns))]
    # strip pandas schema metadata: it makes pa.Schema unhashable, which
    # defeats Ray's downstream schema-dedup (log-spams every shuffle)
    small_arrow = pa.Table.from_pandas(small, preserve_index=False).replace_schema_metadata(None)
    ref = ray.put(small_arrow)
    join_type = {"inner": "inner", "left": "left outer"}[how]

    class Merge:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.join(self.small, keys=on, join_type=join_type)

    return ds.map_batches(Merge, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool_size())


def semi_join_filter(ds: Dataset, keys: set, key_col: str, anti: bool = False) -> Dataset:
    """Semi-join (or anti-join with ``anti=True``): keep rows whose key is
    in (not in) the broadcast key set — the shuffle-free EXISTS/NOT EXISTS
    plan when the key side is small enough to broadcast."""
    import ray

    if not keys:
        # empty key set: pa.array([]) is null-typed and pc.is_in raises a
        # type error against any real column — and no lookup is needed:
        # EXISTS is false everywhere, NOT EXISTS true everywhere
        if anti:
            return ds
        return ds.map_batches(
            lambda t: t.slice(0, 0), batch_format="pyarrow"
        )

    ref = ray.put(pa.array(sorted(keys)))

    class Filt:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch[key_col], value_set=self.keys)
            return batch.filter(pc.invert(mask) if anti else mask)

    return ds.map_batches(Filt, batch_format="pyarrow", concurrency=pool_size())


def tumbling_window(ds: Dataset, ts_col: str, unit: str, out_col: str = "window_start") -> Dataset:
    """Event-time tumbling window: floor the timestamp to the unit boundary
    (DuckDB twin: ``date_trunc(unit, ts)``)."""

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, pc.floor_temporal(batch[ts_col], unit=unit))

    return ds.map_batches(add, batch_format="pyarrow")


def round_columns(ds: Dataset, cols: list[str], ndigits: int = 4) -> Dataset:
    """Round float columns (both engine and oracle round, so float summation
    order can't flip the value-hash)."""

    def rnd(batch: pa.Table) -> pa.Table:
        for c in cols:
            i = batch.column_names.index(c)
            batch = batch.set_column(
                i, c, pc.round(pc.cast(batch[c], pa.float64()), ndigits=ndigits)
            )
        return batch

    return ds.map_batches(rnd, batch_format="pyarrow")


def grouped_agg_partial(
    ds: Dataset,
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_col: str | None = None,
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
) -> pd.DataFrame:
    """Low-cardinality grouped aggregate via the combiner pattern: each block
    pre-aggregates with Arrow's hash group_by (one partial row per distinct
    key per block), and the tiny partial set combines on the driver — **no
    all-to-all shuffle at all**.

    Use ONLY when the distinct-key count is small (TPC-H flag/nation-style
    groupings); high-cardinality groupbys must use ``Dataset.groupby`` so the
    combine itself distributes.  ``sums``/``mins``/``maxs`` map output-column
    -> input-column; means are derived by the caller as sum/count.
    """
    sums, mins, maxs = sums or {}, mins or {}, maxs or {}
    aggs = [(c, "sum") for c in sums.values()]
    aggs += [(c, "min") for c in mins.values()]
    aggs += [(c, "max") for c in maxs.values()]
    if count_col:
        # COUNT(*) via an explicit constant-1 column: Arrow's per-column
        # "count" skips nulls, which diverges from the SQL twin whenever a
        # summed column contains nulls.
        aggs.append(("_one", "sum"))

    def partial(batch: pa.Table) -> pa.Table:
        if count_col:
            batch = batch.append_column(
                "_one", pa.array(np.ones(batch.num_rows, dtype=np.int64))
            )
        return batch.group_by(keys).aggregate(aggs)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    # dropna=False: SQL GROUP BY keeps the null-key group and the Arrow
    # per-block partials above already emit it — pandas' default dropna=True
    # would silently discard those partial rows in the combine
    gb = parts.groupby(keys, sort=False, dropna=False)
    out = pd.DataFrame(index=gb.size().index)
    for name, c in sums.items():
        out[name] = gb[f"{c}_sum"].sum()
    for name, c in mins.items():
        out[name] = gb[f"{c}_min"].min()
    for name, c in maxs.items():
        out[name] = gb[f"{c}_max"].max()
    if count_col:
        out[count_col] = gb["_one_sum"].sum().astype("int64")
    return out.reset_index()


def _block_topn(
    batch: pa.Table,
    key_col: str,
    order_col: str,
    n: int,
    tiebreak_col: str,
    ascending: bool = False,
) -> pa.Table:
    """Per-block per-key top-N in Arrow (the shuffle pre-combiner of
    ``top_n_per_group``): sort the block, then keep the first N rows of each
    contiguous key run via a vectorized run-position mask."""
    if batch.num_rows <= n:
        return batch
    t = batch.sort_by(
        [
            (key_col, "ascending"),
            (order_col, "ascending" if ascending else "descending"),
            (tiebreak_col, "ascending"),
        ]
    )
    key = t[key_col]
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    codes = pc.dictionary_encode(key).indices.to_numpy(zero_copy_only=False)
    change = np.r_[True, codes[1:] != codes[:-1]]
    starts = np.flatnonzero(change)
    run_id = np.cumsum(change) - 1
    pos_in_run = np.arange(len(codes)) - starts[run_id]
    return t.filter(pa.array(pos_in_run < n))


def top_n_per_group(
    ds: Dataset,
    key_col: str,
    order_col: str,
    n: int,
    tiebreak_col: str,
    rank_col: str = "rn",
    ascending: bool = False,
) -> Dataset:
    """Per-group top-N with a deterministic rank (DuckDB twin:
    ``row_number() OVER (PARTITION BY key ORDER BY ord DESC, tie)``;
    ``ascending=True`` flips the order column to ASC — the bottom-N /
    quota-sampling form — with the same pre-combine exactness argument).

    Scale shape: a per-block Arrow PRE-COMBINER keeps only the top-N rows per
    key per block before the hash shuffle, so the groupby moves at most
    ``N * blocks`` rows per key — a skewed hot key lands a bounded group on
    its reducer instead of the whole raw group.  The final per-group head is
    exact because the true top-N of a group is contained in the union of its
    per-block top-Ns (min/max distributivity).  The final head runs as the
    bucketed Arrow-native kernel (the window_funcs round-5 pattern): keys
    hash into buckets, ONE shuffle on the bucket, and each bucket ranks all
    its key segments in a single sorted numpy pass — ~num_buckets
    dispatches instead of |keys|, no Arrow→pandas round trip."""
    num_buckets = 1024
    order_dir = "ascending" if ascending else "descending"

    def precombine(batch: pa.Table) -> pa.Table:
        from ner_ray.utils import stable_hash64

        t = _block_topn(batch, key_col, order_col, n, tiebreak_col, ascending)
        h = stable_hash64(t[key_col])  # NUL-safe (see utils.stable_hash64)
        return t.append_column("_bkt", pa.array((h % num_buckets).astype(np.int64)))

    def bucket_head(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_bkt"])
        if g.num_rows == 0:
            return g.append_column(rank_col, pa.array([], pa.int64()))
        g = g.sort_by(
            [(key_col, "ascending"), (order_col, order_dir), (tiebreak_col, "ascending")]
        )
        keys = g[key_col].to_numpy(zero_copy_only=False)
        pos = np.arange(len(keys), dtype=np.int64)
        newseg = np.r_[True, keys[1:] != keys[:-1]]
        seg_start = np.maximum.accumulate(np.where(newseg, pos, 0))
        rn = pos - seg_start + 1
        mask = rn <= n
        out = g.filter(pa.array(mask))
        return out.append_column(rank_col, pa.array(rn[mask], pa.int64()))

    pre = ds.map_batches(precombine, batch_format="pyarrow", zero_copy_batch=True)
    return pre.groupby("_bkt").map_groups(bucket_head, batch_format="pyarrow")


def asof_gap_join(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    left_pred: str,
    right_pred: str,
    pred_col: str,
    id_col: str,
    gap_col: str = "gap_s",
) -> Dataset:
    """As-of join within each key: for every left row, the most recent right
    row with ``right.ts <= left.ts``; emits ``(id, gap_s)`` (tie-safe: the
    gap to ``max(right.ts)`` is unique even when right ids tie on ts).

    One BUCKET shuffle on ``hash(key_col)`` (the round-5 segmented-kernel
    pattern: ~num_buckets dispatches, not |keys|); inside each bucket one
    sorted carry-forward pass handles every key segment at once — for each
    left row the most recent right row is the running-last right POSITION,
    valid only if it falls inside the row's own key segment.
    """
    num_buckets = 1024

    def bucketize(t: pa.Table) -> pa.Table:
        from ner_ray.utils import stable_hash64

        h = stable_hash64(t[key_col])  # NUL-safe (see utils.stable_hash64)
        return t.append_column("_bkt", pa.array((h % num_buckets).astype(np.int64)))

    empty = pa.table(
        {id_col: pa.array([], pa.int64()), gap_col: pa.array([], pa.float64())}
    )

    def merge_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        # right rows sort BEFORE left at equal ts so the inclusive
        # right.ts <= left.ts match carries forward
        side = pc.equal(g[pred_col], left_pred)
        g = g.append_column("_l", side).sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"), ("_l", "ascending")]
        )
        keys = g[key_col].to_numpy(zero_copy_only=False)
        ts = g[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        is_left = g["_l"].to_numpy(zero_copy_only=False).astype(bool)
        is_right = pc.equal(g[pred_col], right_pred).to_numpy(zero_copy_only=False).astype(bool)
        n = len(keys)
        pos = np.arange(n, dtype=np.int64)
        newseg = np.r_[True, keys[1:] != keys[:-1]]
        seg_start = np.maximum.accumulate(np.where(newseg, pos, 0))
        carry = np.maximum.accumulate(np.where(is_right, pos, -1))
        ok = is_left & (carry >= seg_start)
        gaps = (ts[ok] - ts[carry[ok]]) / 1e6
        ids = g[id_col].to_numpy(zero_copy_only=False)[ok].astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                gap_col: pa.array(np.round(gaps, 3), pa.float64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def range_pair_counts(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    window_seconds: int = 60,
    out_col: str = "n_pairs",
) -> Dataset:
    """Self range-join count per key: ordered pairs (i<j by ``(ts, id)``) with
    ``ts_j - ts_i <= window``; a two-pointer sweep over the ts-sorted group
    replaces the quadratic self-join (DuckDB twin uses the explicit join).

    Bucketed (round-5 pattern): ONE shuffle on ``hash(key)``, each bucket
    sorts once by ``(key, ts, id)`` and sweeps its key segments with
    per-segment ``searchsorted`` — numpy slice calls, not map_groups
    dispatches."""
    num_buckets = 1024

    def bucketize(t: pa.Table) -> pa.Table:
        from ner_ray.utils import stable_hash64

        h = stable_hash64(t[key_col])  # NUL-safe (see utils.stable_hash64)
        return t.append_column("_bkt", pa.array((h % num_buckets).astype(np.int64)))

    def sweep_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_bkt"])
        if g.num_rows == 0:
            return pa.table(
                {
                    key_col: g[key_col],
                    out_col: pa.array([], pa.int64()),
                }
            )
        g = g.sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
        )
        keys = g[key_col].to_numpy(zero_copy_only=False)
        ts = g[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        w = window_seconds * 1_000_000
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[bounds[1:], len(keys)]
        out_keys, out_n = [], []
        for s, e in zip(bounds, ends):
            seg = ts[s:e]
            hi = np.searchsorted(seg, seg + w, side="right")
            n = int((hi - np.arange(1, len(seg) + 1)).sum())
            if n:
                out_keys.append(s)
                out_n.append(n)
        return pa.table(
            {
                key_col: g[key_col].take(pa.array(out_keys, pa.int64())),
                out_col: pa.array(out_n, pa.int64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(sweep_bucket, batch_format="pyarrow")
    )


def hopping_window(
    ds: Dataset,
    ts_col: str,
    period_minutes: int = 30,
    size_periods: int = 2,
    out_col: str = "window_start",
) -> Dataset:
    """Hopping (sliding) event-time window: period ``p``, size ``k*p`` — each
    event replicates into the ``k`` windows covering it (flat map; no state).
    DuckDB twin: UNION ALL of ``k`` shifted tumbling windows."""

    def fan(batch: pa.Table) -> pa.Table:
        base = pc.floor_temporal(batch[ts_col], multiple=period_minutes, unit="minute")
        parts = []
        for i in range(size_periods):
            shifted = pc.subtract(
                base, pa.scalar(i * period_minutes * 60_000_000, pa.duration("us"))
            )
            parts.append(batch.append_column(out_col, pc.cast(shifted, batch[ts_col].type)))
        return pa.concat_tables(parts)

    return ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)


def deterministic_sample(
    ds: Dataset, id_col: str, keep_hex_below: str = "20", salt: str = ""
) -> Dataset:
    """Deterministic content-hash sampling: keep rows whose ``md5(id||salt)``
    first hex byte is below the threshold (fraction ≈ int(threshold,16)/256).
    Unlike seeded RNG sampling this is reproducible across engines — the
    DuckDB twin computes the identical md5."""
    import hashlib

    thresh = int(keep_hex_below, 16)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        mask = [
            int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:2], 16) < thresh
            for i in ids
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds: Dataset,
    id_col: str,
    stratum_col: str,
    rates: dict[str, str],
    default_hex: str = "00",
    salt: str = "",
) -> Dataset:
    """Per-stratum deterministic content-hash sampling.

    ``rates`` maps stratum value -> hex-byte threshold (as in
    ``deterministic_sample``: keep ``md5(id||salt)[:2] < threshold``, i.e.
    fraction ≈ int(threshold,16)/256); strata not listed use ``default_hex``
    (default: drop).  This is the rebalancing primitive a training-data
    pipeline uses to downweight over-represented sources — deterministic, so
    re-runs and the DuckDB twin agree row-for-row, and embarrassingly
    parallel (a pure per-row predicate inside ``map_batches``; no shuffle).
    Like ``deterministic_sample`` the md5 runs per row in Python — pinned for
    cross-engine oracle parity, fine at the scan-bound rates this serves."""
    import hashlib

    thresh = {k: int(v, 16) for k, v in rates.items()}
    dflt = int(default_hex, 16)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        strata = batch[stratum_col].to_pylist()
        mask = [
            int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:2], 16)
            < thresh.get(s, dflt)
            for i, s in zip(ids, strata)
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def heavy_hitters(
    ds: Dataset, col: str, k: int = 10, per_block_cap: int | None = None
) -> pd.DataFrame:
    """Top-k frequent values via the combiner pattern.

    Exact by default: each block emits one (value, count) partial per
    DISTINCT value (Arrow hash count — the shuffle payload is the per-block
    distinct set, never raw rows), the partials merge through a distributed
    ``groupby(col).sum`` and the tiny aggregated result sorts/limits.

    ``per_block_cap`` switches to the capped SpaceSaving-style approximation
    for genuinely unbounded value universes; truncation is LOGGED per block
    and values outside every block's cap can be undercounted — don't pair the
    capped mode with an exact oracle."""
    from ray.data.aggregate import Sum as _Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by([col]).aggregate([(col, "count")])
        if per_block_cap is not None and g.num_rows > per_block_cap:
            import logging

            logging.getLogger(__name__).warning(
                "heavy_hitters: block truncated %d -> %d distinct values "
                "(approximate mode; counts may be lower bounds)",
                g.num_rows,
                per_block_cap,
            )
            g = g.sort_by([(f"{col}_count", "descending"), (col, "ascending")])
            g = g.slice(0, per_block_cap)
        return g

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(col)
        .aggregate(_Sum(f"{col}_count", alias_name="n"))
        .sort(["n", col], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    merged["n"] = merged["n"].astype("int64")
    return merged[[col, "n"]]


def sessionize(
    ds: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    value_col: str = "value",
) -> Dataset:
    """Session windows per key: a new session starts when the gap from the
    previous event strictly exceeds ``gap_seconds``.  Implemented as
    ``groupby(key).map_groups`` over ts-sorted groups (the documented Ray Data
    pattern for stream-shaped windows; ordering restored per group)."""

    # Bucketed Arrow-native kernel (round 5; was groupby(key).map_groups
    # over pandas frames): keys hash into buckets, one key-shuffle on the
    # bucket co-locates whole keys, each bucket runs ONE segmented numpy
    # pass — ~num_buckets dispatches instead of |keys|, no pandas round
    # trip.  Memory contract: a bucket's rows fit a worker's heap.
    num_buckets = 1024

    def bucketize(t: pa.Table) -> pa.Table:
        from ner_ray.utils import stable_hash64

        h = stable_hash64(t[key_col])  # NUL-safe (see utils.stable_hash64)
        return t.append_column("_bkt", pa.array((h % num_buckets).astype(np.int64)))

    def sess_block(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = g.sort_by([(key_col, "ascending"), (ts_col, "ascending")])
        keys = g[key_col].to_numpy(zero_copy_only=False)
        ts_us = pc.cast(g[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        vals = g[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(keys)
        newkey = np.r_[True, keys[1:] != keys[:-1]]
        gap_s = np.empty(n, np.float64)
        if n:
            gap_s[0] = np.inf
            gap_s[1:] = (ts_us[1:] - ts_us[:-1]) / 1e6
        new = newkey | (gap_s > gap_seconds)
        sess_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        # sequential per-session accumulation == the per-group pandas sum
        sums = np.bincount(sess_id, weights=vals)
        counts = np.bincount(sess_id).astype(np.int64)
        return pa.table(
            {
                key_col: g[key_col].take(pa.array(starts)),
                "session_start": g[ts_col].take(pa.array(starts)),
                "n_events": pa.array(counts, pa.int64()),
                "sum_value": pa.array(np.round(sums, 4), pa.float64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(sess_block, batch_format="pyarrow")
    )


def grouped_quantiles(
    ds: Dataset,
    key_col: str,
    val_col: str,
    qs: tuple = (0.25, 0.5, 0.75, 0.95),
    bins: int = 4096,
) -> pd.DataFrame:
    """Distributed EXACT per-group continuous quantiles (``quantile_cont``
    semantics: linear interpolation at rank ``q * (n - 1)``), without ever
    collecting or globally sorting the value column.

    Three combiner-shaped passes, each shuffling only tiny partials:

    1. per-block ``(group, count/min/max)`` partials -> per-group range;
    2. per-block histograms over ``bins`` uniform buckets of each group's
       range (sparse ``(group, bin, count)`` rows; at most ``G x bins``
       after the driver combine) -> cumulative counts locate, for every
       requested rank, the bucket holding it;
    3. one filtered pass collects ONLY the values inside those target
       buckets (expected ``n / bins`` rows per hit, independent of total
       size) and interpolates exactly.

    The refinement collect is bounded by value skew, not data size: a
    degenerate distribution where half a group's mass lands in one bucket
    would collect that bucket; raise ``bins`` for pathological skew.
    """
    from ner_ray.utils import pool_size

    def drop_null_vals(batch: pa.Table) -> pa.Table:
        # quantile_cont ignores NULLs — and true float NaN is NOT an Arrow
        # null (pc.is_valid(NaN) is True): a NaN row would be counted in n
        # and cast to bin 0, silently shifting every rank, so both are
        # dropped here.  Null KEYS are dropped too: the histogram cell ids
        # index a dense per-key array and NaN keys can't be dictionary
        # codes — the null-key group is not emitted by this operator
        # (coalesce the key upstream to include it).
        import pyarrow.compute as pc

        mask = pc.and_(pc.is_valid(batch[val_col]), pc.is_valid(batch[key_col]))
        if pa.types.is_floating(batch[val_col].type):
            mask = pc.and_(mask, pc.invert(pc.is_nan(batch[val_col])))
        return batch.filter(mask)

    # one execution of the upstream plan: the three passes below would
    # otherwise re-run it (and could even see different rows if the plan is
    # nondeterministic, breaking the histogram/refine rank agreement)
    ds = ds.map_batches(drop_null_vals, batch_format="pyarrow").materialize()

    stats = grouped_agg_partial(
        ds, [key_col], mins={"lo": val_col}, maxs={"hi": val_col}, count_col="n"
    )
    keys = stats[key_col].tolist()
    key_ix = {k: i for i, k in enumerate(keys)}
    lo = stats["lo"].to_numpy(dtype=np.float64)
    hi = stats["hi"].to_numpy(dtype=np.float64)
    n = stats["n"].to_numpy(dtype=np.int64)
    span = np.where(hi > lo, hi - lo, 1.0)
    G = len(keys)
    # bound the DENSE driver array (and the cell-id space) to ~8M cells so
    # memory scales with groups actually present, not G x default-bins;
    # exactness is bin-width-independent — narrower bins only shrink the
    # refine collect
    bins = max(64, min(bins, (1 << 23) // max(G, 1)))

    def _codes_bins(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        codes = (
            pd.Series(batch[key_col].to_pandas()).map(key_ix).to_numpy(dtype=np.int64)
        )
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(((v - lo[codes]) / span[codes] * bins).astype(np.int64), 0, bins - 1)
        return codes, b, v

    def hist_partial(batch: pa.Table) -> pa.Table:
        codes, b, _ = _codes_bins(batch)
        # sparse by construction: a dense bincount(minlength=G*bins) would
        # allocate G x bins x 8B in EVERY task regardless of block content
        cells, counts = np.unique(codes * bins + b, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "cnt": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("cell", sort=True)["cnt"]
        .sum()
    )
    full = np.zeros(G * bins, dtype=np.int64)
    full[hist.index.to_numpy()] = hist.to_numpy()
    full = full.reshape(G, bins)
    cum = np.cumsum(full, axis=1)  # cum[g, b] = rows with bin <= b
    before = cum - full  # rows strictly before bin b

    # ranks needed per group: floor and ceil of q * (n - 1)
    need: dict[tuple[int, int], None] = {}
    rank_info = []  # (g, q, pos, lo_rank, hi_rank)
    for g in range(G):
        for q in qs:
            pos = q * (n[g] - 1)
            r0, r1 = int(np.floor(pos)), int(np.ceil(pos))
            b0 = int(np.searchsorted(cum[g], r0, side="right"))
            b1 = int(np.searchsorted(cum[g], r1, side="right"))
            need[(g, b0)] = None
            need[(g, b1)] = None
            rank_info.append((g, q, pos, r0, r1, b0, b1))
    need_cells = np.array(sorted(g * bins + b for (g, b) in need), dtype=np.int64)

    def refine(batch: pa.Table) -> pa.Table:
        codes, b, v = _codes_bins(batch)
        cells = codes * bins + b
        ix = np.searchsorted(need_cells, cells)
        ix = np.clip(ix, 0, len(need_cells) - 1)
        mask = need_cells[ix] == cells
        return pa.table(
            {
                "cell": pa.array(cells[mask], pa.int64()),
                "val": pa.array(v[mask], pa.float64()),
            }
        )

    ref = (
        ds.map_batches(refine, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values(["cell", "val"], kind="mergesort")
    )
    by_cell = {c: grp["val"].to_numpy() for c, grp in ref.groupby("cell", sort=False)}

    def value_at(g: int, rank: int, b: int) -> float:
        vals = by_cell[g * bins + b]
        return float(vals[rank - before[g, b]])

    rows: dict[tuple, dict] = {}
    for g, q, pos, r0, r1, b0, b1 in rank_info:
        v0 = value_at(g, r0, b0)
        v1 = value_at(g, r1, b1) if r1 != r0 else v0
        rows.setdefault(g, {})[q] = v0 + (pos - r0) * (v1 - v0)
    out = pd.DataFrame({key_col: keys})
    for q in qs:
        out[f"p{int(q * 100)}"] = [round(rows[g][q], 4) for g in range(G)]
    return out.sort_values(key_col).reset_index(drop=True)


def rollup_agg(
    ds: Dataset, keys: list[str], sum_col: str, all_label: str = "ALL"
) -> pd.DataFrame:
    """``GROUP BY ROLLUP(k1, k2, ...)``: aggregates at every key prefix down
    to the grand total.  One combiner pass computes the FINEST level (the
    only one that touches the data); every coarser level folds from the
    finest partials driver-side — |finest| rows, not data rows."""
    finest = grouped_agg_partial(
        ds, keys, sums={"sum_val": sum_col}, count_col="n_rows"
    )
    levels = [finest.assign(_lvl=len(keys))]
    for depth in range(len(keys) - 1, -1, -1):
        kept = keys[:depth]
        if kept:
            g = finest.groupby(kept, sort=False, as_index=False)[["sum_val", "n_rows"]].sum()
        else:
            g = pd.DataFrame(
                {"sum_val": [finest["sum_val"].sum()], "n_rows": [finest["n_rows"].sum()]}
            )
        for k in keys[depth:]:
            g[k] = all_label
        levels.append(g.assign(_lvl=depth))
    out = pd.concat(levels, ignore_index=True)[keys + ["sum_val", "n_rows", "_lvl"]]
    # key columns become strings: coarser levels hold the all_label sentinel,
    # and a numeric key mixed with 'ALL' would make sort_values raise
    # (matches the SQL twin, where COALESCE(key, 'ALL') is VARCHAR)
    for k in keys:
        out[k] = out[k].astype(str)
    out["sum_val"] = out["sum_val"].astype(float).round(4)
    out["n_rows"] = out["n_rows"].astype("int64")
    out["_lvl"] = out["_lvl"].astype("int64")
    return out.sort_values(keys + ["_lvl"]).reset_index(drop=True)


def grouping_sets_agg(
    ds: Dataset,
    keys: list[str],
    sets: list[tuple[str, ...]],
    sum_col: str,
    all_label: str = "ALL",
) -> pd.DataFrame:
    """``GROUP BY GROUPING SETS (...)``: the rollup_agg generalization.

    Every requested set must be a subset of ``keys``.  Exactly ONE combiner
    pass computes the finest grouping (all ``keys``); every requested set
    folds from those partials driver-side — sum/count are distributive, so
    folding |finest| rows is exact and no second data pass ever happens.
    ``grouping_id`` matches SQL's GROUPING() bit order (bit i set when
    ``keys[i]`` is aggregated away, MSB-first like DuckDB's GROUPING_ID)."""
    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise ValueError(f"grouping set {s} not a subset of keys: {unknown}")
    finest = grouped_agg_partial(ds, keys, sums={"sum_val": sum_col}, count_col="n_rows")
    levels = []
    for s in sets:
        kept = [k for k in keys if k in s]  # canonical key order
        if kept:
            g = finest.groupby(kept, sort=False, as_index=False)[["sum_val", "n_rows"]].sum()
        else:
            g = pd.DataFrame(
                {"sum_val": [finest["sum_val"].sum()], "n_rows": [finest["n_rows"].sum()]}
            )
        gid = 0
        for i, k in enumerate(keys):
            if k not in s:
                g[k] = all_label
                gid |= 1 << (len(keys) - 1 - i)
        levels.append(g.assign(grouping_id=gid))
    out = pd.concat(levels, ignore_index=True)[keys + ["sum_val", "n_rows", "grouping_id"]]
    for k in keys:
        out[k] = out[k].astype(str)  # same sentinel-vs-numeric rationale as rollup_agg
    out["sum_val"] = out["sum_val"].astype(float).round(4)
    out["n_rows"] = out["n_rows"].astype("int64")
    out["grouping_id"] = out["grouping_id"].astype("int64")
    return out.sort_values(keys + ["grouping_id"]).reset_index(drop=True)


def cube_agg(
    ds: Dataset, keys: list[str], sum_col: str, all_label: str = "ALL"
) -> pd.DataFrame:
    """``GROUP BY CUBE(k1, ..., kn)``: all 2^n grouping sets, folded from one
    combiner pass (see grouping_sets_agg)."""
    from itertools import combinations

    sets = [
        combo for r in range(len(keys), -1, -1) for combo in combinations(keys, r)
    ]
    return grouping_sets_agg(ds, keys, sets, sum_col, all_label=all_label)
