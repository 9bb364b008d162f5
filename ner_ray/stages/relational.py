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
    small_arrow = pa.Table.from_pandas(small, preserve_index=False)
    ref = ray.put(small_arrow)
    join_type = {"inner": "inner", "left": "left outer"}[how]

    class Merge:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.join(self.small, keys=on, join_type=join_type)

    return ds.map_batches(Merge, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8))


def semi_join_filter(ds: Dataset, keys: set, key_col: str) -> Dataset:
    """Semi-join: keep rows whose key is in the broadcast key set."""
    import ray

    ref = ray.put(pa.array(sorted(keys)))

    class Filt:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch[key_col], value_set=self.keys))

    return ds.map_batches(Filt, batch_format="pyarrow", concurrency=(1, 8))


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

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        gap = g[ts_col].diff().dt.total_seconds()
        new = (gap.isna() | (gap > gap_seconds)).astype(np.int64)
        g = g.assign(_sess=new.cumsum())
        out = (
            g.groupby("_sess", sort=True)
            .agg(
                **{
                    key_col: (key_col, "first"),
                    "session_start": (ts_col, "min"),
                    "n_events": (ts_col, "size"),
                    "sum_value": (value_col, "sum"),
                }
            )
            .reset_index(drop=True)
        )
        out["sum_value"] = out["sum_value"].astype(float).round(4)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return ds.groupby(key_col).map_groups(sess, batch_format="pandas")
