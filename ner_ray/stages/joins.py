"""Portable distributed joins for Ray Data.

``Dataset.join`` in Ray 2.49 fails with ``ArrowInvalid: No match ... on right
side of the join`` whenever a hash partition receives zero rows for one side
(the partition block is built with an EMPTY schema).  With small keyed sides
(label tables, mapping tables) empty partitions are routine, so this module
provides the classic portable pattern instead: tag each side, union, and
``groupby(key).map_groups`` — a single hash shuffle, robust to empty/skewed
partitions, identical semantics.

Use ``hash_join`` for small-to-medium keyed sides (canonicalization labels,
surface mappings).  For large-large relational joins prefer broadcast
(stages.relational.broadcast_join) when one side fits the object store, or
``Dataset.join`` when both sides are dense enough that no partition is empty.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_SIDE = "__side__"
_JBKT = "__jbkt__"  # join bucket: hash(key tuple) % num_buckets


def _arrow_schema(ds: Dataset) -> pa.Schema:
    s = ds.schema()
    return pa.schema(list(zip(s.names, s.types)))


def hash_join(
    left: Dataset,
    right: Dataset,
    on: str | list[str],
    how: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    num_buckets: int = 1024,
) -> Dataset:
    """Join two Datasets on key column(s) via union + ONE bucket shuffle.

    ``how``: "inner" | "left" (left-outer) | "full" (full-outer).  Non-key
    column names must be disjoint between the two sides.

    Round-5 shape: keys hash into ``num_buckets`` buckets (content-stable
    across blocks and sides), the shuffle groups by BUCKET, and each bucket
    merges ALL of its key segments in one vectorized numpy pass — dispatch
    is ~num_buckets calls instead of |distinct keys| calls (the old
    per-key ``map_groups(merge)`` paid ~ms of dispatch per key, which at
    5k keys was most of a small join's wall time and at 10^8 keys would be
    hours).  Memory contract: one BUCKET's rows (both sides) fit a
    worker's heap — size ``num_buckets`` accordingly.

    Pass ``left_schema`` / ``right_schema`` whenever the side is a LAZY
    chain: ``Dataset.schema()`` on an un-executed plan EXECUTES the whole
    upstream pipeline just to learn column types (measured: 2 nested
    hash_joins re-ran a sort+aggregate chain 3x in q22), so schema probing
    must never be the price of a join on a hot path.
    """
    if how not in ("inner", "left", "full"):
        # only these are implemented; anything else would silently get
        # left-outer semantics from the merge's how=="inner" special-case
        raise ValueError(f"hash_join: unsupported how={how!r} (inner|left|full)")
    keys = [on] if isinstance(on, str) else list(on)
    ls = left_schema if left_schema is not None else _arrow_schema(left)
    rs = right_schema if right_schema is not None else _arrow_schema(right)
    lcols = [n for n in ls.names if n not in keys]
    rcols = [n for n in rs.names if n not in keys]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    unified = pa.schema(
        [(k, ls.field(k).type) for k in keys]
        + [(c, ls.field(c).type) for c in lcols]
        + [(c, rs.field(c).type) for c in rcols]
        + [(_SIDE, pa.int8()), (_JBKT, pa.int64())]
    )

    def widen(side: int, own: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as np

            from ner_ray.stages.bloom import _key_hash64
            from ner_ray.stages.sketches import splitmix64

            n = t.num_rows
            cols = {}
            for f in unified:
                if f.name == _SIDE:
                    cols[_SIDE] = pa.array([side] * n, pa.int8())
                elif f.name == _JBKT:
                    continue
                elif f.name in t.column_names and (f.name in keys or f.name in own):
                    cols[f.name] = pc.cast(t[f.name], f.type)
                else:
                    cols[f.name] = pa.nulls(n, f.type)
            # content-stable bucket of the key tuple — identical on both
            # sides and across any partitioning.  _key_hash64 (not a raw
            # hash_pandas_object over to_numpy) because a null in a block
            # upcasts int64 -> float64 and would rehash every OTHER key in
            # that block into a different bucket (the bloom.py lesson).
            h = np.zeros(n, dtype=np.uint64)
            for k in keys:
                h = splitmix64(h ^ _key_hash64(cols[k]))
            cols[_JBKT] = pa.array(
                (h % np.uint64(num_buckets)).astype("int64"), pa.int64()
            )
            return pa.table(cols, schema=unified)

        return fn

    both = left.map_batches(widen(0, lcols), batch_format="pyarrow").union(
        right.map_batches(widen(1, rcols), batch_format="pyarrow")
    )
    out_schema = pa.schema(
        [(k, ls.field(k).type) for k in keys]
        + [(c, ls.field(c).type) for c in lcols]
        + [(c, rs.field(c).type) for c in rcols]
    )

    def merge_block(g: pa.Table) -> pa.Table:
        """One call per BUCKET: sort by (keys, side), then merge every key
        segment in one vectorized pass.  The inner cross-product indices
        for ALL segments come from a single arithmetic construction —
        segment s with nl·nr pairs emits ``li = seg_start + k // nr``,
        ``ri = seg_start + nl + k % nr`` for k in [0, nl·nr)."""
        import numpy as np

        g = g.sort_by([(k, "ascending") for k in keys] + [(_SIDE, "ascending")])
        n = g.num_rows
        if n == 0:
            return out_schema.empty_table()
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        new = np.zeros(n, dtype=bool)
        new[0] = True
        nullkey = np.zeros(n, dtype=bool)
        for k in keys:
            arr = g[k].to_numpy(zero_copy_only=False)
            new[1:] |= arr[1:] != arr[:-1]
            nullkey |= np.asarray(pc.is_null(g[k].combine_chunks()))
        # SQL join semantics: a NULL key matches nothing — force every
        # null-key row into its own singleton segment (inner drops it,
        # left/full emit it with the other side nulled), uniformly across
        # key dtypes (float-NaN would split naturally, object-None would
        # not)
        new |= nullkey
        new[1:] |= nullkey[:-1]
        seg_id = np.cumsum(new) - 1
        n_seg = int(seg_id[-1]) + 1
        seg_start = np.flatnonzero(new).astype(np.int64)
        nl = np.bincount(seg_id[side == 0], minlength=n_seg).astype(np.int64)
        nr = np.bincount(seg_id[side == 1], minlength=n_seg).astype(np.int64)

        parts = []

        def emit(li: np.ndarray, ri: np.ndarray | None, rk: bool = False) -> None:
            """Rows taking keys+lcols from li (or keys+rcols from li when
            rk=True for right-only groups) and rcols from ri (None -> null)."""
            cnt = len(li)
            if cnt == 0:
                return
            ltake = g.take(pa.array(li))
            cols = {}
            for k in keys:
                cols[k] = ltake[k]
            if rk:
                for c in lcols:
                    cols[c] = pa.nulls(cnt, out_schema.field(c).type)
                for c in rcols:
                    cols[c] = ltake[c]
            else:
                for c in lcols:
                    cols[c] = ltake[c]
                if ri is None:
                    for c in rcols:
                        cols[c] = pa.nulls(cnt, out_schema.field(c).type)
                else:
                    rtake = g.take(pa.array(ri))
                    for c in rcols:
                        cols[c] = rtake[c]
            parts.append(pa.table(cols, schema=out_schema))

        # inner cross products (segments with both sides present)
        out_cnt = nl * nr
        m = int(out_cnt.sum())
        if m:
            seg_rep = np.repeat(np.arange(n_seg, dtype=np.int64), out_cnt)
            out_start = np.cumsum(out_cnt) - out_cnt
            k_local = np.arange(m, dtype=np.int64) - np.repeat(out_start, out_cnt)
            nr_rep = nr[seg_rep]
            li = seg_start[seg_rep] + k_local // nr_rep
            ri = seg_start[seg_rep] + nl[seg_rep] + k_local % nr_rep
            emit(li, ri)
        if how in ("left", "full"):
            lonly = (nr[seg_id] == 0) & (side == 0)
            emit(np.flatnonzero(lonly).astype(np.int64), None)
        if how == "full":
            ronly = (nl[seg_id] == 0) & (side == 1)
            emit(np.flatnonzero(ronly).astype(np.int64), None, rk=True)
        if not parts:
            return out_schema.empty_table()
        return pa.concat_tables(parts)

    return both.groupby(_JBKT).map_groups(merge_block, batch_format="pyarrow")


_SALT = "__salt__"


def salted_join(
    left: Dataset,
    right: Dataset,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> Dataset:
    """Skew-safe ``hash_join``: split each hot key across ``salt`` reducers.

    ``hash_join`` sends a whole key group to ONE ``map_groups`` task, so a
    hot key (a high-degree node, a null-ish default id) serializes its whole
    cross product on one worker.  Here the RIGHT side is replicated ``salt``
    times (tile + salt column), each LEFT row gets exactly one salt bucket
    (round-robin within its block — the output row SET is identical for any
    assignment, so no determinism is owed to it), and the join runs on
    ``(key, salt)``: the hot key's work lands on ``salt`` reducers instead
    of one.  The price is shipping the right side ``salt``× through the
    shuffle — use when the right side is the SMALL one of a skewed join but
    still too big to broadcast.  ``how`` is "inner" | "left" (each left row
    lives in exactly one salted group, so left-outer semantics survive);
    "full" is rejected — right-only rows would surface once PER SALT.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join: unsupported how={how!r} (inner|left)")
    if salt < 1:
        raise ValueError("salted_join: salt must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)
    ls = left_schema if left_schema is not None else _arrow_schema(left)
    rs = right_schema if right_schema is not None else _arrow_schema(right)

    import numpy as np

    def salt_left(t: pa.Table) -> pa.Table:
        s = pa.array(np.arange(t.num_rows, dtype=np.int64) % salt)
        return t.append_column(_SALT, s)

    def replicate_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), salt))
        rep = t.take(idx)
        s = pa.array(np.repeat(np.arange(salt, dtype=np.int64), n))
        return rep.append_column(_SALT, s)

    joined = hash_join(
        left.map_batches(salt_left, batch_format="pyarrow"),
        right.map_batches(replicate_right, batch_format="pyarrow"),
        on=keys + [_SALT],
        how=how,
        left_schema=ls.append(pa.field(_SALT, pa.int64())),
        right_schema=rs.append(pa.field(_SALT, pa.int64())),
    )
    return joined.map_batches(
        lambda t: t.drop_columns([_SALT]), batch_format="pyarrow"
    )
