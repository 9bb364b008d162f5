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
) -> Dataset:
    """Join two Datasets on key column(s) via union + groupby.

    ``how``: "inner" | "left" (left-outer) | "full" (full-outer).  Non-key
    column names must be disjoint between the two sides.

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
        + [(_SIDE, pa.int8())]
    )

    def widen(side: int, own: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for f in unified:
                if f.name == _SIDE:
                    cols[_SIDE] = pa.array([side] * n, pa.int8())
                elif f.name in t.column_names and (f.name in keys or f.name in own):
                    cols[f.name] = pc.cast(t[f.name], f.type)
                else:
                    cols[f.name] = pa.nulls(n, f.type)
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

    def merge(group: pa.Table) -> pa.Table:
        side = group[_SIDE].to_numpy(zero_copy_only=False)
        lmask = side == 0
        lt = group.filter(pa.array(lmask)).select(keys + lcols)
        rt = group.filter(pa.array(~lmask)).select(rcols)
        nl, nr = lt.num_rows, rt.num_rows
        if nl == 0:
            if how != "full":
                return out_schema.empty_table()
            # right-only key group: keys come from the right rows (the key
            # columns are populated by widen() on both sides)
            rk = group.filter(pa.array(~lmask)).select(keys + rcols)
            cols = {}
            for k in keys:
                cols[k] = rk[k]
            for c in lcols:
                cols[c] = pa.nulls(nr, out_schema.field(c).type)
            for c in rcols:
                cols[c] = rk[c]
            return pa.table(cols, schema=out_schema)
        if nr == 0:
            if how == "inner":
                return out_schema.empty_table()
            cols = {n: lt[n] for n in lt.column_names}
            for c in rcols:
                cols[c] = pa.nulls(nl, out_schema.field(c).type)
            return pa.table(cols, schema=out_schema)
        # cross product within the key group, vectorized: a hot key (a
        # high-degree node) can pair 10^4 x 10^2 rows in one group — a
        # Python list comprehension would build that element by element
        import numpy as np

        li = pa.array(np.repeat(np.arange(nl, dtype=np.int64), nr))
        ri = pa.array(np.tile(np.arange(nr, dtype=np.int64), nl))
        cols = {n: lt[n].take(li) for n in lt.column_names}
        for c in rcols:
            cols[c] = rt[c].take(ri)
        return pa.table(cols, schema=out_schema)

    return both.groupby(keys).map_groups(merge, batch_format="pyarrow")


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
