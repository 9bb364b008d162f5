"""B6 — canonicalization: distributed union-find over surface-form keys.

North-star semantics (BASELINE.json:6): "canonicalization runs a distributed
union-find over groupby(surface-form-key) aggregate shuffles to merge
coreferent entities".

Graph model (pinned semantics):

- **node** = ``"{type}:{normalize_surface(surface)}"`` — typed surface-form
  key.  Typing the node prevents the classic transitive-merge hazard where an
  ambiguous surface ("Lima" the LOC vs "Lima" the ORG alias) would glue two
  unrelated entities into one component.
- **edges**: (a) mention node -> ``ent:{entity_id}`` for every cosine-linked
  mention (B5 output); (b) dictionary edges alias-node -> entity for every
  UNambiguous (type, alias) pair of the alias dict.  Same-surface variants
  ("Acme Corp" / "ACME corp.") already share a node via normalize_surface.
- **components** = coreferent entity clusters; representative label = min
  node string; ``entity_id`` = stable 63-bit hash of the label.

Algorithm: iterative **min-label propagation** expressed entirely in Ray Data
(hash-join labels onto half-edges, then ``groupby(node).min(label)`` — the
"groupby aggregate shuffles" of the north star), driver-side fixpoint check
via a per-round label checksum.  Converges in O(log diameter) rounds;
entity-alias stars have diameter <= 2, so 2-3 rounds in practice.  Each round
shuffles only (node, label) pairs — O(distinct surfaces), *not* O(mentions):
mention streams are pre-deduplicated to distinct nodes inside map_batches
before any shuffle.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Min, Sum

from ner_ray.functions.normalize import normalize_surface
from ner_ray.stages.joins import hash_join

ENT_PREFIX = "ent:"

# Per-worker-process cache for broadcast objects fetched inside stateless
# tasks (keyed by ObjectRef hex).  BOUNDED: each rewrite_triples broadcast
# pins a full mapping dict (up to broadcast_threshold entries); without
# eviction, repeated pipeline runs in one long-lived Ray session would grow
# worker RSS monotonically until OOM.
_BROADCAST_CACHE: dict[str, object] = {}
_BROADCAST_CACHE_MAX = 2


def _broadcast_cache_put(key: str, value) -> None:
    while len(_BROADCAST_CACHE) >= _BROADCAST_CACHE_MAX:
        _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
    _BROADCAST_CACHE[key] = value

_NODE_LABEL = pa.schema([("node", pa.string()), ("label", pa.string())])


def _norm_labels(t: pa.Table) -> pa.Table:
    """Normalize block schema — Ray's hash join can emit empty blocks with an
    EMPTY schema, which breaks later unions/joins if left in the stream."""
    if "node" not in t.column_names or "label" not in t.column_names:
        return _NODE_LABEL.empty_table()
    return pa.table({"node": t["node"], "label": t["label"]}, schema=_NODE_LABEL)


def stable_id(key: str) -> int:
    h = hashlib.blake2b(key.encode(), digest_size=8).digest()
    return int.from_bytes(h, "big") >> 1


def _checksum(labels: Dataset) -> int:
    """Order/sharding-independent checksum of the (node,label) multiset."""

    def part(batch: pa.Table) -> pa.Table:
        s = 0
        for n, l in zip(batch["node"].to_pylist(), batch["label"].to_pylist()):
            s = (s + zlib.crc32(f"{n}\x00{l}".encode())) & 0xFFFFFFFFFFFF
        return pa.table({"s": pa.array([s], pa.int64())})

    out = labels.map_batches(part, batch_format="pyarrow").sum("s")
    return int(out or 0)


def connected_components(edges: Dataset, max_rounds: int = 8) -> Dataset:
    """Min-label propagation over an edge Dataset with columns (src, dst).

    Returns a Dataset (node, label); every endpoint appears exactly once.

    ``max_rounds`` is a SAFETY bound, not a convergence guarantee: plain
    min-label propagation needs O(component diameter) rounds (the entity-
    alias stars this engine builds have diameter <= 2, hence the small
    default).  If the checksum fixpoint is not reached a WARNING is logged
    — callers feeding long-chain graphs (dedup chains A~B~C~...) should
    raise ``max_rounds`` toward their expected diameter.
    """

    def to_half_edges(batch: pa.Table) -> pa.Table:
        src, dst = batch["src"], batch["dst"]
        return pa.table(
            {
                "node": pa.concat_arrays([src.combine_chunks(), dst.combine_chunks()]),
                "peer": pa.concat_arrays([dst.combine_chunks(), src.combine_chunks()]),
            }
        )

    half = edges.map_batches(to_half_edges, batch_format="pyarrow").materialize()
    labels = (
        half.select_columns(["node"])
        .groupby("node")
        .count()
        .map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["node"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    prev = _checksum(labels)
    converged = False
    for _ in range(max_rounds):
        # label(node) joined onto half-edges => message (peer, label)
        def peer_msgs(t: pa.Table) -> pa.Table:
            if "peer" not in t.column_names or "label" not in t.column_names:
                return _NODE_LABEL.empty_table()
            return pa.table({"node": t["peer"], "label": t["label"]}, schema=_NODE_LABEL)

        msgs = hash_join(half, labels, on="node", how="inner").map_batches(
            peer_msgs, batch_format="pyarrow"
        )
        labels = (
            labels.map_batches(_norm_labels, batch_format="pyarrow")
            .union(msgs)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .map_batches(_norm_labels, batch_format="pyarrow")
            .materialize()
        )
        cur = _checksum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        import logging

        logging.getLogger(__name__).warning(
            "connected_components: label propagation did NOT reach a fixpoint "
            "in %d rounds — components with diameter > max_rounds are still "
            "split; raise max_rounds for long-chain graphs",
            max_rounds,
        )
    return labels


# ---------------------------------------------------------------------------


def _node_partials(batch: pa.Table) -> pa.Table:
    """Per-block combiner: distinct (node, surface, type, entity_id) with
    partial mention counts.  The distinct step is Arrow's vectorized hash
    ``group_by`` over the raw mention stream; the Python
    ``normalize_surface`` runs only on the DISTINCT rows (surface vocabulary,
    not mentions — the Zipf pattern everywhere in this engine)."""
    g = (
        batch.select(["surface", "type", "entity_id"])
        .group_by(["surface", "type", "entity_id"])
        .aggregate([("surface", "count")])
    )
    surfaces = g["surface"].to_pylist()
    types = g["type"].to_pylist()
    node = [f"{t}:{normalize_surface(s)}" for s, t in zip(surfaces, types)]
    return pa.table(
        {
            "node": pa.array(node, pa.string()),
            "surface": g["surface"],
            "type": g["type"],
            "entity_id": pc.cast(g["entity_id"], pa.int64()),
            "n_mentions": pc.cast(g["surface_count"], pa.int64()),
        }
    )


def mention_nodes(linked_mentions: Dataset) -> Dataset:
    """Distinct (node, surface, type, entity_id, n_mentions) — deduped inside
    map_batches (combiner, ``_node_partials``) before the distinct groupby
    shuffle."""
    return (
        linked_mentions.map_batches(_node_partials, batch_format="pyarrow")
        .groupby(["node", "surface", "type", "entity_id"])
        .aggregate(Sum("n_mentions", alias_name="n_mentions"))
    )


def build_edges(nodes: Dataset, alias_table: pa.Table) -> Dataset:
    """Mention->entity edges (from data) ∪ unambiguous dictionary edges."""
    linked = nodes.filter(expr="entity_id >= 0")

    def to_edges(batch: pa.Table) -> pa.Table:
        ent = pc.binary_join_element_wise(
            pa.array([ENT_PREFIX] * batch.num_rows),
            pc.cast(batch["entity_id"], pa.string()),
            "",
        )
        return pa.table({"src": batch["node"], "dst": ent})

    data_edges = linked.map_batches(to_edges, batch_format="pyarrow")

    # dictionary edges: unambiguous (type, alias) -> entity
    seen: dict[str, set[int]] = {}
    rows = alias_table.to_pylist()
    for r in rows:
        node = f"{r['type']}:{normalize_surface(r['alias'])}"
        seen.setdefault(node, set()).add(r["entity_id"])
    dict_edges = [
        {"src": node, "dst": f"{ENT_PREFIX}{next(iter(eids))}"}
        for node, eids in sorted(seen.items())
        if len(eids) == 1
    ]
    if dict_edges:
        data_edges = data_edges.union(rd.from_arrow(pa.Table.from_pylist(dict_edges)))
    return data_edges


def local_union_find(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side union-find (path-halving + min-root); used when the
    distinct-key edge set is small enough to collect."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def _canonicalize_driver(
    partials_pdf, alias_table: pa.Table
) -> tuple[Dataset, Dataset]:
    """Driver-side canonicalization over combined node partials (fast path of
    ``canonicalize`` — identical output to the distributed path, tested)."""
    ent_meta = {
        r["entity_id"]: (r["canonical"], r["type"]) for r in alias_table.to_pylist()
    }
    # merge partials -> distinct nodes.  A zero-mention corpus yields an
    # empty partials frame WITHOUT columns (to_pandas of a block-less
    # dataset) — a valid degenerate input that must produce an empty graph,
    # not a KeyError.
    merged: dict[tuple, int] = {}
    if len(partials_pdf) and "node" in partials_pdf.columns:
        for node, s, t, e, n in zip(
            partials_pdf["node"], partials_pdf["surface"], partials_pdf["type"],
            partials_pdf["entity_id"], partials_pdf["n_mentions"],
        ):
            key = (node, s, t, int(e))
            merged[key] = merged.get(key, 0) + int(n)
    # edges: data (node -> entity) ∪ unambiguous dictionary edges
    pairs = [
        (node, f"{ENT_PREFIX}{e}") for (node, _s, _t, e) in merged if e >= 0
    ]
    seen: dict[str, set[int]] = {}
    for r in alias_table.to_pylist():
        dnode = f"{r['type']}:{normalize_surface(r['alias'])}"
        seen.setdefault(dnode, set()).add(r["entity_id"])
    pairs += [
        (dnode, f"{ENT_PREFIX}{next(iter(eids))}")
        for dnode, eids in sorted(seen.items())
        if len(eids) == 1
    ]
    label_map = local_union_find(pairs)
    # group nodes by component label; finish each component
    comps: dict[str, list[tuple]] = {}
    for key in merged:
        comps.setdefault(label_map.get(key[0], key[0]), []).append(key)
    map_rows, ent_rows = [], []
    for label in sorted(comps):
        group = comps[label]
        linked_ids = sorted({e for (_n, _s, _t, e) in group if e >= 0})
        if linked_ids and linked_ids[0] in ent_meta:
            canonical, typ = ent_meta[linked_ids[0]]
        else:
            best = max(
                group, key=lambda k: (merged[k], -len(k[1]), k[1])
            )
            canonical, typ = best[1], best[2]
        eid = stable_id(label)
        ent_rows.append(
            {
                "entity_id": eid,
                "canonical": canonical,
                "type": typ,
                "aliases": sorted({k[1] for k in group}),
            }
        )
        for node, s, t, e in group:
            map_rows.append(
                {
                    "node": node,
                    "surface": s,
                    "type": t,
                    "entity_id": eid,
                    "canonical": canonical,
                    "n_mentions": merged[(node, s, t, e)],
                }
            )
    # explicit schemas: from_pylist([]) would otherwise emit a ZERO-COLUMN
    # table and downstream consumers (rewrite_triples' pdf["node"]) crash on
    # the empty-graph case instead of passing through
    mapping = rd.from_arrow(
        pa.Table.from_pylist(
            map_rows,
            schema=pa.schema(
                [
                    ("node", pa.string()),
                    ("surface", pa.string()),
                    ("type", pa.string()),
                    ("entity_id", pa.int64()),
                    ("canonical", pa.string()),
                    ("n_mentions", pa.int64()),
                ]
            ),
        )
    )
    entities = rd.from_arrow(
        pa.Table.from_pylist(
            ent_rows,
            schema=pa.schema(
                [
                    ("entity_id", pa.int64()),
                    ("canonical", pa.string()),
                    ("type", pa.string()),
                    ("aliases", pa.list_(pa.string())),
                ]
            ),
        )
    )
    return mapping, entities


def canonicalize(
    linked_mentions: Dataset,
    alias_table: pa.Table,
    max_rounds: int = 8,
    cc_threshold: int = 2_000_000,
    node_threshold: int = 500_000,
) -> tuple[Dataset, Dataset]:
    """Full B6.

    Returns ``(mapping, entities)``:

    - mapping: (node, surface, type, entity_id, canonical, n_mentions) — one
      row per distinct typed surface key, including unlinked singletons.
    - entities: (entity_id, canonical, type, aliases) — one row per merged
      component (schemas.ENTITIES shape).

    Fast path: the per-block combiner bounds partial rows by the distinct
    surface vocabulary, which is dwarfed by the mention stream at any corpus
    size — when the partial set is small (``node_threshold``) EVERYTHING
    after the one embarrassingly-parallel combiner map happens driver-side
    (node merge, edge build, union-find, component finish): one Ray execution
    instead of three shuffled ones.  A truly open surface vocabulary (beyond
    the threshold) falls back to the original distributed path below.
    """
    partials = linked_mentions.map_batches(
        _node_partials, batch_format="pyarrow"
    ).materialize()
    if partials.count() <= node_threshold:
        return _canonicalize_driver(partials.to_pandas(), alias_table)
    nodes = (
        partials.groupby(["node", "surface", "type", "entity_id"])
        .aggregate(Sum("n_mentions", alias_name="n_mentions"))
        .materialize()
    )
    edges = build_edges(nodes, alias_table).materialize()

    ent_meta = {
        r["entity_id"]: (r["canonical"], r["type"]) for r in alias_table.to_pylist()
    }

    # Hybrid component step (SURVEY.md §7 hard part 3): the
    # groupby(surface-form-key) combiner above has already reduced the
    # 10^N-mention stream to DISTINCT keys, so the edge set is bounded by
    # distinct surfaces, not data size.  Small edge set -> driver union-find
    # + broadcast labels (zero extra shuffles); huge edge set -> distributed
    # min-label propagation (connected_components).  Both paths produce
    # identical labels (tested).
    n_edges = edges.count()
    use_driver_cc = n_edges <= cc_threshold

    # Attach component labels to mention nodes (unlinked nodes keep themselves
    # as their own component).
    _NODES_SCHEMA = pa.schema(
        [
            ("node", pa.string()),
            ("surface", pa.string()),
            ("type", pa.string()),
            ("entity_id", pa.int64()),
            ("n_mentions", pa.int64()),
            ("label", pa.string()),
        ]
    )

    def fill_label(t: pa.Table) -> pa.Table:
        if "node" not in t.column_names:
            return _NODES_SCHEMA.empty_table()
        if "label" not in t.column_names:
            t = t.append_column("label", t["node"])
        else:
            t = t.set_column(
                t.column_names.index("label"), "label", pc.coalesce(t["label"], t["node"])
            )
        return t.select(_NODES_SCHEMA.names).cast(_NODES_SCHEMA)

    if use_driver_cc:
        import ray

        epdf = edges.to_pandas()
        pairs = list(zip(epdf["src"].tolist(), epdf["dst"].tolist()))
        label_map = local_union_find(pairs)
        lref = ray.put(label_map)

        def attach(t: pa.Table) -> pa.Table:
            lm = ray.get(lref)
            lbls = [lm.get(n, n) for n in t["node"].to_pylist()]
            return t.append_column("label", pa.array(lbls, pa.string())).select(
                _NODES_SCHEMA.names
            ).cast(_NODES_SCHEMA)

        labeled = nodes.map_batches(attach, batch_format="pyarrow")
    else:
        labels = connected_components(edges, max_rounds=max_rounds)
        labeled = hash_join(nodes, labels, on="node", how="left").map_batches(
            fill_label, batch_format="pyarrow"
        )

    def finish(group: pa.Table) -> pa.Table:
        """One component -> one entity row + per-node mapping rows."""
        label = group["label"][0].as_py()
        g = group.to_pylist()
        # canonical: the dictionary canonical of the smallest entity_id member
        # if any mention is linked; else the most-supported original surface.
        linked_ids = sorted({r["entity_id"] for r in g if r["entity_id"] >= 0})
        if linked_ids and linked_ids[0] in ent_meta:
            canonical, typ = ent_meta[linked_ids[0]]
        else:
            best = max(g, key=lambda r: (r["n_mentions"], -len(r["surface"]), r["surface"]))
            canonical, typ = best["surface"], best["type"]
        eid = stable_id(label)
        aliases = sorted({r["surface"] for r in g})
        ent = {
            "entity_id": eid,
            "canonical": canonical,
            "type": typ,
            "aliases": aliases,
            "node": f"__entity__:{label}",
            "surface": canonical,
            "n_mentions": int(sum(r["n_mentions"] for r in g)),
            "kind": "entity",
        }
        maps = [
            {
                "entity_id": eid,
                "canonical": canonical,
                "type": r["type"],
                "aliases": None,
                "node": r["node"],
                "surface": r["surface"],
                "n_mentions": r["n_mentions"],
                "kind": "mapping",
            }
            for r in g
        ]
        return pa.Table.from_pylist([ent] + maps)

    combined = (
        labeled.groupby("label").map_groups(finish, batch_format="pyarrow").materialize()
    )
    mapping = combined.filter(expr="kind == 'mapping'").select_columns(
        ["node", "surface", "type", "entity_id", "canonical", "n_mentions"]
    )
    entities = combined.filter(expr="kind == 'entity'").select_columns(
        ["entity_id", "canonical", "type", "aliases"]
    )
    return mapping, entities


def rewrite_triples(
    triples: Dataset,
    mapping: Dataset,
    how: str = "broadcast",
    num_partitions: int = 16,
    broadcast_threshold: int = 2_000_000,
) -> Dataset:
    """Rewrite triple subj/obj surfaces to canonical entity names.

    ``broadcast`` (default): the mapping — one row per *distinct* surface key,
    orders of magnitude smaller than the triple stream — is collected and
    ``ray.put`` once; rewriting is a shuffle-free map_batches.  Per surface
    key the canonical with the largest mention support wins (triples carry no
    type, so the majority type resolves rare cross-type homographs).

    The broadcast path is GATED: the mapping is open-vocabulary (one row per
    distinct surface form), so a 100 TB corpus can grow it past driver
    memory.  Above ``broadcast_threshold`` mapping rows the call auto-falls
    back to the join plan — same hybrid shape as canonicalize's
    ``node_threshold`` / dedup's ``driver_threshold`` (equality of the two
    plans is pytest-gated).

    ``join``: two hash joins (subj key, then obj key) — forced, for callers
    that know the mapping is non-broadcastable.
    """
    if how == "join":
        return _rewrite_join(triples, mapping, num_partitions)

    import ray

    # pin before the gate: count() would otherwise execute a lazy mapping
    # chain once for the gate and AGAIN for to_pandas()/the join plan
    mapping = mapping.materialize()
    if mapping.count() > broadcast_threshold:
        return _rewrite_join(triples, mapping, num_partitions)
    pdf = mapping.to_pandas()
    best: dict[str, tuple[int, str]] = {}
    if len(pdf) == 0 or "node" not in pdf.columns:
        # zero-mention corpus: to_pandas of an empty mapping can come back
        # column-less — rewrite is then the identity (empty lookup table)
        pdf = pd.DataFrame({"node": [], "canonical": [], "n_mentions": []})
    for node, canonical, n_m in zip(pdf["node"], pdf["canonical"], pdf["n_mentions"]):
        key = node.split(":", 1)[1]
        cur = best.get(key)
        # tie-break on the canonical string so equal-support cross-type
        # homographs rewrite deterministically regardless of mapping row
        # order (Ray block order varies run to run)
        if cur is None or n_m > cur[0] or (n_m == cur[0] and canonical < cur[1]):
            best[key] = (n_m, canonical)
    table = {k: v[1] for k, v in best.items()}
    ref = ray.put(table)
    ref_key = ref.hex()

    def rewrite(batch: pa.Table) -> pa.Table:
        # stateless task; the broadcast dict is fetched once per worker
        # process and cached (no actor-pool spin-up cost)
        t = _BROADCAST_CACHE.get(ref_key)
        if t is None:
            t = ray.get(ref)
            _broadcast_cache_put(ref_key, t)
        for col in ("subj", "obj"):
            arr = batch[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            # surfaces are Zipfian: normalize/lookup per DISTINCT value only,
            # then fan the result back out with a vectorized take
            enc = pc.dictionary_encode(arr)
            mapped = pa.array(
                [t.get(normalize_surface(u), u) for u in enc.dictionary.to_pylist()],
                pa.string(),
            )
            batch = batch.set_column(
                batch.column_names.index(col), col, pc.take(mapped, enc.indices)
            )
        return batch

    return triples.map_batches(rewrite, batch_format="pyarrow")


def _rewrite_join(triples: Dataset, mapping: Dataset, num_partitions: int) -> Dataset:
    """Join-based rewrite for non-broadcastable mappings (two hash joins)."""

    def keyed(which: str):
        def add(batch: pa.Table) -> pa.Table:
            keys = [normalize_surface(s) for s in batch[which].to_pylist()]
            return batch.append_column(f"{which}_key", pa.array(keys, pa.string()))

        return add

    # Reduce mapping to one winner per surface key first (small groupby).
    def pick(group: pa.Table) -> pa.Table:
        # same deterministic tie-break as the broadcast path
        g = group.sort_by([("n_mentions", "descending"), ("canonical", "ascending")])
        return pa.table(
            {
                "skey": [g["skey"][0].as_py()],
                "canon": [g["canonical"][0].as_py()],
            }
        )

    skeys = mapping.map_batches(
        lambda t: pa.table(
            {
                "skey": pa.array(
                    [n.split(":", 1)[1] for n in t["node"].to_pylist()], pa.string()
                ),
                "canonical": t["canonical"],
                "n_mentions": t["n_mentions"],
            }
        ),
        batch_format="pyarrow",
    ).groupby("skey").map_groups(pick, batch_format="pyarrow")

    # One schema probe of the INPUT only; everything downstream is derived
    # statically (probing the second join's lazy left side would re-execute
    # the first join + upstream — see joins.hash_join).
    s = triples.schema()
    tschema = pa.schema(list(zip(s.names, s.types)))
    str_ = pa.string()
    out = hash_join(
        triples.map_batches(keyed("subj"), batch_format="pyarrow"),
        skeys.rename_columns({"skey": "subj_key", "canon": "subj_canon"}),
        on="subj_key",
        how="left",
        left_schema=pa.schema(list(tschema) + [pa.field("subj_key", str_)]),
        right_schema=pa.schema([("subj_key", str_), ("subj_canon", str_)]),
    )
    out = out.map_batches(
        lambda t: t.set_column(
            t.column_names.index("subj"), "subj", pc.coalesce(t["subj_canon"], t["subj"])
        ).drop_columns(["subj_key", "subj_canon"]),
        batch_format="pyarrow",
    )
    out = hash_join(
        out.map_batches(keyed("obj"), batch_format="pyarrow"),
        skeys.rename_columns({"skey": "obj_key", "canon": "obj_canon"}),
        on="obj_key",
        how="left",
        left_schema=pa.schema(list(tschema) + [pa.field("obj_key", str_)]),
        right_schema=pa.schema([("obj_key", str_), ("obj_canon", str_)]),
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.column_names.index("obj"), "obj", pc.coalesce(t["obj_canon"], t["obj"])
        ).drop_columns(["obj_key", "obj_canon"]),
        batch_format="pyarrow",
    )


_AUDIT_EMPTY = pa.table(
    {
        "canonical": pa.array([], pa.string()),
        "n_forms": pa.array([], pa.int64()),
        "n_types": pa.array([], pa.int64()),
        "types": pa.array([], pa.string()),
        "n_mentions": pa.array([], pa.int64()),
    }
)


def entity_audit(mapping: Dataset, num_buckets: int = 256) -> Dataset:
    """Entity-resolution audit over a canonicalization ``mapping`` (the B6
    QA gate): one row per CANONICAL NAME with its surface-form count,
    distinct mention-type count, the sorted type list, and total mention
    support.  ``n_types >= 2`` flags type conflicts / cross-type name
    collisions (a PER and a LOC component resolving to the same canonical)
    — the standard hygiene signal an entity-resolution run is reviewed by.

    Scale shape: ``mapping`` is bounded by the distinct typed-surface
    vocabulary, not the corpus (``canonicalize``'s combiner argument), so
    ONE bucketed groupby (the segmented-kernel idiom: ~``num_buckets``
    dispatches, not |entities|) finishes the audit without touching the
    mention stream again."""
    from ner_ray.utils import stable_hash64

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.select(["canonical", "type", "n_mentions"])
        h = stable_hash64(t["canonical"])  # NUL-safe (utils.stable_hash64)
        return t.append_column(
            "_bkt", pa.array((h % num_buckets).astype(np.int64))
        )

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _AUDIT_EMPTY
        g = g.sort_by([("canonical", "ascending"), ("type", "ascending")])
        canon = g["canonical"].to_numpy(zero_copy_only=False)
        typ = g["type"].to_numpy(zero_copy_only=False)
        nm = g["n_mentions"].to_numpy(zero_copy_only=False).astype(np.int64)
        new = np.r_[True, canon[1:] != canon[:-1]]
        seg = np.cumsum(new) - 1
        n_seg = int(seg[-1]) + 1
        n_forms = np.bincount(seg, minlength=n_seg).astype(np.int64)
        n_ment = np.bincount(seg, weights=nm, minlength=n_seg).astype(np.int64)
        # a type run boundary within a segment == a new distinct type
        newtype = new | np.r_[True, typ[1:] != typ[:-1]]
        n_types = np.bincount(seg[newtype], minlength=n_seg).astype(np.int64)
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(canon)]
        types_joined = [
            ",".join(sorted(set(typ[a:b]))) for a, b in zip(starts, ends)
        ]
        return pa.table(
            {
                "canonical": pa.array(canon[starts]),
                "n_forms": pa.array(n_forms, pa.int64()),
                "n_types": pa.array(n_types, pa.int64()),
                "types": pa.array(types_joined, pa.string()),
                "n_mentions": pa.array(n_ment, pa.int64()),
            }
        )

    return (
        mapping.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(fold, batch_format="pyarrow")
    )
