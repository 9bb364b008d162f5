"""Graph analytics over the materialized triple table (beyond-reference ops
for the KG product: degree stats and PageRank over canonical entities).

Scale shape: edge aggregation is the combiner pattern (per-block Arrow
group_by -> tiny keyed merge).  The iterative PageRank runs on the
**entity** graph, which canonicalization has already collapsed to distinct
canonical nodes — orders of magnitude smaller than the triple stream — so
the power iteration is a driver-side sparse matvec over broadcast-collected
edges below ``driver_threshold`` distinct edges, and documented to shard the
matvec by source-node range above it (each round = one groupby-sum shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _edge_partial(batch: pa.Table) -> pa.Table:
    """Per-block distinct-(subj, obj) combiner with support weight — THE edge
    combiner, shared by the driver-combine and distributed paths so a
    semantics fix can never apply to one and miss the other."""
    if "n_support" in batch.column_names:
        g = batch.group_by(["subj", "obj"]).aggregate([("n_support", "sum")])
        return g.rename_columns(["subj", "obj", "w"])
    g = batch.group_by(["subj", "obj"]).aggregate([("subj", "count")])
    return g.rename_columns(["subj", "obj", "w"])


def edge_weights(triples: Dataset, driver_threshold: int = 5_000_000) -> pd.DataFrame:
    """Distinct (subj, obj) edges with support weight.

    Returns a DataFrame by contract (callers treat the distinct-edge set as
    driver-resident).  Below ``driver_threshold`` per-block distinct partials
    the merge happens in pandas (cheapest at bench scale); above it the merge
    is the distributed ``edge_weights_ds`` groupby and only the FINAL
    distinct-edge set streams back — per-block partials never all land on the
    driver at once.  Callers that must stay distributed end-to-end use
    ``edge_weights_ds`` directly (``pagerank_distributed``, ``degree_stats``
    above its own threshold).
    """

    parts_ds = triples.map_batches(_edge_partial, batch_format="pyarrow").materialize()
    if parts_ds.count() > driver_threshold:
        from ray.data.aggregate import Sum

        return (
            parts_ds.groupby(["subj", "obj"])
            .aggregate(Sum("w", alias_name="w"))
            .to_pandas()
        )
    parts = parts_ds.to_pandas()
    return parts.groupby(["subj", "obj"], sort=False)["w"].sum().reset_index()


def degree_stats(triples: Dataset, driver_threshold: int = 5_000_000) -> pd.DataFrame:
    """Per-node in/out degree over distinct edges (deterministic order).

    Hybrid plan (same rationale as ``pagerank``): below ``driver_threshold``
    distinct edges the degree fold is driver pandas over ``edge_weights``;
    above it edges stay a Dataset (``edge_weights_ds``) and degrees come from
    ONE distributed groupby-sum over narrow per-endpoint contribution rows —
    the driver only ever holds the O(nodes) result the contract returns.
    Driver-vs-distributed equality is pytest-gated on a seeded graph.
    """
    edges_ds = edge_weights_ds(triples).materialize()
    if edges_ds.count() > driver_threshold:
        return _degree_stats_distributed(edges_ds)
    e = edges_ds.to_pandas()
    out_deg = e.groupby("subj").size().rename("out_degree")
    in_deg = e.groupby("obj").size().rename("in_degree")
    deg = pd.concat([out_deg, in_deg], axis=1).fillna(0).astype("int64")
    deg.index.name = "node"
    deg["degree"] = deg["out_degree"] + deg["in_degree"]
    return deg.reset_index().sort_values(
        ["degree", "node"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)


def _degree_stats_distributed(edges_ds: Dataset) -> pd.DataFrame:
    """Degrees over a distinct-edge Dataset: per-block combiner emitting
    (node, out, in) partial counts, then one groupby-sum shuffle."""
    from ray.data.aggregate import Sum

    def ends(t: pa.Table) -> pa.Table:
        ones = pa.array(np.ones(t.num_rows, dtype=np.int64))
        zeros = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        both = pa.table(
            {
                "node": pa.concat_arrays(
                    [t["subj"].combine_chunks(), t["obj"].combine_chunks()]
                ),
                "out_degree": pa.concat_arrays([ones, zeros]),
                "in_degree": pa.concat_arrays([zeros, ones]),
            }
        )
        g = both.group_by("node").aggregate([("out_degree", "sum"), ("in_degree", "sum")])
        return g.rename_columns(["node", "out_degree", "in_degree"])

    deg = (
        edges_ds.map_batches(ends, batch_format="pyarrow")
        .groupby("node")
        .aggregate(
            Sum("out_degree", alias_name="out_degree"),
            Sum("in_degree", alias_name="in_degree"),
        )
        .to_pandas()
    )
    deg["out_degree"] = deg["out_degree"].astype("int64")
    deg["in_degree"] = deg["in_degree"].astype("int64")
    deg["degree"] = deg["out_degree"] + deg["in_degree"]
    deg = deg[["node", "out_degree", "in_degree", "degree"]]
    return deg.sort_values(
        ["degree", "node"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)


def edge_weights_ds(triples: Dataset) -> Dataset:
    """Distinct (subj, obj) edges with support weight, fully distributed:
    per-block Arrow combiner then a single ``groupby([subj,obj]).sum`` —
    the shuffle payload is per-block-distinct edges, never raw triples."""
    from ray.data.aggregate import Sum

    parts = triples.map_batches(_edge_partial, batch_format="pyarrow")
    return parts.groupby(["subj", "obj"]).aggregate(Sum("w", alias_name="w"))


def pagerank_distributed(
    edges: Dataset, damping: float = 0.85, n_iter: int = 30
) -> Dataset:
    """Sharded-matvec PageRank: ranks and edges stay Datasets end to end.

    Each round = one hash-join of ranks onto edges by source node, a
    per-block partial-product combiner, and one ``groupby(dst).sum`` shuffle
    (+ a scalar dangling-mass aggregate).  No step materializes the graph on
    the driver; memory per round is O(nodes) spread over the cluster.

    ``edges`` must have columns (subj, obj, w).  Returns a Dataset
    (node, rank), ranks rounded to 10 digits — write it out or sort/limit it;
    collecting it is the caller's choice.
    """
    from ray.data.aggregate import Sum

    from ner_ray.stages.joins import hash_join

    # Consumed three times below (nodes, out-weight agg, normalize join) and
    # schema-probed once — pin it so a lazy upstream plan runs exactly once.
    edges = edges.materialize()

    def ends(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [t["subj"].combine_chunks(), t["obj"].combine_chunks()]
                )
            }
        )

    nodes = (
        edges.map_batches(ends, batch_format="pyarrow")
        .groupby("node")
        .count()
        .select_columns(["node"])
        .materialize()
    )
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda t: pa.table({"node": pa.array([], pa.string()), "rank": pa.array([], pa.float64())}),
            batch_format="pyarrow",
        )

    # Explicit schemas on every lazy join side: Dataset.schema() on an
    # un-executed chain runs the whole upstream plan (see joins.hash_join).
    str_, f64 = pa.string(), pa.float64()
    out_w = edges.groupby("subj").aggregate(Sum("w", alias_name="out_w"))
    edges_schema = pa.schema(list(zip(edges.schema().names, edges.schema().types)))
    w_type = edges_schema.field("w").type
    nedges = hash_join(
        edges,
        out_w,
        on="subj",
        how="inner",
        left_schema=edges_schema,
        right_schema=pa.schema([("subj", str_), ("out_w", w_type)]),
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["subj"],
                "dst": t["obj"],
                "norm_w": pc.divide(
                    pc.cast(t["w"], pa.float64()), pc.cast(t["out_w"], pa.float64())
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    ranks = nodes.map_batches(
        lambda t: t.append_column("rank", pa.array([1.0 / n] * t.num_rows, pa.float64())),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(n_iter):

        def contrib_partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "rank" not in t.column_names:
                return pa.table(
                    {"node": pa.array([], pa.string()), "c": pa.array([], pa.float64())}
                )
            prod = pc.multiply(t["rank"], t["norm_w"])
            g = (
                t.append_column("c", prod)
                .select(["dst", "c"])
                .group_by(["dst"])
                .aggregate([("c", "sum")])
            )
            return g.rename_columns(["node", "c"])

        ranks_src = ranks.map_batches(
            lambda t: pa.table({"src": t["node"], "rank": t["rank"]}),
            batch_format="pyarrow",
        )
        contribs = (
            hash_join(
                nedges,
                ranks_src,
                on="src",
                how="inner",
                left_schema=pa.schema(
                    [("src", str_), ("dst", str_), ("norm_w", f64)]
                ),
                right_schema=pa.schema([("src", str_), ("rank", f64)]),
            )
            .map_batches(contrib_partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("c", alias_name="c"))
            .materialize()
        )
        # Rank mass is conserved (sum r = 1 every round) and each source's
        # norm weights sum to 1, so sum(contribs) = rank mass of nodes WITH
        # outgoing edges; the dangling mass is the complement — no extra
        # dangling-set join per round.
        d_mass = max(0.0, 1.0 - float(contribs.sum("c") or 0.0))
        base = (1.0 - damping) / n + damping * (d_mass / n)

        def update(t: pa.Table) -> pa.Table:
            if "c" not in t.column_names:
                return pa.table({"node": t["node"], "rank": pa.array([base] * t.num_rows)})
            c = pc.fill_null(pc.cast(t["c"], pa.float64()), 0.0)
            return pa.table(
                {"node": t["node"], "rank": pc.add(base, pc.multiply(damping, c))}
            )

        ranks = (
            hash_join(
                nodes,
                contribs,
                on="node",
                how="left",
                left_schema=pa.schema([("node", str_)]),
                right_schema=pa.schema([("node", str_), ("c", f64)]),
            )
            .map_batches(update, batch_format="pyarrow")
            .materialize()
        )

    return ranks.map_batches(
        lambda t: pa.table({"node": t["node"], "rank": pc.round(t["rank"], ndigits=10)}),
        batch_format="pyarrow",
    )


def pagerank(
    triples: Dataset,
    damping: float = 0.85,
    n_iter: int = 30,
    tol: float = 0.0,
    driver_threshold: int = 5_000_000,
) -> pd.DataFrame:
    """PageRank over the canonical entity graph (weighted by edge support).

    Deterministic: fixed iteration count, sorted node order.  ``tol``
    defaults to 0.0 (run exactly ``n_iter`` rounds) because only the DRIVER
    path can early-break on it — a positive tol would make the two hybrid
    paths disagree at the 1e-10 rounding whenever the driver exits early,
    so results would depend on which side of ``driver_threshold`` the same
    logical graph lands.  Pass a positive tol only for driver-scale graphs
    where the early exit is worth that asymmetry.
    Returns (node, rank) sorted by rank desc then node.  Hybrid plan (same
    rationale as canonicalize): below ``driver_threshold`` distinct edges the
    power iteration is a driver-side numpy matvec; above it the computation
    stays fully distributed (``pagerank_distributed``) and the sorted result
    streams back — tested identical on seeded graphs.
    """
    edges_ds = edge_weights_ds(triples).materialize()
    if edges_ds.count() > driver_threshold:
        ranks = pagerank_distributed(edges_ds, damping=damping, n_iter=n_iter)
        return ranks.sort(["rank", "node"], descending=[True, False]).to_pandas()
    e = edges_ds.to_pandas()
    nodes = sorted(set(e["subj"]) | set(e["obj"]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": [], "rank": []})
    src = e["subj"].map(idx).to_numpy()
    dst = e["obj"].map(idx).to_numpy()
    w = e["w"].to_numpy(dtype=np.float64)
    out_w = np.zeros(n)
    np.add.at(out_w, src, w)
    dangling = out_w == 0
    norm_w = w / out_w[src]
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] * norm_w)
        dangling_mass = r[dangling].sum() / n
        new = (1 - damping) / n + damping * (contrib + dangling_mass)
        if np.abs(new - r).sum() < tol:
            r = new
            break
        r = new
    out = pd.DataFrame({"node": nodes, "rank": np.round(r, 10)})
    return out.sort_values(["rank", "node"], ascending=[False, True], kind="mergesort").reset_index(
        drop=True
    )


def undirected_edges(triples: Dataset) -> Dataset:
    """Distinct undirected entity edges ``(a < b)`` from a triple table —
    per-block Arrow combiner + one vectorized groupby (shared by
    ``triangle_counts`` and ``link_features``)."""
    from ray.data.aggregate import Sum

    def to_edges(t: pa.Table) -> pa.Table:
        s = t["subj"].to_numpy(zero_copy_only=False)
        o = t["obj"].to_numpy(zero_copy_only=False)
        keep = s != o
        s, o = s[keep], o[keep]
        a = np.minimum(s, o)
        b = np.maximum(s, o)
        return (
            pa.table(
                {
                    "a": pa.array(a, pa.string()),
                    "b": pa.array(b, pa.string()),
                    "_one": pa.array(np.ones(len(a), np.int64)),
                }
            )
            .group_by(["a", "b"])
            .aggregate([("_one", "min")])
            .rename_columns(["a", "b", "w"])
        )

    return (
        triples.select_columns(["subj", "obj"])
        .map_batches(to_edges, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("w", alias_name="_x"))  # distinct edges via the groupby
        .drop_columns(["_x"])
    )


def triangle_counts(triples: Dataset, max_degree: int = 10_000) -> Dataset:
    """Per-entity triangle counts over the UNDIRECTED entity co-occurrence
    graph (motif counting — the clustering/community primitive; Suri &
    Vassilvitskii 2011 MapReduce node-iterator shape):

    1. normalize triples to distinct undirected edges ``(a < b)`` — one
       vectorized groupby (the edge set, already entity-sized after
       canonicalization);
    2. per-node WEDGE enumeration: one ``groupby(center)`` over both edge
       directions emits the ordered neighbor pairs ``(u < v)`` of each
       center — a node of degree d emits d·(d-1)/2 wedges, so degrees are
       capped at ``max_degree`` with a hard error rather than a silent
       quadratic blowup (production would split hot nodes by neighbor
       ranges first);
    3. a wedge is a triangle iff its ``(u, v)`` is itself an edge: one
       hash join of wedges against edges, then a per-center count.

    Every triangle is counted exactly once at each of its three corners, so
    ``sum(n_triangles) == 3 * total_triangles``.  Output:
    ``(entity, n_triangles)`` for entities in >= 1 triangle.
    """
    from ray.data.aggregate import Sum

    from ner_ray.stages.joins import hash_join

    SEP = "\x1e"  # engine-internal join key separator

    edges = undirected_edges(triples).materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "n": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
            }
        )

    def wedges(g: pa.Table) -> pa.Table:
        nbrs = sorted(g["n"].to_pylist())
        d = len(nbrs)
        if d > max_degree:
            raise ValueError(
                f"node {g['c'][0].as_py()!r} has degree {d} > max_degree="
                f"{max_degree}; split hot nodes before triangle counting"
            )
        if d < 2:
            return pa.table(
                {"c": pa.array([], pa.string()), "ek": pa.array([], pa.string())}
            )
        iu, iv = np.triu_indices(d, k=1)
        arr = np.asarray(nbrs, dtype=object)
        return pa.table(
            {
                "c": pa.array([g["c"][0].as_py()] * len(iu), pa.string()),
                "ek": pa.array(
                    [f"{u}{SEP}{v}" for u, v in zip(arr[iu], arr[iv])], pa.string()
                ),
            }
        )

    wedge_ds = (
        edges.map_batches(both_dirs, batch_format="pyarrow")
        .groupby("c")
        .map_groups(wedges, batch_format="pyarrow")
    )

    def edge_keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ek": pc.binary_join_element_wise(t["a"], t["b"], SEP),
                "_e": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    closed = hash_join(
        wedge_ds,
        edges.map_batches(edge_keys, batch_format="pyarrow"),
        on="ek",
        how="inner",
        left_schema=pa.schema([("c", pa.string()), ("ek", pa.string())]),
        right_schema=pa.schema([("ek", pa.string()), ("_e", pa.int64())]),
    )

    def count_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": t["c"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    return (
        closed.map_batches(count_rows, batch_format="pyarrow")
        .groupby("entity")
        .aggregate(Sum("n", alias_name="n_triangles"))
    )


def link_features(triples: Dataset, max_degree: int = 10_000) -> Dataset:
    """Link-prediction features for every existing KG edge: degrees of both
    endpoints, common-neighbor count, and neighborhood Jaccard
    ``|N(a) ∩ N(b)| / |N(a) ∪ N(b)|`` (Liben-Nowell & Kleinberg 2003) —
    the classic features for KG completion / link scoring.

    Shape: the triangle-counting wedge machinery — a wedge centered at c
    with ends (u, v) witnesses c as a COMMON NEIGHBOR of the pair (u, v) —
    so common counts are one ``groupby(wedge key).count`` joined (left)
    back onto the edge set; degrees are one more narrow groupby joined on
    each endpoint.  Same hot-degree guard as ``triangle_counts``.

    Jaccard quantizes to micros from exact integers on both engine sides:
    ``floor(cn * 1e6 / (da + db - cn) + 0.5)``.
    """
    import math

    from ray.data.aggregate import Sum

    from ner_ray.stages.joins import hash_join

    SEP = "\x1e"

    edges = undirected_edges(triples).materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "n": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
                "_one": pa.array(np.ones(2 * t.num_rows, np.int64)),
            }
        )

    dirs = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()
    deg = dirs.groupby("c").aggregate(Sum("_one", alias_name="d"))

    def wedges(g: pa.Table) -> pa.Table:
        nbrs = sorted(g["n"].to_pylist())
        d = len(nbrs)
        if d > max_degree:
            raise ValueError(
                f"node {g['c'][0].as_py()!r} has degree {d} > max_degree="
                f"{max_degree}; split hot nodes before link_features"
            )
        if d < 2:
            return pa.table(
                {"ek": pa.array([], pa.string()), "_one": pa.array([], pa.int64())}
            )
        iu, iv = np.triu_indices(d, k=1)
        arr = np.asarray(nbrs, dtype=object)
        return pa.table(
            {
                "ek": pa.array(
                    [f"{u}{SEP}{v}" for u, v in zip(arr[iu], arr[iv])], pa.string()
                ),
                "_one": pa.array(np.ones(len(iu), np.int64)),
            }
        )

    common = (
        dirs.groupby("c")
        .map_groups(wedges, batch_format="pyarrow")
        .groupby("ek")
        .aggregate(Sum("_one", alias_name="cn"))
    )

    def edge_keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ek": pc.binary_join_element_wise(t["a"], t["b"], SEP),
                "a": t["a"],
                "b": t["b"],
            }
        )

    with_cn = hash_join(
        edges.map_batches(edge_keys, batch_format="pyarrow"),
        common,
        on="ek",
        how="left",
        left_schema=pa.schema(
            [("ek", pa.string()), ("a", pa.string()), ("b", pa.string())]
        ),
        right_schema=pa.schema([("ek", pa.string()), ("cn", pa.int64())]),
    )
    with_da = hash_join(
        with_cn.map_batches(
            lambda t: t.drop_columns(["ek"]), batch_format="pyarrow"
        ),
        deg.map_batches(
            lambda t: pa.table({"a": t["c"], "da": t["d"]}), batch_format="pyarrow"
        ),
        on="a",
        how="left",
        left_schema=pa.schema(
            [("a", pa.string()), ("b", pa.string()), ("cn", pa.int64())]
        ),
        right_schema=pa.schema([("a", pa.string()), ("da", pa.int64())]),
    )
    with_db = hash_join(
        with_da,
        deg.map_batches(
            lambda t: pa.table({"b": t["c"], "db": t["d"]}), batch_format="pyarrow"
        ),
        on="b",
        how="left",
        left_schema=pa.schema(
            [("a", pa.string()), ("b", pa.string()), ("cn", pa.int64()), ("da", pa.int64())]
        ),
        right_schema=pa.schema([("b", pa.string()), ("db", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        cn = t["cn"].to_numpy(zero_copy_only=False)
        cn = np.where(np.isnan(cn.astype(np.float64)), 0, cn).astype(np.int64)
        da = t["da"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = t["db"].to_numpy(zero_copy_only=False).astype(np.int64)
        jac = np.array(
            [
                math.floor(c * 1_000_000 / (x + y - c) + 0.5)
                for c, x, y in zip(cn.tolist(), da.tolist(), db.tolist())
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "da": pa.array(da, pa.int64()),
                "db": pa.array(db, pa.int64()),
                "common": pa.array(cn, pa.int64()),
                "jaccard_micro": pa.array(jac, pa.int64()),
            }
        )

    return with_db.map_batches(finish, batch_format="pyarrow")


def neighbor_degree_agg(triples: Dataset) -> Dataset:
    """One message-passing round over the KG entity graph (the GraphSAGE /
    GNN feature-propagation primitive with degree as the input feature):
    for every entity, aggregate its neighbors' degrees — count, sum, max,
    and mean (exact integer micros).

    Shape: distinct undirected edges -> both-direction adjacency rows ->
    ONE hash join of adjacency against the degree table (message = the
    neighbor's feature) -> one groupby-fold per node.  This is the
    canonical "join features onto edges, fold per destination" plan every
    GNN data pipeline runs; a k-round propagation is k repetitions.
    """
    import math

    from ray.data.aggregate import Max, Sum

    from ner_ray.stages.joins import hash_join

    edges = undirected_edges(triples).materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "n": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
                "_one": pa.array(np.ones(2 * t.num_rows, np.int64)),
            }
        )

    dirs = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()
    deg = dirs.groupby("c").aggregate(Sum("_one", alias_name="d"))

    msgs = hash_join(
        dirs.map_batches(
            lambda t: t.drop_columns(["_one"]), batch_format="pyarrow"
        ),
        deg.map_batches(
            lambda t: pa.table({"n": t["c"], "dn": t["d"]}), batch_format="pyarrow"
        ),
        on="n",
        how="inner",
        left_schema=pa.schema([("c", pa.string()), ("n", pa.string())]),
        right_schema=pa.schema([("n", pa.string()), ("dn", pa.int64())]),
    )

    def ones(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": t["c"],
                "dn": t["dn"],
                "_one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    agg = (
        msgs.map_batches(ones, batch_format="pyarrow")
        .groupby("c")
        .aggregate(
            Sum("_one", alias_name="n_neighbors"),
            Sum("dn", alias_name="sum_nbr_deg"),
            Max("dn", alias_name="max_nbr_deg"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t["sum_nbr_deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_neighbors"].to_numpy(zero_copy_only=False).astype(np.int64)
        mean = np.array(
            [
                math.floor(a * 1_000_000 / b + 0.5)
                for a, b in zip(s.tolist(), n.tolist())
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "entity": t["c"],
                "n_neighbors": pa.array(n, pa.int64()),
                "sum_nbr_deg": pa.array(s, pa.int64()),
                "max_nbr_deg": pc.cast(t["max_nbr_deg"], pa.int64()),
                "mean_nbr_deg_micro": pa.array(mean, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
