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
from ray.data import Dataset


def edge_weights(triples: Dataset) -> pd.DataFrame:
    """Distinct (subj, obj) edges with support weight (combiner + merge)."""

    def partial(batch: pa.Table) -> pa.Table:
        if "n_support" in batch.column_names:
            g = batch.group_by(["subj", "obj"]).aggregate([("n_support", "sum")])
            return g.rename_columns(["subj", "obj", "w"])
        g = batch.group_by(["subj", "obj"]).aggregate([("subj", "count")])
        return g.rename_columns(["subj", "obj", "w"])

    parts = triples.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.groupby(["subj", "obj"], sort=False)["w"].sum().reset_index()


def degree_stats(triples: Dataset) -> pd.DataFrame:
    """Per-node in/out degree over distinct edges (deterministic order)."""
    e = edge_weights(triples)
    out_deg = e.groupby("subj").size().rename("out_degree")
    in_deg = e.groupby("obj").size().rename("in_degree")
    deg = pd.concat([out_deg, in_deg], axis=1).fillna(0).astype("int64")
    deg.index.name = "node"
    deg["degree"] = deg["out_degree"] + deg["in_degree"]
    return deg.reset_index().sort_values(
        ["degree", "node"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)


def pagerank(
    triples: Dataset,
    damping: float = 0.85,
    n_iter: int = 30,
    tol: float = 1e-9,
    driver_threshold: int = 5_000_000,
) -> pd.DataFrame:
    """PageRank over the canonical entity graph (weighted by edge support).

    Deterministic: fixed iteration count / tolerance, sorted node order.
    Returns (node, rank) sorted by rank desc then node.
    """
    e = edge_weights(triples)
    if len(e) > driver_threshold:  # pragma: no cover - sandbox corpora are small
        raise NotImplementedError(
            "edge set exceeds driver threshold; shard the matvec by source "
            "range (each round = map_batches partial products -> groupby-sum)"
        )
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
