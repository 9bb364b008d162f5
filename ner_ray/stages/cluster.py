"""Distributed k-means and SemDeDup-style semantic deduplication.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public) is the standard
recipe for pruning semantic near-duplicates from web-scale training corpora:
k-means the embedding space, then search for near-duplicate pairs WITHIN
each cluster only.  That turns the intractable global all-pairs problem into
k independent bounded problems whose total cost is sum(c_i^2) — tunable by k
— and each cluster's pair search is a single dense matmul.

Scale shape (the part that must survive 100 TB):

- ``kmeans_assign`` is a stateless ``map_batches`` pass: the (k, d) centroid
  matrix broadcasts ONCE via ``ray.put`` and every task reads it zero-copy
  from the local object store; per batch the assignment is one float64
  matmul + argmax.  Nothing shuffles; the corpus streams.
- ``kmeans_fit`` (Lloyd's) never moves the corpus either: each iteration is
  one ``map_batches`` pass emitting per-block PARTIAL per-cluster vector
  sums + counts (k rows per block, narrow), folded driver-side — the
  classic distributive-aggregate shape (sum/count commute), so the driver
  handles k * n_blocks tiny rows per iteration, never the data.  Callers
  should pass a materialized dataset: the fit re-executes its input once
  per iteration by construction.
- ``semantic_dedup`` groups by the assigned cluster id — k groups, so the
  per-group ``map_groups`` dispatch overhead (~50 us/group) is irrelevant —
  and the within-cluster pair scan is vectorized (one upper-triangle
  matmul per cluster).  Oversized clusters are CAPPED at
  ``max_cluster_size`` rows (smallest ids kept, the rest treated as unique)
  and the truncation is logged, like every other capped path in this repo:
  a silently quadratic degenerate cluster must not take down the stage.
  The resulting duplicate-pair edge set is bounded by the threshold hits;
  components resolve with the same hybrid used by minhash/canonicalize —
  driver union-find below ``cc_threshold`` edges, distributed min-label
  propagation above it.

Cross-engine determinism (the oracle contract): assignments are argmax over
float64 cosine similarities with first-wins (= lowest centroid id) ties, the
same order DuckDB's ``row_number() OVER (ORDER BY sim DESC, cid ASC)``
produces; reported similarities are quantized with the floor-form
``floor(x * 1e4 + 0.5) / 1e4`` that is bit-identical double arithmetic in
Python and DuckDB (probed for q43; Python banker's round() vs DuckDB
half-away round() disagree at half boundaries).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ner_ray.stages.ann import _batch_matrix, _normalize
from ner_ray.stages.text_dedup import _dnode

logger = logging.getLogger(__name__)


def _quantize4(x: np.ndarray) -> np.ndarray:
    """floor(x * 1e4 + 0.5) / 1e4 — the cross-engine-stable 4-decimal
    quantizer (see module docstring)."""
    return np.floor(x * 1e4 + 0.5) / 1e4


def kmeans_assign(
    ds: Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """Assign every vector to its max-cosine centroid.

    Returns (id_col, cluster_id, sim) with ``sim`` the quantized cosine to
    the winning centroid.  One streaming pass; centroids broadcast once.
    """
    import ray

    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        x = _normalize(_batch_matrix(batch, emb_col))
        sims = x @ c.T
        cid = np.argmax(sims, axis=1)  # first max = lowest centroid id
        best = sims[np.arange(len(x)), cid]
        import pyarrow.compute as pc

        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                "cluster_id": pa.array(cid.astype(np.int64)),
                "sim": pa.array(_quantize4(best)),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_fit(
    ds: Dataset,
    k: int,
    n_iter: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    init_sample: int = 2048,
    seed: int = 42,
) -> np.ndarray:
    """Distributed spherical Lloyd's: returns the (k, d) unit centroid matrix.

    Init comes from ``kmeans_lite`` over the content-addressed deterministic
    sample (``ann._train_sample`` — membership and order pinned independent
    of block arrival order).  Each iteration streams the corpus once and
    folds k-per-block partials on the driver (see module docstring); empty
    clusters keep their previous centroid.  Pass a MATERIALIZED dataset —
    the input re-executes once per iteration.
    """
    import ray

    from ner_ray.stages.ann import _train_sample, kmeans_lite

    cent = kmeans_lite(_train_sample(ds, id_col, emb_col, init_sample), k, seed=seed)
    k_eff = len(cent)  # kmeans_lite clamps k to the sample size
    for _ in range(n_iter):
        cent_ref = ray.put(cent)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            x = _normalize(_batch_matrix(batch, emb_col))
            a = np.argmax(x @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=len(c))
            nz = np.flatnonzero(cnt)
            return pa.table(
                {
                    "cluster_id": pa.array(nz.astype(np.int64)),
                    "vsum": pa.array(
                        [sums[i].tolist() for i in nz], pa.list_(pa.float64())
                    ),
                    "cnt": pa.array(cnt[nz].astype(np.int64)),
                }
            )

        p = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
        nxt = cent.copy()
        if len(p):
            # fold in CONTENT-sorted order so the driver-side float sums are
            # independent of block arrival order (cluster_id alone leaves
            # same-cluster partials from different blocks in arrival order)
            p["_k"] = p["vsum"].map(
                lambda v: np.asarray(v, dtype=np.float64).tobytes()
            )
            p = p.sort_values(["cluster_id", "cnt", "_k"], kind="mergesort")
            for cid, grp in p.groupby("cluster_id", sort=True):
                vec = np.sum(np.stack(list(grp["vsum"])), axis=0)
                nxt[int(cid)] = vec / int(grp["cnt"].sum())
        cent = _normalize(nxt)
    assert len(cent) == k_eff
    return cent


def semantic_dedup(
    ds: Dataset,
    centroids: np.ndarray,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_cluster_size: int = 100_000,
    cc_threshold: int = 2_000_000,
) -> Dataset:
    """SemDeDup: within-cluster cosine near-dup pruning over the whole corpus.

    Returns (id_col, cluster_id, group_id, keep): ``group_id`` is the min id
    of the vector's duplicate component (itself when unique), ``keep`` marks
    the component representative — filtering on ``keep`` yields the
    deduplicated corpus.

    Threshold boundary note: the ``>= threshold`` compare runs on raw
    float64 cosines (normalize-then-matmul) while a SQL twin computes
    dot/norms — a pair within ~1e-15 of the threshold could flip between
    engines.  Quantizing before the compare only MOVES the sharp boundary,
    it cannot remove it, so this matches the q19/q37/q39 exact-pair twins:
    the flip set is measure-zero on real data and has never been observed.
    """
    import ray

    # carry the embedding alongside the assignment so the pair scan needs no
    # join; the wide column rides exactly one shuffle (the cluster groupby)
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    cent_ref = ray.put(cent)

    def assign_keep_vec(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        x = _normalize(_batch_matrix(batch, emb_col))
        cid = np.argmax(x @ c.T, axis=1)
        import pyarrow.compute as pc

        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                "cluster_id": pa.array(cid.astype(np.int64)),
                emb_col: batch[emb_col],
            }
        )

    # materialize: the plan has TWO consumers below (the pair groupby and the
    # label attach) — a live Dataset would re-run the assignment per branch
    # (the kg_raw_triples live-lock lesson); the pin is block-spillable
    with_vec = ds.map_batches(assign_keep_vec, batch_format="pyarrow").materialize()

    def cluster_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        if len(ids) > max_cluster_size:
            logger.warning(
                "semantic_dedup: cluster of %d rows capped to %d (smallest "
                "ids kept; overflow rows are treated as unique)",
                len(ids),
                max_cluster_size,
            )
            order = order[:max_cluster_size]
            ids = ids[:max_cluster_size]
        x = _normalize(_batch_matrix(group, emb_col))[order]
        sims = x @ x.T
        ii, jj = np.triu_indices(len(ids), 1)
        hit = sims[ii, jj] >= threshold
        # zero-padded node names so the min-LABEL components rule coincides
        # with the numeric-min group_id contract (text_dedup._dnode rationale)
        return pa.table(
            {
                "src": pa.array([_dnode(ids[i]) for i in ii[hit]], pa.string()),
                "dst": pa.array([_dnode(ids[j]) for j in jj[hit]], pa.string()),
            }
        )

    edges = with_vec.groupby("cluster_id").map_groups(
        cluster_pairs, batch_format="pyarrow"
    )
    narrow = with_vec.select_columns([id_col, "cluster_id"])
    return _attach_components(narrow, edges, id_col, cc_threshold)


def _attach_components(
    assigned: Dataset, edges: Dataset, id_col: str, cc_threshold: int
) -> Dataset:
    """(id, cluster_id) + duplicate edges -> (id, cluster_id, group_id, keep).

    Same hybrid as ``text_dedup._groups_from_edges`` (which drops non-id
    columns, hence this cluster-preserving variant): the edge set is bounded
    by threshold HITS, so small sets finish with driver union-find and a
    broadcast label map; huge sets fall back to distributed min-label
    propagation joined back on the id.
    """
    import ray

    edges = edges.materialize()
    if edges.count() <= cc_threshold:
        from ner_ray.stages.canonicalize import local_union_find

        epdf = edges.to_pandas()
        label_map = local_union_find(list(zip(epdf["src"], epdf["dst"])))
        ref = ray.put({int(a[1:]): int(b[1:]) for a, b in label_map.items()})

        def attach(batch: pa.Table) -> pa.Table:
            lm = ray.get(ref)
            ids = batch[id_col].to_pylist()
            grp = [lm.get(i, i) for i in ids]
            return pa.table(
                {
                    id_col: batch[id_col],
                    "cluster_id": batch["cluster_id"],
                    "group_id": pa.array(grp, pa.int64()),
                    "keep": pa.array([g == i for g, i in zip(grp, ids)], pa.bool_()),
                }
            )

        return assigned.map_batches(attach, batch_format="pyarrow")

    from ner_ray.stages.canonicalize import connected_components
    from ner_ray.stages.joins import hash_join

    labels = connected_components(edges)

    def to_map(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: pa.array(
                    [int(n[1:]) for n in batch["node"].to_pylist()], pa.int64()
                ),
                "group_id": pa.array(
                    [int(l[1:]) for l in batch["label"].to_pylist()], pa.int64()
                ),
            }
        )

    dup_map = labels.map_batches(to_map, batch_format="pyarrow")
    joined = hash_join(
        assigned.select_columns([id_col, "cluster_id"]),
        dup_map,
        on=id_col,
        how="left",
        left_schema=pa.schema([(id_col, pa.int64()), ("cluster_id", pa.int64())]),
        right_schema=pa.schema([(id_col, pa.int64()), ("group_id", pa.int64())]),
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        grp = pc.coalesce(batch["group_id"], batch[id_col])
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster_id": batch["cluster_id"],
                "group_id": grp,
                "keep": pc.equal(grp, batch[id_col]),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
