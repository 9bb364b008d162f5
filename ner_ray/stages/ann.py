"""Similarity search over an embedding column (``list<float>``).

- ``ann_topk`` — brute-force cosine top-k: the query matrix is broadcast via
  ``ray.put`` once; every batch does one numpy matmul against it and emits
  only its local top-k candidates; the driver merges ``O(batches * k)``
  candidate rows.  No shuffle; compute scales linearly and distributes.
- ``lsh_topk`` — the scale path: random-hyperplane LSH buckets (signs of R
  projections) shrink the candidate set; same-bucket (multi-probe) candidates
  are scored exactly.  Approximate: recall < 1 by design; tests measure
  recall vs brute force.
- ``embedding_near_dup_pairs`` — all pairs with cosine >= threshold
  (brute: batch x broadcast-matrix matmul; DuckDB twin is a self-join with
  ``list_cosine_similarity``).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ner_ray.utils import pool_size


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    return flat.reshape(-1, dim)


def ann_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_ids: set[int] | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k per query row; returns (query_idx, vec_id, score, rank).

    Deterministic tie-break: (score desc, vec_id asc)."""
    import ray

    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    qref = ray.put(q)
    excl = exclude_ids or set()

    class Scorer:
        def __init__(self):
            self.q = ray.get(qref)  # one shared copy per node

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            m = _normalize(_batch_matrix(batch, emb_col))
            scores = m @ self.q.T  # [rows, Q]
            out_q, out_id, out_s = [], [], []
            kk = min(k, len(ids))
            for qi in range(self.q.shape[0]):
                s = scores[:, qi]
                idx = np.argpartition(-s, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
                for i in idx:
                    if int(ids[i]) in excl:
                        continue
                    out_q.append(qi)
                    out_id.append(int(ids[i]))
                    out_s.append(float(s[i]))
            return pa.table(
                {
                    "query_idx": pa.array(out_q, pa.int64()),
                    id_col: pa.array(out_id, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    cand = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=pool_size()).to_pandas()
    rows = []
    for qi, grp in cand.groupby("query_idx"):
        top = heapq.nsmallest(k, grp.itertuples(index=False), key=lambda r: (-r.score, getattr(r, id_col)))
        for rank, r in enumerate(top):
            rows.append(
                {"query_idx": int(qi), id_col: getattr(r, id_col), "score": r.score, "rank": rank}
            )
    return pd.DataFrame(rows)


def lsh_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 10,
    n_probe_bits: int = 2,
    seed: int = 42,
) -> pd.DataFrame:
    """Approximate top-k: score only vectors whose hyperplane sign-bucket is
    within ``n_probe_bits`` Hamming bits of the query's bucket (multi-probe).
    Recall < 1 by design; the 100 TB path when brute force is too costly."""
    import ray

    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    dim = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    qsig = (q @ planes > 0).astype(np.uint8)
    qref, pref = ray.put(q), ray.put(planes)

    def popcount_rows(diff: np.ndarray) -> np.ndarray:
        return diff.sum(axis=1)

    class Scorer:
        def __init__(self):
            self.q = ray.get(qref)
            self.planes = ray.get(pref)
            self.qsig = (self.q @ self.planes > 0).astype(np.uint8)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            m = _normalize(_batch_matrix(batch, emb_col))
            sig = (m @ self.planes > 0).astype(np.uint8)  # [rows, P]
            out_q, out_id, out_s = [], [], []
            for qi in range(self.q.shape[0]):
                ham = popcount_rows(sig != self.qsig[qi])
                mask = ham <= n_probe_bits
                if not mask.any():
                    continue
                sub = m[mask] @ self.q[qi]
                sub_ids = ids[mask]
                kk = min(k, len(sub_ids))
                idx = np.argpartition(-sub, kk - 1)[:kk] if kk < len(sub_ids) else np.arange(len(sub_ids))
                for i in idx:
                    out_q.append(qi)
                    out_id.append(int(sub_ids[i]))
                    out_s.append(float(sub[i]))
            return pa.table(
                {
                    "query_idx": pa.array(out_q, pa.int64()),
                    id_col: pa.array(out_id, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    cand = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=pool_size()).to_pandas()
    rows = []
    for qi, grp in cand.groupby("query_idx"):
        top = heapq.nsmallest(k, grp.itertuples(index=False), key=lambda r: (-r.score, getattr(r, id_col)))
        for rank, r in enumerate(top):
            rows.append(
                {"query_idx": int(qi), id_col: getattr(r, id_col), "score": r.score, "rank": rank}
            )
    return pd.DataFrame(rows)


def kmeans_lite(sample: np.ndarray, n_centroids: int, n_iter: int = 8, seed: int = 42) -> np.ndarray:
    """Seeded Lloyd iterations on a driver-side sample (the IVF coarse
    quantizer).  The sample is small by construction; the full corpus never
    comes to the driver."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample)
    cent = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    train_size: int = 2048,
    seed: int = 42,
) -> pd.DataFrame:
    """IVF-style approximate top-k: a coarse k-means quantizer (trained on a
    driver-side sample, broadcast once) restricts exact scoring to vectors
    whose nearest cell is among the query's ``n_probe`` closest cells.

    Scale path vs ``lsh_topk``: cells adapt to the data distribution, so the
    probed fraction ~ ``n_probe / n_centroids`` regardless of dimension.  At
    100 TB the assignment would be precomputed once into a cell-partitioned
    Parquet layout (write_parquet(partition_cols=["cell"])) so a query reads
    only probed partitions; here assignment happens in the same pass, which
    still scans but skips the scoring matmul for unprobed rows.
    Recall < 1 by design; tests measure recall vs brute force.
    """
    import ray

    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    sample_tbl = ds.limit(train_size).map_batches(
        lambda t: t.select([emb_col]), batch_format="pyarrow"
    ).to_pandas()
    sample = np.asarray(list(sample_tbl[emb_col]), dtype=np.float64)
    cent = kmeans_lite(sample, n_centroids, seed=seed)
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # [Q, n_probe]
    qref, cref, pref = ray.put(q), ray.put(cent), ray.put(probe)

    class Scorer:
        def __init__(self):
            self.q = ray.get(qref)
            self.cent = ray.get(cref)
            self.probe = ray.get(pref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            m = _normalize(_batch_matrix(batch, emb_col))
            cells = np.argmax(m @ self.cent.T, axis=1)  # [rows]
            out_q, out_id, out_s = [], [], []
            for qi in range(self.q.shape[0]):
                mask = np.isin(cells, self.probe[qi])
                if not mask.any():
                    continue
                sub = m[mask] @ self.q[qi]
                sub_ids = ids[mask]
                kk = min(k, len(sub_ids))
                idx = np.argpartition(-sub, kk - 1)[:kk] if kk < len(sub_ids) else np.arange(len(sub_ids))
                for i in idx:
                    out_q.append(qi)
                    out_id.append(int(sub_ids[i]))
                    out_s.append(float(sub[i]))
            return pa.table(
                {
                    "query_idx": pa.array(out_q, pa.int64()),
                    id_col: pa.array(out_id, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    cand = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=pool_size()).to_pandas()
    rows = []
    for qi, grp in cand.groupby("query_idx"):
        top = heapq.nsmallest(k, grp.itertuples(index=False), key=lambda r: (-r.score, getattr(r, id_col)))
        for rank, r in enumerate(top):
            rows.append(
                {"query_idx": int(qi), id_col: getattr(r, id_col), "score": r.score, "rank": rank}
            )
    return pd.DataFrame(rows)


def embedding_near_dup_pairs(
    ds: Dataset,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """All (a < b) pairs with cosine >= threshold.

    Brute: every batch matmuls against the broadcast full matrix and emits
    only its rows' qualifying pairs (each pair found once via a<b filter).
    DuckDB twin: self-join with list_cosine_similarity.  For corpora where
    the full matrix exceeds the object store, use LSH bucketing instead
    (``lsh_topk``-style) — documented approximation.
    """
    import ray

    full = ds.map_batches(
        lambda t: t.select([id_col, emb_col]), batch_format="pyarrow"
    ).to_pandas()
    all_ids = full[id_col].to_numpy()
    mat = _normalize(np.asarray(list(full[emb_col]), dtype=np.float64))
    ref = ray.put((all_ids, mat))

    class Pairs:
        def __init__(self):
            self.all_ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            m = _normalize(_batch_matrix(batch, emb_col))
            scores = m @ self.mat.T
            src, dst, val = [], [], []
            for r in range(len(ids)):
                hit = np.where(scores[r] >= threshold)[0]
                for j in hit:
                    a, b = int(ids[r]), int(self.all_ids[j])
                    if a < b:
                        src.append(a)
                        dst.append(b)
                        val.append(float(scores[r, j]))
            return pa.table(
                {
                    "vec_id_a": pa.array(src, pa.int64()),
                    "vec_id_b": pa.array(dst, pa.int64()),
                    "score": pa.array(val, pa.float64()),
                }
            )

    return ds.map_batches(Pairs, batch_format="pyarrow", concurrency=pool_size())
