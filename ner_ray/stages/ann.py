"""Similarity search over an embedding column (``list<float>``).

- ``ann_topk`` — brute-force cosine top-k: the query matrix is broadcast via
  ``ray.put`` once; every batch does one numpy matmul against it and emits
  only its local top-k candidates; the driver merges ``O(batches * k)``
  candidate rows.  No shuffle; compute scales linearly and distributes.
- ``lsh_topk`` — the scale path: random-hyperplane LSH buckets (signs of R
  projections) shrink the candidate set; same-bucket (multi-probe) candidates
  are scored exactly.  Approximate: recall < 1 by design; tests measure
  recall vs brute force.
- ``ivf_build_index`` / ``ivf_search_index`` — the 100 TB IVF layout: vectors
  written ONCE as cell-partitioned Parquet, queries read ONLY probed cells.
- ``embedding_near_dup_pairs`` — all pairs with cosine >= threshold.
  ``method="block"`` (default, exact): chunk-pair tasks, each scoring one
  chunk x chunk tile — the corpus never collects to the driver and no task
  holds more than two chunks.  ``method="lsh"`` (approximate scale path):
  hyperplane band buckets -> per-bucket exact cosine -> distributed dedup.
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
    return _topk_merge(cand, k, id_col)


def _topk_merge(cand: pd.DataFrame, k: int, id_col: str) -> pd.DataFrame:
    """Driver merge of O(blocks * k) candidate rows -> final per-query top-k
    with deterministic (score desc, id asc) tie-break."""
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
    return _topk_merge(cand, k, id_col)


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


def _train_sample(ds: Dataset, id_col: str, emb_col: str, train_size: int) -> np.ndarray:
    """Deterministic quantizer-training sample: Ray Data's streaming executor
    does not preserve row order by default (``preserve_order=False``), so a
    bare ``limit().to_pandas()`` yields a run-dependent row ORDER, and
    ``kmeans_lite``'s init/updates are order-sensitive — two builds would
    disagree on centroids and therefore on probed cells.  Fixing order alone
    is not enough: ``limit()`` also truncates a run-dependent STREAM, so the
    sample's MEMBERSHIP varies between runs.  Membership is pinned by taking
    the ``train_size`` rows with the smallest deterministic id hash (a
    content-addressed sample, independent of block arrival order), then
    sorting by id to pin the order."""
    import zlib

    def hashed(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        h = pa.array([zlib.crc32(str(i).encode()) for i in ids], pa.int64())
        return t.select([id_col, emb_col]).append_column("_h", h)

    # per-block top-train_size by hash, then a driver top-train_size of the
    # partials: exact global min-k without collecting the corpus
    def block_topk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows <= train_size:
            return t
        idx = pc.select_k_unstable(t, train_size, [("_h", "ascending")])
        return t.take(idx)

    tbl = (
        ds.map_batches(hashed, batch_format="pyarrow")
        .map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()
    )
    tbl = tbl.sort_values(["_h", id_col], kind="mergesort").head(train_size)
    tbl = tbl.sort_values(id_col, kind="mergesort").reset_index(drop=True)
    return np.asarray(list(tbl[emb_col]), dtype=np.float64)


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
    sample = _train_sample(ds, id_col, emb_col, train_size)
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
    return _topk_merge(cand, k, id_col)


def ivf_build_index(
    ds: Dataset,
    index_dir: str,
    n_centroids: int = 16,
    train_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Build the 100 TB IVF layout: assign every vector to its nearest coarse
    centroid and write the corpus ONCE as cell-partitioned Parquet
    (``index_dir/data/cell=<c>/``); centroids persist beside it.  Queries then
    read only probed cell partitions (``ivf_search_index``) — the read path
    prunes, it doesn't scan-and-skip."""
    import json
    import os

    import ray

    sample = _train_sample(ds, id_col, emb_col, train_size)
    cent = kmeans_lite(sample, n_centroids, seed=seed)
    cref = ray.put(cent)

    class Assign:
        def __init__(self):
            self.cent = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, emb_col))
            cells = np.argmax(m @ self.cent.T, axis=1).astype(np.int32)
            # "cell" becomes the hive partition key (stripped from the data
            # files); "cell_id" stays a data column so the pruned read does
            # not depend on partition-column re-inference.
            return batch.append_column("cell", pa.array(cells, pa.int32())).append_column(
                "cell_id", pa.array(cells, pa.int32())
            )

    # rebuilds must not append next to a previous generation's files (a
    # crashed build + retry would otherwise serve duplicate/stale rows from
    # every probed cell)
    data_dir = os.path.join(index_dir, "data")
    if os.path.exists(data_dir):
        import shutil

        shutil.rmtree(data_dir)
    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(Assign, batch_format="pyarrow", concurrency=pool_size()).write_parquet(
        data_dir, partition_cols=["cell"]
    )
    with open(os.path.join(index_dir, "centroids.json"), "w") as f:
        json.dump(cent.tolist(), f)
    return cent


def ivf_search_index(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Search a cell-partitioned IVF index reading ONLY the probed cells'
    Parquet partitions (union over all queries); per-query candidates are
    additionally masked to that query's own probe set, so results are
    identical to the in-pass ``ivf_topk`` with the same quantizer."""
    import json
    import os

    import ray
    import ray.data as rd

    with open(os.path.join(index_dir, "centroids.json")) as f:
        cent = np.asarray(json.load(f), dtype=np.float64)
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # [Q, n_probe]
    cells = sorted({int(c) for row in probe for c in row})
    # pyarrow.fs discovery so the cell-partitioned layout works on object
    # stores (s3://...) as well as local paths — os.listdir silently finds
    # nothing for URI paths, which would return empty results, not an error
    from pyarrow import fs as pafs

    try:
        filesystem, base = pafs.FileSystem.from_uri(os.path.join(index_dir, "data"))
    except (ValueError, pa.ArrowInvalid):
        filesystem, base = pafs.LocalFileSystem(), os.path.join(index_dir, "data")
    # FileSystem paths come back scheme-less; restore it for read_parquet
    scheme = index_dir.split("://", 1)[0] + "://" if "://" in index_dir else ""
    paths = []
    for c in cells:
        d = f"{base}/cell={c}"
        if filesystem.get_file_info(d).type == pafs.FileType.Directory:
            infos = filesystem.get_file_info(pafs.FileSelector(d))
            paths.extend(
                sorted(scheme + i.path for i in infos if i.path.endswith(".parquet"))
            )
    if not paths:
        return pd.DataFrame({"query_idx": [], id_col: [], "score": [], "rank": []})
    probed = rd.read_parquet(paths)  # pruned read: unprobed cells never leave disk
    qref, pref = ray.put(q), ray.put(probe)

    class Scorer:
        def __init__(self):
            self.q = ray.get(qref)
            self.probe = ray.get(pref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            cell = batch["cell_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = _normalize(_batch_matrix(batch, emb_col))
            out_q, out_id, out_s = [], [], []
            for qi in range(self.q.shape[0]):
                mask = np.isin(cell, self.probe[qi])
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

    cand = probed.map_batches(Scorer, batch_format="pyarrow", concurrency=pool_size()).to_pandas()
    return _topk_merge(cand, k, id_col)


# Per-worker cache of normalized chunk matrices for the block-pair scorer.
# BOUNDED (FIFO): every invocation materializes fresh object refs, so old
# keys can never hit again — an unbounded dict grows worker RSS by O(corpus)
# per invocation until the node OOMs.
from collections import OrderedDict

_CHUNK_CACHE: OrderedDict = OrderedDict()
_CHUNK_CACHE_MAX = 16


def _cache_put(key, value):
    _CHUNK_CACHE[key] = value
    while len(_CHUNK_CACHE) > _CHUNK_CACHE_MAX:
        _CHUNK_CACHE.popitem(last=False)
    return value


def embedding_near_dup_pairs(
    ds: Dataset,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    method: str = "block",
    target_chunk_rows: int = 4096,
    n_planes: int = 12,
    band_bits: int = 3,
    max_bucket: int = 2000,
    seed: int = 42,
) -> Dataset:
    """All (a < b) pairs with cosine >= threshold.

    ``method="block"`` (default, EXACT): the corpus is chunked once
    (``materialize`` + object-store block refs) and one task per chunk pair
    (i <= j) scores a chunk x chunk tile.  The full matrix is never collected
    to the driver and never broadcast whole — each task holds exactly two
    chunks (O(chunk^2) memory), compute is O(N^2 / n_pairs) per task and
    spreads over the cluster.  Exact all-pairs is inherently quadratic in
    compute; when that is too costly, use:

    ``method="lsh"`` (approximate scale path): hyperplane band buckets ->
    per-bucket exact cosine (bucket size capped + LOGGED) -> distributed pair
    dedup.  Recall < 1 by design (tests measure recall vs the exact path);
    linear shuffle volume, no quadratic global step.
    """
    if method == "lsh":
        return _near_dup_pairs_lsh(
            ds, threshold, id_col, emb_col, n_planes, band_bits, max_bucket, seed
        )
    if method != "block":
        raise ValueError(f"unknown method {method!r}")
    import ray
    import ray.data as rd

    mat = ds.map_batches(
        lambda t: t.select([id_col, emb_col]), batch_format="pyarrow"
    ).materialize()
    n_rows = mat.count()
    n_chunks = max(1, -(-n_rows // target_chunk_rows))
    if mat.num_blocks() != n_chunks:
        mat = mat.repartition(n_chunks).materialize()
    refs = mat.to_arrow_refs()
    T = len(refs)
    # upper-triangle tile (i, j), i <= j, decoded from a LINEAR index so the
    # driver never builds the O(T^2) tile list (T^2 Python dicts at 100M
    # rows would OOM the driver before any task ran)
    tri_offsets = np.cumsum(np.concatenate(([0], np.arange(T, 0, -1))))  # len T+1
    n_tiles = int(tri_offsets[-1])

    def decode_tiles(batch: dict) -> pa.Table:
        t = batch["id"].astype(np.int64)
        i = np.searchsorted(tri_offsets, t, side="right") - 1
        j = i + (t - tri_offsets[i])
        return pa.table({"i": pa.array(i, pa.int64()), "j": pa.array(j, pa.int64())})

    def fetch(idx: int) -> tuple[np.ndarray, np.ndarray]:
        key = ("nd", refs[idx].hex(), id_col)
        hit = _CHUNK_CACHE.get(key)
        if hit is None:
            t = ray.get(refs[idx])
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            m = _normalize(_batch_matrix(t, emb_col))
            hit = _cache_put(key, (ids, m))
        return hit

    def score_tile(batch: pa.Table) -> pa.Table:
        src, dst, val = [], [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_a, m_a = fetch(i)
            ids_b, m_b = fetch(j)
            scores = m_a @ m_b.T
            mask = scores >= threshold
            if i == j:
                mask &= np.tri(len(ids_a), k=-1, dtype=bool).T  # strict upper
            rr, cc = np.nonzero(mask)
            if len(rr) == 0:
                continue
            a_ids, b_ids, sv = ids_a[rr], ids_b[cc], scores[rr, cc]
            same = a_ids == b_ids
            a_ids, b_ids, sv = a_ids[~same], b_ids[~same], sv[~same]
            lo = np.minimum(a_ids, b_ids)
            hi = np.maximum(a_ids, b_ids)
            src.extend(lo.tolist())
            dst.extend(hi.tolist())
            val.extend(sv.tolist())
        return pa.table(
            {
                "vec_id_a": pa.array(src, pa.int64()),
                "vec_id_b": pa.array(dst, pa.int64()),
                "score": pa.array(val, pa.float64()),
            }
        )

    tiles = rd.range(n_tiles).map_batches(decode_tiles, batch_format="numpy")
    return tiles.map_batches(score_tile, batch_format="pyarrow", batch_size=1)


def _near_dup_pairs_lsh(
    ds: Dataset,
    threshold: float,
    id_col: str,
    emb_col: str,
    n_planes: int,
    band_bits: int,
    max_bucket: int,
    seed: int,
) -> Dataset:
    """Banded hyperplane-LSH near-dup pairs (the approximate linear-shuffle
    path): sketch per batch -> (band, key) bucket groupby -> per-bucket exact
    cosine -> distributed groupby dedup of surviving pairs."""
    n_bands = max(1, n_planes // band_bits)

    # planes are built lazily per worker from the seed (no driver-side dim probe)
    def sketch_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_batch_matrix(batch, emb_col))
        planes = _CHUNK_CACHE.get(("planes", seed, n_planes, m.shape[1]))
        if planes is None:
            planes = np.random.default_rng(seed).standard_normal((m.shape[1], n_planes))
            _cache_put(("planes", seed, n_planes, m.shape[1]), planes)
        bits = (m @ planes > 0).astype(np.uint64)  # [N, P]
        out_id, out_band, out_key, out_emb = [], [], [], []
        emb = batch[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        for b in range(n_bands):
            seg = bits[:, b * band_bits : (b + 1) * band_bits]
            key = (seg * (1 << np.arange(seg.shape[1], dtype=np.uint64))).sum(axis=1)
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_key.append(key.astype(np.int64))
            out_emb.append(emb)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "band": pa.array(np.concatenate(out_band), pa.int32()),
                "key": pa.array(np.concatenate(out_key), pa.int64()),
                emb_col: pa.concat_arrays([e for e in out_emb]),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id_a": pa.array([], pa.int64()),
                "vec_id_b": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if group.num_rows < 2:
            return empty
        if group.num_rows > max_bucket:
            import logging

            logging.getLogger(__name__).warning(
                "near_dup_pairs_lsh: bucket truncated %d -> %d rows (recall loss)",
                group.num_rows,
                max_bucket,
            )
            group = group.sort_by([(id_col, "ascending")]).slice(0, max_bucket)
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = _normalize(_batch_matrix(group, emb_col))[order]
        scores = m @ m.T
        rr, cc = np.triu_indices(len(ids), k=1)
        s = scores[rr, cc]
        hit = (s >= threshold) & (ids[rr] != ids[cc])
        if not hit.any():
            return empty
        return pa.table(
            {
                "vec_id_a": pa.array(ids[rr[hit]], pa.int64()),
                "vec_id_b": pa.array(ids[cc[hit]], pa.int64()),
                "score": pa.array(s[hit], pa.float64()),
            }
        )

    sketch = ds.map_batches(sketch_batch, batch_format="pyarrow")
    pairs = sketch.groupby(["band", "key"]).map_groups(bucket_pairs, batch_format="pyarrow")
    # distributed dedup: the same pair surfaces in up to n_bands buckets
    from ray.data.aggregate import Max

    return pairs.groupby(["vec_id_a", "vec_id_b"]).aggregate(Max("score", alias_name="score"))


def kmeans_l2_lite(
    sample: np.ndarray, n_centroids: int, n_iter: int = 8, seed: int = 42
) -> np.ndarray:
    """Seeded plain-L2 Lloyd iterations on a driver-side sample — the PQ
    sub-quantizer trainer (``kmeans_lite`` normalizes for cosine/IVF; PQ
    codebooks quantize RAW subvectors, so no normalization here)."""
    rng = np.random.default_rng(seed)
    cent = sample[
        rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    ].copy()
    for _ in range(n_iter):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_encode(
    ds: Dataset,
    codebooks: "list[np.ndarray]",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """Product-quantization encoding (Jégou et al. 2011): split each
    d-dim embedding into ``M = len(codebooks)`` contiguous subspaces and
    replace each subvector with the index of its nearest (L2) codebook
    centroid — d floats compress to M small ints, the memory step that
    makes billion-vector ANN fit a cluster.

    Scale shape: the codebooks are tiny (M x k x d/M) and ride the
    closure by VALUE (restart-safe, the linker precedent); encoding is a
    stateless zero-shuffle ``map_batches`` — one (n, k) distance matmul
    per subspace per batch.  Ties break to the lowest centroid id
    (matching a SQL twin's ``ORDER BY d ASC, cid ASC``).

    Returns ``(id_col, code_0 .. code_{M-1})`` int64 columns.
    """
    import pyarrow.compute as pc

    cbs = [np.asarray(c, dtype=np.float64) for c in codebooks]
    dsub = cbs[0].shape[1]

    def encode(t: pa.Table) -> pa.Table:
        x = np.asarray(t[emb_col].to_pylist(), dtype=np.float64)
        cols = {id_col: pc.cast(t[id_col], pa.int64())}
        for m, cb in enumerate(cbs):
            sub = x[:, m * dsub : (m + 1) * dsub]
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            cols[f"code_{m}"] = pa.array(np.argmin(d2, axis=1).astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_adc_topk(
    ds: Dataset,
    codebooks: "list[np.ndarray]",
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_ids: "set[int] | None" = None,
) -> pd.DataFrame:
    """Asymmetric-distance top-k over PQ codes (Jégou et al. 2011 ADC):
    the corpus is PQ-encoded (same argmin kernel as ``pq_encode``) and the
    UNquantized query's distance to a vector is approximated by M table
    lookups — ``d(q, x) ~= sum_m ||q_m - c_{m, code_m}||^2`` — so search
    cost per vector is M int adds instead of a d-dim dot product.

    Cross-engine exactness: each of the M x k query-to-centroid table
    entries floor-quantizes to integer micros (computed as the SQUARE of
    the Euclidean norm — ``power(list_distance(...), 2)`` — so a SQL twin
    replays the identical expression), and the per-vector distance is the
    INTEGER sum of M table entries — order-free exact.  Deterministic
    tie-break (d_micro asc, id asc).  Per-block top-k partials merge on
    the driver (O(blocks x k) rows).

    Returns ``(id_col, d_micro, rank)``.
    """
    cbs = [np.asarray(c, dtype=np.float64) for c in codebooks]
    dsub = cbs[0].shape[1]
    q = np.asarray(query, dtype=np.float64)
    tmicro = []
    for m, cb in enumerate(cbs):
        qm = q[m * dsub : (m + 1) * dsub]
        norm = np.sqrt(((qm[None, :] - cb) ** 2).sum(axis=1))
        tmicro.append(np.floor(norm**2 * 1e6 + 0.5).astype(np.int64))
    excl = np.array(sorted(exclude_ids or ()), dtype=np.int64)

    def block(t: pa.Table) -> pa.Table:
        x = np.asarray(t[emb_col].to_pylist(), dtype=np.float64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.zeros(len(ids), dtype=np.int64)
        for m, cb in enumerate(cbs):
            sub = x[:, m * dsub : (m + 1) * dsub]
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            d += tmicro[m][np.argmin(d2, axis=1)]
        if len(excl):
            keep = ~np.isin(ids, excl)
            ids, d = ids[keep], d[keep]
        kk = min(k, len(ids))
        if kk < len(ids):
            idx = np.argpartition(d, kk - 1)[:kk]
        else:
            idx = np.arange(len(ids))
        return pa.table(
            {
                id_col: pa.array(ids[idx], pa.int64()),
                "d_micro": pa.array(d[idx], pa.int64()),
            }
        )

    cand = ds.map_batches(block, batch_format="pyarrow").to_pandas()
    top = (
        cand.sort_values(["d_micro", id_col], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top
