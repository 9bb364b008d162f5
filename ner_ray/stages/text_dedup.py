"""Deduplication family for document corpora (training-data pipeline ops).

- ``exact_dedup`` — hash-partition on a content fingerprint, keep first id.
- ``minhash_near_dup`` — shingle -> MinHash -> LSH band buckets -> candidate
  pairs -> signature-estimate verify -> connected components -> dup groups.
- ``simhash_near_dup`` — 64-bit SimHash, pigeonhole block buckets, Hamming
  verify, connected components.
- ``ngram_jaccard_pairs`` — exact Jaccard verification over candidate pairs
  (used as the precise re-check inside MinHash buckets when text is at hand).

All deterministic (seeded permutations).  Scale shape: sketches are computed
per batch inside ``map_batches`` (vectorized numpy); the only shuffles move
(bucket_key, doc_id, sketch) rows, never full documents; per-bucket pair
generation is capped (``max_bucket``, logged) so a degenerate hot bucket
cannot go quadratic at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Min, Sum

from ner_ray.functions.hashing import (
    MinHasher,
    _hash64,
    band_keys_vectorized,
    hamming64,
    simhash64,
    simhash_blocks,
    word_shingles,
)
from ner_ray.functions.texttools import md5_fingerprint, tokenize_ws
from ner_ray.stages.canonicalize import connected_components

from ner_ray.utils import pool_size


def _dnode(i) -> str:
    """Graph node name for a doc id, ZERO-PADDED so the components step's
    min-LABEL rule (lexicographic string min, in both the driver union-find
    and the distributed min-label propagation) coincides with the numeric
    min doc_id that ``group_id`` promises — unpadded names break the
    contract for mixed digit counts ('d17' < 'd5')."""
    return f"d{int(i):020d}"


def exact_dedup(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """One row per distinct (whitespace-normalized, lowercased) text:
    representative ``id = min(id)``, ``n_dups`` duplicate count.

    DuckDB twin:
      SELECT min(doc_id) AS doc_id, count(*) AS n_dups FROM documents
      GROUP BY md5(lower(trim(regexp_replace(text,'\\s+',' ','g'))))
    """

    def fp(batch: pa.Table) -> pa.Table:
        fps = [md5_fingerprint(t) for t in batch[text_col].to_pylist()]
        return pa.table(
            {
                "fp": pa.array(fps, pa.string()),
                id_col: batch[id_col],
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(fp, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(Min(id_col, alias_name=id_col), Sum("n", alias_name="n_dups"))
        .select_columns([id_col, "n_dups"])
    )


class _MinHashSketcher:
    """Actor: one (doc_id, sig, band keys) row per doc.

    Hot-path design: per-token 64-bit hashes come from an actor-lifetime
    cache (corpus vocabulary is Zipfian — most tokens repeat), shingle hashes
    are a vectorized mod-p combination of consecutive token hashes, the
    signature is the existing vectorized [perm x shingle] min, and band keys
    hash the whole batch in a few numpy ops.  The signature is emitted ONCE
    per doc as uint32 bytes (num_perm*4 B); band rows for the shuffle carry
    only (doc_id, band, key).
    """

    def __init__(self, num_perm: int, bands: int, shingle_k: int, text_col: str, id_col: str):
        self.mh = MinHasher(num_perm=num_perm)
        self.bands = bands
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col
        self.token_cache: dict[str, int] = {}

    def _token_hashes(self, tokens: list[str]) -> np.ndarray:
        cache = self.token_cache
        out = np.empty(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            h = cache.get(t)
            if h is None:
                h = _hash64(t)
                cache[t] = h
            out[i] = h
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        sigs = np.empty((len(ids), self.mh.num_perm), dtype=np.uint64)
        for r, text in enumerate(batch[self.text_col].to_pylist()):
            toks = (text or "").split()
            sh = MinHasher.shingle_hashes(self._token_hashes(toks), k=self.k)
            sigs[r] = self.mh.signature(set(sh.tolist()))
        keys = band_keys_vectorized(sigs, self.bands)  # [N, bands]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array([s.tobytes() for s in sigs.astype(np.uint32)], pa.binary()),
                "keys": pa.array(keys.tolist(), pa.list_(pa.int64())),
            }
        )


# Shuffle-cell count for the band-bucket groupbys.  8192 bounds map_groups
# dispatch (~50us/group) at bench scale, but one CELL's rows must fit a
# single map_groups task: at B bands over N docs a cell holds ~N*B/_N_CELLS
# band rows, so for corpora beyond ~10^9 band rows scale this up to keep
# cells under ~10^6 rows (it only re-partitions work — cell assignment is a
# hash, so ANY value yields identical output; set before building the plan).
_N_CELLS = 8192


def _add_cell(batch: pa.Table) -> pa.Table:
    """Map (band, key) -> shuffle cell.  ~8k cells bound map_groups dispatch
    (the per-group ~50us fixed cost) regardless of bucket cardinality."""
    band = batch["band"].to_numpy().astype(np.uint64)
    key = batch["key"].to_numpy().astype(np.uint64)
    cell = ((key ^ (band * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(_N_CELLS)).astype(
        np.int64
    )
    return batch.append_column("cell", pa.array(cell, pa.int64()))


def _cell_bucket_pairs(group: pa.Table, max_bucket: int) -> pa.Table:
    """All candidate pairs inside one shuffle cell, re-segmented by the true
    (band, key) bucket identity and emitted vectorized (lexsort + boundary
    scan + triu indices per >=2-doc segment; singleton segments — the vast
    majority — cost one vector compare, no Python)."""
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    if group.num_rows < 2:
        return empty
    band = group["band"].to_numpy()
    key = group["key"].to_numpy()
    doc = group["doc_id"].to_numpy()
    order = np.lexsort((doc, key, band))
    band, key, doc = band[order], key[order], doc[order]
    brk = np.flatnonzero((band[1:] != band[:-1]) | (key[1:] != key[:-1]))
    starts = np.concatenate(([0], brk + 1))
    ends = np.concatenate((brk + 1, [len(doc)]))
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        ids = np.unique(doc[s:e])
        if len(ids) > max_bucket:  # cap degenerate buckets (deterministic + LOGGED)
            import logging

            logging.getLogger(__name__).warning(
                "minhash_near_dup: bucket truncated %d -> %d docs (recall loss)",
                len(ids),
                max_bucket,
            )
            ids = ids[:max_bucket]
        if len(ids) < 2:
            continue
        ii, jj = np.triu_indices(len(ids), k=1)
        out_a.append(ids[ii])
        out_b.append(ids[jj])
    if not out_a:
        return empty
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), pa.int64()),
            "b": pa.array(np.concatenate(out_b), pa.int64()),
        }
    )


def _minhash_verify_local(
    ds: Dataset,
    sk: "pd.DataFrame",
    id_col: str,
    num_perm: int,
    threshold: float,
    max_bucket: int,
) -> Dataset:
    """Driver fast path of ``minhash_near_dup``: bucket + pair + verify over
    the collected sketch table.  Bucketing/pairing reuses the SAME
    ``_cell_bucket_pairs`` kernel as the distributed plan (one call over all
    band rows — segmentation is by true (band, key), so cell partitioning is
    irrelevant to the result), keeping the two paths pair-identical."""
    import pandas as pd  # noqa: F401  (type comment)

    doc = sk["doc_id"].to_numpy(dtype=np.int64)
    n = len(doc)
    if n == 0:
        return _groups_from_edges(
            ds, __import__("ray").data.from_arrow(
                pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
            ), id_col,
        )
    keys = np.asarray(sk["keys"].tolist(), dtype=np.int64)  # [N, bands]
    bands_n = keys.shape[1]
    band_rows = pa.table(
        {
            "band": pa.array(np.tile(np.arange(bands_n, dtype=np.int64), n), pa.int64()),
            "key": pa.array(keys.reshape(-1), pa.int64()),
            "doc_id": pa.array(np.repeat(doc, bands_n), pa.int64()),
        }
    )
    pairs = _cell_bucket_pairs(band_rows, max_bucket)
    a = pairs["a"].to_numpy(zero_copy_only=False)
    b = pairs["b"].to_numpy(zero_copy_only=False)
    if len(a):
        uniq = np.unique(np.column_stack([a, b]), axis=0)
        a, b = uniq[:, 0], uniq[:, 1]
    sig = np.frombuffer(b"".join(sk["sig"]), dtype=np.uint32).reshape(n, num_perm)
    ix = {int(d): i for i, d in enumerate(doc)}
    ai = np.fromiter((ix[int(x)] for x in a), dtype=np.int64, count=len(a))
    bi = np.fromiter((ix[int(y)] for y in b), dtype=np.int64, count=len(b))
    agree = (sig[ai] == sig[bi]).mean(axis=1) if len(a) else np.empty(0)
    keep = agree >= threshold
    edges = pa.table(
        {
            "src": pa.array([_dnode(x) for x in a[keep]], pa.string()),
            "dst": pa.array([_dnode(y) for y in b[keep]], pa.string()),
        }
    )
    import ray.data as rd

    return _groups_from_edges(ds, rd.from_arrow(edges), id_col)


def minhash_near_dup(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 200,
    driver_threshold: int = 100_000,
) -> Dataset:
    """Near-duplicate groups via MinHash+LSH.

    Returns (doc_id, group_id, keep): every doc appears once; ``group_id`` is
    the min doc_id of its duplicate cluster; ``keep`` marks the
    representative.

    Scale shape: the (band, key) shuffle moves ~20-byte rows (the signature
    never enters the all-to-all — at 100 TB the sketch table is the
    checkpointed dedup index, written once as Parquet).  Bucket groups emit
    CANDIDATE pairs only; verification (signature agreement >= threshold, the
    scalable standard — exact-Jaccard recheck is ``ngram_jaccard_pairs``)
    runs against a sig lookup bounded by the candidate set, which LSH keeps
    tiny relative to the corpus.

    Hybrid (same rationale as dedup_triples / canonicalize): at or below
    ``driver_threshold`` docs the SKETCH table is driver-small (sig
    ``num_perm*4`` B + ``bands*8`` B per doc), so bucketing + pairing +
    verify run locally on the collected sketch — tested pair-identical to
    the distributed plan, which otherwise pays ~6 shuffle executions of
    fixed overhead.  Above it, the fully distributed plan runs."""
    sketch = ds.map_batches(
        _MinHashSketcher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        concurrency=pool_size(),
    ).materialize()  # consumed twice: band explode + candidate verification

    if sketch.count() <= driver_threshold:
        return _minhash_verify_local(
            ds, sketch.to_pandas(), id_col, num_perm, threshold, max_bucket
        )

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = np.asarray(batch["keys"].to_pylist(), dtype=np.int64)
        bands_n = keys.shape[1] if n else 0
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(batch["doc_id"].to_numpy(), bands_n), pa.int64()),
                "band": pa.array(np.tile(np.arange(bands_n, dtype=np.int32), n), pa.int32()),
                "key": pa.array(keys.reshape(-1), pa.int64()),
            }
        )

    band_rows = sketch.select_columns(["doc_id", "keys"]).map_batches(
        explode, batch_format="pyarrow"
    )

    # Distributed pair-dedup: the same candidate pair surfaces in up to
    # ``bands`` buckets; one groupby collapses it without driver collection.
    # Buckets are shuffled by CELL (hash(band,key) % n_cells), not by raw
    # (band, key): map_groups costs ~50us of dispatch PER GROUP, and band
    # buckets are overwhelmingly singletons, so grouping by the raw key pays
    # N*bands dispatches for almost no work.  ~8k cells keep dispatch O(cells)
    # while the per-cell fn re-segments by (band, key) vectorized.
    cand = (
        band_rows.map_batches(_add_cell, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(
            lambda g: _cell_bucket_pairs(g, max_bucket), batch_format="pyarrow"
        )
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
    )

    # Distributed verify: join each side's signature onto the pair stream
    # (hash_join), compare signature agreement inside map_batches.  No
    # ``.to_pandas()`` between the band explode and the final group output —
    # at 100 TB the candidate set is not driver-sized.  Schemas are passed
    # explicitly: every side is a lazy chain, and letting hash_join probe
    # ``.schema()`` would re-execute the sort+aggregate candidate plan per
    # probe (the 3x re-run this comment is the tombstone of).
    from ner_ray.stages.joins import hash_join

    sig_a = sketch.map_batches(
        lambda t: pa.table({"a": t["doc_id"], "sig_a": t["sig"]}), batch_format="pyarrow"
    )
    sig_b = sketch.map_batches(
        lambda t: pa.table({"b": t["doc_id"], "sig_b": t["sig"]}), batch_format="pyarrow"
    )
    i64, bin_ = pa.int64(), pa.binary()
    cand_schema = pa.schema([("a", i64), ("b", i64)])
    sig_a_schema = pa.schema([("a", i64), ("sig_a", bin_)])
    sig_b_schema = pa.schema([("b", i64), ("sig_b", bin_)])
    join1 = hash_join(
        cand, sig_a, on="a", left_schema=cand_schema, right_schema=sig_a_schema
    )
    join1_schema = pa.schema([("a", i64), ("b", i64), ("sig_a", bin_)])
    paired = hash_join(
        join1, sig_b, on="b", left_schema=join1_schema, right_schema=sig_b_schema
    )

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
        if t.num_rows == 0 or "sig_a" not in t.column_names:
            return empty
        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        keep_a, keep_b = [], []
        for x, y, sa, sb in zip(a, b, t["sig_a"].to_pylist(), t["sig_b"].to_pylist()):
            if sa is None or sb is None:
                continue
            agree = float(
                np.mean(np.frombuffer(sa, dtype=np.uint32) == np.frombuffer(sb, dtype=np.uint32))
            )
            if agree >= threshold:
                keep_a.append(_dnode(x))
                keep_b.append(_dnode(y))
        return pa.table(
            {"src": pa.array(keep_a, pa.string()), "dst": pa.array(keep_b, pa.string())}
        )

    edges = paired.map_batches(verify, batch_format="pyarrow")
    return _groups_from_edges(ds, edges, id_col)


def minhash_contrastive_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 200,
) -> Dataset:
    """Contrastive training pairs for embedding models from the MinHash-LSH
    pipeline: every LSH CANDIDATE pair (bucket collision) is emitted with
    its signature-agreement count and a label — 1 where agreement passes
    the near-dup threshold (a POSITIVE pair) and 0 where the bucket
    collision FAILED verification (a HARD NEGATIVE: similar enough to
    collide, not similar enough to be a duplicate — exactly the mining a
    retriever trainer wants and exactly the reject set ``minhash_near_dup``
    throws away).  Output: (doc_a, doc_b, n_agree, label), doc_a < doc_b,
    each candidate pair once.

    Same scale shape as ``minhash_near_dup``'s distributed plan (band
    explode -> cell-bucketed candidate pairing with the ``max_bucket``
    cap -> signature joins), minus the closure: pairs ARE the product."""
    import numpy as np
    import pyarrow as pa

    from ner_ray.stages.joins import hash_join

    sketch = ds.map_batches(
        _MinHashSketcher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        concurrency=pool_size(),
    ).materialize()  # consumed by the band explode AND both signature joins

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = np.asarray(batch["keys"].to_pylist(), dtype=np.int64)
        bands_n = keys.shape[1] if n else 0
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(batch["doc_id"].to_numpy(), bands_n), pa.int64()
                ),
                "band": pa.array(np.tile(np.arange(bands_n, dtype=np.int32), n), pa.int32()),
                "key": pa.array(keys.reshape(-1), pa.int64()),
            }
        )

    cand = (
        sketch.select_columns(["doc_id", "keys"])
        .map_batches(explode, batch_format="pyarrow")
        .map_batches(_add_cell, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(lambda g: _cell_bucket_pairs(g, max_bucket), batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
    )

    sig_a = sketch.map_batches(
        lambda t: pa.table({"a": t["doc_id"], "sig_a": t["sig"]}), batch_format="pyarrow"
    )
    sig_b = sketch.map_batches(
        lambda t: pa.table({"b": t["doc_id"], "sig_b": t["sig"]}), batch_format="pyarrow"
    )
    i64, bin_ = pa.int64(), pa.binary()
    join1 = hash_join(
        cand,
        sig_a,
        on="a",
        left_schema=pa.schema([("a", i64), ("b", i64)]),
        right_schema=pa.schema([("a", i64), ("sig_a", bin_)]),
    )
    paired = hash_join(
        join1,
        sig_b,
        on="b",
        left_schema=pa.schema([("a", i64), ("b", i64), ("sig_a", bin_)]),
        right_schema=pa.schema([("b", i64), ("sig_b", bin_)]),
    )

    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "n_agree": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64()),
        }
    )

    def label(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sig_a" not in t.column_names:
            return empty
        rows_a, rows_b, agree, lab = [], [], [], []
        for x, y, sa, sb in zip(
            t["a"].to_pylist(), t["b"].to_pylist(),
            t["sig_a"].to_pylist(), t["sig_b"].to_pylist(),
        ):
            if sa is None or sb is None:
                continue
            n_eq = int(
                np.sum(np.frombuffer(sa, dtype=np.uint32) == np.frombuffer(sb, dtype=np.uint32))
            )
            rows_a.append(x)
            rows_b.append(y)
            agree.append(n_eq)
            lab.append(1 if n_eq >= threshold * num_perm else 0)
        return pa.table(
            {
                "doc_a": pa.array(rows_a, pa.int64()),
                "doc_b": pa.array(rows_b, pa.int64()),
                "n_agree": pa.array(agree, pa.int64()),
                "label": pa.array(lab, pa.int64()),
            }
        )

    return paired.map_batches(label, batch_format="pyarrow")


class _SimHashSketcher:
    def __init__(self, n_blocks: int, text_col: str, id_col: str):
        self.n_blocks = n_blocks
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, blk, val, sims = [], [], [], []
        for i, text in zip(batch[self.id_col].to_pylist(), batch[self.text_col].to_pylist()):
            h = simhash64(tokenize_ws((text or "").lower()))
            h_signed = h - (1 << 64) if h >= (1 << 63) else h  # store as int64
            for b, v in simhash_blocks(h, self.n_blocks):
                ids.append(i)
                blk.append(b)
                val.append(v)
                sims.append(h_signed)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "block": pa.array(blk, pa.int32()),
                "val": pa.array(val, pa.int64()),
                "sim": pa.array(sims, pa.int64()),
            }
        )


def simhash_near_dup(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 4,
    max_bucket: int = 500,
    driver_threshold: int = 100_000,
) -> Dataset:
    """Near-duplicate groups via SimHash (Hamming distance <= max_hamming;
    requires max_hamming < n_blocks for the pigeonhole blocking to be exact).

    Hybrid like ``minhash_near_dup``: at or below ``driver_threshold`` docs
    the sketch (``n_blocks`` ~24-byte rows per doc) collects to the driver
    and ``cell_pairs`` runs ONCE over the whole table (it re-segments by the
    true (block, val) bucket internally, so the result is pair-identical to
    the cell-sharded shuffle), skipping the groupby execution's fixed cost;
    above it the distributed cell shuffle runs."""

    def cell_pairs(group: pa.Table) -> pa.Table:
        """Hamming-verified pairs inside one shuffle cell, re-segmented by the
        true (block, val) bucket (same cell pattern as _cell_bucket_pairs:
        dispatch is O(cells), not O(buckets)); per segment the XOR+popcount
        runs over triu pair indices in numpy — no Python pair loop."""
        empty = pa.table(
            {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
        )
        if group.num_rows < 2:
            return empty
        blk = group["block"].to_numpy()
        val = group["val"].to_numpy()
        doc = group["doc_id"].to_numpy()
        sim = group["sim"].to_numpy().view(np.uint64)  # reinterpret two's-complement
        order = np.lexsort((doc, val, blk))
        blk, val, doc, sim = blk[order], val[order], doc[order], sim[order]
        brk = np.flatnonzero((blk[1:] != blk[:-1]) | (val[1:] != val[:-1]))
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk + 1, [len(doc)]))
        src: list[str] = []
        dst: list[str] = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            if n > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "simhash_near_dup: bucket truncated %d -> %d docs (recall loss)",
                    n,
                    max_bucket,
                )
                e = s + max_bucket
                n = max_bucket
            d, sm = doc[s:e], sim[s:e]
            ii, jj = np.triu_indices(n, k=1)
            x = np.bitwise_xor(sm[ii], sm[jj])
            hd = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
            m = (hd <= max_hamming) & (d[ii] != d[jj])
            if not m.any():
                continue
            lo = np.minimum(d[ii][m], d[jj][m])
            hi = np.maximum(d[ii][m], d[jj][m])
            src.extend(_dnode(v) for v in lo)
            dst.extend(_dnode(v) for v in hi)
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

    def add_cell(batch: pa.Table) -> pa.Table:
        b = batch["block"].to_numpy().astype(np.uint64)
        v = batch["val"].to_numpy().view(np.uint64)
        cell = ((v ^ (b * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(_N_CELLS)).astype(
            np.int64
        )
        return batch.append_column("cell", pa.array(cell, pa.int64()))

    # plain tasks, not an actor pool: the sketcher is stateless (no cache to
    # pin), so tasks reuse warm workers and pay no pool spawn
    _sketch_fn = _SimHashSketcher(n_blocks=n_blocks, text_col=text_col, id_col=id_col)
    sketch = ds.map_batches(_sketch_fn, batch_format="pyarrow").materialize()
    if sketch.count() <= driver_threshold * n_blocks:
        import ray as _ray
        import ray.data as rd

        tbl = pa.concat_tables(_ray.get(sketch.to_arrow_refs()))
        return _groups_from_edges(ds, rd.from_arrow(cell_pairs(tbl)), id_col)
    edges = (
        sketch.map_batches(add_cell, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_pairs, batch_format="pyarrow")
    )
    return _groups_from_edges(ds, edges, id_col)


def ngram_jaccard_pairs(
    ds: Dataset,
    pairs: list[tuple[int, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> pd.DataFrame:
    """Exact word-k-gram Jaccard for an explicit candidate pair list (the
    precise verify pass; pairs list is small by construction)."""
    import ray

    wanted = sorted({i for p in pairs for i in p})
    vset = pa.array(wanted, pa.int64())
    texts = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(pa.compute.cast(t[id_col], pa.int64()), value_set=vset)).select(
            [id_col, text_col]
        ),
        batch_format="pyarrow",
    ).to_pandas()
    lookup = dict(zip(texts[id_col], texts[text_col]))
    from ner_ray.functions.hashing import jaccard

    rows = []
    for a, b in pairs:
        sa = word_shingles(lookup.get(a, ""), k=shingle_k)
        sb = word_shingles(lookup.get(b, ""), k=shingle_k)
        rows.append({"a": a, "b": b, "jaccard": jaccard(sa, sb)})
    return pd.DataFrame(rows)


def _groups_from_edges(
    ds: Dataset, edges: Dataset, id_col: str, cc_threshold: int = 2_000_000
) -> Dataset:
    """Edges ('d{i}','d{j}') -> (doc_id, group_id, keep) for ALL docs.

    Hybrid component step (same rationale as canonicalize): the edge set is
    bounded by the number of candidate duplicate PAIRS, which LSH keeps tiny
    relative to the corpus — small sets finish with driver union-find +
    broadcast labels (no shuffle); huge sets fall back to distributed
    min-label propagation.
    """
    import ray

    edges = edges.materialize()
    if edges.count() <= cc_threshold:
        from ner_ray.stages.canonicalize import local_union_find

        epdf = edges.to_pandas()
        label_map = local_union_find(list(zip(epdf["src"], epdf["dst"])))
        ref = ray.put({int(k[1:]): int(v[1:]) for k, v in label_map.items()})

        def attach(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            lm = ray.get(ref)
            ids = pc.cast(batch[id_col], pa.int64()).to_pylist()
            grp = [lm.get(i, i) for i in ids]
            return pa.table(
                {
                    id_col: pa.array(ids, pa.int64()),
                    "group_id": pa.array(grp, pa.int64()),
                    "keep": pa.array([g == i for g, i in zip(grp, ids)], pa.bool_()),
                }
            )

        return ds.map_batches(attach, batch_format="pyarrow")

    labels = connected_components(edges)

    def to_map(batch: pa.Table) -> pa.Table:
        ids = [int(n[1:]) for n in batch["node"].to_pylist()]
        grp = [int(l[1:]) for l in batch["label"].to_pylist()]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "group_id": pa.array(grp, pa.int64()),
            }
        )

    dup_map = labels.map_batches(to_map, batch_format="pyarrow")

    # Left-join the dup map onto the full id set: singletons map to themselves.
    from ner_ray.stages.joins import hash_join

    all_ids = ds.map_batches(
        lambda t: pa.table({id_col: pa.compute.cast(t[id_col], pa.int64())}),
        batch_format="pyarrow",
    )
    joined = hash_join(
        all_ids,
        dup_map,
        on=id_col,
        how="left",
        left_schema=pa.schema([(id_col, pa.int64())]),
        right_schema=pa.schema([(id_col, pa.int64()), ("group_id", pa.int64())]),
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        grp = pc.coalesce(batch["group_id"], batch[id_col])
        keep = pc.equal(grp, batch[id_col])
        return pa.table(
            {
                id_col: batch[id_col],
                "group_id": grp,
                "keep": keep,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def duplicate_ngram_spans(
    ds: Dataset,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Cross-document duplicate n-gram detection (the exact-substring dedup
    signal of Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", reduced to its shuffle shape): for every document,
    count how many of its token ``k``-gram positions carry a shingle that
    also occurs in at least one OTHER document.

    Plan: (1) positional shingles per doc, shuffled as a 128-bit digest —
    never the shingle text (two INDEPENDENT 64-bit polynomial hashes over
    splitmix64-decorrelated token hashes; the twin groups by the shingle
    STRING, so any collision at test scale would surface as a hash
    mismatch); (2) one groupby over digests keeps the positions of shingles
    with >= 2 distinct docs; (3) a narrow per-doc count joined back onto
    per-doc totals.  Nothing document-sized ever enters a shuffle, and the
    heavy relation is |distinct (doc, shingle) pairs| rows of (doc_id, two
    uint64 columns, multiplicity) — pairs pre-aggregate INSIDE the shingle
    pass (a doc's text is one input row, so its pair multiplicities are
    block-local and exact), and the >= 2-distinct-docs test runs
    VECTORIZED per hash bucket (``h1 & (_DUP_BUCKETS-1)`` — the minhash
    cell-bucketing idiom, ~4k map_groups calls instead of one per distinct
    shingle).  Tokenization is the
    corpus-analytics idiom (``[a-z0-9]+`` over ``lower(text)``), so the
    DuckDB twin re-derives shingles with ``regexp_extract_all`` + list
    slices.

    Digest construction (fully vectorized — the previous per-position
    Python md5 dominated this operator's wall time): each distinct token
    hashes once via the process-stable ``hash_pandas_object`` (C kernel);
    position p's digest halves are ``sum_j t_j(p+j) * B_i^j mod 2^64`` over
    two decorrelated token-hash streams ``t_1 = h``, ``t_2 =
    splitmix64(h ^ C)`` with distinct odd bases ``B_i`` — k vectorized
    multiply-adds per half, windows never crossing doc boundaries.

    Output: ``(id_col, n_shingles, n_dup, dup_frac_micro)`` for every doc
    with at least one full shingle; ``dup_frac_micro`` uses the shared
    ``floor(a * 1e6 / b + 0.5)`` idiom.
    """
    import math

    from ner_ray.stages.decontam import TOKEN_RE
    from ner_ray.stages.joins import hash_join
    from ner_ray.stages.sketches import splitmix64

    B1 = np.uint64(0x9E3779B97F4A7C15)  # distinct odd multipliers
    B2 = np.uint64(0xC2B2AE3D27D4EB4F)
    C2 = np.uint64(0x94D049BB133111EB)
    _DUP_BUCKETS = 4096  # power of two: bucket = h1 & (B-1)

    def shingles(t: pa.Table) -> pa.Table:
        toks_all: list[str] = []
        doc_of: list[int] = []
        for row, txt in enumerate(t[text_col].to_pylist()):
            toks = TOKEN_RE.findall((txt or "").lower())
            toks_all.extend(toks)
            doc_of.extend([row] * len(toks))
        if len(toks_all) < k:
            # full 5-column schema, matching the normal-path output: blocks
            # with heterogeneous schemas trip Ray's streaming-executor
            # schema-unification warning and rely on undefined behavior in
            # the downstream groupby("bucket") / Sum("cnt")
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "h1": pa.array([], pa.uint64()),
                    "h2": pa.array([], pa.uint64()),
                    "cnt": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        from ner_ray.utils import stable_hash64

        h = stable_hash64(
            np.asarray(toks_all, dtype=object)
        )  # uint64, content-stable across blocks/processes, NUL-safe
        h2src = splitmix64(h ^ C2)
        doc = np.asarray(doc_of, dtype=np.int64)
        n = len(h) - k + 1
        acc1 = np.zeros(n, dtype=np.uint64)
        acc2 = np.zeros(n, dtype=np.uint64)
        # powers precomputed mod 2^64 in Python ints (scalar uint64 overflow
        # would warn; array ops below wrap silently by definition)
        pows1 = [np.uint64(pow(int(B1), j, 1 << 64)) for j in range(k)]
        pows2 = [np.uint64(pow(int(B2), j, 1 << 64)) for j in range(k)]
        for j in range(k):  # k vectorized multiply-adds, mod-2^64 wraparound
            acc1 += h[j : j + n] * pows1[j]
            acc2 += h2src[j : j + n] * pows2[j]
        valid = doc[:n] == doc[k - 1 :]  # window stays inside one doc
        vdoc, v1, v2 = doc[:n][valid], acc1[valid], acc2[valid]
        # A document's text is ONE input row, so every position of a given
        # (doc, shingle) pair lives in THIS block: per-block aggregation of
        # the pair multiplicities and of the per-doc totals is already
        # GLOBAL — totals leave this function needing no shuffle at all,
        # and the dup relation shrinks from |positions| to |distinct pairs|.
        pairs = pa.table(
            {
                id_col: pa.array(ids[vdoc], pa.int64()),
                "h1": pa.array(v1, pa.uint64()),
                "h2": pa.array(v2, pa.uint64()),
                "cnt": pa.array(np.ones(len(vdoc), np.int64)),
            }
        ).group_by([id_col, "h1", "h2"]).aggregate([("cnt", "sum")])
        bucket = pc.bit_wise_and(pairs["h1"], np.uint64(_DUP_BUCKETS - 1))
        return pa.table(
            {
                id_col: pairs[id_col],
                "h1": pairs["h1"],
                "h2": pairs["h2"],
                "cnt": pc.cast(pairs["cnt_sum"], pa.int64()),
                "bucket": pc.cast(bucket, pa.int64()),
            }
        )

    pos = ds.map_batches(shingles, batch_format="pyarrow")

    totals = pos.groupby(id_col).aggregate(Sum("cnt", alias_name="n_shingles"))

    def bucket_dups(g: pa.Table) -> pa.Table:
        """One call per hash BUCKET ((h1 & (B-1)); ~_DUP_BUCKETS calls bound
        the map_groups dispatch — the minhash cell-bucketing idiom), doing
        the per-shingle >=2-distinct-docs test VECTORIZED: pair rows are
        already distinct per (doc, shingle), so after a sort by (h1, h2) a
        shingle's run length IS its distinct-doc count."""
        t = g.sort_by([("h1", "ascending"), ("h2", "ascending")])
        h1 = t["h1"].to_numpy(zero_copy_only=False)
        h2 = t["h2"].to_numpy(zero_copy_only=False)
        new = np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
        starts = np.flatnonzero(new)
        run_len = np.diff(np.r_[starts, len(h1)])
        dup_row = np.repeat(run_len >= 2, run_len)
        kept = t.filter(pa.array(dup_row))
        return pa.table(
            {id_col: kept[id_col], "n_dup": pc.cast(kept["cnt"], pa.int64())}
        )

    dups = (
        pos.groupby("bucket")
        .map_groups(bucket_dups, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("n_dup", alias_name="n_dup"))
    )
    joined = hash_join(
        totals,
        dups,
        on=id_col,
        how="left",
        left_schema=pa.schema([(id_col, pa.int64()), ("n_shingles", pa.int64())]),
        right_schema=pa.schema([(id_col, pa.int64()), ("n_dup", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_shingles"].to_numpy(zero_copy_only=False)
        d = t["n_dup"].to_numpy(zero_copy_only=False)
        d = np.where(np.isnan(d.astype(np.float64)), 0, d).astype(np.int64)
        frac = np.array(
            [math.floor(a * 1000000 / b + 0.5) for a, b in zip(d.tolist(), n.tolist())],
            dtype=np.int64,
        )
        return pa.table(
            {
                id_col: t[id_col],
                "n_shingles": t["n_shingles"],
                "n_dup": pa.array(d, pa.int64()),
                "dup_frac_micro": pa.array(frac, pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
