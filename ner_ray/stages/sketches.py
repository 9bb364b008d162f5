"""Cardinality sketches: HyperLogLog approximate distinct counting.

Exact distinct counts (q11) shuffle every distinct value; at 100 TB the
distinct set itself can exceed a node.  HyperLogLog (Flajolet, Fusy,
Gandouet, Meunier 2007) replaces the shuffle with a fixed 2^p-byte register
array per (group x block) that merges by ELEMENTWISE MAX — the same
mergeable-sketch shape as the MinHash signatures and the Bloom bitmap, so
partials combine in a tiny second stage and only registers ever move.

Standard error is ~1.04/sqrt(2^p): p=12 -> 4 KiB registers, ~1.6% error;
p=14 -> 16 KiB, ~0.8%.  Hashing is the same process-stable
``pandas.util.hash_pandas_object`` the Bloom stage uses.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ner_ray.stages.bloom import _key_hash64

_COMBINE_PARTS = 8


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (returns 64 for x == 0).
    Branch-free shift cascade — exact, unlike float log2 (which rounds
    values near 2^53+ across power-of-two boundaries)."""
    x = x.copy()
    n = np.zeros(x.shape, dtype=np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        s_ = np.uint64(s)
        m = (x >> np.uint64(64 - s)) == 0
        n[m] += s_
        x[m] <<= s_
    return n


def hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """uint8[2^p] register array for a batch of uint64 hashes."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return reg
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    w = hashes << np.uint64(p)
    rank = np.minimum(_clz64(w) + np.uint64(1), np.uint64(64 - p + 1)).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (Steele, Lea & Flood 2014) over
    uint64 wraparound arithmetic.  Avalanche-quality like the pandas hash,
    but — unlike it — every step is plain mod-2^64 add/mul/xor/shift that
    HUGEINT SQL replicates EXACTLY, so a DuckDB twin can re-derive the
    whole sketch with no hash fixture (the CMS multiply-shift precedent,
    with xor-shift mixing on top because HLL's rank bits need avalanche
    where CMS's bucket index does not)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_estimate(reg: np.ndarray) -> float:
    """Cardinality estimate with the small-range linear-counting correction
    (64-bit hashes need no large-range correction).

    The harmonic denominator sum(2^-r) is computed as an EXACT integer
    scaled by 2^64 (every term 2^(64-r) is an exact int; ranks are <= 64)
    — float summation order can differ by an ulp between numpy and a SQL
    twin, integer summation cannot.  The division and the alpha factor are
    then single correctly-rounded double ops, written in the same
    association order as the twin SQL."""
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)
    counts = np.bincount(reg, minlength=65)
    denom = sum(int(c) << (64 - r) for r, c in enumerate(counts.tolist()) if c)
    est = alpha * m * m * float(1 << 64) / float(denom)
    if est <= 2.5 * m:
        zeros = int(counts[0])
        if zeros:
            est = m * math.log(m / zeros)
    return float(est)


def _hashes(arr: pa.ChunkedArray | pa.Array, hash_fn: str) -> np.ndarray:
    """Hash a (null-free) value column: ``"pandas"`` = the process-stable
    Bloom-stage hash; ``"splitmix"`` = SQL-replicable splitmix64 over
    integer keys (the q49 twin path — raises on non-integer columns)."""
    if hash_fn == "splitmix":
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        return splitmix64(a.to_numpy(zero_copy_only=False).astype(np.int64))
    return _key_hash64(arr)


def approx_distinct(ds: Dataset, col: str, p: int = 14, hash_fn: str = "pandas") -> float:
    """Global approximate distinct count of ``ds[col]``.

    One streaming pass emits a register array per block; a tiny repartition
    pre-reduces to ``_COMBINE_PARTS`` partials before the driver max-merges
    — driver traffic is bounded by ``_COMBINE_PARTS x 2^p`` bytes,
    independent of input size (the build_bloom_bitmap pattern).
    """

    def block_regs(t: pa.Table) -> pa.Table:
        # SQL COUNT(DISTINCT col) ignores nulls — so must the sketch
        vals = t[col].combine_chunks().drop_null() if t.num_rows else None
        reg = hll_registers(
            _hashes(vals, hash_fn) if vals is not None and len(vals) else np.empty(0, np.uint64),
            p,
        )
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    def max_combine(t: pa.Table) -> pa.Table:
        reg = np.zeros(1 << p, dtype=np.uint8)
        for payload in t["reg"].to_pylist():
            np.maximum(reg, np.frombuffer(payload, dtype=np.uint8), out=reg)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    parts = (
        ds.select_columns([col])
        .map_batches(block_regs, batch_format="pyarrow", batch_size=None)
        .repartition(_COMBINE_PARTS)
        .map_batches(max_combine, batch_format="pyarrow", batch_size=None)
    )
    reg = np.zeros(1 << p, dtype=np.uint8)
    for row in parts.iter_rows():
        np.maximum(reg, np.frombuffer(row["reg"], dtype=np.uint8), out=reg)
    return hll_estimate(reg)


def grouped_approx_distinct(
    ds: Dataset,
    key: str,
    col: str,
    p: int = 12,
    out_col: str = "approx_distinct",
    hash_fn: str = "pandas",
) -> Dataset:
    """Per-``key`` approximate distinct count of ``col``.

    Stage 1 (map_batches) collapses each block to one register row per key
    present in the block — so the shuffle moves ``n_keys x 2^p`` bytes per
    block, never raw values.  Stage 2 (groupby.map_groups) max-merges and
    estimates.  Register rows dominate only when a block's rows-per-key
    drops below 2^p; for genuinely high-cardinality keys lower ``p``.
    """

    def block_regs(t: pa.Table) -> pa.Table:
        # null VALUES are ignored (SQL COUNT DISTINCT); null KEYS are
        # dropped rather than grouped — Ray's groupby sort-shuffle cannot
        # order None against strings, and np.argsort on an object array
        # containing None raises, so the null group is out of reach here
        # (callers wanting it should coalesce the key upstream).  Grouping
        # runs over factorize codes, which is also null-crash-proof.
        t = t.filter(pc.and_(pc.is_valid(t[col]), pc.is_valid(t[key])))
        if t.num_rows == 0:
            return pa.table(
                {key: t[key], "reg": pa.array([], pa.binary())}
            )
        keys = t[key].to_numpy(zero_copy_only=False)
        h = _hashes(t[col], hash_fn)
        codes, uniques = pd.factorize(keys, use_na_sentinel=True)
        order = np.argsort(codes, kind="stable")
        cs, hs = codes[order], h[order]
        bounds = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        out_keys, regs = [], []
        for i, s in enumerate(bounds):
            e = bounds[i + 1] if i + 1 < len(bounds) else len(cs)
            out_keys.append(uniques[cs[s]])
            regs.append(hll_registers(hs[s:e], p).tobytes())
        return pa.table({key: pa.array(out_keys), "reg": pa.array(regs, pa.binary())})

    def merge_group(t: pa.Table) -> pa.Table:
        reg = np.zeros(1 << p, dtype=np.uint8)
        for payload in t["reg"].to_pylist():
            np.maximum(reg, np.frombuffer(payload, dtype=np.uint8), out=reg)
        return pa.table(
            {
                key: t[key].slice(0, 1),
                out_col: pa.array([hll_estimate(reg)], pa.float64()),
            }
        )

    return (
        ds.select_columns([key, col])
        .map_batches(block_regs, batch_format="pyarrow")
        .groupby(key)
        .map_groups(merge_group, batch_format="pyarrow")
    )


# --- Count-Min sketch (Cormode & Muthukrishnan 2005) ------------------------
#
# Frequency estimation with a fixed (depth x width) counter matrix that
# merges by ELEMENTWISE SUM — the additive sibling of HLL's max-merge, so
# per-block partial matrices fold exactly regardless of partitioning (integer
# sums commute; partition-independence is a pytest law, like HLL's).
# Estimate(x) = min over rows of counter[i, h_i(x)]; always >= true count,
# over by at most ~e*N/width with prob 1 - e^-depth.
#
# Hashing is multiply-shift over uint64 wraparound arithmetic
# ((a*x + b) mod 2^64) >> (64 - width_bits) — chosen because HUGEINT SQL can
# replicate it EXACTLY ((a*x + b) % 2^64 // 2^(64-bits)), so the whole sketch
# (cells, counters, min) is independently re-derivable by the DuckDB twin
# with no hash fixture at all.  Constants are fixed odd 62-bit values
# (seeded once, embedded below AND in the twin SQL).

CMS_PARAMS: tuple[tuple[int, int], ...] = tuple(
    (int(a) | 1, int(b))
    for a, b in np.random.default_rng(42).integers(
        1, 1 << 62, size=(4, 2), dtype=np.int64
    )
)


def cms_cells(keys: np.ndarray, width_bits: int) -> np.ndarray:
    """[depth, n] cell index per key per hash row (uint64 multiply-shift)."""
    x = keys.astype(np.uint64)
    shift = np.uint64(64 - width_bits)
    return np.stack(
        [
            (np.uint64(a) * x + np.uint64(b)) >> shift
            for a, b in CMS_PARAMS
        ]
    ).astype(np.int64)


def cms_counts(ds: Dataset, col: str, width_bits: int = 6) -> np.ndarray:
    """Build the (depth, 2^width_bits) counter matrix in ONE streaming pass:
    each block emits its partial matrix as (row, cell, cnt) rows (<= d*w per
    block, tiny), folded by integer sum on the driver — exact under any
    partitioning."""
    depth, width = len(CMS_PARAMS), 1 << width_bits

    def partial(t: pa.Table) -> pa.Table:
        # null keys carry no frequency (SQL GROUP BY col ... WHERE col IS
        # NOT NULL semantics for a point-estimate sketch)
        keys = (
            t[col].combine_chunks().drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        )
        cells = cms_cells(keys, width_bits)
        rows, cols, cnts = [], [], []
        for i in range(depth):
            binc = np.bincount(cells[i], minlength=width)
            nz = np.flatnonzero(binc)
            rows.append(np.full(len(nz), i, dtype=np.int64))
            cols.append(nz.astype(np.int64))
            cnts.append(binc[nz].astype(np.int64))
        return pa.table(
            {
                "row": pa.array(np.concatenate(rows)),
                "cell": pa.array(np.concatenate(cols)),
                "cnt": pa.array(np.concatenate(cnts)),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    mat = np.zeros((depth, width), dtype=np.int64)
    if len(p):
        np.add.at(mat, (p["row"].to_numpy(), p["cell"].to_numpy()), p["cnt"].to_numpy())
    return mat


def cms_estimate(mat: np.ndarray, keys: np.ndarray, width_bits: int = 6) -> np.ndarray:
    """Point estimates for ``keys``: min over hash rows of their counters."""
    cells = cms_cells(np.asarray(keys, dtype=np.int64), width_bits)
    ests = np.stack([mat[i, cells[i]] for i in range(len(CMS_PARAMS))])
    return ests.min(axis=0)


# ---------------------------------------------------------------------------
# Misra-Gries mergeable heavy-hitter summaries (sketch -> exact verify)


def mg_summary(counts: dict, capacity: int) -> dict:
    """Reduce an exact ``item -> count`` map to a Misra-Gries summary of at
    most ``capacity`` counters (Misra & Gries 1982): subtract the
    (capacity+1)-th largest count from everything and drop the non-positive
    remainder.  Guarantee: ``true - err <= c(x) <= true`` with the summary's
    total error ``err <= N / (capacity + 1)``; any item with frequency above
    that threshold SURVIVES.  Deterministic — no sampling, no hashing."""
    if len(counts) <= capacity:
        return dict(counts)
    vals = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    # (capacity+1)-th largest via one O(n) partition, not a full sort
    kth = np.partition(vals, len(vals) - (capacity + 1))[len(vals) - (capacity + 1)]
    return {k: v - int(kth) for k, v in counts.items() if v > kth}


def mg_merge(a: dict, b: dict, capacity: int) -> dict:
    """Merge two MG summaries (Agarwal et al. 2012, "Mergeable Summaries"):
    pointwise sum, then the same (capacity+1)-th-largest reduction.  Errors
    add, so a fold over B blocks keeps the global ``N / (capacity + 1)``
    bound regardless of how the stream was partitioned."""
    out = dict(a)
    for k, v in b.items():
        out[k] = out.get(k, 0) + v
    return mg_summary(out, capacity)


def mg_top_terms_exact(
    ds: Dataset,
    text_col: str,
    k: int,
    capacity: int = 4096,
) -> pa.Table:
    """EXACT top-k terms by total occurrences via the sketch-then-verify
    plan (the Bloom-semi-join discipline applied to heavy hitters):

    1. Each block folds its token stream into an exact Counter, reduced to
       a Misra-Gries summary of ``capacity`` counters — bounded memory no
       matter how large the vocabulary grows (the reason q35's exact
       combiner can't be used on an open token stream at 100 TB).  Each
       partial also carries its block's token total as a sentinel row
       (term "" — the tokenizer can never emit it).
    2. Partials combine by POINTWISE SUM + one final MG reduction —
       associative, commutative, and therefore partition-order-free (no
       block identity needed).  Per Agarwal et al.'s mergeability plus the
       final reduction, the combined error is <= 2N/(capacity+1).
    3. The candidate set = surviving keys, which PROVABLY contains every
       term with frequency > 2N/(capacity+1).  A second stateless pass
       exact-counts ONLY the candidates (broadcast set, narrow partials),
       so the result is exact whenever the true k-th count clears that
       threshold — asserted at runtime, so a silent capacity shortfall is
       impossible.

    Returns ``(term, n, rank)`` sorted by (n desc, term)."""
    import ray as _ray

    from ner_ray.stages.decontam import TOKEN_RE

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        n = 0
        for x in t[text_col].to_pylist():
            if x is None:
                continue
            toks = TOKEN_RE.findall(x.lower())
            n += len(toks)
            c.update(toks)
        s = mg_summary(c, capacity)
        # sentinels the tokenizer can never emit: "" = block token total,
        # "\x01" = this block's summary was lossy (distinct > capacity)
        terms = list(s.keys()) + [""] + (["\x01"] if len(c) > capacity else [])
        cs = list(s.values()) + [n] + ([1] if len(c) > capacity else [])
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "c": pa.array(cs, pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("term", sort=False)["c"]
        .sum()
    )
    total_n = int(parts.get("", 0))
    block_lossy = "\x01" in parts.index
    parts = parts.drop(labels=["", "\x01"], errors="ignore")
    merged = dict(zip(parts.index, parts.astype(int)))
    # lossy whenever ANY reduction dropped/decremented a counter: a block
    # overflow (sentinel) or the final merge itself exceeding capacity.
    # (Counting "len - 2" regardless of whether the '\x01' sentinel was
    # present let distinct == capacity+1 slip through as lossy=False while
    # mg_summary below still dropped a counter.)
    lossy = block_lossy or len(merged) > capacity
    summary = mg_summary(merged, capacity)
    # exact when no block (and no final reduction) ever dropped a counter;
    # otherwise the 2N/(capacity+1) mergeability bound applies
    threshold = 2.0 * total_n / (capacity + 1) if lossy else -1.0
    candidates = set(summary)

    ref = _ray.put(candidates)

    def verify(t: pa.Table) -> pa.Table:
        from collections import Counter

        cand = _ray.get(ref)
        c: Counter = Counter()
        for x in t[text_col].to_pylist():
            if x is None:
                continue
            c.update(w for w in TOKEN_RE.findall(x.lower()) if w in cand)
        return pa.table(
            {
                "term": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    exact = (
        ds.map_batches(verify, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    if lossy and (
        len(exact) < k or (len(exact) and float(exact["n"].iloc[-1]) <= threshold)
    ):
        raise ValueError(
            f"MG capacity {capacity} too small for exact top-{k}: "
            f"{len(exact)} candidates, k-th count "
            f"{exact['n'].iloc[-1] if len(exact) else 0} vs guarantee "
            f"threshold {threshold:.1f}; raise capacity"
        )
    exact["rank"] = np.arange(1, len(exact) + 1, dtype=np.int64)
    return pa.Table.from_pandas(exact, preserve_index=False)


def histogram_quantiles(
    ds: Dataset,
    col: str,
    bins: int = 256,
    ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> pd.DataFrame:
    """Approximate quantiles via a mergeable fixed-grid histogram — the
    percentile primitive that replaces an all-to-all sort at 100 TB.

    Two streaming passes: (1) distributed min/max (tiny partials), (2) each
    block bincounts ``floor((x - mn) / w)`` clipped to ``[0, bins-1]`` and
    the <= ``bins``-row partials combine driver-side with NO shuffle (the
    ``grouped_agg_partial`` combiner shape).  Quantile ``p`` interpolates
    linearly inside the first bin whose cumulative count reaches ``p * n``
    — worst-case error one bin width, independent of data size, and the
    whole sketch is partition-order-free (bincounts add commutatively).
    Estimates floor-quantize to 6 decimals (the q43/q44 idiom) so a SQL
    twin replaying the identical IEEE arithmetic hash-matches exactly.

    Returns ``(p, bin, bin_count, cum_count, estimate)`` — one row per
    requested quantile.
    """
    from ray.data.aggregate import Max, Min

    from ner_ray.stages.relational import grouped_agg_partial

    mm = ds.aggregate(Min(col), Max(col))
    mn, mx = float(mm[f"min({col})"]), float(mm[f"max({col})"])
    if not mx > mn:  # degenerate: constant column -> every quantile is mn
        return pd.DataFrame(
            [(p, 0, 0, 0, mn) for p in ps],
            columns=["p", "bin", "bin_count", "cum_count", "estimate"],
        )
    w = (mx - mn) / float(bins)

    def hist(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.minimum(bins - 1, np.maximum(0, np.floor((x - mn) / w))).astype(np.int64)
        cnt = np.bincount(b, minlength=bins)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {"bin": pa.array(nz, pa.int64()), "cnt": pa.array(cnt[nz], pa.int64())}
        )

    hp = grouped_agg_partial(
        ds.map_batches(hist, batch_format="pyarrow"), keys=["bin"], sums={"cnt": "cnt"}
    ).sort_values("bin")
    bin_ids = hp["bin"].to_numpy()
    cnts = hp["cnt"].to_numpy()
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    rows = []
    for p in ps:
        target = p * float(n)
        i = int(np.searchsorted(cum, target, side="left"))
        cum_prev = float(cum[i] - cnts[i])
        est = mn + w * (float(bin_ids[i]) + (target - cum_prev) / float(cnts[i]))
        est = math.floor(est * 1e6 + 0.5) / 1e6
        rows.append((p, int(bin_ids[i]), int(cnts[i]), int(cum[i]), est))
    return pd.DataFrame(
        rows, columns=["p", "bin", "bin_count", "cum_count", "estimate"]
    )


def grouped_histogram_quantiles(
    ds: Dataset,
    key_col: str,
    col: str,
    bins: int = 64,
    ps: tuple[float, ...] = (0.5, 0.9),
) -> pd.DataFrame:
    """Per-group approximate quantiles on ONE global fixed grid — the
    grouped percentile primitive (per-source length p50/p90 etc.) without
    a per-group sort or a per-group range pass.

    Same mergeable shape as ``histogram_quantiles``: a global min/max
    pass fixes the grid, per-block ``(key, bin)`` bincount partials
    combine with no shuffle (|keys| x bins partial rows per block), and
    each group interpolates on its own cumulative counts.  Error is one
    GLOBAL bin width — groups much narrower than the global range get
    coarser estimates; raise ``bins`` when that matters.  Estimates
    floor-quantize to 6 decimals (the q43/q44 idiom) for SQL-twin
    hash-exactness.

    Returns ``(key, p, bin, bin_count, cum_count, estimate)``.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    from ner_ray.stages.relational import grouped_agg_partial

    mm = ds.aggregate(Min(col), Max(col))
    mn, mx = float(mm[f"min({col})"]), float(mm[f"max({col})"])
    if not mx > mn:
        return pd.DataFrame(
            columns=[key_col, "p", "bin", "bin_count", "cum_count", "estimate"]
        )
    w = (mx - mn) / float(bins)

    def hist(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.minimum(bins - 1, np.maximum(0, np.floor((x - mn) / w))).astype(np.int64)
        g = (
            pa.table({key_col: t[key_col], "bin": pa.array(b)})
            .group_by([key_col, "bin"])
            .aggregate([("bin", "count")])
        )
        return pa.table(
            {
                key_col: g[key_col],
                "bin": g["bin"],
                "cnt": pc.cast(g["bin_count"], pa.int64()),
            }
        )

    hp = grouped_agg_partial(
        ds.map_batches(hist, batch_format="pyarrow"),
        keys=[key_col, "bin"],
        sums={"cnt": "cnt"},
    ).sort_values([key_col, "bin"])
    rows = []
    for key, grp in hp.groupby(key_col, sort=True):
        bin_ids = grp["bin"].to_numpy()
        cnts = grp["cnt"].to_numpy()
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        for p in ps:
            target = p * float(n)
            i = int(np.searchsorted(cum, target, side="left"))
            cum_prev = float(cum[i] - cnts[i])
            est = mn + w * (float(bin_ids[i]) + (target - cum_prev) / float(cnts[i]))
            est = math.floor(est * 1e6 + 0.5) / 1e6
            rows.append((key, p, int(bin_ids[i]), int(cnts[i]), int(cum[i]), est))
    return pd.DataFrame(
        rows, columns=[key_col, "p", "bin", "bin_count", "cum_count", "estimate"]
    )
