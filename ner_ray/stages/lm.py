"""N-gram language-model perplexity filter (the CCNet / KenLM-style quality
signal): score every document by the average log-probability of its tokens
under a bigram stupid-backoff model trained on the corpus itself, and flag
the low-likelihood tail (boilerplate, gibberish, lorem-ipsum, non-text).

Wenzek et al. 2020 (CCNet) filter Common Crawl with a KenLM 5-gram model;
the distributed *shape* is what matters here, reproduced for a bigram
stupid-backoff model (Brants et al. 2007) small enough to train on the
corpus under test.  Reference repo has no equivalent (confirmed-by-absence,
SURVEY §2 Part B preamble); this is one of the beyond-reference
LLM-pipeline operators the engine adds.

Scale shape
-----------
Training is the TF-IDF/DF combiner pattern (queries.q43): each block folds
its token stream into *narrow* ``(gram, c)`` partial-count rows (a Counter
per block — one row per distinct gram per block, never the token stream),
one vocabulary-keyed ``groupby().sum`` combines them, and the model prunes
**inside the distributed plan** before anything reaches the driver: bigrams
below ``min_count`` are dropped (they back off to unigrams anyway), and an
optional ``max_bigrams`` cap keeps the highest-count bigrams with a
deterministic ``(count desc, gram asc)`` tie-break — truncation is LOGGED,
never silent.  What the driver collects and ``ray.put``-broadcasts is the
pruned vocabulary-sized model (the same contract as the q43 IDF broadcast
and the linker alias dict), NOT anything corpus-sized.

Scoring is a stateless ``map_batches`` pass with zero shuffle: token and
bigram strings map through the broadcast count dicts via vectorized pandas
hash lookups, and the per-doc fold is a ``bincount`` over the flattened
token stream.

Cross-engine exactness (the q56/BM25 idiom): every per-token log-prob is
floor-quantized to integer micros BEFORE the per-doc sum, so the DuckDB
twin's arbitrary-order BIGINT addition is exact; the flag compares
``sum_micros < threshold_micros * n_tokens`` in pure integers.  The model
probabilities divide BIGINT counts cast to DOUBLE with the same
association order on both sides.

Tokenization is the corpus-analytics idiom shared with q43/q44/q55:
``[a-z0-9]+`` over ``lower(text)``.
"""

from __future__ import annotations

import logging
import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ner_ray.stages.decontam import TOKEN_RE

logger = logging.getLogger(__name__)

BACKOFF = 0.4  # Brants et al. 2007 stupid-backoff constant

# Finite default cap on the driver-collected bigram table: an
# open-vocabulary 100-TB corpus can exceed driver memory even after the
# min_count prune, and a warning nobody reads is not a bound.  2M grams ≈
# tens of MB as a dict — comfortably broadcastable — and the truncation is
# deterministic ((count desc, gram asc)) and logged.  Pass ``None``
# explicitly to opt out.
DEFAULT_MAX_BIGRAMS = 2_000_000


def _tokenize_flat(arr) -> tuple[np.ndarray, pa.Array]:
    """Vectorized ``TOKEN_RE.findall(lower(text))`` over a whole column:
    ``(parent_row int64 ndarray, token StringArray)`` of the flattened
    stream.  Non-``[a-z0-9]`` runs become separators then whitespace-split —
    exactly findall's token set for this alphabet — with zero per-row
    Python."""
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    low = pc.utf8_lower(pc.fill_null(pc.cast(arr, pa.string()), ""))
    sep = pc.replace_substring_regex(low, pattern="[^a-z0-9]+", replacement=" ")
    toks = pc.utf8_split_whitespace(sep)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(pc.utf8_length(flat), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    return parent[keep_np], flat.filter(keep)


def train_bigram_lm(
    ds: Dataset,
    text_col: str = "text",
    min_count: int = 2,
    max_bigrams: int | None = DEFAULT_MAX_BIGRAMS,
) -> tuple[dict[str, int], dict[str, int], float]:
    """Count unigrams and bigrams over the corpus and return
    ``(unigram_counts, bigram_counts, total_tokens)``.

    Unigrams keep every token (the backoff denominator needs them all and
    the table is vocabulary-sized); bigrams prune at ``min_count`` inside
    the distributed plan and cap at ``max_bigrams``
    (``DEFAULT_MAX_BIGRAMS`` unless overridden; ``None`` disables).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        parent, flat = _tokenize_flat(t[text_col])
        if len(flat) == 0:
            return pa.table(
                {"gram": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        uni_vc = pc.value_counts(flat)
        # bigram keys: adjacent tokens within one doc, space-joined (the
        # space separator is unambiguous: unigrams never contain one)
        same = parent[1:] == parent[:-1]
        mask = pa.array(same)
        big = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1).filter(mask),
            flat.slice(1).filter(mask),
            " ",
        )
        parts = [
            pa.table(
                {
                    "gram": uni_vc.field("values"),
                    "c": pc.cast(uni_vc.field("counts"), pa.int64()),
                }
            )
        ]
        if len(big):
            bi_vc = pc.value_counts(big)
            parts.append(
                pa.table(
                    {
                        "gram": bi_vc.field("values"),
                        "c": pc.cast(bi_vc.field("counts"), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("c", alias_name="c"))
    )

    def prune(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_bi = pc.match_substring(t["gram"], " ")
        keep = pc.or_(pc.invert(is_bi), pc.greater_equal(t["c"], min_count))
        return t.filter(keep)

    pruned = counts.map_batches(prune, batch_format="pyarrow").to_pandas()
    if max_bigrams is None and len(pruned) > 5_000_000:
        logger.warning(
            "uncapped LM model collected %d grams to the driver; set "
            "max_bigrams on an open-vocabulary corpus",
            len(pruned),
        )
    is_bi = pruned["gram"].str.contains(" ", regex=False)
    uni_tbl, bi_tbl = pruned[~is_bi], pruned[is_bi]
    if max_bigrams is not None and len(bi_tbl) > max_bigrams:
        logger.warning(
            "bigram model truncated %d -> %d (count desc, gram asc)",
            len(bi_tbl),
            max_bigrams,
        )
        bi_tbl = bi_tbl.sort_values(
            ["c", "gram"], ascending=[False, True], kind="mergesort"
        ).head(max_bigrams)
    uni = dict(zip(uni_tbl["gram"], uni_tbl["c"].astype(int)))
    bi = dict(zip(bi_tbl["gram"], bi_tbl["c"].astype(int)))
    total = float(sum(uni.values()))
    return uni, bi, total


def score_tokens(
    toks: list[str],
    uni: dict[str, int],
    bi: dict[str, int],
    total: float,
) -> list[float]:
    """Pure per-token log-prob kernel (pytest reference for the vectorized
    path): first token scores ``ln(c_w / T)``; a token whose ``(prev, w)``
    bigram survives pruning scores ``ln(c_bi / c_prev)``; otherwise stupid
    backoff ``ln(0.4 * c_w / T)``."""
    import math

    out = []
    for i, w in enumerate(toks):
        if i == 0:
            out.append(math.log(float(uni[w]) / total))
            continue
        g = f"{toks[i - 1]} {w}"
        if g in bi:
            out.append(math.log(float(bi[g]) / float(uni[toks[i - 1]])))
        else:
            out.append(math.log(BACKOFF * float(uni[w]) / total))
    return out


def _flatten_tokens(
    t: pa.Table, id_col: str, text_col: str
) -> tuple[list, list[int], pd.Series, pd.Series, np.ndarray, np.ndarray]:
    """Flatten a batch's token streams: returns (doc_ids, n_tokens_per_doc,
    token Series, prev-token Series, has_prev mask, doc index per token).
    Docs with zero tokens are skipped (the SQL twins' inner-join shape).
    Fully vectorized (``_tokenize_flat`` + numpy segment ops)."""
    parent, flat = _tokenize_flat(t[text_col])
    if len(flat) == 0:
        return (
            [],
            [],
            pd.Series([], dtype=object),
            pd.Series([], dtype=object),
            np.zeros(0, bool),
            np.zeros(0, np.int64),
        )
    # np.unique is sorted == input-row order; inverse = compact doc index
    rows_present, doc_idx = np.unique(parent, return_inverse=True)
    n_toks = np.bincount(doc_idx).astype(np.int64)
    ids_all = t[id_col].to_pylist()
    doc_ids = [ids_all[r] for r in rows_present]
    toks_np = flat.to_numpy(zero_copy_only=False)
    same = parent[1:] == parent[:-1]
    prev_np = np.empty(len(toks_np), dtype=object)
    prev_np[0] = None
    prev_np[1:] = np.where(same, toks_np[:-1], None)
    has_prev = np.r_[False, same]
    return (
        doc_ids,
        list(n_toks),
        pd.Series(toks_np, dtype=object),
        pd.Series(prev_np, dtype=object),
        has_prev,
        doc_idx.astype(np.int64),
    )


OOV_COUNT = 0.5  # pseudo-count for tokens unseen by a model (DSIR scoring
# of out-of-domain text; never reached when the model trained on the same
# corpus it scores, as in lm_perplexity_filter)


def logprob_micros(
    tok_s: pd.Series,
    prev_s: pd.Series,
    has_prev: np.ndarray,
    uni: dict[str, int],
    bi: dict[str, int],
    total: float,
) -> np.ndarray:
    """Vectorized per-token stupid-backoff log-prob, floor-quantized to
    integer micros (the cross-engine-exact unit both SQL twins fold).
    Association order mirrors the SQL exactly:
      bigram hit: ln(CAST(c_bi AS DOUBLE) / CAST(c_prev AS DOUBLE))
      backoff:    ln(0.4 * cu(w) / T)    (left-assoc in numpy and SQL)
      first:      ln(cu(w) / T)
    where cu(w) = count if in the model else the 0.5 OOV pseudo-count
    (SQL: COALESCE(CAST(u.c AS DOUBLE), 0.5))."""
    if len(tok_s) == 0:
        return np.zeros(0, np.int64)
    c_w = tok_s.map(uni).to_numpy(dtype=np.float64, na_value=np.nan)
    c_w = np.where(np.isnan(c_w), OOV_COUNT, c_w)
    c_prev = prev_s.map(uni).to_numpy(dtype=np.float64, na_value=np.nan)
    # "\x00" never tokenizes, so first-token sentinels cannot hit a real
    # bigram key (and object-dtype None + str would raise in pandas)
    big = prev_s.fillna("\x00") + " " + tok_s
    c_bi = big.map(bi).to_numpy(dtype=np.float64, na_value=np.nan)
    hit = has_prev & ~np.isnan(c_bi)
    lnp = np.empty(len(tok_s), dtype=np.float64)
    lnp[hit] = np.log(c_bi[hit] / c_prev[hit])
    miss = has_prev & ~hit
    lnp[miss] = np.log(BACKOFF * c_w[miss] / total)
    first = ~has_prev
    lnp[first] = np.log(c_w[first] / total)
    return np.floor(lnp * 1e6 + 0.5).astype(np.int64)


def lm_perplexity_filter(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    max_bigrams: int | None = DEFAULT_MAX_BIGRAMS,
    threshold_micros: int = -7_000_000,
) -> Dataset:
    """Score every doc's average token log-prob under the corpus bigram LM
    and flag docs below ``threshold_micros`` (micros of nats/token).

    Output: ``(doc_id, n_tokens, sum_lp_micros, avg_logprob, flagged)`` —
    one row per document with at least one token.  ``avg_logprob`` derives
    from the integers on both engine sides (``sum/1e6/n``), so the hash
    comparison stays exact.
    """
    import ray as _ray

    uni, bi, total = train_bigram_lm(
        ds, text_col=text_col, min_count=min_count, max_bigrams=max_bigrams
    )
    uni_ref, bi_ref = _ray.put(uni), _ray.put(bi)

    def score(t: pa.Table) -> pa.Table:
        uni_m = _ray.get(uni_ref)
        bi_m = _ray.get(bi_ref)
        doc_ids, n_toks, tok_s, prev_s, has_prev, doc_idx = _flatten_tokens(
            t, id_col, text_col
        )
        if not doc_ids:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "sum_lp_micros": pa.array([], pa.int64()),
                    "avg_logprob": pa.array([], pa.float64()),
                    "flagged": pa.array([], pa.int64()),
                }
            )
        micros = logprob_micros(tok_s, prev_s, has_prev, uni_m, bi_m, total)
        sums = np.bincount(doc_idx, weights=micros, minlength=len(doc_ids)).astype(
            np.int64
        )
        n = np.asarray(n_toks, dtype=np.int64)
        avg = (sums / 1e6) / n
        flagged = (sums < threshold_micros * n).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "sum_lp_micros": pa.array(sums, pa.int64()),
                "avg_logprob": pa.array(avg, pa.float64()),
                "flagged": pa.array(flagged, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_select(
    ds: Dataset,
    target: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    max_bigrams: int | None = DEFAULT_MAX_BIGRAMS,
) -> Dataset:
    """DSIR-style data selection (Xie et al. 2023, Data Selection via
    Importance Resampling): score every raw-corpus doc by the
    log-likelihood RATIO between a bigram LM trained on the TARGET domain
    and one trained on the RAW corpus; docs whose text looks more like the
    target than like the background get positive scores.  (DSIR uses hashed
    n-gram features; same estimator family, here with the engine's exact
    stupid-backoff bigram models.)

    Scale shape: two ``train_bigram_lm`` passes (each the distributed
    (gram, c) combiner; the target is typically a small slice), both pruned
    models broadcast once, then ONE stateless scoring pass over the corpus
    computes both log-probs per token from the same flattened stream —
    zero shuffle, nothing document-sized moves.

    Output: ``(doc_id, n_tokens, dsir_micros, avg_llr, selected)`` where
    ``dsir_micros = Σ_token (micros_target - micros_raw)`` (each side
    floor-quantized exactly as the q71 twin folds) and ``selected = 1``
    when the average ratio is positive."""
    import ray as _ray

    uni_t, bi_t, total_t = train_bigram_lm(
        target, text_col=text_col, min_count=min_count, max_bigrams=max_bigrams
    )
    uni_r, bi_r, total_r = train_bigram_lm(
        ds, text_col=text_col, min_count=min_count, max_bigrams=max_bigrams
    )
    refs = [_ray.put(x) for x in (uni_t, bi_t, uni_r, bi_r)]

    def score(t: pa.Table) -> pa.Table:
        ut, bt, ur, br = (_ray.get(r) for r in refs)
        doc_ids, n_toks, tok_s, prev_s, has_prev, doc_idx = _flatten_tokens(
            t, id_col, text_col
        )
        if not doc_ids:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "dsir_micros": pa.array([], pa.int64()),
                    "avg_llr": pa.array([], pa.float64()),
                    "selected": pa.array([], pa.int64()),
                }
            )
        m_t = logprob_micros(tok_s, prev_s, has_prev, ut, bt, total_t)
        m_r = logprob_micros(tok_s, prev_s, has_prev, ur, br, total_r)
        diff = np.bincount(
            doc_idx, weights=m_t - m_r, minlength=len(doc_ids)
        ).astype(np.int64)
        n = np.asarray(n_toks, dtype=np.int64)
        avg = (diff / 1e6) / n
        return pa.table(
            {
                id_col: pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "dsir_micros": pa.array(diff, pa.int64()),
                "avg_llr": pa.array(avg, pa.float64()),
                "selected": pa.array((diff > 0).astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def corpus_js_divergence(
    ds: Dataset,
    key_col: str = "source",
    text_col: str = "text",
    num_buckets: int = 512,
) -> pd.DataFrame:
    """Jensen-Shannon divergence between the token distributions of every
    pair of corpus slices (``key_col`` values) — the data-mixture /
    domain-shift diagnostic a training pipeline runs before choosing
    sampling weights (JS in nats; 0 = identical distributions, ln 2 max).

    Scale shape: pass 1 folds global per-key token totals with the
    no-shuffle combiner (|keys| partial rows per block); pass 2 emits
    narrow ``(term, key, cnt)`` block partials, ONE shuffle co-locates
    whole terms into ``num_buckets`` hash buckets (the window_funcs
    bucketed-kernel pattern — dispatch is ~num_buckets calls, not
    |vocab|), and each bucket folds a dense ``terms x keys`` count matrix
    into per-pair partial sums in a single segmented numpy pass.  Only
    vocabulary-sized partials ever move; the corpus never does.

    Cross-engine exactness (the lm.py integer-micro idiom): each term's
    pairwise contribution floor-quantizes to integer PICOS (1e-12) before
    the sum, so partial-order-free BIGINT addition makes the DuckDB twin
    hash-exact; ``js_divergence = js_pico / 1e12`` on both sides.

    Returns ``(source_a, source_b, js_pico, js_divergence)``, one row per
    unordered key pair (source_a < source_b).
    """
    import pyarrow.compute as pc

    from ner_ray.stages.relational import grouped_agg_partial

    # pass 1: global token totals per key
    def tot_partial(t: pa.Table) -> pa.Table:
        parent, _flat = _tokenize_flat(t[text_col])
        src = pc.take(t[key_col], pa.array(parent))
        g = pa.table({"k": src}).group_by("k").aggregate([("k", "count")])
        return pa.table({"k": g["k"], "n": pc.cast(g["k_count"], pa.int64())})

    tot = grouped_agg_partial(
        ds.map_batches(tot_partial, batch_format="pyarrow"), keys=["k"], sums={"n": "n"}
    )
    keys_sorted = sorted(tot["k"].astype(str))
    totals = dict(zip(tot["k"].astype(str), tot["n"].astype(float)))
    totals_vec = np.array([totals[k] for k in keys_sorted], dtype=np.float64)
    key_index = pd.Index(keys_sorted)
    nk = len(keys_sorted)

    # pass 2: (term, key, cnt) block partials, bucketed by term hash
    def cnt_partial(t: pa.Table) -> pa.Table:
        parent, flat = _tokenize_flat(t[text_col])
        src = pc.take(t[key_col], pa.array(parent))
        g = (
            pa.table({"term": flat, "k": src})
            .group_by(["term", "k"])
            .aggregate([("term", "count")])
        )
        from ner_ray.utils import stable_hash64

        h = stable_hash64(g["term"])  # NUL-safe (see utils.stable_hash64)
        return pa.table(
            {
                "term": g["term"],
                "k": g["k"],
                "cnt": pc.cast(g["term_count"], pa.int64()),
                "_bkt": pa.array((h % num_buckets).astype(np.int64)),
            }
        )

    empty = pa.table(
        {
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "js_pico": pa.array([], pa.int64()),
        }
    )

    def js_block(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        g = g.sort_by([("term", "ascending"), ("k", "ascending")])
        terms = g["term"].to_numpy(zero_copy_only=False)
        newseg = np.r_[True, terms[1:] != terms[:-1]]
        tid = np.cumsum(newseg) - 1
        kcode = key_index.get_indexer(g["k"].to_numpy(zero_copy_only=False))
        m = np.zeros((int(tid[-1]) + 1, nk), dtype=np.float64)
        np.add.at(m, (tid, kcode), g["cnt"].to_numpy(zero_copy_only=False))
        p = m / totals_vec  # column-aligned global probabilities
        rows_a, rows_b, picos = [], [], []
        with np.errstate(divide="ignore", invalid="ignore"):
            for i in range(nk):
                for j in range(i + 1, nk):
                    pi, pj = p[:, i], p[:, j]
                    msum = pi + pj
                    ca = np.where(pi > 0, 0.5 * pi * np.log(2 * pi / msum), 0.0)
                    cb = np.where(pj > 0, 0.5 * pj * np.log(2 * pj / msum), 0.0)
                    pico = np.floor((ca + cb) * 1e12 + 0.5).astype(np.int64).sum()
                    rows_a.append(keys_sorted[i])
                    rows_b.append(keys_sorted[j])
                    picos.append(int(pico))
        return pa.table(
            {
                "source_a": pa.array(rows_a, pa.string()),
                "source_b": pa.array(rows_b, pa.string()),
                "js_pico": pa.array(picos, pa.int64()),
            }
        )

    parts = (
        ds.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(js_block, batch_format="pyarrow")
    )
    out = grouped_agg_partial(
        parts, keys=["source_a", "source_b"], sums={"js_pico": "js_pico"}
    )
    out["js_pico"] = out["js_pico"].astype("int64")
    out["js_divergence"] = out["js_pico"].astype(float) / 1e12
    return out[["source_a", "source_b", "js_pico", "js_divergence"]].reset_index(
        drop=True
    )
