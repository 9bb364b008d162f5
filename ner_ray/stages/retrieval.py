"""BM25 ranked retrieval over a document corpus.

The classic lexical-relevance scorer (Robertson & Walker 1994; the
Okapi/Lucene formulation with the +1-inside-the-log IDF that keeps scores
positive for df > N/2).  The reference repo has no retrieval operator
(confirmed-by-absence, SURVEY §2); this extends the q43 TF-IDF machinery
into full query scoring — the primitive a training-data pipeline uses for
quality-by-relevance filtering and hard-negative mining.

Scale shape
-----------
The query set is tiny (user-supplied, dozens of terms); the corpus is the
100 TB side.  So:

* ONE narrow statistics pass: each block emits partial document
  frequencies for the DISTINCT query terms only (never the vocabulary)
  plus its token-count partial; a groupby over <= |terms|+1 keys reduces
  them.  The stats table (df per query term, total docs, total tokens) is
  driver-tiny by construction and broadcasts via ``ray.put``.
* ONE stateless scoring pass computes per-(query, doc) scores in-block —
  document length comes from the doc's own tokens, so no join touches the
  corpus.
* Top-k per query runs through ``relational.top_n_per_group`` (per-block
  pre-combiner, bounded shuffle).

Cross-engine determinism: per-term contributions are quantized to INTEGER
micro-units (``floor(x * 1e6 + 0.5)``) *before* the per-query sum, so the
DuckDB twin — which sums in arbitrary order — adds exactly the same
integers (float addition order can differ by an ulp; integer addition
cannot).  The final score is ``micros / 1e6``, the identical double on
both sides.
"""

from __future__ import annotations

import math

import pyarrow as pa
from ray.data import Dataset

from ner_ray.stages.decontam import TOKEN_RE


def bm25_topk(
    ds: Dataset,
    queries: dict[str, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Top-``k`` documents per query by BM25.

    Output: ``(query_id, doc_id, score, rank)`` with rank 1..k per query
    (ties broken by ascending doc id, mirroring the twin's
    ``row_number() OVER (ORDER BY micros DESC, doc_id)``).
    """
    import ray as _ray
    from ray.data.aggregate import Sum

    from ner_ray.stages.relational import top_n_per_group

    terms = sorted({t for ts in queries.values() for t in ts})
    n_docs = ds.count()

    _DL = "\x00dl"  # sentinel key for the token-count partial

    def partials(t: pa.Table) -> pa.Table:
        from collections import Counter

        df: Counter = Counter()
        sum_dl = 0
        tset = set(terms)
        for x in t[text_col].to_pylist():
            if x is None:
                continue
            toks = TOKEN_RE.findall(x.lower())
            sum_dl += len(toks)
            df.update(tset & set(toks))
        keys = list(df.keys()) + [_DL]
        vals = list(df.values()) + [sum_dl]
        return pa.table(
            {"term": pa.array(keys, pa.string()), "val": pa.array(vals, pa.int64())}
        )

    stats = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("val", alias_name="val"))
        .to_pandas()
    )
    smap = dict(zip(stats["term"], stats["val"].astype(int)))
    sum_dl = smap.pop(_DL, 0)
    avgdl = sum_dl / n_docs if n_docs else 1.0
    ref = _ray.put((smap, avgdl, float(n_docs), dict(queries)))

    def score(t: pa.Table) -> pa.Table:
        from collections import Counter

        dfm, avg, n, qs = _ray.get(ref)
        qids, ids, micros = [], [], []
        for doc_id, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            if x is None:
                continue
            toks = TOKEN_RE.findall(x.lower())
            tf = Counter(toks)
            dl = len(toks)
            for qid, qterms in qs.items():
                total = 0
                hit = False
                for term in qterms:
                    f = tf.get(term, 0)
                    if not f:
                        continue
                    hit = True
                    df = dfm[term]
                    contrib = (
                        math.log((n - df + 0.5) / (df + 0.5) + 1)
                        * f
                        * (k1 + 1)
                        / (f + k1 * (1 - b + b * dl / avg))
                    )
                    total += math.floor(contrib * 1000000 + 0.5)
                if hit:
                    qids.append(qid)
                    ids.append(doc_id)
                    micros.append(total)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.string()),
                id_col: pa.array(ids, pa.int64()),
                "score_micros": pa.array(micros, pa.int64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    top = top_n_per_group(scored, "query_id", "score_micros", k, id_col, rank_col="rank")

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "query_id": t["query_id"],
                id_col: t[id_col],
                "score": pc.divide(pc.cast(t["score_micros"], pa.float64()), 1000000.0),
                "rank": pc.cast(t["rank"], pa.int64()),
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


# --- Bucket-partitioned inverted index (the IVF layout applied to text) ----
#
# BM25 above is the one-pass scorer; a standing corpus wants a persisted
# index so each query touches only the postings it needs.  Terms hash into
# a fixed number of buckets (crc32 % B) and the postings table
# (term, doc_id, tf) writes ONCE as hive-partitioned Parquet
# (index_dir/data/bucket=<b>/).  A search reads ONLY its query terms'
# bucket partitions via pyarrow.fs discovery — the read path prunes, it
# does not scan-and-skip (the ann.ivf_build_index / ivf_search_index
# discipline, including the single-generation rebuild rule).


def _term_bucket(term: str, num_buckets: int) -> int:
    import zlib

    return zlib.crc32(term.encode("utf-8")) % num_buckets


def index_build(
    ds: Dataset,
    index_dir: str,
    num_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Tokenize the corpus and write the postings as bucket-partitioned
    Parquet.  One narrow shuffle (the partitioned write); postings rows are
    (term, doc_id, tf) — tens of bytes — never documents."""
    import json
    import os
    import shutil

    def postings(t: pa.Table) -> pa.Table:
        from collections import Counter

        terms, buckets, ids, tfs = [], [], [], []
        for doc_id, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            if x is None:
                continue
            for term, tf in Counter(TOKEN_RE.findall(x.lower())).items():
                terms.append(term)
                buckets.append(_term_bucket(term, num_buckets))
                ids.append(doc_id)
                tfs.append(tf)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "bucket": pa.array(buckets, pa.int32()),
                id_col: pa.array(ids, pa.int64()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    # single-generation rebuild: a crashed build + retry must never serve
    # stale rows next to fresh ones from a probed bucket
    data_dir = os.path.join(index_dir, "data")
    if os.path.exists(data_dir):
        shutil.rmtree(data_dir)
    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(postings, batch_format="pyarrow").write_parquet(
        data_dir, partition_cols=["bucket"]
    )
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"num_buckets": num_buckets, "id_col": id_col}, f)


def index_search(
    index_dir: str,
    terms: list[str],
    mode: str = "and",
    id_col: str = "doc_id",
) -> Dataset:
    """Boolean retrieval over the bucket-partitioned index, reading ONLY
    the buckets the query terms hash into.

    Returns ``(doc_id, n_matched, total_tf)``: ``mode="and"`` keeps docs
    matching every distinct query term, ``"or"`` any.  Exactness does not
    depend on bucket layout (pytest law, like IVF's layout-independence):
    pruning only skips buckets that by construction hold none of the
    query's postings."""
    import json
    import os

    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    tset = sorted(set(terms))
    buckets = sorted({_term_bucket(t, meta["num_buckets"]) for t in tset})

    from pyarrow import fs as pafs

    try:
        filesystem, base = pafs.FileSystem.from_uri(os.path.join(index_dir, "data"))
    except (ValueError, pa.ArrowInvalid):
        filesystem, base = pafs.LocalFileSystem(), os.path.join(index_dir, "data")
    scheme = index_dir.split("://", 1)[0] + "://" if "://" in index_dir else ""
    paths = []
    for b in buckets:
        d = f"{base}/bucket={b}"
        if filesystem.get_file_info(d).type == pafs.FileType.Directory:
            infos = filesystem.get_file_info(pafs.FileSelector(d))
            paths.extend(
                sorted(scheme + i.path for i in infos if i.path.endswith(".parquet"))
            )
    if not paths:
        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_matched": pa.array([], pa.int64()),
                    "total_tf": pa.array([], pa.int64()),
                }
            )
        )

    probed = rd.read_parquet(paths, columns=["term", id_col, "tf"])

    def keep(t: pa.Table) -> pa.Table:
        # a bucket holds every term that hashes to it; drop non-query rows
        return t.filter(pc.is_in(t["term"], value_set=pa.array(tset, pa.string())))

    # postings are unique per (term, doc): Count = distinct terms matched
    agg = (
        probed.map_batches(keep, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Count(alias_name="n_matched"), Sum("tf", alias_name="total_tf"))
    )
    if mode == "and":
        need = len(tset)
        agg = agg.map_batches(
            lambda t: t.filter(pc.equal(t["n_matched"], need)), batch_format="pyarrow"
        )
    return agg.select_columns([id_col, "n_matched", "total_tf"])
