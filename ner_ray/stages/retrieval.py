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
