"""E2 — distributed conlleval: span-level P/R/F1 over a tagged corpus.

The reference shells out to perl ``conlleval.pl`` on a driver-side text file
(``eval.py`` (R), SURVEY.md §2 E2/S5).  Here the corpus stays distributed:
each block folds its (gold, pred) tag sequences to spans and emits partial
``(type, tp, n_pred, n_gold)`` counts; ``Dataset.sum`` over the tiny partial
table is the only cross-block step — the combiner pattern, no shuffle of tag
sequences.

Also provides ``tag_bio_corpus``: the reference's test entry (corpus in ->
pred tags out), adapting BIO_CORPUS rows to the transcript taggers.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

from ner_ray.functions.metrics import SpanEval
from ner_ray.utils import pool_size


def tag_bio_corpus(ds: Dataset, tagger: str = "rule", **tagger_kwargs) -> Dataset:
    """Run a tagger over BIO_CORPUS rows; output adds ``pred_tags``.

    Mirrors the reference test flow (``main.py --mode test`` (R)): sentences
    are re-joined to text, tagged through the same actor-pool stage the
    transcript path uses, and the predicted char tags aligned back.
    """
    from ner_ray.stages.tagger import TAGGERS

    cls = TAGGERS[tagger]

    class CorpusTagger:
        def __init__(self):
            self.tagger = cls(output="tags", **tagger_kwargs)

        def __call__(self, batch: pa.Table) -> pa.Table:
            chars_col = batch["chars"].to_pylist()
            texts = ["".join(cs) for cs in chars_col]
            shim = pa.table(
                {
                    "conv_id": pa.array([str(s) for s in batch["sentence_id"].to_pylist()]),
                    "turn_idx": pa.array([0] * batch.num_rows, pa.int32()),
                    "text": pa.array(texts, pa.string()),
                }
            )
            tagged = self.tagger(shim)
            return batch.append_column("pred_tags", tagged["tags"])

    return ds.map_batches(CorpusTagger, batch_format="pyarrow", concurrency=pool_size())


def evaluate_tags(
    ds: Dataset, gold_col: str = "tags", pred_col: str = "pred_tags"
) -> dict:
    """Distributed span P/R/F1: per-block partial counts -> tiny sum."""

    def partial(batch: pa.Table) -> pa.Table:
        ev = SpanEval()
        for gold, pred in zip(batch[gold_col].to_pylist(), batch[pred_col].to_pylist()):
            ev.update(list(gold), list(pred))
        types = sorted(ev.by_type)
        return pa.table(
            {
                "type": pa.array(types, pa.string()),
                "tp": pa.array([ev.by_type[t].tp for t in types], pa.int64()),
                "n_pred": pa.array([ev.by_type[t].n_pred for t in types], pa.int64()),
                "n_gold": pa.array([ev.by_type[t].n_gold for t in types], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    ev = SpanEval()
    for typ, grp in parts.groupby("type"):
        prf = ev._prf(str(typ))
        prf.tp = int(grp["tp"].sum())
        prf.n_pred = int(grp["n_pred"].sum())
        prf.n_gold = int(grp["n_gold"].sum())
        ev.overall.add(prf)
    return ev.report()


def mentions_to_tags(turn_texts: list[str], spans_per_turn: list[list]) -> list[list[str]]:
    """Helper: typed spans -> BIO tag rows (golden construction)."""
    from ner_ray.functions.bio import spans_to_bio

    return [
        spans_to_bio(len(t), [(s, e, typ) for _, typ, s, e in spans])
        for t, spans in zip(turn_texts, spans_per_turn)
    ]
