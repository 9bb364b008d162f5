"""Span-level P/R/F1 (conlleval semantics) + triple-set P/R.

Re-implements the metric semantics of the reference's evaluation path
(``eval.py`` -> perl ``conlleval.pl`` (R), SURVEY.md §2 E2): a predicted span
counts as correct iff its boundaries AND type exactly match a gold span;
precision = correct/predicted, recall = correct/gold, per entity type and
overall.  Pure functions; the distributed variant aggregates per-block
(tp, fp, fn) partials via Ray Data (see stages.metrics helpers).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from ner_ray.functions.bio import fold_bio


@dataclass
class PRF:
    tp: int = 0
    n_pred: int = 0
    n_gold: int = 0

    @property
    def precision(self) -> float:
        return self.tp / self.n_pred if self.n_pred else 0.0

    @property
    def recall(self) -> float:
        return self.tp / self.n_gold if self.n_gold else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0

    def add(self, other: "PRF") -> None:
        self.tp += other.tp
        self.n_pred += other.n_pred
        self.n_gold += other.n_gold


@dataclass
class SpanEval:
    overall: PRF = field(default_factory=PRF)
    by_type: dict[str, PRF] = field(default_factory=dict)

    def update(self, gold_tags: list[str], pred_tags: list[str]) -> None:
        chars = [""] * len(gold_tags)  # surfaces irrelevant for boundary match
        gold = Counter((t, s, e) for _, t, s, e in fold_bio(chars, gold_tags))
        pred = Counter((t, s, e) for _, t, s, e in fold_bio(chars, pred_tags))
        for (typ, s, e), c in pred.items():
            hit = min(c, gold.get((typ, s, e), 0))
            self._prf(typ).tp += hit
            self.overall.tp += hit
            self._prf(typ).n_pred += c
            self.overall.n_pred += c
        for (typ, _s, _e), c in gold.items():
            self._prf(typ).n_gold += c
            self.overall.n_gold += c

    def _prf(self, typ: str) -> PRF:
        return self.by_type.setdefault(typ, PRF())

    def merge(self, other: "SpanEval") -> None:
        self.overall.add(other.overall)
        for typ, prf in other.by_type.items():
            self._prf(typ).add(prf)

    def report(self) -> dict:
        return {
            "overall": {
                "precision": self.overall.precision,
                "recall": self.overall.recall,
                "f1": self.overall.f1,
            },
            **{
                typ: {"precision": p.precision, "recall": p.recall, "f1": p.f1}
                for typ, p in sorted(self.by_type.items())
            },
        }


def triple_prf(pred: set[tuple], gold: set[tuple]) -> PRF:
    """Set-level P/R for emitted (subj, pred, obj[, ...]) triples — the
    BASELINE.json P/R>=0.95 gate is computed with this."""
    out = PRF()
    out.n_pred = len(pred)
    out.n_gold = len(gold)
    out.tp = len(pred & gold)
    return out
