"""Unit tests for the pure operator kernels (SURVEY.md §5.2 item 1)."""

from __future__ import annotations

import numpy as np
import pytest

from ner_ray.functions.bio import fold_bio, spans_to_bio
from ner_ray.functions.metrics import SpanEval, triple_prf
from ner_ray.functions.normalize import (
    ENG,
    NUM,
    UNK,
    chars_to_ids,
    normalize_char,
    normalize_surface,
)
from ner_ray.functions.viterbi import (
    brute_force_decode,
    viterbi_decode_batch,
    viterbi_decode_single,
)


class TestNormalize:
    def test_digits(self):
        for c in "0123456789０９":  # incl. full-width digits (str.isdigit)
            assert normalize_char(c) == NUM

    def test_ascii_letters(self):
        for c in "azAZqX":
            assert normalize_char(c) == ENG

    def test_passthrough(self):
        for c in ["张", "南", " ", ".", "é", "😀", "-"]:
            assert normalize_char(c) == c

    def test_ids_with_unk(self):
        w2i = {UNK: 1, NUM: 2, ENG: 3, "张": 4}
        assert chars_to_ids(list("a7张奇"), w2i) == [3, 2, 4, 1]

    def test_surface_key(self):
        assert normalize_surface("ACME corp.") == normalize_surface("Acme Corp")
        assert normalize_surface("  A.  Chen ") == "a. chen"


class TestBIOFold:
    def test_simple_span(self):
        chars = list("张伟去南京")
        tags = ["B-PER", "I-PER", "O", "B-LOC", "I-LOC"]
        assert fold_bio(chars, tags) == [("张伟", "PER", 0, 2), ("南京", "LOC", 3, 5)]

    def test_orphan_I_opens(self):
        spans = fold_bio(list("abc"), ["O", "I-LOC", "I-LOC"])
        assert spans == [("bc", "LOC", 1, 3)]

    def test_orphan_I_type_switch(self):
        spans = fold_bio(list("abcd"), ["B-PER", "I-LOC", "I-LOC", "O"])
        assert spans == [("a", "PER", 0, 1), ("bc", "LOC", 1, 3)]

    def test_adjacent_spans(self):
        spans = fold_bio(list("abcd"), ["B-PER", "I-PER", "B-PER", "I-PER"])
        assert spans == [("ab", "PER", 0, 2), ("cd", "PER", 2, 4)]

    def test_span_at_end(self):
        spans = fold_bio(list("xy"), ["B-ORG", "I-ORG"])
        assert spans == [("xy", "ORG", 0, 2)]

    def test_roundtrip(self):
        tags = spans_to_bio(6, [(0, 2, "PER"), (3, 6, "ORG")])
        assert tags == ["B-PER", "I-PER", "O", "B-ORG", "I-ORG", "I-ORG"]
        assert fold_bio(list("abcdef"), tags) == [
            ("ab", "PER", 0, 2),
            ("def", "ORG", 3, 6),
        ]


class TestViterbi:
    @pytest.mark.parametrize("seed", range(8))
    def test_matches_brute_force(self, seed):
        rng = np.random.default_rng(seed)
        L, T = int(rng.integers(1, 6)), 4
        logits = rng.normal(size=(L, T))
        trans = rng.normal(size=(T, T))
        assert viterbi_decode_single(logits, trans) == brute_force_decode(logits, trans)

    def test_batch_matches_single_with_padding(self):
        rng = np.random.default_rng(7)
        T = 7
        lens = np.array([1, 4, 6, 3, 6])
        Lmax = int(lens.max())
        logits = rng.normal(size=(len(lens), Lmax, T))
        trans = rng.normal(size=(T, T))
        out = viterbi_decode_batch(logits, lens, trans)
        for b, ln in enumerate(lens):
            single = viterbi_decode_single(logits[b, :ln], trans)
            assert out[b, :ln].tolist() == single
            assert (out[b, ln:] == -1).all()

    def test_zero_length_row(self):
        out = viterbi_decode_batch(np.zeros((2, 3, 4)), np.array([0, 3]), np.zeros((4, 4)))
        assert (out[0] == -1).all()
        assert (out[1] != -1).all()


class TestMetrics:
    def test_span_eval_exact(self):
        ev = SpanEval()
        gold = ["B-PER", "I-PER", "O", "B-LOC"]
        ev.update(gold, gold)
        rpt = ev.report()
        assert rpt["overall"]["f1"] == 1.0
        assert rpt["PER"]["precision"] == 1.0

    def test_span_eval_boundary_miss(self):
        ev = SpanEval()
        ev.update(["B-PER", "I-PER", "O"], ["B-PER", "O", "O"])
        assert ev.overall.tp == 0
        assert ev.overall.n_pred == 1
        assert ev.overall.n_gold == 1

    def test_triple_prf(self):
        prf = triple_prf({("a", "r", "b"), ("c", "r", "d")}, {("a", "r", "b")})
        assert prf.tp == 1 and prf.n_pred == 2 and prf.n_gold == 1


class TestTranscriptFixture:
    def test_deterministic_and_shuffled(self):
        from ner_ray.fixtures.transcripts import TranscriptConfig, make_transcripts_table

        cfg = TranscriptConfig(n_convs=20, seed=42)
        t1 = make_transcripts_table(cfg)
        t2 = make_transcripts_table(cfg)
        assert t1.equals(t2)
        # mandated schema
        from ner_ray import schemas

        assert t1.schema.equals(schemas.TRANSCRIPTS)
        # written shuffled: turn_idx column is not sorted
        ti = t1["turn_idx"].to_pylist()
        assert ti != sorted(ti)

    def test_mega_conversation_skew(self):
        from ner_ray.fixtures.transcripts import TranscriptConfig, make_transcripts_table

        t = make_transcripts_table(TranscriptConfig(n_convs=50, seed=42))
        counts = {}
        for c in t["conv_id"].to_pylist():
            counts[c] = counts.get(c, 0) + 1
        assert counts["conv-000000"] == max(counts.values())
        assert counts["conv-000000"] >= 0.05 * t.num_rows

    def test_ts_consistent_with_turn_idx(self):
        from ner_ray.fixtures.transcripts import TranscriptConfig, make_transcripts_table

        t = (
            make_transcripts_table(TranscriptConfig(n_convs=10, seed=42))
            .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
            .to_pylist()
        )
        prev = {}
        for row in t:
            key = row["conv_id"]
            if key in prev:
                assert row["ts"] > prev[key]
            prev[key] = row["ts"]
