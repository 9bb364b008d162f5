"""M7-M10 BERT path: WordPiece tokenizer, feature builder semantics
(truncation vs chunk-and-stitch), frozen tiny-BERT encode + CRF decode, and
the actor-pool stage (SURVEY.md §2 M7/M8/M9/M10)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ner_ray import schemas
from ner_ray.functions import wordpiece as wp
from ner_ray.stages.tagger import BertTagger, RuleTagger, tag_transcripts
from ner_ray.state.bert import BERT_LABELS, FrozenTinyBert, corpus_words

VOCAB = wp.build_wordpiece_vocab(corpus_words())


def _mk_batch(texts, conv="c1"):
    return pa.table(
        {
            "conv_id": pa.array([conv] * len(texts), pa.string()),
            "turn_idx": pa.array(range(len(texts)), pa.int32()),
            "text": pa.array(texts, pa.string()),
        }
    )


class TestWordPiece:
    def test_offsets_cover_words(self):
        text = "Alice Chen works at Wayne Enterprises."
        toks = wp.tokenize(text, VOCAB)
        for t in toks:
            if t.piece not in (wp.UNK_TOKEN,):
                assert text[t.start : t.end].lower() == t.piece.removeprefix("##")

    def test_continuation_pieces(self):
        toks = wp.tokenize("Enterprises", VOCAB)
        assert len(toks) > 1
        assert not toks[0].is_continuation
        assert all(t.is_continuation for t in toks[1:])
        assert all(t.piece.startswith("##") for t in toks[1:])

    def test_cjk_isolated_per_char(self):
        toks = wp.tokenize("南京大学", VOCAB)
        assert [t.piece for t in toks] == ["南", "京", "大", "学"]
        assert [(t.start, t.end) for t in toks] == [(0, 1), (1, 2), (2, 3), (3, 4)]

    def test_unk_covers_whole_word(self):
        toks = wp.tokenize("Ωmega", VOCAB)  # Ω not in vocab -> whole word UNK
        assert toks == [wp.Token(wp.UNK_TOKEN, 0, 5)]

    def test_punctuation_split(self):
        toks = wp.tokenize("done.", VOCAB)
        assert [t.piece for t in toks] == ["done", "."]

    def test_greedy_longest_match(self):
        # "works" (<=6 chars) is a whole-word vocab entry; greedy matching
        # must take it in one piece, not char by char.
        toks = wp.tokenize("works", VOCAB)
        assert [t.piece for t in toks] == ["works"]

    def test_batch_equals_per_text(self):
        # tokenize_batch joins the batch and runs ONE numpy pass; must be
        # token-for-token (piece + offsets + continuation) equal to the
        # per-text path, including empties and texts containing newlines.
        texts = [
            "Alice Chen works at Acme Corp.",
            "",
            "南京大学 is in 南京.",
            "line one\nline two done.",
            "Ωmega  spaced\tout",
            " leading and trailing ",
        ]
        batch = wp.tokenize_batch(texts, VOCAB)
        single = [wp.tokenize(t, VOCAB) for t in texts]
        assert batch == single
        # offsets are LOCAL to each text, not the joined string
        for t, toks in zip(texts, batch):
            for tok in toks:
                assert 0 <= tok.start <= tok.end <= len(t)


class TestBertTagger:
    def test_ascii_matches_rule_tagger(self):
        texts = [
            "Alice Chen works at Acme Corp.",
            "Bob Okafor visited Oslo.",
            "Globex announced a partnership with Initech.",
        ]
        b = BertTagger()(_mk_batch(texts)).to_pylist()
        r = RuleTagger()(_mk_batch(texts)).to_pylist()
        key = lambda rows: {(x["turn_idx"], x["surface"], x["type"], x["start"]) for x in rows}
        assert key(b) == key(r)

    def test_mentions_schema_and_offsets(self):
        t = BertTagger()(_mk_batch(["Fatima Noor is based in Cape Town."]))
        assert t.schema.equals(schemas.MENTIONS)
        for row in t.to_pylist():
            assert row["end"] - row["start"] == len(row["surface"])

    def test_deterministic(self):
        b = _mk_batch(["Erik Larsen joined Globex after leaving Initech."])
        assert BertTagger()(b).equals(BertTagger()(b))

    def test_strict_truncation_at_max_seq(self):
        # strict mode reproduces the reference's silent truncation at
        # max_seq_length (M8); the entity beyond the cap is lost.
        filler = "the plan " * 70  # 140 wordpieces > the 126-piece cap
        text = filler + "Alice Chen works at Acme Corp."
        strict = BertTagger(strict_reference_mode=True)(_mk_batch([text])).to_pylist()
        loose = BertTagger()(_mk_batch([text])).to_pylist()
        assert {r["surface"] for r in strict} == set()
        assert {r["surface"] for r in loose} == {"Alice Chen", "Acme Corp"}

    def test_chunk_stitch_equals_single_pass_short_text(self):
        text = "Deng Wei met Carol Diaz to review the plan."
        small = BertTagger(max_seq_length=8)(_mk_batch([text])).to_pylist()
        full = BertTagger()(_mk_batch([text])).to_pylist()
        # chunking may split words across segments only at piece boundaries;
        # entities wholly inside a chunk survive
        assert {r["surface"] for r in full} == {"Deng Wei", "Carol Diaz"}
        assert {r["surface"] for r in small} >= {"Deng Wei"}

    def test_softmax_vs_crf_decode_paths(self):
        b = _mk_batch(["Alice Chen works at Acme Corp."])
        crf = BertTagger(decode="crf")(b).to_pylist()
        soft = BertTagger(decode="softmax")(b).to_pylist()
        assert {r["surface"] for r in crf} == {r["surface"] for r in soft} == {
            "Alice Chen", "Acme Corp",
        }

    def test_tags_output(self):
        t = BertTagger(output="tags")(_mk_batch(["Oslo is nice."]))
        assert t.schema.equals(schemas.TAGS)
        row = t.to_pylist()[0]
        assert row["tags"][0] == "B-LOC"


class TestFrozenTinyBert:
    def test_encode_shapes_and_mask(self):
        m = FrozenTinyBert.create()
        ids = np.zeros((2, 6), dtype=np.int64)
        ids[0, :4] = [1, 2, 3, 4]
        mask = ids > 0
        out = m.encode(ids, mask)
        assert out.shape == (2, 6, m.hidden)
        e = m.emissions(ids, mask)
        assert e.shape == (2, 6, len(BERT_LABELS))

    def test_seeded_reproducible(self):
        a, b = FrozenTinyBert.create(), FrozenTinyBert.create()
        assert np.array_equal(a.word_emb, b.word_emb)
        assert a.vocab_list == b.vocab_list


@pytest.mark.usefixtures("ray_session")
class TestBertStage:
    def test_actor_pool_with_broadcast_model(self, small_transcripts):
        import ray

        model_ref = ray.put(FrozenTinyBert.create())
        ds = rd.from_arrow(small_transcripts)
        out = tag_transcripts(
            ds, tagger="bert", batch_size=256, concurrency=2, model_ref=model_ref
        ).to_pandas()
        assert len(out) > 50
        assert set(out.columns) == set(schemas.MENTIONS.names)

    def test_pr_vs_rule_golden(self, small_transcripts):
        """BERT path P/R vs the pinned rule-tagger golden on the fixture
        corpus (ASCII is exact; bounded CJK prior ambiguity documented in
        state/bert.py)."""
        ds = rd.from_arrow(small_transcripts)
        rule = tag_transcripts(ds, tagger="rule").to_pandas()
        bert = tag_transcripts(ds, tagger="bert").to_pandas()
        key = lambda df: set(zip(df.conv_id, df.turn_idx, df.surface, df.type, df.start))
        R, B = key(rule), key(bert)
        tp = len(R & B)
        assert tp / len(B) > 0.80 and tp / len(R) > 0.85