"""B2/B3 stage tests: order restore, rule + neural taggers (SURVEY.md §5.2)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from ner_ray import schemas
from ner_ray.stages.tagger import NeuralTagger, RuleTagger, tag_transcripts


def _mk_batch(texts, conv="c1"):
    return pa.table(
        {
            "conv_id": pa.array([conv] * len(texts), pa.string()),
            "turn_idx": pa.array(range(len(texts)), pa.int32()),
            "text": pa.array(texts, pa.string()),
        }
    )


class TestRuleTagger:
    def test_simple_mentions(self):
        t = RuleTagger()(_mk_batch(["Alice Chen works at Acme Corp."]))
        assert t.schema.equals(schemas.MENTIONS)
        rows = t.to_pylist()
        assert [(r["surface"], r["type"], r["start"], r["end"]) for r in rows] == [
            ("Alice Chen", "PER", 0, 10),
            ("Acme Corp", "ORG", 20, 29),
        ]

    def test_leftmost_longest_cjk(self):
        # 南京大学 (ORG) must win over prefix 南京 (LOC).
        rows = RuleTagger()(_mk_batch(["张伟在南京大学。"])).to_pylist()
        assert [(r["surface"], r["type"]) for r in rows] == [
            ("张伟", "PER"),
            ("南京大学", "ORG"),
        ]

    def test_ascii_word_boundary(self):
        rows = RuleTagger()(_mk_batch(["the climate in Lima is mild, NJUsers"])).to_pylist()
        assert [(r["surface"], r["type"]) for r in rows] == [("Lima", "LOC")]

    def test_tags_output_matches_fold(self):
        t = RuleTagger(output="tags")(_mk_batch(["Bob Okafor visited Oslo."]))
        assert t.schema.equals(schemas.TAGS)
        row = t.to_pylist()[0]
        assert row["tags"][0] == "B-PER"
        assert row["tags"][10] == "O"
        assert row["tags"][19] == "B-LOC"

    def test_turn_mentions_output(self):
        t = RuleTagger(output="turn_mentions")(_mk_batch(["Bob Okafor visited Oslo."]))
        assert t.schema.equals(schemas.TURN_MENTIONS)
        ms = t.to_pylist()[0]["mentions"]
        assert [m["surface"] for m in ms] == ["Bob Okafor", "Oslo"]

    def test_empty_batch(self):
        t = RuleTagger()(_mk_batch([]))
        assert t.num_rows == 0
        assert t.schema.equals(schemas.MENTIONS)


class TestNeuralTagger:
    def test_cjk_entities_decoded(self):
        rows = NeuralTagger()(_mk_batch(["张伟在南京。"])).to_pylist()
        got = {(r["surface"], r["type"]) for r in rows}
        assert ("张伟", "PER") in got
        assert ("南京", "LOC") in got

    def test_deterministic(self):
        b = _mk_batch(["张伟在南京大学。", "李娜 visited 北京."])
        t1 = NeuralTagger()(b)
        t2 = NeuralTagger()(b)
        assert t1.equals(t2)

    def test_long_turn_chunk_and_stitch(self):
        text = ("x" * 300) + "南京"  # crosses max_seq_len=256 boundary
        t = NeuralTagger(output="tags")(_mk_batch([text]))
        row = t.to_pylist()[0]
        assert len(row["tags"]) == len(text)

    def test_strict_reference_mode_truncates(self):
        text = ("x" * 300) + "南京"
        t = NeuralTagger(output="tags", strict_reference_mode=True, max_seq_len=128)(
            _mk_batch([text])
        )
        row = t.to_pylist()[0]
        assert len(row["tags"]) == 128  # reference truncation semantics

    def test_empty_text(self):
        t = NeuralTagger()(_mk_batch(["", "南京"]))
        assert all(r["surface"] == "南京" for r in t.to_pylist())


@pytest.mark.usefixtures("ray_session")
class TestTagStage:
    def test_actor_pool_stage(self, small_transcripts):
        ds = rd.from_arrow(small_transcripts)
        out = tag_transcripts(ds, tagger="rule", batch_size=256, concurrency=2)
        t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
        assert t.num_rows > 50
        assert set(t.column_names) == set(schemas.MENTIONS.names)
        # every mention surface is a gazetteer entry found at its offsets
        for r in t.slice(0, 50).to_pylist():
            assert r["end"] - r["start"] == len(r["surface"])

    def test_order_restore_text_equality(self, small_transcripts):
        """Per-turn text equality under stable turn ordering (BASELINE.json:15)."""
        from ner_ray.stages.order_restore import sort_conversations

        ds = rd.from_arrow(small_transcripts)
        restored = sort_conversations(ds).to_pandas()
        expected = (
            small_transcripts.to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert (restored["conv_id"] == expected["conv_id"]).all()
        assert (restored["turn_idx"] == expected["turn_idx"]).all()
        assert (restored["text"] == expected["text"]).all()
