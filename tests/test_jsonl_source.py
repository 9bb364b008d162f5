"""JSONL transcript source/sink: both layouts normalize to the mandated
schema and round-trip losslessly."""

from __future__ import annotations

import json

import pytest
import ray.data as rd

from ner_ray import schemas
from ner_ray.fixtures.transcripts import TranscriptConfig, make_transcripts_table
from ner_ray.sources.transcripts_jsonl import (
    read_transcripts_jsonl,
    write_transcripts_jsonl,
)


@pytest.mark.usefixtures("ray_session")
class TestJsonlSource:
    def test_turn_lines_roundtrip(self, tmp_path):
        t = make_transcripts_table(TranscriptConfig(n_convs=20))
        out = write_transcripts_jsonl(rd.from_arrow(t), str(tmp_path / "jl"))
        assert out
        back = read_transcripts_jsonl([str(p) for p in out]).to_pandas()
        orig = t.to_pandas()
        key = ["conv_id", "turn_idx"]
        back = back.sort_values(key).reset_index(drop=True)
        orig = orig.sort_values(key).reset_index(drop=True)
        assert back["text"].equals(orig["text"])
        assert back["role"].equals(orig["role"])
        assert (back["ts"] == orig["ts"]).all()

    def test_schema_is_canonical(self, tmp_path):
        p = tmp_path / "x.jsonl"
        p.write_text(
            json.dumps({"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi", "ts": 1700000000})
            + "\n"
        )
        ds = read_transcripts_jsonl(str(p))
        t = ds.to_pandas()
        assert list(t.columns) == list(schemas.TRANSCRIPTS.names)
        assert str(t["ts"].iloc[0]) == "2023-11-14 22:13:20"  # epoch-seconds heuristic
        assert t["tool"].iloc[0] == ""

    def test_conversation_layout(self, tmp_path):
        p = tmp_path / "conv.jsonl"
        conv = {
            "conv_id": "c9",
            "turns": [
                {"role": "user", "text": "Alice Chen works at NJU."},
                {"role": "assistant", "text": "noted.", "tool": None},
            ],
        }
        p.write_text(json.dumps(conv) + "\n")
        t = read_transcripts_jsonl(str(p), layout="conversations").to_pandas()
        assert list(t["turn_idx"]) == [0, 1]
        assert t["text"].iloc[0] == "Alice Chen works at NJU."

    def test_feeds_kg_pipeline(self, tmp_path):
        from ner_ray.pipelines.kg import KGConfig, build_kg

        t = make_transcripts_table(TranscriptConfig(n_convs=30))
        out = write_transcripts_jsonl(rd.from_arrow(t), str(tmp_path / "jl2"))
        tx = read_transcripts_jsonl([str(p) for p in out])
        res = build_kg(tx.select_columns(["conv_id", "turn_idx", "text"]), KGConfig())
        assert res.triples.count() > 0