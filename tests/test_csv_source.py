"""CSV transcript source (sources/transcripts_csv.py): round-trip equality
against the canonical fixture, schema pinning, and the epoch-unit
heuristic."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestCsvSource:
    def _fixture(self):
        from ner_ray.pipelines.queries import transcripts_path_for

        return pq.read_table(transcripts_path_for(SF)).to_pandas()

    def test_roundtrip_equals_parquet(self, tmp_path):
        from ner_ray.sources.transcripts_csv import read_transcripts_csv

        df = self._fixture()
        out = df.copy()
        # ship ts as integer micros (one of the accepted encodings)
        out["ts"] = out["ts"].astype("int64")
        p = tmp_path / "tx.csv"
        out.to_csv(p, index=False)

        got = (
            read_transcripts_csv(str(p))
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        # CSV cannot distinguish "" from NULL; the source normalizes both
        # to "" (the canonical tool encoding), so align the expectation
        want["tool"] = want["tool"].fillna("")
        pd.testing.assert_frame_equal(got[want.columns], want)

    def test_schema_is_canonical(self, tmp_path):
        from ner_ray import schemas
        from ner_ray.sources.transcripts_csv import read_transcripts_csv

        df = self._fixture().head(20)
        df["ts"] = df["ts"].astype("int64")
        p = tmp_path / "tx.csv"
        df.to_csv(p, index=False)
        ds = read_transcripts_csv(str(p))
        assert ds.schema().base_schema.equals(schemas.TRANSCRIPTS)

    def test_epoch_seconds_heuristic(self, tmp_path):
        from ner_ray.sources.transcripts_csv import read_transcripts_csv

        p = tmp_path / "tx.csv"
        pd.DataFrame(
            {
                "conv_id": ["c1", "c1"],
                "turn_idx": [0, 1],
                "role": ["user", "assistant"],
                "text": ["hi", "hello"],
                "tool": ["", ""],
                "ts": [1_700_000_000, 1_700_000_005],  # epoch SECONDS
            }
        ).to_csv(p, index=False)
        got = read_transcripts_csv(str(p)).to_pandas().sort_values("turn_idx")
        span = (got["ts"].iloc[1] - got["ts"].iloc[0]).total_seconds()
        assert span == 5.0

    def test_feeds_kg_pipeline(self, tmp_path):
        """The CSV-read corpus must produce the SAME flagship triples as
        the parquet-read corpus (format-agnosticism end-to-end)."""
        from ner_ray.pipelines.kg import KGConfig, build_kg, read_transcripts
        from ner_ray.pipelines.queries import transcripts_path_for
        from ner_ray.sources.transcripts_csv import read_transcripts_csv

        df = self._fixture()
        df["ts"] = df["ts"].astype("int64")
        p = tmp_path / "tx.csv"
        df.to_csv(p, index=False)

        a = (
            build_kg(read_transcripts_csv(str(p)), KGConfig())
            .triples.to_pandas()
            .drop(columns=["conv_ids"])
            .sort_values(["subj", "pred", "obj"])
            .reset_index(drop=True)
        )
        b = (
            build_kg(read_transcripts(transcripts_path_for(SF)), KGConfig())
            .triples.to_pandas()
            .drop(columns=["conv_ids"])
            .sort_values(["subj", "pred", "obj"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
