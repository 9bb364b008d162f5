"""B4 tests: pattern triples, window semantics, salted-chunk exactness."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from ner_ray import schemas
from ner_ray.stages.order_restore import add_salted_chunks
from ner_ray.stages.tagger import RuleTagger
from ner_ray.stages.triples import (
    extract_pattern_triples,
    extract_triples,
    make_window_extractor,
)


def _turn_mentions(turns: list[tuple[str, int, str]]) -> pa.Table:
    batch = pa.table(
        {
            "conv_id": pa.array([c for c, _, _ in turns], pa.string()),
            "turn_idx": pa.array([t for _, t, _ in turns], pa.int32()),
            "text": pa.array([x for _, _, x in turns], pa.string()),
        }
    )
    return RuleTagger(output="turn_mentions")(batch)


class TestPatternTriples:
    def test_lexicon_hit(self):
        tm = _turn_mentions([("c1", 0, "Alice Chen works at Acme Corp.")])
        rows = extract_pattern_triples(tm).to_pylist()
        assert rows == [
            {
                "subj": "Alice Chen",
                "pred": "works_at",
                "obj": "Acme Corp",
                "conv_id": "c1",
                "turn_idx": 0,
                "confidence": 1.0,
            }
        ]

    def test_cooccur_fallback(self):
        tm = _turn_mentions([("c1", 1, "Oslo and Kyoto came up.")])
        rows = extract_pattern_triples(tm).to_pylist()
        assert [(r["subj"], r["pred"], r["obj"]) for r in rows] == [
            ("Oslo", "co_occurs_with", "Kyoto")
        ]
        assert rows[0]["confidence"] == pytest.approx(0.8)

    def test_three_mentions_adjacent_pairs(self):
        tm = _turn_mentions([("c1", 2, "Carol Diaz joined NJU after leaving Globex.")])
        preds = [(r["subj"], r["pred"], r["obj"]) for r in extract_pattern_triples(tm).to_pylist()]
        assert ("Carol Diaz", "joined", "NJU") in preds
        assert ("NJU", "left", "Globex") in preds

    def test_no_mentions_no_rows(self):
        tm = _turn_mentions([("c1", 0, "nothing here."), ("c1", 1, "Oslo alone.")])
        assert extract_pattern_triples(tm).num_rows == 0


class TestWindowExtractor:
    def _group(self, turns, owned=None):
        tm = _turn_mentions(turns)
        n = tm.num_rows
        owned = owned or [True] * n
        return tm.drop_columns(["text"]).append_column(
            "owned", pa.array(owned, pa.bool_())
        )

    def test_window_pairs(self):
        g = self._group(
            [("c1", 0, "Oslo is nice."), ("c1", 1, "Kyoto too."), ("c1", 3, "Lima far.")]
        )
        rows = make_window_extractor(3)(g).to_pylist()
        got = {(r["subj"], r["obj"], r["turn_idx"]) for r in rows}
        # 0->1 (dt=1), 1->3 (dt=2); 0->3 is dt=3 >= window
        assert got == {("Oslo", "Kyoto", 0), ("Kyoto", "Lima", 1)}

    def test_unowned_anchor_skipped(self):
        g = self._group(
            [("c1", 0, "Oslo is nice."), ("c1", 1, "Kyoto too.")], owned=[False, True]
        )
        assert make_window_extractor(3)(g).num_rows == 0


@pytest.mark.usefixtures("ray_session")
class TestSaltedWindowExactness:
    def test_chunked_equals_naive(self, small_transcripts):
        """Salted-chunk extraction == single-group extraction (no dup/loss at
        chunk edges) — SURVEY.md §7 hard part 1."""
        ds = rd.from_arrow(small_transcripts)
        tm = ds.map_batches(
            RuleTagger, fn_constructor_kwargs={"output": "turn_mentions"},
            batch_format="pyarrow", concurrency=2,
        )
        window = 3

        def run(chunk_turns):
            out = extract_triples(tm, window=window, chunk_turns=chunk_turns).to_pandas()
            return sorted(map(tuple, out.values.tolist()))

        # tiny chunks (lots of edges) vs chunks larger than any conversation
        assert run(4) == run(100000)

    def test_mega_conv_fanout(self, small_transcripts):
        """add_salted_chunks splits the mega-conversation into many groups."""
        ds = rd.from_arrow(small_transcripts)
        chunked = add_salted_chunks(ds, chunk_turns=8, window=3).to_pandas()
        mega = chunked[chunked.conv_id == "conv-000000"]
        assert mega.chunk.nunique() > 3
        # lookahead rows exist and are flagged
        assert (~mega.owned).sum() > 0
        # each (chunk, turn) appears at most twice (owned + one lookahead copy)
        dup = mega.groupby(["chunk", "turn_idx"]).size().max()
        assert dup == 1  # within a chunk each turn appears once


class TestPatternVectorizedEquality:
    """The vectorized extract_pattern_triples must match the row-loop
    reference exactly (incl. tie ordering) on a real tagged corpus."""

    def test_matches_row_reference_on_fixture(self, small_transcripts):
        import pandas as pd

        from ner_ray.stages.triples import _extract_pattern_triples_rows

        tagged = RuleTagger(output="turn_mentions")(small_transcripts)
        fast = extract_pattern_triples(tagged).to_pandas()
        ref = _extract_pattern_triples_rows(tagged).to_pandas()
        key = ["conv_id", "turn_idx", "subj", "obj"]
        pd.testing.assert_frame_equal(
            fast.sort_values(key).reset_index(drop=True),
            ref.sort_values(key).reset_index(drop=True),
        )

    def test_unsorted_mentions_sorted_per_row(self):
        # mentions given out of start order must pair in start order
        tm = pa.table(
            {
                "conv_id": pa.array(["c1"], pa.string()),
                "turn_idx": pa.array([0], pa.int32()),
                "text": pa.array(["Oslo and Kyoto and Lima."], pa.string()),
                "mentions": pa.array(
                    [
                        [
                            {"surface": "Lima", "type": "LOC", "start": 19, "end": 23},
                            {"surface": "Oslo", "type": "LOC", "start": 0, "end": 4},
                            {"surface": "Kyoto", "type": "LOC", "start": 9, "end": 14},
                        ]
                    ]
                ),
            }
        )
        out = [(r["subj"], r["obj"]) for r in extract_pattern_triples(tm).to_pylist()]
        assert out == [("Oslo", "Kyoto"), ("Kyoto", "Lima")]


@pytest.mark.usefixtures("ray_session")
class TestWindowBruteForceProperty:
    """Randomized corpora (sparse turn gaps, multi-conv, arbitrary block
    splits, random chunk sizes) against a pure-Python brute-force window
    reference — the regression guard for the salted-chunk + bucketed
    groupby machinery."""

    def _random_tm(self, rng, n_convs=6, max_turns=30):
        rows = {"conv_id": [], "turn_idx": [], "text": [], "mentions": []}
        for c in range(n_convs):
            turns = sorted(rng.sample(range(max_turns * 3), rng.randint(1, max_turns)))
            for t in turns:
                n_m = rng.choice([0, 0, 1, 1, 2, 3])
                ms = [
                    {
                        "surface": f"E{rng.randint(0, 9)}",
                        "type": "ORG",
                        "start": 5 * i,
                        "end": 5 * i + 2,
                    }
                    for i in range(n_m)
                ]
                rows["conv_id"].append(f"c{c}")
                rows["turn_idx"].append(t)
                rows["text"].append(" " * (5 * max(n_m, 1)))
                rows["mentions"].append(ms)
        import pyarrow as pa

        from ner_ray import schemas

        return pa.table(
            {
                "conv_id": pa.array(rows["conv_id"], pa.string()),
                "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
                "text": pa.array(rows["text"], pa.string()),
                "mentions": pa.array(rows["mentions"], pa.list_(schemas.MENTION_STRUCT)),
            }
        )

    def _brute_windows(self, tbl, window):
        rows = tbl.to_pylist()
        by_conv: dict = {}
        for r in rows:
            by_conv.setdefault(r["conv_id"], []).append(r)
        out = []
        for conv, rs in by_conv.items():
            rs = sorted(rs, key=lambda r: r["turn_idx"])
            for i, a in enumerate(rs):
                for b in rs[i + 1 :]:
                    if not (0 < b["turn_idx"] - a["turn_idx"] < window):
                        continue
                    for ma in a["mentions"]:
                        for mb in b["mentions"]:
                            out.append(
                                (
                                    ma["surface"],
                                    "co_mentioned_with",
                                    mb["surface"],
                                    conv,
                                    a["turn_idx"],
                                    0.5,
                                )
                            )
        return sorted(out)

    def test_random_corpora_match_brute_force(self):
        import random

        for seed in (1, 7, 23):
            rng = random.Random(seed)
            tbl = self._random_tm(rng)
            window = rng.choice([2, 3, 5])
            chunk_turns = rng.choice([2, 5, 16])
            ds = rd.from_arrow(tbl).repartition(rng.choice([1, 3, 9]))
            got = extract_triples(ds, window=window, chunk_turns=chunk_turns)
            gp = got.to_pandas()
            gp = gp[gp.pred == "co_mentioned_with"]
            got_rows = sorted(
                map(tuple, gp[["subj", "pred", "obj", "conv_id", "turn_idx", "confidence"]]
                    .astype({"confidence": float}).values.tolist())
            )
            assert got_rows == self._brute_windows(tbl, window), (seed, window, chunk_turns)
