"""Graph analytics (degree, PageRank) + hopping window / sampling / heavy
hitters operators."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ner_ray.stages.graph import degree_stats, edge_weights, pagerank
from ner_ray.stages.relational import deterministic_sample, heavy_hitters, hopping_window


def _triples(rows):
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows], pa.string()),
                "obj": pa.array([r[1] for r in rows], pa.string()),
                "n_support": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).repartition(2)


@pytest.mark.usefixtures("ray_session")
class TestGraph:
    def test_edge_weights_merge_across_blocks(self):
        e = edge_weights(_triples([("a", "b", 2), ("a", "b", 3), ("b", "c", 1)]))
        e = e.sort_values(["subj", "obj"]).reset_index(drop=True)
        assert list(e.itertuples(index=False, name=None)) == [("a", "b", 5), ("b", "c", 1)]

    def test_degree_stats(self):
        d = degree_stats(_triples([("a", "b", 1), ("a", "c", 1), ("b", "c", 1)]))
        row = d.set_index("node")
        assert row.loc["a", "out_degree"] == 2 and row.loc["a", "in_degree"] == 0
        assert row.loc["c", "in_degree"] == 2
        assert d.iloc[0]["node"] in ("a", "c")  # highest degree first

    def test_pagerank_vs_dense_reference(self):
        rows = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1), ("a", "c", 2)]
        pr = pagerank(_triples(rows), n_iter=100, tol=0).set_index("node")["rank"]
        # dense power iteration reference
        nodes = ["a", "b", "c"]
        M = np.zeros((3, 3))
        for s, o, w in rows:
            M[nodes.index(o), nodes.index(s)] += w
        M /= M.sum(axis=0, keepdims=True)
        r = np.full(3, 1 / 3)
        for _ in range(100):
            r = 0.15 / 3 + 0.85 * (M @ r)
        for i, n in enumerate(nodes):
            assert pr[n] == pytest.approx(r[i], abs=1e-6)

    def test_pagerank_deterministic_and_sums_to_one(self):
        rows = [("a", "b", 1), ("b", "a", 1), ("c", "a", 4)]
        p1 = pagerank(_triples(rows))
        p2 = pagerank(_triples(rows))
        assert p1.equals(p2)
        assert p1["rank"].sum() == pytest.approx(1.0, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
class TestWindowSampleHH:
    def test_hopping_window_covers_each_event_twice(self):
        ts = pa.array(
            [1_700_000_000_000_000 + i * 60_000_000 for i in range(100)], pa.timestamp("us")
        )
        ds = rd.from_arrow(pa.table({"ts": ts, "v": pa.array(range(100), pa.int64())}))
        out = hopping_window(ds, "ts", period_minutes=30, size_periods=2).to_pandas()
        assert len(out) == 200
        per_event = out.groupby("v").size()
        assert (per_event == 2).all()
        # each event's ts falls inside [window_start, window_start + 60min)
        delta = (out["ts"] - out["window_start"]).dt.total_seconds()
        assert ((delta >= 0) & (delta < 3600)).all()

    def test_deterministic_sample_stable_fraction(self):
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(5000), pa.int64())}))
        a = deterministic_sample(ds, "doc_id", keep_hex_below="20").to_pandas()
        b = deterministic_sample(ds, "doc_id", keep_hex_below="20").to_pandas()
        assert a.equals(b)
        assert 0.09 < len(a) / 5000 < 0.16  # ~12.5%

    def test_heavy_hitters_exact_vs_groupby(self):
        rng = np.random.default_rng(5)
        vals = rng.zipf(1.5, size=20000) % 500
        ds = rd.from_arrow(pa.table({"u": pa.array(vals, pa.int64())})).repartition(8)
        hh = heavy_hitters(ds, "u", k=10, per_block_cap=100)
        exact = (
            pd.Series(vals).value_counts().rename_axis("u").reset_index(name="n")
            .sort_values(["n", "u"], ascending=[False, True], kind="mergesort")
            .head(10).reset_index(drop=True)
        )
        assert list(hh["u"]) == list(exact["u"])
        assert list(hh["n"]) == list(exact["n"])