"""End-to-end KG pipeline tests: linking, canonicalization, dedup, the frozen
golden P/R >= 0.95 gate (BASELINE.json), and checkpoint/resume."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray
import ray.data as rd

from ner_ray.fixtures.aliases import make_alias_table
from ner_ray.functions.metrics import triple_prf
from ner_ray.pipelines.kg import KGConfig, build_kg
from ner_ray.stages.canonicalize import connected_components
from ner_ray.stages.dedup import dedup_triples
from ner_ray.stages.joins import hash_join
from ner_ray.stages.linker import LinkerActor

GOLDEN = "tests/golden/golden_triples.parquet"


@pytest.mark.usefixtures("ray_session")
class TestLinker:
    def test_cosine_disambiguates_ambiguous_alias(self):
        batch = pa.table(
            {
                "surface": pa.array(["Lima", "Lima", "nosuch"], pa.string()),
                "type": pa.array(["LOC", "ORG", "PER"], pa.string()),
            }
        )
        out = LinkerActor()(batch).to_pylist()
        assert out[0]["entity_id"] == 14  # LOC Lima
        assert out[1]["entity_id"] == 22  # ORG Lima Systems
        assert out[2]["entity_id"] == -1  # unlinked path

    def test_cross_script_alias(self):
        batch = pa.table(
            {
                "surface": pa.array(["张伟", "ACME corp."], pa.string()),
                "type": pa.array(["PER", "ORG"], pa.string()),
            }
        )
        out = LinkerActor()(batch).to_pylist()
        assert out[0]["entity_id"] == 4  # Deng Wei
        assert out[1]["entity_id"] == 20  # Acme Corp (normalized surface)


@pytest.mark.usefixtures("ray_session")
class TestCanonicalizePaths:
    def test_driver_and_distributed_identical(self, small_transcripts):
        import ray

        from ner_ray.fixtures.aliases import make_alias_table
        from ner_ray.pipelines.kg import explode_mentions
        from ner_ray.stages.canonicalize import canonicalize
        from ner_ray.stages.linker import link_mentions
        from ner_ray.stages.tagger import tag_transcripts

        alias = make_alias_table()
        tm = tag_transcripts(
            rd.from_arrow(small_transcripts), tagger="rule", output="turn_mentions"
        ).materialize()
        linked = link_mentions(
            tm.drop_columns(["text"]).map_batches(explode_mentions, batch_format="pyarrow"),
            alias_ref=ray.put(alias),
        ).materialize()
        ma, ea = canonicalize(linked, alias)  # driver fast path
        mb, eb = canonicalize(linked, alias, node_threshold=0)  # distributed
        srt = lambda d, c: d.to_pandas().sort_values(c).reset_index(drop=True)
        A = srt(ma, ["node", "surface", "entity_id"])
        B = srt(mb, ["node", "surface", "entity_id"])[A.columns]
        assert A.equals(B)
        EA, EB = srt(ea, ["entity_id"]), srt(eb, ["entity_id"])
        EB = EB[EA.columns]
        assert EA.drop(columns=["aliases"]).equals(EB.drop(columns=["aliases"]))
        assert all(list(x) == list(y) for x, y in zip(EA.aliases, EB.aliases))


@pytest.mark.usefixtures("ray_session")
class TestUnionFind:
    def test_components_vs_bruteforce(self):
        import random

        rng = random.Random(7)
        nodes = [f"n{i}" for i in range(30)]
        edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(25)]
        eds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([a for a, _ in edges], pa.string()),
                    "dst": pa.array([b for _, b in edges], pa.string()),
                }
            )
        )
        got = {
            r["node"]: r["label"]
            for r in connected_components(eds, max_rounds=10).to_pandas().to_dict("records")
        }
        # brute-force union find
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        for a, b in edges:
            assert got[a] == got[b] if find(a) == find(b) else True
        # same partition structure
        from collections import defaultdict

        mine, theirs = defaultdict(set), defaultdict(set)
        for n in got:
            mine[got[n]].add(n)
            theirs[find(n)].add(n)
        assert sorted(map(frozenset, mine.values())) == sorted(map(frozenset, theirs.values()))


@pytest.mark.usefixtures("ray_session")
class TestHashJoin:
    def test_inner_and_left(self):
        left = rd.from_arrow(
            pa.table({"k": ["a", "b", "c", "b"], "x": [1, 2, 3, 4]})
        )
        right = rd.from_arrow(pa.table({"k": ["b", "b", "z"], "y": [10, 20, 30]}))
        inner = hash_join(left, right, on="k", how="inner").to_pandas()
        assert sorted(map(tuple, inner[["k", "x", "y"]].values.tolist())) == [
            ("b", 2, 10),
            ("b", 2, 20),
            ("b", 4, 10),
            ("b", 4, 20),
        ]
        lo = hash_join(left, right, on="k", how="left").to_pandas()
        assert len(lo) == 6
        assert lo[lo.k == "a"]["y"].isna().all()


@pytest.mark.usefixtures("ray_session")
class TestDedup:
    def test_dedup_merges_provenance(self):
        t = pa.table(
            {
                "subj": pa.array(["A", "A", "B"], pa.string()),
                "pred": pa.array(["r", "r", "r"], pa.string()),
                "obj": pa.array(["C", "C", "C"], pa.string()),
                "conv_id": pa.array(["c1", "c2", "c1"], pa.string()),
                "turn_idx": pa.array([0, 1, 2], pa.int32()),
                "confidence": pa.array([0.5, 1.0, 0.8], pa.float32()),
            }
        )
        out = dedup_triples(rd.from_arrow(t)).to_pandas().sort_values("subj")
        assert len(out) == 2
        a = out[out.subj == "A"].iloc[0]
        assert a.n_support == 2
        assert a.confidence == pytest.approx(1.0)
        assert list(a.conv_ids) == ["c1", "c2"]

    def test_driver_and_distributed_paths_identical(self):
        t = pa.table(
            {
                "subj": pa.array(["A", "A", "B", "A"], pa.string()),
                "pred": pa.array(["r", "r", "r", "s"], pa.string()),
                "obj": pa.array(["C", "C", "C", "D"], pa.string()),
                "conv_id": pa.array(["c1", "c2", "c1", "c3"], pa.string()),
                "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
                "confidence": pa.array([0.5, 1.0, 0.8, 0.2], pa.float32()),
            }
        )
        ds = rd.from_arrow(t).repartition(3)
        a = dedup_triples(ds).to_pandas().sort_values(["subj", "pred"]).reset_index(drop=True)
        b = (
            dedup_triples(ds, driver_threshold=0)  # force the shuffle path
            .to_pandas().sort_values(["subj", "pred"]).reset_index(drop=True)[a.columns]
        )
        assert a.drop(columns=["conv_ids"]).equals(b.drop(columns=["conv_ids"]))
        assert all(list(x) == list(y) for x, y in zip(a.conv_ids, b.conv_ids))

    def test_rewrite_tie_breaks_on_canonical(self):
        """Equal-support cross-type homographs rewrite to the lexicographically
        smaller canonical, independent of mapping row order (both rewrite
        paths)."""
        from ner_ray.stages.canonicalize import rewrite_triples

        triples = rd.from_arrow(
            pa.table(
                {
                    "subj": pa.array(["Lima"], pa.string()),
                    "pred": pa.array(["r"], pa.string()),
                    "obj": pa.array(["Oslo"], pa.string()),
                    "conv_id": pa.array(["c1"], pa.string()),
                    "turn_idx": pa.array([0], pa.int32()),
                    "confidence": pa.array([1.0], pa.float32()),
                }
            )
        )
        rows = [
            {"node": "LOC:lima", "surface": "Lima", "type": "LOC",
             "entity_id": 1, "canonical": "Lima", "n_mentions": 5},
            {"node": "ORG:lima", "surface": "Lima", "type": "ORG",
             "entity_id": 2, "canonical": "Alpha Lima Systems", "n_mentions": 5},
            {"node": "LOC:oslo", "surface": "Oslo", "type": "LOC",
             "entity_id": 3, "canonical": "Oslo", "n_mentions": 1},
        ]
        for order in (rows, rows[::-1]):
            mapping = rd.from_arrow(pa.Table.from_pylist(order))
            for how in ("broadcast", "join"):
                out = rewrite_triples(triples, mapping, how=how).to_pandas()
                assert out.subj.iloc[0] == "Alpha Lima Systems", (order[0], how)


@pytest.mark.usefixtures("ray_session")
class TestGoldenGate:
    def test_triple_pr_gate(self, small_transcripts):
        """The binding P/R >= 0.95 gate vs the frozen golden output
        (BASELINE.json:2,14; golden = pinned rule-tagger pipeline output,
        see SURVEY.md §0 on the empty reference mount)."""
        res = build_kg(rd.from_arrow(small_transcripts), KGConfig())
        pred = res.triples.to_pandas()
        gold = pq.read_table(GOLDEN).to_pandas()
        key = lambda df: set(zip(df.subj, df.pred, df.obj))
        prf = triple_prf(key(pred), key(gold))
        assert prf.precision >= 0.95, prf.__dict__
        assert prf.recall >= 0.95, prf.__dict__
        # support/provenance columns also stable
        assert pred.n_support.sum() == gold.n_support.sum()

    def test_entities_match_golden(self, small_transcripts):
        res = build_kg(rd.from_arrow(small_transcripts), KGConfig())
        got = res.entities.to_pandas().sort_values("canonical").reset_index(drop=True)
        gold = (
            pq.read_table("tests/golden/golden_entities.parquet")
            .to_pandas()
            .sort_values("canonical")
            .reset_index(drop=True)
        )
        assert list(got.canonical) == list(gold.canonical)
        assert list(got.type) == list(gold.type)


@pytest.mark.usefixtures("ray_session")
class TestCheckpointResume:
    def test_resume_skips_and_invalidates(self, small_transcripts, tmp_path):
        from ner_ray.fixtures.transcripts import TranscriptConfig, write_transcripts
        from ner_ray.pipelines.kg import run_kg

        inp = str(tmp_path / "input")
        ckpt = str(tmp_path / "ckpt")
        write_transcripts(inp, TranscriptConfig(n_convs=12), shards=2)
        m1 = run_kg(inp, ckpt, KGConfig(window=2, chunk_turns=8))
        assert all(not s["skipped"] for s in m1["stages"].values())
        m2 = run_kg(inp, ckpt, KGConfig(window=2, chunk_turns=8))
        assert all(s["skipped"] for s in m2["stages"].values())
        assert m2["stages"]["graph"]["rows"] == m1["stages"]["graph"]["rows"]
        # config change invalidates the signature -> recompute
        m3 = run_kg(inp, ckpt, KGConfig(window=3, chunk_turns=8))
        assert not m3["stages"]["graph"]["skipped"]


@pytest.mark.usefixtures("ray_session")
class TestIncrementalUpdate:
    """update_kg: per-increment checkpoints + distributive merge must equal
    the from-scratch build over the concatenated corpus (increments split on
    conversation boundaries — the fixture writer shards whole convs)."""

    def _load(self, path):
        import ray.data as rd

        df = rd.read_parquet(path).to_pandas()
        df["conv_ids"] = df["conv_ids"].apply(lambda v: ",".join(list(v)))
        cols = ["subj", "pred", "obj", "confidence", "n_support", "conv_ids"]
        return df[cols].sort_values(cols[:3]).reset_index(drop=True)

    def test_update_equals_full_build_and_resumes(self, tmp_path):
        import glob
        import shutil

        import pandas as pd

        from ner_ray.fixtures.transcripts import TranscriptConfig, write_transcripts
        from ner_ray.pipelines.kg import run_kg, update_kg

        full = str(tmp_path / "full")
        write_transcripts(full, TranscriptConfig(n_convs=60, seed=7), shards=4)
        files = sorted(glob.glob(full + "/*.parquet"))
        inc1, inc2 = tmp_path / "inc1", tmp_path / "inc2"
        inc1.mkdir(), inc2.mkdir()
        for f in files[:2]:
            shutil.copy(f, inc1)
        for f in files[2:]:
            shutil.copy(f, inc2)

        cfg = KGConfig(window=2, chunk_turns=16)
        m_full = run_kg(full, str(tmp_path / "out_full"), cfg)
        m_inc = update_kg(str(tmp_path / "out_inc"), [str(inc1), str(inc2)], cfg)
        pd.testing.assert_frame_equal(
            self._load(m_full["output"]), self._load(m_inc["output"])
        )

        # resume: unchanged inputs skip every increment and the final graph
        m2 = update_kg(str(tmp_path / "out_inc"), [str(inc1), str(inc2)], cfg)
        assert all(v["skipped"] for v in m2["increments"].values())
        assert m2["stages"]["graph"]["skipped"]

        # extending the input list pays only the NEW increment's tagging:
        # old increments stay skipped, the graph recomputes over 3 increments
        inc3 = tmp_path / "inc3"
        inc3.mkdir()
        write_transcripts(str(inc3), TranscriptConfig(n_convs=10, seed=99), shards=1)
        # the generator reuses conv-00000x ids; disambiguate so increment 3
        # holds genuinely NEW conversations (the boundary guard correctly
        # rejects id reuse across increments)
        for f in glob.glob(str(inc3) + "/*.parquet"):
            t = pq.read_table(f)
            cid = pa.compute.binary_join_element_wise(
                t["conv_id"], pa.array(["x3"] * t.num_rows), "-"
            )
            pq.write_table(t.set_column(t.column_names.index("conv_id"), "conv_id", cid), f)
        m3 = update_kg(
            str(tmp_path / "out_inc"), [str(inc1), str(inc2), str(inc3)], cfg
        )
        skips = [v["skipped"] for v in m3["increments"].values()]
        assert sorted(skips) == [False, True, True]
        assert not m3["stages"]["graph"]["skipped"]
        assert m3["stages"]["graph"]["rows"] >= m2["stages"]["graph"]["rows"]

    def test_boundary_guard_rejects_split_conversations(self, tmp_path):
        from ner_ray.fixtures.transcripts import TranscriptConfig, write_transcripts
        from ner_ray.pipelines.kg import update_kg

        # two increments that BOTH contain conv-000000..: a conversation
        # split across increments must be rejected, not silently mis-built
        a, b = tmp_path / "a", tmp_path / "b"
        write_transcripts(str(a), TranscriptConfig(n_convs=6, seed=1), shards=1)
        write_transcripts(str(b), TranscriptConfig(n_convs=6, seed=2), shards=1)
        with pytest.raises(ValueError, match="span increment boundaries"):
            update_kg(str(tmp_path / "out"), [str(a), str(b)], KGConfig(window=2))

    def test_empty_input_list_rejected(self, tmp_path):
        from ner_ray.pipelines.kg import update_kg

        with pytest.raises(ValueError, match="input_paths is empty"):
            update_kg(str(tmp_path / "out"), [])
