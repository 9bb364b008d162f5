"""Round-3 hardening: threshold gates on the remaining driver
materializations (rewrite broadcast, degree stats), restart-safe actor
constructor args, the q44 pair-emission cap, GPU plumbing, and the JSONL
sink's duplicate-block preservation."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ner_ray.fixtures.transcripts import TranscriptConfig, make_transcripts_table


@pytest.mark.usefixtures("ray_session")
class TestRewriteThreshold:
    def _fixture(self):
        triples = rd.from_arrow(
            pa.table(
                {
                    "subj": ["Alice Chen", "NJU", "alice chen", "Bob"],
                    "pred": ["works_at"] * 4,
                    "obj": ["NJU", "Alice Chen", "Nanjing", "NJU"],
                    "confidence": pa.array([0.9, 0.8, 0.7, 0.6], pa.float32()),
                    "conv_id": ["c1", "c1", "c2", "c3"],
                    "turn_idx": pa.array([0, 1, 0, 0], pa.int32()),
                }
            )
        ).repartition(2)
        mapping = rd.from_arrow(
            pa.table(
                {
                    "node": ["s:alice chen", "s:nju", "s:nanjing"],
                    "surface": ["Alice Chen", "NJU", "Nanjing"],
                    "type": ["PER", "ORG", "LOC"],
                    "entity_id": pa.array([1, 2, 3], pa.int64()),
                    "canonical": ["Alice Chen", "Nanjing University", "Nanjing"],
                    "n_mentions": pa.array([5, 9, 2], pa.int64()),
                }
            )
        )
        return triples, mapping

    def test_auto_fallback_to_join_matches_broadcast(self):
        from ner_ray.stages.canonicalize import rewrite_triples

        triples, mapping = self._fixture()
        key = ["subj", "pred", "obj", "conv_id", "turn_idx"]
        bc = rewrite_triples(triples, mapping).to_pandas().sort_values(key).reset_index(drop=True)
        # threshold of 1 row forces the join fallback on the same inputs
        jn = (
            rewrite_triples(triples, mapping, broadcast_threshold=1)
            .to_pandas()
            .sort_values(key)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(bc[key], jn[key])
        assert set(bc["subj"]) >= {"Alice Chen", "Nanjing University"}


@pytest.mark.usefixtures("ray_session")
class TestDegreeStatsDistributed:
    def test_driver_vs_distributed_equality(self):
        from ner_ray.stages.graph import degree_stats

        rng = np.random.default_rng(7)
        n = 400
        rows = pa.table(
            {
                "subj": [f"n{int(i)}" for i in rng.integers(0, 40, n)],
                "obj": [f"n{int(i)}" for i in rng.integers(0, 40, n)],
                "n_support": pa.array(rng.integers(1, 5, n), pa.int64()),
            }
        )
        triples = rd.from_arrow(rows).repartition(4)
        drv = degree_stats(triples)
        dist = degree_stats(triples, driver_threshold=0)
        pd.testing.assert_frame_equal(drv, dist)

    def test_edge_weights_threshold_path(self):
        from ner_ray.stages.graph import edge_weights

        t = rd.from_arrow(
            pa.table(
                {
                    "subj": ["a", "a", "b"],
                    "obj": ["b", "b", "c"],
                    "n_support": pa.array([2, 3, 1], pa.int64()),
                }
            )
        ).repartition(2)
        lo = edge_weights(t).sort_values(["subj", "obj"]).reset_index(drop=True)
        hi = edge_weights(t, driver_threshold=0).sort_values(["subj", "obj"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(lo, hi.astype(lo.dtypes.to_dict()))
        assert int(lo.loc[(lo.subj == "a") & (lo.obj == "b"), "w"].iloc[0]) == 5


@pytest.mark.usefixtures("ray_session")
class TestRestartSafeConstructors:
    def test_model_spec_matches_model_ref(self):
        import ray

        from ner_ray.stages.tagger import tag_transcripts
        from ner_ray.state.bert import FrozenTinyBert

        t = make_transcripts_table(TranscriptConfig(n_convs=8))
        ds = rd.from_arrow(t)
        ref = ray.put(FrozenTinyBert.create(hidden=32, n_layers=2, n_heads=2))
        via_ref = (
            tag_transcripts(ds, tagger="bert", batch_size=256, concurrency=2, model_ref=ref)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx", "start"])
            .reset_index(drop=True)
        )
        via_spec = (
            tag_transcripts(
                ds,
                tagger="bert",
                batch_size=256,
                concurrency=2,
                model_spec={"hidden": 32, "n_layers": 2, "n_heads": 2},
            )
            .to_pandas()
            .sort_values(["conv_id", "turn_idx", "start"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(via_ref, via_spec)

    def test_fanout_constructor_args_are_plain_values(self):
        """The flagship actor's constructor kwargs must contain no ObjectRef
        (ray#53727: refs in fn_constructor_kwargs break actor restart)."""
        import ray

        from ner_ray.fixtures.aliases import make_alias_table
        from ner_ray.pipelines.kg import TaggerFanout, _alias_ipc

        ipc = _alias_ipc(make_alias_table())
        assert isinstance(ipc, bytes)
        # constructing the actor class from plain values must work WITHOUT
        # touching the object store
        tf = TaggerFanout(
            tagger="rule",
            tagger_kwargs=None,
            window=3,
            chunk_turns=256,
            alias_ipc=ipc,
            tau=0.6,
        )
        t = make_transcripts_table(TranscriptConfig(n_convs=3))
        out = tf(t.select(["conv_id", "turn_idx", "text"]))
        assert out.num_rows > 0
        assert not any(isinstance(v, ray.ObjectRef) for v in [ipc, 0.6, 3, 256])


@pytest.mark.usefixtures("ray_session")
class TestGpuPlumbing:
    def test_num_gpus_forwards_to_map_batches(self):
        """num_gpus=0 is not None, so it must forward; with 0 GPUs requested
        the pool still schedules on a CPU-only cluster and output is
        unchanged — proving the argument reaches map_batches."""
        from ner_ray.stages.tagger import tag_transcripts

        t = make_transcripts_table(TranscriptConfig(n_convs=6))
        ds = rd.from_arrow(t)
        base = (
            tag_transcripts(ds, batch_size=256, concurrency=2)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx", "start"])
            .reset_index(drop=True)
        )
        gpu0 = (
            tag_transcripts(ds, batch_size=256, concurrency=2, num_gpus=0)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx", "start"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(base, gpu0)

    def test_kgconfig_carries_num_gpus(self):
        from ner_ray.pipelines.kg import KGConfig

        cfg = KGConfig(tagger_num_gpus=0.25)
        assert cfg.sig()["tagger_num_gpus"] == 0.25


@pytest.mark.usefixtures("ray_session")
class TestJsonlDuplicateBlocks:
    def test_byte_identical_blocks_both_survive(self, tmp_path):
        from ner_ray.sources.transcripts_jsonl import (
            read_transcripts_jsonl,
            write_transcripts_jsonl,
        )

        t = make_transcripts_table(TranscriptConfig(n_convs=4))
        ds = rd.from_arrow(t).union(rd.from_arrow(t))  # two identical blocks
        out_dir = str(tmp_path / "dups")
        paths = write_transcripts_jsonl(ds, out_dir)
        assert len(paths) == len(set(paths)) == 2
        back = read_transcripts_jsonl(paths)
        assert back.count() == 2 * t.num_rows
        # no orphan files beyond the manifest
        assert sorted(glob.glob(os.path.join(out_dir, "part-*.jsonl"))) == paths


@pytest.mark.usefixtures("ray_session")
class TestPmiCap:
    def test_mega_doc_pair_emission_bounded(self, tmp_path):
        """A synthetic mega-doc must emit at most C(cap, 2) pairs, and DF
        counts stay exact for every term."""
        import pyarrow.parquet as pq

        from ner_ray.pipelines.queries import q44_term_pmi

        # 200 distinct terms in one doc; cap at 20 -> pair keys bounded
        mega = " ".join(f"term{i:03d}" for i in range(200))
        # supporting docs so some pairs clear min_support
        common = "alpha beta gamma"
        docs = pa.table(
            {
                "doc_id": pa.array(list(range(7)), pa.int64()),
                "text": [mega + " " + common] + [common] * 6,
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(docs, sf / "documents.parquet")
        out = q44_term_pmi(str(sf), min_support=5, max_terms_per_doc=20).to_pandas()
        # alpha/beta/gamma appear in all 7 docs -> survive min_support; the
        # capped mega-doc keeps its most frequent terms (all tf=1 -> ties by
        # term name, so term0xx win over the commons... pairs among commons
        # still reach support 6 from the other docs)
        assert {"alpha", "beta", "gamma"} <= set(out["term_a"]) | set(out["term_b"])
        # uncapped run on the same fixture emits term-pair keys quadratically;
        # the capped run's distinct terms inside pair keys is bounded by cap
        capped_terms = set(out["term_a"]) | set(out["term_b"])
        assert len(capped_terms) <= 20 + 3


@pytest.mark.usefixtures("ray_session")
class TestRound3DynamicTwins:
    """Local replica of the driver's comparison for the three entries that
    were rows-only in round 2 and gained dynamic twins this round
    (q37 exact-cosine join, mm_video_frames payload re-slice,
    mm_resize_pipeline independent numpy re-derivation)."""

    SF = "/root/testdata/sf0.01"

    def _check(self, name):
        import sys

        import duckdb

        sys.path.insert(0, "tools")
        from oracle_check import TABLES, canon, compare, to_pandas

        from ner_ray.pipelines.queries import RAY_QUERIES, oracle_sql_catalog

        sql = oracle_sql_catalog()[name]
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{self.SF}/{t}.parquet')"
            )
        mine = canon(to_pandas(RAY_QUERIES[name](self.SF)))
        oracle = canon(con.execute(sql).df())
        ok, why = compare(mine, oracle)
        assert ok, f"{name}: {why}"

    def test_q37_embedding_near_dup_twin(self):
        self._check("q37_doc_embedding_near_dup")

    def test_mm_video_frames_twin(self):
        self._check("mm_video_frames")

    def test_mm_resize_pipeline_twin(self):
        self._check("mm_resize_pipeline")

    def test_q22_minhash_twin(self):
        self._check("q22_minhash_near_dup")


@pytest.mark.usefixtures("ray_session")
class TestGroupIdNumericMin:
    """group_id must be the NUMERIC min doc_id of a duplicate cluster: the
    components step picks the lexicographic-min node label, so unpadded
    node names broke the contract for mixed digit counts ('d17' < 'd5').
    Nodes are now zero-padded (text_dedup._dnode)."""

    def _docs(self):
        texts = {i: f"unique filler document number {i} " * 5 for i in range(20)}
        dup = "the same duplicated text body repeated for the cluster " * 4
        texts[5] = dup
        texts[17] = dup
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": [texts[i] for i in sorted(texts)],
                }
            )
        )

    def test_minhash_cluster_gets_numeric_min(self):
        from ner_ray.stages.text_dedup import minhash_near_dup

        out = minhash_near_dup(self._docs(), threshold=0.7).to_pandas()
        g = dict(zip(out.doc_id, out.group_id))
        assert g[5] == 5 and g[17] == 5
        keep = dict(zip(out.doc_id, out.keep))
        assert keep[5] and not keep[17]

    def test_simhash_cluster_gets_numeric_min(self):
        from ner_ray.stages.text_dedup import simhash_near_dup

        out = simhash_near_dup(self._docs(), max_hamming=3).to_pandas()
        g = dict(zip(out.doc_id, out.group_id))
        assert g[5] == 5 and g[17] == 5


@pytest.mark.usefixtures("ray_session")
class TestRound3NewOps:
    """Round-3 additions: PII redaction, stratified sampling, sequence
    packing — twin equality (driver replica) plus operator properties the
    SQL twin can't express (multi-domain packing, oversize docs)."""

    def test_q45_pii_redaction_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q45_pii_redaction")

    def test_q46_stratified_sample_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q46_stratified_sample")

    def test_q47_sequence_packing_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q47_sequence_packing")

    def test_redact_order_pins_url_before_phone(self):
        # digits inside a URL must be swallowed by <URL>, not tagged <PHONE>;
        # an email inside a URL query string belongs to the URL
        from ner_ray.functions.texttools import redact_pii_array

        clean, n = redact_pii_array(
            pa.array(["see https://h.example/a?e=x@y.zz&t=1-222-333-4444 ok +1-555-0100"])
        )
        assert clean.to_pylist() == ["see <URL> ok <PHONE>"]
        assert n.to_pylist() == [2]

    def test_stratified_sample_default_drops(self):
        from ner_ray.stages.relational import stratified_sample

        ds = rd.from_arrow(
            pa.table(
                {
                    "id": pa.array(range(200), pa.int64()),
                    "grp": pa.array(["a" if i % 2 else "b" for i in range(200)]),
                }
            )
        )
        out = stratified_sample(ds, "id", "grp", rates={"a": "ff"}).to_pandas()
        # default_hex="00": unlisted stratum b fully dropped; a ~ 255/256 kept
        assert set(out.grp) == {"a"}
        assert len(out) >= 95

    def _packed(self, toks, budget, n_domains=1, domain_block=4096):
        from ner_ray.stages.packing import pack_sequences

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(toks)), pa.int64()),
                    "src": pa.array(["s" + str(i % 2) for i in range(len(toks))]),
                    "n_tokens": pa.array(toks, pa.int64()),
                }
            )
        )
        return pack_sequences(
            ds,
            "doc_id",
            "n_tokens",
            budget,
            stratum_col="src",
            n_domains=n_domains,
            domain_block=domain_block,
        ).to_pandas()

    def test_packing_respects_budget_and_covers_all(self):
        rng = __import__("numpy").random.default_rng(7)
        toks = rng.integers(1, 200, size=500).tolist()
        out = self._packed(toks, budget=512)
        assert sorted(out.doc_id) == list(range(500))  # every doc exactly once
        fills = out.groupby("bin_id")["n_tokens"].sum()
        assert (fills <= 512).all()
        # bin_fill column agrees with the recomputed per-bin totals
        assert (out.bin_fill == out.bin_id.map(fills)).all()
        # next-fit over id order: members of one bin are contiguous in id
        # order within their (stratum, domain)
        for _, g in out.sort_values("doc_id").groupby(["stratum", "domain"]):
            seq = g.bin_seq.to_numpy()
            assert (seq[1:] >= seq[:-1]).all()

    def test_packing_oversize_doc_gets_own_bin(self):
        out = self._packed([100, 900, 100, 50], budget=512)
        big = out[out.doc_id == 1].iloc[0]
        assert out.groupby("bin_id")["doc_id"].count()[big.bin_id] == 1
        assert big.bin_fill == 900
        small = out[out.doc_id != 1]
        assert (small.groupby("bin_id")["n_tokens"].sum() <= 512).all()

    def test_packing_multi_domain_still_valid(self):
        rng = __import__("numpy").random.default_rng(11)
        toks = rng.integers(1, 300, size=400).tolist()
        out = self._packed(toks, budget=400, n_domains=3, domain_block=64)
        assert sorted(out.doc_id) == list(range(400))
        assert out.domain.nunique() == 3  # the striping actually spreads
        fills = out.groupby("bin_id")["n_tokens"].sum()
        oversize = set(out[out.n_tokens > 400].bin_id)
        assert (fills.drop(index=list(oversize), errors="ignore") <= 400).all()


@pytest.mark.usefixtures("ray_session")
class TestBloomSemiJoin:
    """Bloom-pruned EXISTS/NOT EXISTS (stages.bloom): exact under forced
    false positives, approximate mode is a bounded superset, empty build
    side degenerates correctly, and the catalog twin stays wired."""

    def _sides(self):
        rng = np.random.default_rng(7)
        probe = pd.DataFrame(
            {"k": rng.integers(0, 1000, 3000), "v": np.arange(3000, dtype=np.int64)}
        )
        build = pd.DataFrame({"bk": rng.integers(500, 1500, 2000)})
        return probe, build, set(build["bk"])

    def test_semi_exact_matches_isin(self):
        from ner_ray.stages.bloom import bloom_semi_join

        probe, build, keys = self._sides()
        out = (
            bloom_semi_join(rd.from_pandas(probe), rd.from_pandas(build), on="k", build_on="bk")
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        exp = probe[probe["k"].isin(keys)].sort_values("v").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, exp)

    def test_anti_exact_under_forced_fpr(self):
        # num_bits=256 over ~700 distinct keys saturates the filter: nearly
        # every probe row is a Bloom positive, so the exact verify join is
        # what produces the correct anti result.
        from ner_ray.stages.bloom import bloom_semi_join

        probe, build, keys = self._sides()
        out = (
            bloom_semi_join(
                rd.from_pandas(probe),
                rd.from_pandas(build),
                on="k",
                build_on="bk",
                anti=True,
                num_bits=256,
                num_hashes=2,
            )
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        exp = probe[~probe["k"].isin(keys)].sort_values("v").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, exp)

    def test_semi_exact_under_forced_fpr_string_keys(self):
        from ner_ray.stages.bloom import bloom_semi_join

        probe = pd.DataFrame({"k": [f"s{i}" for i in range(1000)], "v": range(1000)})
        build = pd.DataFrame({"k2": [f"s{i}" for i in range(0, 1000, 3)]})
        out = (
            bloom_semi_join(
                rd.from_pandas(probe),
                rd.from_pandas(build),
                on="k",
                build_on="k2",
                num_bits=512,
                num_hashes=2,
            )
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        exp = probe[probe["k"].isin(set(build["k2"]))].sort_values("v").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, exp)

    def test_approximate_mode_is_superset_no_false_negatives(self):
        from ner_ray.stages.bloom import bloom_semi_join

        probe, build, keys = self._sides()
        approx = bloom_semi_join(
            rd.from_pandas(probe),
            rd.from_pandas(build),
            on="k",
            build_on="bk",
            num_bits=1024,
            num_hashes=2,
            exact=False,
        ).to_pandas()
        exact = probe[probe["k"].isin(keys)]
        # Bloom filters have no false negatives: every true match survives
        assert set(exact["v"]) <= set(approx["v"])

    def test_default_sizing_fpr_is_negligible(self):
        # at the default 2^22 bits / 4 hashes over ~1k keys the approximate
        # survivors ARE the exact answer (expected FPs << 1)
        from ner_ray.stages.bloom import bloom_semi_join

        probe, build, keys = self._sides()
        approx = bloom_semi_join(
            rd.from_pandas(probe), rd.from_pandas(build), on="k", build_on="bk", exact=False
        ).to_pandas()
        assert sorted(approx["v"]) == sorted(probe[probe["k"].isin(keys)]["v"])

    def test_empty_build_side(self):
        from ner_ray.stages.bloom import bloom_semi_join

        probe, build, _ = self._sides()
        empty = rd.from_pandas(build.iloc[:0])
        semi = bloom_semi_join(rd.from_pandas(probe), empty, on="k", build_on="bk").to_pandas()
        anti = bloom_semi_join(
            rd.from_pandas(probe), empty, on="k", build_on="bk", anti=True
        ).to_pandas()
        assert len(semi) == 0
        assert len(anti) == len(probe)

    def test_q48_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q48_bloom_semi_join")


class TestCatalogPriorityOrder:
    """The correctness driver records the first 50 catalog entries; the
    invariant this round is that ALL of them are hash-checkable (an oracle
    twin exists), and that overflow entries remain runnable catalog members."""

    def test_first_50_all_have_twins(self):
        from ner_ray.pipelines.queries import RAY_QUERIES, oracle_sql_catalog

        twins = oracle_sql_catalog()
        first50 = list(RAY_QUERIES)[:50]
        missing = [n for n in first50 if n not in twins]
        assert missing == [], f"in-cap entries without oracle twins: {missing}"

    def test_overflow_entries_still_callable(self):
        from ner_ray.pipelines.queries import RAY_QUERIES

        for name in list(RAY_QUERIES)[50:]:
            assert callable(RAY_QUERIES[name])

    def test_window_includes_round34_operators(self):
        """Round-5 rotation: the driver window must stamp the newer operator
        families, not only the long-stable round-1/2 twins — >= 15 of the
        first 50 entries are round-3/4 ops (q49+)."""
        import re

        from ner_ray.pipelines.queries import RAY_QUERIES

        first50 = list(RAY_QUERIES)[:50]
        promoted = [n for n in first50 if re.match(r"q(49|[5-8][0-9])_", n)]
        assert len(promoted) >= 15, promoted


@pytest.mark.usefixtures("ray_session")
class TestHyperLogLog:
    """HLL approx-distinct (stages.sketches): error bound, exact
    partitioning-independence of the merged registers (the mergeability
    property that makes the sketch distributable), and the grouped path."""

    def test_error_bound_large_cardinality(self):
        from ner_ray.stages.sketches import approx_distinct

        rng = np.random.default_rng(3)
        # ~40k distinct values, with duplicates
        vals = rng.integers(0, 40_000, size=120_000)
        truth = len(np.unique(vals))
        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
        est = approx_distinct(ds, "v", p=14)
        # stderr at p=14 is ~0.8%; allow 4 sigma
        assert abs(est - truth) / truth < 0.033, (est, truth)

    def test_partitioning_independence(self):
        from ner_ray.stages.sketches import approx_distinct

        rng = np.random.default_rng(5)
        vals = rng.integers(0, 5_000, size=30_000)
        t = pa.table({"v": pa.array(vals, pa.int64())})
        e1 = approx_distinct(rd.from_arrow(t).repartition(1), "v", p=12)
        e8 = approx_distinct(rd.from_arrow(t).repartition(8), "v", p=12)
        assert e1 == e8  # register max-merge is exactly order/partition-free

    def test_grouped_close_to_exact(self):
        from ner_ray.stages.sketches import grouped_approx_distinct

        rng = np.random.default_rng(9)
        n = 60_000
        grp = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
        val = rng.integers(0, 8_000, n)
        ds = rd.from_arrow(
            pa.table({"g": pa.array(grp), "v": pa.array(val, pa.int64())})
        ).repartition(6)
        out = grouped_approx_distinct(ds, "g", "v", p=12).to_pandas()
        exact = pd.DataFrame({"g": grp, "v": val}).groupby("g")["v"].nunique()
        assert set(out.g) == {"a", "b", "c"}
        for _, r in out.iterrows():
            truth = exact[r.g]
            assert abs(r.approx_distinct - truth) / truth < 0.07, (r.g, r.approx_distinct, truth)

    def test_small_range_linear_counting_is_tight(self):
        from ner_ray.stages.sketches import approx_distinct

        ds = rd.from_arrow(pa.table({"v": pa.array(list(range(150)) * 4, pa.int64())}))
        est = approx_distinct(ds, "v", p=12)
        assert abs(est - 150) < 3  # linear-counting regime: near-exact

    def test_q49_catalog_entry_runs(self):
        from ner_ray.pipelines.queries import RAY_QUERIES

        out = RAY_QUERIES["q49_approx_distinct_users"]("/root/testdata/sf0.001").to_pandas()
        assert len(out) >= 1 and (out.approx_distinct > 0).all()


@pytest.mark.usefixtures("ray_session")
class TestCube:
    """CUBE / GROUPING SETS fold from one combiner pass (relational.cube_agg):
    DuckDB twin equality plus fold-vs-pandas equality on seeded data."""

    def test_q50_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q50_cube")

    def test_grouping_sets_match_pandas(self):
        from ner_ray.stages.relational import grouping_sets_agg

        rng = np.random.default_rng(13)
        df = pd.DataFrame(
            {
                "a": np.array(["x", "y", "z"])[rng.integers(0, 3, 5000)],
                "b": np.array(["p", "q"])[rng.integers(0, 2, 5000)],
                "v": rng.integers(0, 100, 5000).astype("int64"),
            }
        )
        ds = rd.from_pandas(df).repartition(4)
        out = grouping_sets_agg(ds, ["a", "b"], [("a", "b"), ("a",), ()], "v")
        # (a, b) level
        lvl_ab = out[out.grouping_id == 0]
        exp_ab = df.groupby(["a", "b"])["v"].agg(["sum", "size"])
        for _, r in lvl_ab.iterrows():
            assert r.sum_val == float(exp_ab.loc[(r.a, r.b)]["sum"])
            assert r.n_rows == int(exp_ab.loc[(r.a, r.b)]["size"])
        # (a,) level: b == 'ALL', grouping_id has the b bit (LSB) set
        lvl_a = out[out.grouping_id == 1]
        assert set(lvl_a.b) == {"ALL"}
        exp_a = df.groupby("a")["v"].sum()
        for _, r in lvl_a.iterrows():
            assert r.sum_val == float(exp_a[r.a])
        # grand total
        g = out[out.grouping_id == 3]
        assert len(g) == 1 and g.iloc[0].sum_val == float(df.v.sum())
        # no (b,) level was requested
        assert (out.grouping_id != 2).all()

    def test_grouping_set_must_be_subset(self):
        from ner_ray.stages.relational import grouping_sets_agg

        ds = rd.from_pandas(pd.DataFrame({"a": ["x"], "v": [1]}))
        with pytest.raises(ValueError):
            grouping_sets_agg(ds, ["a"], [("a", "nope")], "v")

    def test_cube_has_all_subsets(self):
        from ner_ray.stages.relational import cube_agg

        df = pd.DataFrame({"a": ["x", "x", "y"], "b": ["p", "q", "p"], "v": [1, 2, 3]})
        out = cube_agg(rd.from_pandas(df), ["a", "b"], "v")
        assert set(out.grouping_id) == {0, 1, 2, 3}
        assert out[out.grouping_id == 3].iloc[0].n_rows == 3


@pytest.mark.usefixtures("ray_session")
class TestClusterOps:
    """Distributed k-means + SemDeDup (stages.cluster): DuckDB twin equality
    over the centroid fixture, distributed-fit-vs-driver-Lloyd's equality,
    partitioning independence, the oversized-cluster cap, and the
    distributed-components fallback."""

    def _toy(self, n=2000, d=16, seed=7):
        rng = np.random.default_rng(seed)
        centers = rng.normal(size=(8, d))
        x = (centers[rng.integers(0, 8, n)] + 0.3 * rng.normal(size=(n, d))).astype(
            np.float32
        )
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array([v.tolist() for v in x], pa.list_(pa.float32())),
            }
        )
        return t, x

    def test_q51_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q51_kmeans_assign")

    def test_q52_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q52_semantic_dedup")

    def test_kmeans_fit_matches_driver_lloyds(self):
        import zlib

        from ner_ray.stages.ann import kmeans_lite
        from ner_ray.stages.cluster import kmeans_fit

        t, x = self._toy()
        ds = rd.from_arrow(t).repartition(6).materialize()
        cent = kmeans_fit(ds, 8, n_iter=5, init_sample=512, seed=7)

        # driver replica: identical content-addressed init, then plain
        # numpy Lloyd's (mean = fold(sum)/fold(count), so only float
        # summation ORDER differs from the distributed partials)
        xd = x.astype(np.float64)
        ids = np.arange(len(xd), dtype=np.int64)
        h = np.array([zlib.crc32(str(i).encode()) for i in ids], dtype=np.int64)
        sel = np.lexsort((ids, h))[:512]
        sel = sel[np.argsort(ids[sel], kind="stable")]
        ref = kmeans_lite(xd[sel], 8, seed=7)
        xn = xd / np.linalg.norm(xd, axis=1, keepdims=True)
        for _ in range(5):
            a = np.argmax(xn @ ref.T, axis=1)
            nxt = ref.copy()
            for c in range(8):
                m = xn[a == c]
                if len(m):
                    nxt[c] = m.mean(axis=0)
            ref = nxt / np.linalg.norm(nxt, axis=1, keepdims=True)

        assert cent.shape == ref.shape
        np.testing.assert_allclose(cent, ref, atol=1e-8)

    def test_assign_partitioning_independence(self):
        from ner_ray.stages.cluster import kmeans_assign, kmeans_fit

        t, _ = self._toy()
        ds = rd.from_arrow(t).materialize()
        cent = kmeans_fit(ds, 8, n_iter=3, init_sample=512, seed=7)
        a2 = kmeans_assign(ds.repartition(2), cent).to_pandas().sort_values("vec_id")
        a8 = kmeans_assign(ds.repartition(8), cent).to_pandas().sort_values("vec_id")
        assert (a2["cluster_id"].to_numpy() == a8["cluster_id"].to_numpy()).all()
        np.testing.assert_array_equal(a2["sim"].to_numpy(), a8["sim"].to_numpy())

    def test_semantic_dedup_drops_near_dups(self):
        from ner_ray.stages.cluster import kmeans_fit, semantic_dedup

        t, x = self._toy(n=400)
        # append exact duplicates of the first 20 vectors with fresh ids
        dup = pa.table(
            {
                "vec_id": pa.array(np.arange(1000, 1020, dtype=np.int64)),
                "embedding": pa.array(
                    [v.tolist() for v in x[:20]], pa.list_(pa.float32())
                ),
            }
        )
        ds = rd.from_arrow(pa.concat_tables([t, dup])).repartition(4).materialize()
        cent = kmeans_fit(ds, 8, n_iter=3, init_sample=256, seed=7)
        out = semantic_dedup(ds, cent, threshold=0.999).to_pandas()
        assert len(out) == 420
        dropped = out[~out["keep"]]
        # every injected duplicate is dropped in favour of its numeric-min twin
        assert set(dropped["vec_id"]) >= set(range(1000, 1020))
        for _, r in dropped[dropped["vec_id"] >= 1000].iterrows():
            assert r["group_id"] == r["vec_id"] - 1000

    def test_cluster_cap_bounds_pairs(self):
        from ner_ray.stages.cluster import kmeans_fit, semantic_dedup

        t, _ = self._toy(n=300)
        ds = rd.from_arrow(t).materialize()
        cent = kmeans_fit(ds, 2, n_iter=2, init_sample=128, seed=7)
        out = semantic_dedup(ds, cent, threshold=0.0, max_cluster_size=10).to_pandas()
        # threshold 0 links ~everything, but the cap keeps only the 10
        # smallest ids per cluster in the pair scan: overflow rows stay kept
        assert len(out) == 300
        assert out[out["vec_id"] >= 100]["keep"].all()

    def test_distributed_components_path_equal(self):
        # tiny edge set (exact-dup chains only, threshold .9999): the point
        # is DRIVER-vs-DISTRIBUTED path equality, not CC scale — min-label
        # propagation costs a join round per component diameter, so a dense
        # toy graph would spend minutes proving nothing extra
        from ner_ray.stages.cluster import kmeans_fit, semantic_dedup

        t, x = self._toy(n=80)
        dup = pa.table(
            {
                "vec_id": pa.array(np.arange(500, 510, dtype=np.int64)),
                "embedding": pa.array(
                    [v.tolist() for v in x[:10]], pa.list_(pa.float32())
                ),
            }
        )
        ds = rd.from_arrow(pa.concat_tables([t, dup])).repartition(3).materialize()
        cent = kmeans_fit(ds, 4, n_iter=2, init_sample=64, seed=7)
        drv = (
            semantic_dedup(ds, cent, threshold=0.9999)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        dist = (
            semantic_dedup(ds, cent, threshold=0.9999, cc_threshold=0)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert (~drv["keep"]).sum() >= 10  # the injected dups actually linked
        pd.testing.assert_frame_equal(drv, dist, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestCurationPipeline:
    """q53: the composed curation pass (lang + quality + tokens + exact-dup
    keeper) — twin equality plus output-invariant checks."""

    def test_q53_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q53_curation_pipeline")

    def test_output_invariants(self):
        from ner_ray.pipelines.queries import RAY_QUERIES

        out = RAY_QUERIES["q53_curation_pipeline"]("/root/testdata/sf0.001").to_pandas()
        assert set(out.columns) == {"doc_id", "pred_lang", "quality", "n_tokens"}
        assert (out["pred_lang"] == "en").all()
        assert (out["quality"] >= 0.5).all()
        assert out["doc_id"].is_unique


@pytest.mark.usefixtures("ray_session")
class TestLateRound3Twins:
    """Twins added late round 3: SimHash near-dup over the sketch fixture
    (XOR+popcount verify in SQL) and degrees over the independent
    canon-triples twin."""

    def test_q23_simhash_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q23_simhash_near_dup")

    def test_kg_degree_stats_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "kg_degree_stats")

    def test_kg_pagerank_twin(self):
        # 30-round float64 power iteration, unrolled MATERIALIZED-CTE twin:
        # bit-identical after the stage's 1e-10 rounding (tol=0.0 pins the
        # iteration count on the engine side)
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "kg_pagerank")

    def test_q26_ngram_jaccard_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q26_ngram_jaccard")

    def test_q38_winnow_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q38_winnow_fingerprint")

    def test_q39_lsh_near_dup_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q39_doc_near_dup_lsh")

    def test_q25_lsh_topk_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q25_ann_lsh")

    def test_q32_ivf_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q32_ann_ivf")

    def test_mm_image_features_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "mm_image_features")

    def test_mm_audio_features_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "mm_audio_features")

    def test_kg_demo_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "kg_demo")


@pytest.mark.usefixtures("ray_session")
class TestCountMinSketch:
    """CMS (stages.sketches): twin equality, exact partition-independence of
    the integer counter fold (the additive merge law), and the
    overestimate guarantee."""

    def test_q54_twin(self):
        TestRound3DynamicTwins._check(TestRound3DynamicTwins(), "q54_cms_user_counts")

    def test_partition_independence_exact(self):
        from ner_ray.stages.sketches import cms_counts

        rng = np.random.default_rng(5)
        keys = rng.zipf(1.5, size=20_000).astype(np.int64)
        t = pa.table({"k": pa.array(keys)})
        m2 = cms_counts(rd.from_arrow(t).repartition(2), "k", width_bits=7)
        m9 = cms_counts(rd.from_arrow(t).repartition(9), "k", width_bits=7)
        assert np.array_equal(m2, m9)  # integer sums: EXACT, not approximate
        assert m2.sum() == 20_000 * len(m2)  # every row counts every item

    def test_overestimates_only_and_bound(self):
        from ner_ray.stages.sketches import cms_counts, cms_estimate

        rng = np.random.default_rng(6)
        keys = rng.zipf(1.3, size=30_000).astype(np.int64)
        ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(4)
        mat = cms_counts(ds, "k", width_bits=8)
        uniq, true = np.unique(keys, return_counts=True)
        est = cms_estimate(mat, uniq, width_bits=8)
        assert (est >= true).all()
        # expected overshoot <= ~2N/width per row; allow 4 sigma-ish slack
        assert (est - true).max() <= 8 * 30_000 / 256


@pytest.mark.usefixtures("ray_session")
class TestNullKeySemantics:
    """Nulls in key/value columns: the block-content hash independence fix
    (a null in a block must not change OTHER keys' hashes — pandas upcasts
    int->float64 under to_pandas and rehashes everything), plus SQL
    semantics (EXISTS never matches null; COUNT DISTINCT ignores nulls;
    GROUP BY keeps a null group)."""

    def test_hash_block_content_independent(self):
        from ner_ray.stages.bloom import _key_hash64

        clean = _key_hash64(pa.array([5, 7], pa.int64()))
        dirty = _key_hash64(pa.array([5, None], pa.int64()))
        assert clean[0] == dirty[0]

    def test_bloom_semi_anti_with_nulls(self):
        from ner_ray.stages.bloom import bloom_semi_join

        probe = rd.from_arrow(
            pa.table({"k": pa.array([1, 2, None, 4], pa.int64()),
                      "v": pa.array(["a", "b", "c", "d"])})
        ).repartition(2)
        build = rd.from_arrow(
            pa.table({"k": pa.array([2, None, 4], pa.int64())})
        ).repartition(2)
        schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
        semi = bloom_semi_join(probe, build, on="k", probe_schema=schema).to_pandas()
        assert sorted(semi["v"]) == ["b", "d"]  # null never matches
        anti = bloom_semi_join(
            probe, build, on="k", anti=True, probe_schema=schema
        ).to_pandas()
        assert sorted(anti["v"]) == ["a", "c"]  # NOT EXISTS keeps the null row

    def test_hll_ignores_null_values(self):
        from ner_ray.stages.sketches import approx_distinct

        vals = pa.array(list(range(1000)) + [None] * 50, pa.int64())
        ds = rd.from_arrow(pa.table({"v": vals})).repartition(3)
        est = approx_distinct(ds, "v", p=14)
        assert abs(est - 1000) / 1000 < 0.05

    def test_grouped_hll_null_key_dropped_not_crash(self):
        # Ray's groupby sort-shuffle cannot order None among strings, so
        # null keys are DROPPED (documented); the old np.argsort path
        # crashed the whole task instead
        from ner_ray.stages.sketches import grouped_approx_distinct

        t = pa.table(
            {
                "g": pa.array(["a", "a", None, None, "b"]),
                "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
            }
        )
        out = grouped_approx_distinct(rd.from_arrow(t).repartition(2), "g", "v").to_pandas()
        assert sorted(out["g"]) == ["a", "b"]


@pytest.mark.usefixtures("ray_session")
class TestCoreReviewFixes:
    """Round-3 self-review fixes on the core path: BERT word-boundary
    chunking (mid-word segment splits truncated mention surfaces) and the
    zero-mention corpus producing an empty graph instead of a KeyError."""

    def test_word_boundary_chunks(self):
        from collections import namedtuple

        from ner_ray.stages.tagger import _word_boundary_chunks

        T = namedtuple("T", "piece is_continuation")
        # words of 1-4 pieces, then a degenerate 9-piece word
        toks = []
        for w, n in enumerate([1, 3, 2, 4, 1, 2, 9, 1]):
            toks.append(T(f"w{w}", False))
            toks.extend(T(f"w{w}#{k}", True) for k in range(n - 1))
        segs = _word_boundary_chunks(toks, cap=6)
        # every token survives, in order
        assert [t.piece for s in segs for t in s] == [t.piece for t in toks]
        assert all(len(s) <= 6 for s in segs)
        # no segment may START with a continuation piece, except inside the
        # hard-split of the degenerate 9-piece word (> cap)
        for s in segs:
            if s[0].is_continuation:
                assert s[0].piece.startswith("w6#")

    def test_bert_long_turn_surfaces_complete(self):
        from ner_ray.stages.tagger import tag_transcripts

        filler = "meeting report update " * 60  # pushes past the 126 cap
        text = filler + "Alice Chen works at Acme Corp in Nanjing."
        t = pa.table(
            {
                "conv_id": pa.array(["c"], pa.string()),
                "turn_idx": pa.array([0], pa.int32()),
                "text": pa.array([text], pa.string()),
            }
        )
        out = tag_transcripts(
            rd.from_arrow(t), tagger="bert", batch_size=16, concurrency=2,
            model_spec={"hidden": 32, "n_layers": 2, "n_heads": 2},
        ).to_pandas()
        # whatever the (frozen) model tags, every surface must equal the
        # text slice it claims — a mid-word split would truncate it
        for r in out.itertuples():
            assert text[r.start:r.end] == r.surface
            assert not r.surface.endswith(("##",))

    def test_empty_corpus_builds_empty_graph(self):
        from ner_ray.pipelines.kg import KGConfig, build_kg

        t = pa.table(
            {
                "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
                "turn_idx": pa.array([0, 1, 0], pa.int32()),
                "text": pa.array(
                    ["nothing of note", "still nothing", "plain words only"],
                    pa.string(),
                ),
            }
        )
        res = build_kg(rd.from_arrow(t).repartition(2), KGConfig())
        assert res.triples.count() == 0
        assert res.entities.count() == 0
        assert res.mapping.count() == 0


@pytest.mark.usefixtures("ray_session")
class TestRelationalEdgeCases:
    """Second review batch: empty broadcast key sets, NaN vs null in
    quantiles, null group keys in the partial-agg combine, and hash_join
    rejecting unimplemented join types."""

    def test_semi_join_empty_keys(self):
        from ner_ray.stages.relational import semi_join_filter

        ds = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
        assert semi_join_filter(ds, set(), "k").count() == 0
        assert semi_join_filter(ds, set(), "k", anti=True).count() == 3

    def test_grouped_quantiles_ignore_nan(self):
        from ner_ray.stages.relational import grouped_quantiles

        t = pa.table(
            {
                "g": pa.array(["a"] * 3),
                "v": pa.array([float("nan"), 5.0, 6.0], pa.float64()),
            }
        )
        out = grouped_quantiles(rd.from_arrow(t), "g", "v", qs=[0.5])
        assert float(out.iloc[0]["p50"]) == 5.5  # quantile_cont over [5, 6]

    def test_grouped_agg_partial_keeps_null_keys(self):
        from ner_ray.stages.relational import grouped_agg_partial

        t = pa.table(
            {
                "g": pa.array(["a", None, None], pa.string()),
                "v": pa.array([1, 2, 3], pa.int64()),
            }
        )
        out = grouped_agg_partial(
            rd.from_arrow(t).repartition(2), ["g"], sums={"s": "v"}
        )
        assert len(out) == 2  # the null group survives the pandas combine
        assert int(out[out["g"].isna()]["s"].iloc[0]) == 5

    def test_hash_join_rejects_unknown_how(self):
        from ner_ray.stages.joins import hash_join

        ds = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError):
            hash_join(ds, ds, on="k", how="outer")
