"""Continuation-session round-5 additions (q99–q112 + the resumable
curation runner): twin equality at sf0.001 plus an INDEPENDENT pandas
re-derivation of each operator (a third implementation, so a shared bug
in the Ray kernel and its SQL twin can't hide), toy-corpus proofs for
branches the synthetic fixture cannot exercise (q108's suppress flag,
q112's hard negative), the broadcast-vs-join path-equality law (q102),
a task-retry fault test (q102 under a SIGKILLed map worker), and the
checkpoint/resume contract on the curation side."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _twin_check(name: str, sql: str | None = None) -> None:
    """Driver-style twin equality.  Transcripts-backed twins embed a
    fixture path: oracle_sql_catalog() pins the driver's sf0.01, so
    in-suite sf0.001 checks pass the SQL rebuilt for THIS fixture (the
    TestToolTransitions pattern)."""
    import sys

    import duckdb

    sys.path.insert(0, "tools")
    from oracle_check import TABLES, canon, compare, to_pandas

    from ner_ray.pipelines.queries import RAY_QUERIES, oracle_sql_catalog

    if sql is None:
        sql = oracle_sql_catalog()[name]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    mine = canon(to_pandas(RAY_QUERIES[name](SF)))
    oracle = canon(con.execute(sql).df())
    ok, why = compare(mine, oracle)
    assert ok, f"{name}: {why}"


def _fixture_df() -> pd.DataFrame:
    from ner_ray.pipelines.queries import transcripts_path_for

    path = transcripts_path_for(SF)
    return pq.read_table(path).to_pandas()


class TestConvQA:
    """q99 — per-conversation hygiene flags."""

    def test_twin(self, ray_session):
        from ner_ray.pipelines.queries import _q99_sql, transcripts_path_for

        _twin_check("q99_conv_qa", _q99_sql(transcripts_path_for(SF)))

    def test_independent_pandas(self, ray_session):
        from ner_ray.pipelines.queries import q99_conv_qa

        tx = _fixture_df().sort_values(["conv_id", "turn_idx"])
        rows = []
        for conv_id, g in tx.groupby("conv_id", sort=False):
            roles = g["role"].to_numpy()
            texts = g["text"].to_numpy()
            prev_r = np.r_[[None], roles[:-1]]
            prev_t = np.r_[[None], texts[:-1]]
            has_prev = np.r_[False, np.ones(len(roles) - 1, bool)]
            n_rep = int(np.sum(has_prev & (roles == prev_r)))
            n_orph = int(
                np.sum((roles == "tool") & ~(has_prev & (prev_r == "assistant")))
            )
            n_dup = int(np.sum(has_prev & (texts == prev_t)))
            ok = int(
                n_rep == 0 and n_orph == 0 and n_dup == 0 and roles[0] == "user"
            )
            rows.append(
                (conv_id, len(g), n_rep, n_orph, n_dup, roles[0], ok)
            )
        want = (
            pd.DataFrame(
                rows,
                columns=[
                    "conv_id",
                    "n_turns",
                    "n_role_repeats",
                    "n_orphan_tool",
                    "n_dup_adjacent",
                    "first_role",
                    "qa_ok",
                ],
            )
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        got = (
            q99_conv_qa(SF)
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)[want.columns]
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_flags_fire_on_fixture(self, ray_session):
        """The uniform-random role fixture must actually exercise every
        counter (a QA op that never fires verifies nothing)."""
        from ner_ray.pipelines.queries import q99_conv_qa

        df = q99_conv_qa(SF).to_pandas()
        assert (df["n_role_repeats"] > 0).any()
        assert (df["n_orphan_tool"] > 0).any()
        assert df["qa_ok"].isin([0, 1]).all()
        assert len(df) == df["conv_id"].nunique()


class TestBoilerplateTurns:
    """q100 — cross-conversation repeated-turn detection."""

    def test_twin(self, ray_session):
        from ner_ray.pipelines.queries import _q100_sql, transcripts_path_for

        _twin_check("q100_boilerplate_turns", _q100_sql(transcripts_path_for(SF)))

    def test_independent_pandas(self, ray_session):
        from ner_ray.pipelines.queries import (
            _BOILER_MIN_CONVS,
            q100_boilerplate_turns,
        )

        tx = _fixture_df()
        tx["text_norm"] = tx["text"].str.lower().str.strip()
        g = (
            tx.groupby("text_norm")
            .agg(n_turns=("conv_id", "size"), n_convs=("conv_id", "nunique"))
            .reset_index()
        )
        g = g[g["n_turns"] >= 2].copy()
        g["is_boilerplate"] = (g["n_convs"] >= _BOILER_MIN_CONVS).astype("int64")
        want = g.sort_values("text_norm").reset_index(drop=True)
        got = (
            q100_boilerplate_turns(SF)
            .to_pandas()
            .sort_values("text_norm")
            .reset_index(drop=True)[want.columns]
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_template_boilerplate_found(self, ray_session):
        """The fixture's zero-slot templates repeat across conversations,
        so they MUST surface flagged."""
        from ner_ray.pipelines.queries import q100_boilerplate_turns

        df = q100_boilerplate_turns(SF).to_pandas()
        flagged = set(df.loc[df["is_boilerplate"] == 1, "text_norm"])
        assert "ok, done. anything else?" in flagged
        assert "please run the search and summarize the results." in flagged


class TestMixtureSample:
    """q101 — sqrt-temperature per-language mixture sampling."""

    def test_twin(self, ray_session):
        _twin_check("q101_mixture_sample")

    def test_quota_math_and_selection(self, ray_session):
        from ner_ray.pipelines.queries import _MIX_BUDGET, q101_mixture_sample
        from ner_ray.stages.sketches import splitmix64

        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        n = docs.groupby("lang")["doc_id"].size()
        wq = {
            lang: int(np.floor(np.sqrt(np.float64(c)) * 1e6 + 0.5))
            for lang, c in n.items()
        }
        tot = sum(wq.values())
        quota = {lang: (_MIX_BUDGET * w) // tot for lang, w in wq.items()}

        got = q101_mixture_sample(SF).to_pandas()
        per_lang = got.groupby("lang")["doc_id"].size().to_dict()
        for lang, q in quota.items():
            assert per_lang.get(lang, 0) == min(q, int(n[lang]))
        # the floor allocation never overshoots the budget
        assert len(got) <= _MIX_BUDGET
        # each language's winners are exactly its bottom-quota docs in
        # splitmix64 hash order (independent re-derivation)
        for lang, g in got.groupby("lang"):
            ids = docs.loc[docs["lang"] == lang, "doc_id"].to_numpy(np.uint64)
            h = splitmix64(ids)
            order = np.lexsort((ids.astype(np.int64), h))
            want_ids = set(ids[order][: quota[lang]].astype(np.int64))
            assert set(g["doc_id"]) == want_ids

    def test_deterministic(self, ray_session):
        from ner_ray.pipelines.queries import q101_mixture_sample

        a = (
            q101_mixture_sample(SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            q101_mixture_sample(SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestSftClean:
    """q102 — the composed SFT-curation chain (boilerplate anti-join ->
    conversation QA gate -> pair extraction over the CLEANED sequence)."""

    def test_twin(self, ray_session):
        from ner_ray.pipelines.queries import _q102_sql, transcripts_path_for

        _twin_check("q102_sft_clean", _q102_sql(transcripts_path_for(SF)))

    def test_independent_pandas(self, ray_session):
        from ner_ray.pipelines.queries import (
            _SFT_BOILER_MIN_CONVS,
            q102_sft_clean,
        )

        tx = _fixture_df()
        tx["tn"] = tx["text"].str.lower().str.strip()
        g = tx.groupby("tn").agg(
            n=("conv_id", "size"), nc=("conv_id", "nunique")
        )
        boiler = set(g[(g["n"] >= 2) & (g["nc"] >= _SFT_BOILER_MIN_CONVS)].index)
        # QA gate over ORIGINAL order
        ok_convs = set()
        for conv_id, grp in tx.sort_values("turn_idx").groupby("conv_id"):
            roles = grp["role"].to_numpy()
            prev = np.r_[[None], roles[:-1]]
            has_prev = np.r_[False, np.ones(len(roles) - 1, bool)]
            orphan = (roles == "tool") & ~(has_prev & (prev == "assistant"))
            if roles[0] == "user" and not orphan.any():
                ok_convs.add(conv_id)
        rows = []
        cleaned = tx[~tx["tn"].isin(boiler) & tx["conv_id"].isin(ok_convs)]
        for conv_id, grp in cleaned.sort_values("turn_idx").groupby("conv_id"):
            roles = grp["role"].to_numpy()
            texts = grp["text"].to_numpy()
            tis = grp["turn_idx"].to_numpy()
            for i in range(1, len(roles)):
                if roles[i] == "assistant" and roles[i - 1] == "user":
                    rows.append((conv_id, int(tis[i]), texts[i - 1], texts[i]))
        want = (
            pd.DataFrame(rows, columns=["conv_id", "turn_idx", "prompt", "response"])
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        got = (
            q102_sft_clean(SF)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)[want.columns]
        )
        assert len(got) > 0, "composed pipeline must emit pairs on the fixture"
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_broadcast_and_join_paths_equal(self, ray_session, monkeypatch):
        """The boilerplate flag applies broadcast under _BP_BROADCAST_CAP
        and via the bucketed left join above it — both paths must emit
        identical pairs (the house fast-path/fallback equality law)."""
        import ner_ray.pipelines.queries as q

        fast = (
            q.q102_sft_clean(SF)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        monkeypatch.setattr(q, "_BP_BROADCAST_CAP", 0)
        slow = (
            q.q102_sft_clean(SF)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, slow[fast.columns])


class TestTokenBudgetCut:
    """q103 — greedy hash-order prefix under a global token budget via
    the distributed prefix-threshold pattern (bucket masses + one
    boundary-bucket resolution)."""

    def test_twin(self, ray_session):
        _twin_check("q103_token_budget_cut")

    def test_independent_pandas_and_prefix_law(self, ray_session):
        from ner_ray.pipelines.queries import q103_token_budget_cut
        from ner_ray.stages.lm import _tokenize_flat
        from ner_ray.stages.sketches import splitmix64

        import pyarrow as pa

        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        parent, _ = _tokenize_flat(pa.array(docs["text"].tolist(), pa.string()))
        n = np.bincount(parent, minlength=len(docs)).astype(np.int64)
        ids = docs["doc_id"].to_numpy(np.int64)
        h = splitmix64(ids.astype(np.uint64))
        order = np.lexsort((ids, h))
        cb = np.zeros(len(ids), dtype=np.int64)
        cb[order] = np.cumsum(n[order]) - n[order]
        budget = int(n.sum()) // 2
        want = set(ids[cb < budget].astype(int))

        got = q103_token_budget_cut(SF).to_pandas()
        assert set(got["doc_id"].astype(int)) == want
        # greedy-prefix maximality: the selection reaches the budget and
        # removing its last (hash-order) doc would drop under it
        sel_mask = np.isin(ids, list(want))
        total_sel = int(n[sel_mask].sum())
        assert total_sel >= budget
        last = order[np.isin(order, np.flatnonzero(sel_mask))][-1]
        assert total_sel - int(n[last]) < budget


class TestCorpusReport:
    """q104 — the one-row exact-integer corpus datasheet."""

    def test_twin(self, ray_session):
        _twin_check("q104_corpus_report")

    def test_independent_pandas(self, ray_session):
        from ner_ray.functions.texttools import md5_fingerprint
        from ner_ray.pipelines.queries import (
            _REPORT_SHORT_TOKENS,
            q104_corpus_report,
        )
        from ner_ray.stages.lm import _tokenize_flat

        import pyarrow as pa

        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        parent, _ = _tokenize_flat(pa.array(docs["text"].tolist(), pa.string()))
        n = np.bincount(parent, minlength=len(docs)).astype(np.int64)
        fps = docs["text"].map(md5_fingerprint)
        want = {
            "n_docs": len(docs),
            "n_sources": docs["source"].nunique(),
            "n_langs": docs["lang"].nunique(),
            "total_tokens": int(n.sum()),
            "max_tokens": int(n.max()),
            "mean_tokens_micros": (int(n.sum()) * 1_000_000) // len(docs),
            "dup_docs": len(docs) - fps.nunique(),
            "short_docs": int((n < _REPORT_SHORT_TOKENS).sum()),
        }
        got = q104_corpus_report(SF).iloc[0].to_dict()
        assert got == want


class TestCurationFaultTolerance:
    """Task-retry evidence for the catalog ops (the flagship's round-4
    fault test covers ACTOR restart; q102 is a task-pool plan, so the
    failure mode it must survive is a killed map-task worker — Ray
    re-executes lost tasks from lineage)."""

    def test_worker_killed_mid_q102_output_identical(self, tmp_path, ray_session):
        import os
        import signal
        import subprocess
        import threading
        import time

        from ner_ray.fixtures.transcripts import TranscriptConfig, write_transcripts
        import ner_ray.pipelines.queries as q

        # a corpus big enough that the run outlives the kill window on the
        # 4-cpu session cluster
        sf_dir = str(tmp_path / "sf")
        os.makedirs(sf_dir, exist_ok=True)
        tx = os.path.join(sf_dir, "transcripts")
        write_transcripts(tx, TranscriptConfig(n_convs=2500, seed=11), shards=8)

        orig = q.transcripts_path_for
        patched = lambda s: tx if s == sf_dir else orig(s)  # noqa: E731
        q.transcripts_path_for = patched
        try:
            def run():
                return (
                    q.q102_sft_clean(sf_dir)
                    .to_pandas()
                    .sort_values(["conv_id", "turn_idx"])
                    .reset_index(drop=True)
                )

            baseline = run()
            assert len(baseline) > 0

            result: dict = {}

            def target():
                try:
                    result["df"] = run()
                except Exception as exc:
                    result["err"] = exc

            t = threading.Thread(target=target)
            t.start()
            killed = None
            deadline = time.time() + 90
            while time.time() < deadline and killed is None and t.is_alive():
                out = subprocess.run(
                    ["ps", "-eo", "pid,args"], capture_output=True, text=True
                ).stdout
                for line in out.splitlines():
                    if "ray::MapBatches" in line or "ray::Map(" in line:
                        pid = int(line.strip().split(None, 1)[0])
                        try:
                            os.kill(pid, signal.SIGKILL)
                            killed = pid
                        except ProcessLookupError:
                            continue
                        break
                time.sleep(0.05)
            t.join(timeout=300)
            if killed is None:
                pytest.skip("no in-flight map worker observed to kill")
            assert "err" not in result, result.get("err")
            pd.testing.assert_frame_equal(result["df"], baseline)
        finally:
            q.transcripts_path_for = orig


class TestCorpusDiff:
    """q105 — snapshot diff (added / removed / changed by fingerprint)."""

    def test_twin(self, ray_session):
        _twin_check("q105_corpus_diff")

    def test_independent_pandas(self, ray_session):
        import hashlib

        from ner_ray.pipelines.queries import q105_corpus_diff

        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        ids = docs["doc_id"].to_numpy()
        v1 = {
            int(i): hashlib.md5(t.encode()).hexdigest()
            for i, t in zip(ids, docs["text"])
            if i % 3 != 0
        }
        v2 = {
            int(i): hashlib.md5(
                ((t + " v2") if i % 7 == 0 else t).encode()
            ).hexdigest()
            for i, t in zip(ids, docs["text"])
            if i % 5 != 0
        }
        want = {}
        for i in set(v1) | set(v2):
            if i not in v1:
                want[i] = "added"
            elif i not in v2:
                want[i] = "removed"
            elif v1[i] != v2[i]:
                want[i] = "changed"
        got = q105_corpus_diff(SF).to_pandas()
        assert dict(zip(got["doc_id"].astype(int), got["status"])) == want
        # every status class must actually occur on the fixture
        assert set(got["status"]) == {"added", "removed", "changed"}


class TestToolLatency:
    """q106 — per-tool turnaround statistics."""

    def test_twin(self, ray_session):
        from ner_ray.pipelines.queries import _q106_sql, transcripts_path_for

        _twin_check("q106_tool_latency", _q106_sql(transcripts_path_for(SF)))

    def test_independent_pandas(self, ray_session):
        from ner_ray.pipelines.queries import q106_tool_latency

        tx = _fixture_df().sort_values(["conv_id", "turn_idx"])
        rows = []
        for _, g in tx.groupby("conv_id", sort=False):
            ts = g["ts"].astype("int64").to_numpy()
            tools = g["tool"].fillna("").to_numpy()
            for i in range(len(g) - 1):
                if tools[i] != "":
                    rows.append((tools[i], int(ts[i + 1] - ts[i])))
        want = (
            pd.DataFrame(rows, columns=["tool", "lat"])
            .groupby("tool")
            .agg(n_calls=("lat", "size"), total_us=("lat", "sum"), max_us=("lat", "max"))
            .reset_index()
        )
        want["mean_us_micros"] = (want["total_us"] * 1_000_000) // want["n_calls"]
        want = want.sort_values("tool").reset_index(drop=True)
        got = (
            q106_tool_latency(SF)
            .sort_values("tool")
            .reset_index(drop=True)[want.columns]
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestPreferencePairs:
    """q107 — DPO/RLHF preference-pair mining (same prompt, >=2 distinct
    responses, deterministic two-smallest pick)."""

    def test_twin(self, ray_session):
        from ner_ray.pipelines.queries import _q107_sql, transcripts_path_for

        _twin_check("q107_preference_pairs", _q107_sql(transcripts_path_for(SF)))

    def test_independent_pandas(self, ray_session):
        from ner_ray.pipelines.queries import q107_preference_pairs

        tx = _fixture_df().sort_values(["conv_id", "turn_idx"])
        pairs = []
        for _, g in tx.groupby("conv_id", sort=False):
            roles = g["role"].to_numpy()
            texts = g["text"].to_numpy()
            for i in range(1, len(roles)):
                if roles[i] == "assistant" and roles[i - 1] == "user":
                    pairs.append((texts[i - 1], texts[i]))
        d = pd.DataFrame(pairs, columns=["prompt", "response"]).drop_duplicates()
        rows = []
        for prompt, g in d.groupby("prompt"):
            rs = sorted(g["response"])
            if len(rs) >= 2:
                rows.append((prompt, rs[0], rs[1]))
        want = (
            pd.DataFrame(rows, columns=["prompt", "response_a", "response_b"])
            .sort_values("prompt")
            .reset_index(drop=True)
        )
        got = (
            q107_preference_pairs(SF)
            .to_pandas()
            .sort_values("prompt")
            .reset_index(drop=True)[want.columns]
        )
        assert len(got) > 0, "fixture must yield preference candidates"
        pd.testing.assert_frame_equal(got, want)


class TestRareEntitySuppression:
    """q108 — the k-anonymity audit table over flagship mentions."""

    def test_twin(self, ray_session):
        from ner_ray.pipelines.queries import _q108_sql, transcripts_path_for

        _twin_check(
            "q108_rare_entity_suppression", _q108_sql(transcripts_path_for(SF))
        )

    def test_flag_fires_on_toy_corpus(self, ray_session, tmp_path, monkeypatch):
        """The fixture gazetteer is uniformly well-supported, so the flag
        must be proven on a corpus WITH a rare tail: one surface in a
        single conversation, another in three."""
        import pyarrow as pa
        import pyarrow.parquet as paq

        from ner_ray import schemas
        from ner_ray.fixtures import gazetteer as gz
        import ner_ray.pipelines.queries as q

        rare, common = gz.PER[0], gz.PER[1]
        rows = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}

        def add(conv, ti, text):
            rows["conv_id"].append(conv)
            rows["turn_idx"].append(ti)
            rows["role"].append("user")
            rows["text"].append(text)
            rows["tool"].append("")
            rows["ts"].append(1_767_225_600_000_000 + ti)

        add("c1", 0, f"{rare} works at home.")
        for i, conv in enumerate(["c1", "c2", "c3"]):
            add(conv, i + 1, f"{common} visited Lima.")
        tbl = pa.table(
            {
                "conv_id": pa.array(rows["conv_id"], pa.string()),
                "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
                "role": pa.array(rows["role"], pa.string()),
                "text": pa.array(rows["text"], pa.string()),
                "tool": pa.array(rows["tool"], pa.string()),
                "ts": pa.array(rows["ts"], pa.timestamp("us")),
            },
            schema=schemas.TRANSCRIPTS,
        )
        d = tmp_path / "toy_tx"
        d.mkdir()
        paq.write_table(tbl, d / "part-0.parquet")

        orig = q.transcripts_path_for
        monkeypatch.setattr(
            q, "transcripts_path_for", lambda s: str(d) if s == "TOY" else orig(s)
        )
        got = q.q108_rare_entity_suppression("TOY").to_pandas()
        by_surface = got.set_index("surface")
        assert int(by_surface.loc[rare, "suppress"]) == 1
        assert int(by_surface.loc[rare, "n_convs"]) == 1
        assert int(by_surface.loc[common, "suppress"]) == 0
        assert int(by_surface.loc[common, "n_convs"]) == 3


class TestResumableCuration:
    """pipelines/curation.run_sft_curation — the B10 checkpoint/resume
    contract on the curation side (same machinery as the KG stages)."""

    def test_run_skip_and_invalidate(self, ray_session, tmp_path, monkeypatch):
        import json
        import os

        import ner_ray.pipelines.curation as cur
        import ner_ray.pipelines.queries as q
        from ner_ray.pipelines.queries import q102_sft_clean

        out = str(tmp_path / "ckpt")

        ds1, m1 = cur.run_sft_curation(SF, out)
        assert m1["skipped"] is False
        direct = (
            q102_sft_clean(SF)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        got = (
            ds1.to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)[direct.columns]
        )
        pd.testing.assert_frame_equal(got, direct)
        # lineage manifest on disk
        mf = json.load(open(os.path.join(out, "sft_pairs", "manifest.json")))
        assert mf["row_count"] == len(direct) and mf["files"]

        # unchanged input -> resumed, not recomputed (build must not run)
        def boom(_):
            raise AssertionError("build re-executed despite matching signature")

        monkeypatch.setattr(q, "q102_sft_clean", boom)
        ds2, m2 = cur.run_sft_curation(SF, out)
        assert m2["skipped"] is True
        assert len(ds2.to_pandas()) == len(direct)
        monkeypatch.undo()

        # parameter change -> signature change -> rebuild
        monkeypatch.setattr(q, "_SFT_BOILER_MIN_CONVS", 99)
        ds3, m3 = cur.run_sft_curation(SF, out)
        assert m3["skipped"] is False


class TestConvGroupSplit:
    """q109 — group-level split: a conversation never straddles splits."""

    def test_twin(self, ray_session):
        from ner_ray.pipelines.queries import _q109_sql, transcripts_path_for

        _twin_check("q109_conv_group_split", _q109_sql(transcripts_path_for(SF)))

    def test_leak_free_and_proportions(self, ray_session):
        import hashlib

        from ner_ray.pipelines.queries import q109_conv_group_split

        got = q109_conv_group_split(SF).to_pandas()
        tx = _fixture_df()
        # one row per conversation, n_turns exact
        want_counts = tx.groupby("conv_id").size().sort_index()
        assert len(got) == len(want_counts)
        merged = got.set_index("conv_id")["n_turns"].sort_index()
        assert (merged.to_numpy() == want_counts.to_numpy()).all()
        assert list(merged.index) == list(want_counts.index)
        # independent split re-derivation
        for conv_id, row in got.set_index("conv_id").iterrows():
            h2 = hashlib.md5(conv_id.encode()).hexdigest()[:2]
            want = "train" if h2 < "cc" else ("val" if h2 < "e6" else "test")
            assert row["split"] == want
        # all three splits occur on the fixture
        assert set(got["split"]) == {"train", "val", "test"}


class TestEpochShuffleOrders:
    """q110 — deterministic multi-epoch data-loader orders."""

    def test_twin(self, ray_session):
        _twin_check("q110_epoch_shuffle_orders")

    def test_epochs_decorrelated_and_complete(self, ray_session):
        from ner_ray.pipelines.queries import (
            _EPOCHS,
            _EPOCH_SHARDS,
            q110_epoch_shuffle_orders,
        )

        got = q110_epoch_shuffle_orders(SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        n = len(docs)
        # every epoch is a complete assignment of all docs
        for e in range(_EPOCHS):
            g = got[got["epoch"] == e]
            assert len(g) == n
            assert set(g["doc_id"]) == set(docs["doc_id"])
            # positions are 1..|shard| within each shard
            for _s, sg in g.groupby("shard"):
                assert sorted(sg["pos"]) == list(range(1, len(sg) + 1))
            assert set(g["shard"]) <= set(range(_EPOCH_SHARDS))
        # epoch orders are decorrelated: the global (shard, pos) order of
        # epoch 0 and epoch 1 must differ for most docs
        o0 = got[got["epoch"] == 0].set_index("doc_id")[["shard", "pos"]].sort_index()
        o1 = got[got["epoch"] == 1].set_index("doc_id")[["shard", "pos"]].sort_index()
        same = (
            (o0["shard"].to_numpy() == o1["shard"].to_numpy())
            & (o0["pos"].to_numpy() == o1["pos"].to_numpy())
        ).mean()
        assert same < 0.2, f"epoch orders too correlated: {same:.2f}"


class TestSkewReport:
    """q111 — key-skew diagnostics with exact rank-based quantiles."""

    def test_twin(self, ray_session):
        from ner_ray.pipelines.queries import _q111_sql, transcripts_path_for

        _twin_check("q111_skew_report", _q111_sql(transcripts_path_for(SF)))

    def test_independent_pandas(self, ray_session):
        from ner_ray.pipelines.queries import q111_skew_report

        tx = _fixture_df()
        c = tx.groupby("conv_id").size().sort_values(ascending=False)
        K, N, M = len(c), int(c.sum()), int(c.max())
        s = np.sort(c.to_numpy())
        got = q111_skew_report(SF).set_index("metric")
        assert int(got.loc["n_keys", "value"]) == K
        assert int(got.loc["n_rows", "value"]) == N
        assert int(got.loc["max_rows", "value"]) == M
        assert int(got.loc["p50_rows", "value"]) == int(s[int(np.ceil(0.5 * K)) - 1])
        assert int(got.loc["p99_rows", "value"]) == int(s[int(np.ceil(0.99 * K)) - 1])
        assert int(got.loc["skew_max_over_mean_micros", "value"]) == (
            M * K * 1_000_000
        ) // N
        # the mega-conversation (conv-000000) must be the hottest key
        assert got.loc["hot_1", "key"] == "conv-000000"
        assert int(got.loc["hot_1", "value"]) == M
        # the report must actually show skew on this fixture
        assert int(got.loc["skew_max_over_mean_micros", "value"]) > 2_000_000


class TestContrastivePairs:
    """q112 — positives + hard negatives from the LSH candidate stream."""

    def test_twin(self, ray_session):
        from ner_ray.pipelines.queries import _minhash_fixture, _q112_sql, _t

        _twin_check(
            "q112_contrastive_pairs",
            _q112_sql(_minhash_fixture(_t(SF, "documents"))),
        )

    def test_positive_labels_on_fixture(self, ray_session):
        from ner_ray.pipelines.queries import q112_contrastive_pairs

        got = q112_contrastive_pairs(SF).to_pandas()
        assert len(got) > 0 and (got["label"] == 1).any()
        assert (got["doc_a"] < got["doc_b"]).all()
        # each candidate pair appears once
        assert not got.duplicated(["doc_a", "doc_b"]).any()
        # label consistent with the agreement count at 0.7 * 128
        want = (got["n_agree"] >= 0.7 * 128).astype("int64")
        assert (got["label"] == want).all()

    def test_hard_negative_on_borderline_pair(self, ray_session):
        """The fixture's LSH buckets only collide for true near-dups, so
        the HARD-NEGATIVE branch is proven on a crafted borderline pair:
        ~90% token overlap -> near-certain band collision with signature
        agreement below the 0.7 threshold."""
        import pyarrow as pa
        import ray.data as rd

        from ner_ray.stages.text_dedup import minhash_contrastive_pairs

        base = " ".join(f"tok{i}" for i in range(60))
        mut = " ".join(
            (f"alt{i}" if i % 10 == 0 else f"tok{i}") for i in range(60)
        )
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([base, mut, base], pa.string()),
            }
        )
        got = (
            minhash_contrastive_pairs(rd.from_arrow(t), threshold=0.7)
            .to_pandas()
            .set_index(["doc_a", "doc_b"])
        )
        # exact dup -> positive; borderline pair -> hard negative
        assert int(got.loc[(1, 3), "label"]) == 1
        assert int(got.loc[(1, 2), "label"]) == 0
        assert int(got.loc[(1, 2), "n_agree"]) < 0.7 * 128
