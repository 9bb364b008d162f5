"""Round-5 additions: vectorized curation kernels (batch lang-ID / quality /
char classes), the finite bigram-LM cap, the bucketed Arrow window/session
kernels, and the shared flagship-triples cache."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"

EDGE_TEXTS = [
    "",
    "   ",
    None,
    "the the the",
    "渐江 省 杭州 市 西湖 这 是 中文 文本 测试",
    "a" * 40,
    "12345 67890 11 22 33",
    "x\ty\nz",
    "Hello, World! 42",
    "é ü ñ über café naïve",
    "mixed 中文 and english the of to in is it for on",
    "!!! ??? ... ---",
    "one",
    "the quick brown fox jumps over the lazy dog again and again",
]


class TestBatchTextKernels:
    """Bit-equality of the vectorized batch kernels against the per-row
    reference implementations — on the fixture corpus AND unicode edges."""

    def _texts(self):
        t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
        return t["text"].to_pylist() + EDGE_TEXTS

    def test_char_classes_parity(self):
        from ner_ray.functions.texttools import char_classes, char_classes_batch

        texts = self._texts()
        batch = char_classes_batch(pa.array(texts, pa.string()))
        for i, x in enumerate(texts):
            ref = char_classes(x or "")
            got = {k: int(v[i]) for k, v in batch.items() if k != "n_chars"}
            assert ref == got, (x, ref, got)

    def test_lang_id_parity(self):
        from ner_ray.functions.texttools import lang_id, lang_id_batch

        texts = self._texts()
        got = lang_id_batch(pa.array(texts, pa.string())).to_pylist()
        ref = [lang_id(x or "") for x in texts]
        assert got == ref

    def test_quality_score_parity(self):
        from ner_ray.functions.texttools import quality_score, quality_score_batch

        texts = self._texts()
        got = quality_score_batch(pa.array(texts, pa.string()))
        ref = np.array([quality_score(x or "") for x in texts])
        assert np.array_equal(got, ref)


class TestLmCap:
    def test_default_cap_is_finite(self):
        import inspect

        from ner_ray.stages.lm import (
            DEFAULT_MAX_BIGRAMS,
            dsir_select,
            lm_perplexity_filter,
            train_bigram_lm,
        )

        assert DEFAULT_MAX_BIGRAMS is not None
        for fn in (train_bigram_lm, lm_perplexity_filter, dsir_select):
            assert (
                inspect.signature(fn).parameters["max_bigrams"].default
                == DEFAULT_MAX_BIGRAMS
            )

    def test_open_vocabulary_corpus_is_bounded(self, ray_session):
        """Adversarial open-vocabulary corpus: far more distinct bigrams than
        the cap, all above min_count — the driver-side model must truncate
        to exactly max_bigrams with the (count desc, gram asc) tie-break."""
        from ner_ray.stages.lm import train_bigram_lm

        rng = np.random.default_rng(7)
        # 2000 docs of random token pairs -> ~thousands of distinct bigrams,
        # each repeated twice so min_count keeps them all
        docs = []
        for _ in range(2000):
            a, b = rng.integers(0, 200, size=2)
            docs.append(f"w{a} w{b} w{a} w{b}")
        ds = rd.from_arrow(pa.table({"text": pa.array(docs * 2, pa.string())}))
        uni, bi, total = train_bigram_lm(ds, max_bigrams=50)
        assert len(bi) == 50
        # deterministic: re-train gives the identical truncated model
        uni2, bi2, _ = train_bigram_lm(ds, max_bigrams=50)
        assert bi == bi2

    def test_tokenize_flat_matches_findall(self):
        from ner_ray.stages.decontam import TOKEN_RE
        from ner_ray.stages.lm import _tokenize_flat

        texts = EDGE_TEXTS + ["a1-b2_c3", "ONE one oNe", "  spaced   out  "]
        parent, flat = _tokenize_flat(pa.array(texts, pa.string()))
        got: dict[int, list[str]] = {}
        for p, tok in zip(parent, flat.to_pylist()):
            got.setdefault(int(p), []).append(tok)
        for i, x in enumerate(texts):
            assert got.get(i, []) == TOKEN_RE.findall((x or "").lower()), x


class TestBucketedGroupKernels:
    """The bucketed Arrow window/session kernels against brute-force
    per-key references on synthetic data with ties and single-row keys."""

    def _events(self, n=4000, keys=37, seed=11):
        rng = np.random.default_rng(seed)
        uid = rng.integers(0, keys, size=n)
        base = np.datetime64("2024-01-01", "us")
        ts = base + np.sort(rng.integers(0, 10**7, size=n)).astype("timedelta64[us]")
        # shuffle so arrival order is not ts order
        perm = rng.permutation(n)
        return pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "user_id": pa.array(uid[perm], pa.int64()),
                "ts": pa.array(ts[perm]),
                "value": pa.array(rng.uniform(-5, 5, size=n), pa.float64()),
            }
        )

    def test_window_funcs_matches_bruteforce(self, ray_session):
        from ner_ray.stages.window import to_micros, window_funcs

        t = self._events()
        out = (
            window_funcs(
                rd.from_arrow(t).repartition(8),
                key_col="user_id",
                order_cols=["ts", "event_id"],
                value_col="value",
                id_col="event_id",
                moving_rows=4,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        rows = []
        for uid, g in df.groupby("user_id"):
            v = to_micros(g["value"].to_numpy())
            cum = np.cumsum(v)
            for i in range(len(g)):
                mov = int(v[max(0, i - 3) : i + 1].sum())
                rows.append(
                    {
                        "event_id": g["event_id"].iloc[i],
                        "user_id": uid,
                        "rn": i + 1,
                        "lag_value_micro": None if i == 0 else int(v[i - 1]),
                        "cum_value_micro": int(cum[i]),
                        "mov_value_micro": mov,
                    }
                )
        ref = (
            pd.DataFrame(rows).sort_values("event_id").reset_index(drop=True)
        )
        got = out[ref.columns]
        assert len(got) == len(ref)
        for c in ["rn", "cum_value_micro", "mov_value_micro"]:
            assert np.array_equal(got[c].to_numpy(), ref[c].to_numpy()), c
        g_lag = got["lag_value_micro"].astype("Int64")
        r_lag = ref["lag_value_micro"].astype("Int64")
        assert g_lag.equals(r_lag)

    def test_sessionize_matches_bruteforce(self, ray_session):
        from ner_ray.stages.relational import sessionize

        t = self._events(n=3000, keys=23, seed=5)
        out = (
            sessionize(
                rd.from_arrow(t.drop_columns(["event_id"])).repartition(8),
                gap_seconds=600,
            )
            .to_pandas()
            .sort_values(["user_id", "session_start"])
            .reset_index(drop=True)
        )
        df = t.to_pandas().sort_values(["user_id", "ts"])
        rows = []
        for uid, g in df.groupby("user_id"):
            ts = g["ts"].to_numpy()
            vals = g["value"].to_numpy()
            start = 0
            for i in range(1, len(g) + 1):
                if i == len(g) or (ts[i] - ts[i - 1]) / np.timedelta64(
                    1, "s"
                ) > 600:
                    rows.append(
                        {
                            "user_id": uid,
                            "session_start": ts[start],
                            "n_events": i - start,
                            "sum_value": round(float(vals[start:i].sum()), 4),
                        }
                    )
                    start = i
        ref = (
            pd.DataFrame(rows)
            .sort_values(["user_id", "session_start"])
            .reset_index(drop=True)
        )
        assert len(out) == len(ref)
        assert np.array_equal(out["n_events"].to_numpy(), ref["n_events"].to_numpy())
        assert np.array_equal(
            out["session_start"].to_numpy(), ref["session_start"].to_numpy()
        )
        assert np.allclose(
            out["sum_value"].to_numpy(), ref["sum_value"].to_numpy(), atol=1e-9
        )


class TestTrainedBiLSTM:
    """Round-5 trained-weights path: numpy-SGD BiLSTM-CRF training on the
    synthetic CJK corpus, checkpoint round-trip through the production
    loader, and contextual generalization to NEVER-SEEN entity surfaces
    (the rule tagger's gazetteer recall is ~0 on the held-out split)."""

    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        from ner_ray.state.train import build_trained_checkpoint

        path = str(tmp_path_factory.mktemp("ck") / "bilstm")
        metrics = build_trained_checkpoint(
            path, n_train=600, n_eval=200, epochs=6, seed=17
        )
        return metrics

    def test_beats_rule_tagger_on_heldout(self, trained):
        assert trained["rule_heldout_f1"] < 0.05
        assert trained["heldout_f1"] > trained["rule_heldout_f1"]
        assert trained["heldout_f1"] >= 0.85, trained
        assert trained["train_f1"] >= 0.99, trained

    def test_checkpoint_roundtrip_identical_decode(self, trained):
        from ner_ray.functions.normalize import chars_to_ids
        from ner_ray.functions.viterbi import viterbi_decode_batch
        from ner_ray.state.checkpoint import load_bilstm
        from ner_ray.state.train import make_corpus, make_surface_splits

        model = load_bilstm(trained["path"])
        held = make_corpus(50, make_surface_splits(seed=17)[1], seed=99)
        for chars, _tags in held:
            ids = np.array([chars_to_ids(chars, model.word2id)], np.int64)
            lens = np.array([len(chars)], np.int64)
            emis = model.emissions(ids, lengths=lens)
            p1 = viterbi_decode_batch(emis, lens, model.transitions)
            p2 = viterbi_decode_batch(
                load_bilstm(trained["path"]).emissions(ids, lengths=lens),
                lens,
                model.transitions,
            )
            assert np.array_equal(p1, p2)

    def test_distributed_path_loads_checkpoint(self, trained, ray_session):
        """The production actor-pool tagger consumes the trained checkpoint
        via weights_path and reproduces the in-process held-out F1."""
        import pyarrow as pa_

        from ner_ray.sources.bio_corpus import parse_bio_text, format_bio_text
        from ner_ray.stages.evaluate import evaluate_tags, tag_bio_corpus
        from ner_ray.state.train import make_corpus, make_surface_splits

        held = make_corpus(120, make_surface_splits(seed=17)[1], seed=19)
        t = pa_.table(
            {
                "sentence_id": pa_.array(range(len(held)), pa_.int64()),
                "chars": pa_.array([c for c, _ in held], pa_.list_(pa_.string())),
                "tags": pa_.array([g for _, g in held], pa_.list_(pa_.string())),
            }
        )
        ds = rd.from_arrow(t).repartition(4)
        rep = evaluate_tags(
            tag_bio_corpus(ds, tagger="bilstm", weights_path=trained["path"])
        )
        assert rep["overall"]["f1"] >= 0.85, rep

    def test_emissions_batch_composition_invariant(self, trained):
        """With lengths, a short row's emissions are identical whether it is
        padded into a long batch or processed alone — the property trained
        weights need (the old padded-tail backward pass broke it)."""
        from ner_ray.functions.normalize import chars_to_ids
        from ner_ray.state.checkpoint import load_bilstm

        model = load_bilstm(trained["path"])
        short = chars_to_ids(list("赵伟在京市工作"), model.word2id)
        alone = model.emissions(
            np.array([short], np.int64), lengths=np.array([len(short)])
        )[0, : len(short)]
        padded_ids = np.zeros((2, 30), np.int64)
        padded_ids[0, : len(short)] = short
        padded_ids[1, :] = 3  # another full-length row in the same batch
        both = model.emissions(
            padded_ids, lengths=np.array([len(short), 30])
        )[0, : len(short)]
        assert np.allclose(alone, both, atol=1e-12)


class TestBucketedHashJoin:
    """The round-5 bucketed hash_join (one bucket shuffle + vectorized
    multi-segment merge) against pandas merge on randomized inputs, plus
    the SQL null-key rule (a NULL key never matches; left/full still emit
    the row with the other side nulled)."""

    def _ref(self, l, r, on, how):
        out = l.merge(r, on=on, how={"inner": "inner", "left": "left", "full": "outer"}[how])
        return out

    @pytest.mark.parametrize("how", ["inner", "left", "full"])
    def test_matches_pandas_merge(self, how, ray_session):
        from ner_ray.stages.joins import hash_join

        rng = np.random.default_rng(31)
        l = pd.DataFrame(
            {
                "k": rng.integers(0, 60, size=400),
                "lv": rng.integers(0, 1000, size=400),
            }
        )
        r = pd.DataFrame(
            {
                "k": rng.integers(30, 90, size=300),
                "rv": rng.integers(0, 1000, size=300),
            }
        )
        got = (
            hash_join(
                rd.from_pandas(l).repartition(5),
                rd.from_pandas(r).repartition(3),
                on="k",
                how=how,
                num_buckets=7,  # force multi-key buckets
            )
            .to_pandas()
            .fillna(-1)
            .astype({"k": "int64", "lv": "int64", "rv": "int64"})
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        ref = (
            self._ref(l, r, "k", how)
            .fillna(-1)
            .astype({"k": "int64", "lv": "int64", "rv": "int64"})
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref)

    def test_null_keys_never_match(self, ray_session):
        from ner_ray.stages.joins import hash_join

        l = pa.table(
            {"k": pa.array([1, None, 2, None], pa.int64()), "lv": pa.array(list("abcd"))}
        )
        r = pa.table({"k": pa.array([1, None, 3], pa.int64()), "rv": pa.array(list("xyz"))})
        ls = pa.schema([("k", pa.int64()), ("lv", pa.string())])
        rs = pa.schema([("k", pa.int64()), ("rv", pa.string())])
        inner = hash_join(
            rd.from_arrow(l).repartition(2), rd.from_arrow(r).repartition(2),
            on="k", left_schema=ls, right_schema=rs,
        ).to_pandas()
        assert sorted(inner["lv"]) == ["a"]  # only k=1 matches
        left = hash_join(
            rd.from_arrow(l).repartition(2), rd.from_arrow(r).repartition(2),
            on="k", how="left", left_schema=ls, right_schema=rs,
        ).to_pandas()
        assert sorted(left["lv"]) == ["a", "b", "c", "d"]
        assert left.loc[left["lv"] != "a", "rv"].isna().all()
        full = hash_join(
            rd.from_arrow(l).repartition(2), rd.from_arrow(r).repartition(2),
            on="k", how="full", left_schema=ls, right_schema=rs,
        ).to_pandas()
        # 4 left rows (1 matched) + 2 unmatched right rows (null-k and k=3)
        assert len(full) == 6

    def test_string_null_keys_never_match(self, ray_session):
        from ner_ray.stages.joins import hash_join

        l = pa.table({"k": pa.array(["x", None, "y"]), "lv": pa.array([1, 2, 3], pa.int64())})
        r = pa.table({"k": pa.array(["x", None]), "rv": pa.array([10, 20], pa.int64())})
        inner = hash_join(
            rd.from_arrow(l), rd.from_arrow(r), on="k",
            left_schema=pa.schema([("k", pa.string()), ("lv", pa.int64())]),
            right_schema=pa.schema([("k", pa.string()), ("rv", pa.int64())]),
        ).to_pandas()
        assert inner["k"].tolist() == ["x"]


class TestFlagshipCache:
    def test_cache_reused_within_job(self, ray_session):
        from ner_ray.pipelines import queries as q

        q._FLAGSHIP_TRIPLES_CACHE.clear()
        a = q._flagship_triples(SF)
        assert len(q._FLAGSHIP_TRIPLES_CACHE) == 1
        b = q._flagship_triples(SF)
        assert a is b


class TestQuotaWeightedSample:
    """q88 — the composed per-domain quota -> global E-S weighted sample."""

    def test_twin_sf0001(self, ray_session):
        import sys

        import duckdb

        sys.path.insert(0, "tools")
        from oracle_check import TABLES, canon, compare, to_pandas

        from ner_ray.pipelines.queries import RAY_QUERIES, oracle_sql_catalog

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            )
        mine = canon(to_pandas(RAY_QUERIES["q88_quota_weighted_sample"](SF)))
        oracle = canon(
            con.execute(oracle_sql_catalog()["q88_quota_weighted_sample"]).df()
        )
        ok, why = compare(mine, oracle)
        assert ok, why

    def test_quota_and_k_respected(self, ray_session):
        from ner_ray.pipelines.queries import (
            _Q88_K,
            _Q88_QUOTA,
            q88_quota_weighted_sample,
        )

        out = q88_quota_weighted_sample(SF).to_pandas()
        assert 0 < len(out) <= _Q88_K
        assert (out["pos"] >= 1).all() and (out["pos"] <= _Q88_QUOTA).all()
        assert out.groupby("domain").size().max() <= _Q88_QUOTA
        # weighted draw: weights are the positive n_chars, keys strictly neg
        assert (out["weight"] > 0).all()
        assert (out["key_micros"] <= 0).all()

    def test_draws_are_decorrelated(self, ray_session):
        """The E-S hash chain is salted away from the quota chain: winning
        rank inside a domain (pos) must not order the global sample keys."""
        from ner_ray.pipelines.queries import q88_quota_weighted_sample

        out = q88_quota_weighted_sample(SF).to_pandas()
        r = np.corrcoef(out["pos"], out["key_micros"])[0, 1]
        assert abs(r) < 0.5


class TestSlidingChunks:
    """q89 — overlapping sliding-window chunking (RAG layout)."""

    def test_twin_sf0001(self, ray_session):
        import sys

        import duckdb

        sys.path.insert(0, "tools")
        from oracle_check import TABLES, canon, compare, to_pandas

        from ner_ray.pipelines.queries import RAY_QUERIES, oracle_sql_catalog

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            )
        mine = canon(to_pandas(RAY_QUERIES["q89_sliding_chunks"](SF)))
        oracle = canon(con.execute(oracle_sql_catalog()["q89_sliding_chunks"]).df())
        ok, why = compare(mine, oracle)
        assert ok, why

    def test_stride_equals_size_degenerates_to_sequence_chunks(self, ray_session):
        from ner_ray.stages.packing import sequence_chunks, sliding_chunks

        tbl = pa.table(
            {
                "doc_id": pa.array(range(40), pa.int64()),
                "n_tokens": pa.array([(i * 37) % 90 for i in range(40)], pa.int64()),
            }
        )
        a = (
            sliding_chunks(rd.from_arrow(tbl).repartition(3), 64, 64, n_domains=2)
            .to_pandas()
            .sort_values(["domain", "doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        b = (
            sequence_chunks(rd.from_arrow(tbl).repartition(3), 64, n_domains=2)
            .to_pandas()
            .sort_values(["domain", "doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_overlap_windows_and_span_bounds(self, ray_session):
        from ner_ray.stages.packing import sliding_chunks

        tbl = pa.table(
            {
                "doc_id": pa.array(range(30), pa.int64()),
                "n_tokens": pa.array([5 + (i * 13) % 70 for i in range(30)], pa.int64()),
            }
        )
        out = sliding_chunks(
            rd.from_arrow(tbl).repartition(2), 32, 16, n_domains=1
        ).to_pandas()
        # every row's span sits inside its window [k*16, k*16+32)
        assert (out["tok_start"] >= out["chunk_id"] * 16).all()
        assert (out["tok_end"] <= out["chunk_id"] * 16 + 32).all()
        assert (out["tok_end"] > out["tok_start"]).all()
        # interior stream positions are covered by exactly size/stride = 2
        # windows: pick a token position well inside the stream and count
        total = int(tbl["n_tokens"].to_numpy().sum())
        pos = total // 2
        covering = out[(out["tok_start"] <= pos) & (out["tok_end"] > pos)]
        assert covering["chunk_id"].nunique() == 2

    def test_rejects_nonpositive_params(self):
        from ner_ray.stages.packing import sliding_chunks

        with pytest.raises(ValueError):
            sliding_chunks(None, 0, 16)
        with pytest.raises(ValueError):
            sliding_chunks(None, 64, 0)


class TestHistogramQuantiles:
    """q90 — mergeable fixed-grid histogram quantiles."""

    def test_within_one_bin_of_exact(self, ray_session):
        import pyarrow.parquet as pq

        from ner_ray.stages.sketches import histogram_quantiles

        tbl = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_extendedprice"])
        x = np.sort(tbl["l_extendedprice"].to_numpy())
        bins = 256
        w = (x[-1] - x[0]) / bins
        out = histogram_quantiles(rd.from_arrow(tbl).repartition(4), "l_extendedprice", bins=bins)
        for _, row in out.iterrows():
            exact = float(np.quantile(x, row["p"]))
            assert abs(row["estimate"] - exact) <= w + 1e-6, (row["p"], row["estimate"], exact)

    def test_partition_invariance(self, ray_session):
        """The sketch is a commutative bincount sum: any block layout gives
        bit-identical output (the mergeability law)."""
        import pyarrow.parquet as pq

        from ner_ray.stages.sketches import histogram_quantiles

        tbl = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_extendedprice"])
        a = histogram_quantiles(rd.from_arrow(tbl).repartition(1), "l_extendedprice")
        b = histogram_quantiles(rd.from_arrow(tbl).repartition(13), "l_extendedprice")
        pd.testing.assert_frame_equal(a, b)

    def test_constant_column_degenerate(self, ray_session):
        from ner_ray.stages.sketches import histogram_quantiles

        tbl = pa.table({"v": pa.array([7.5] * 100, pa.float64())})
        out = histogram_quantiles(rd.from_arrow(tbl), "v")
        assert (out["estimate"] == 7.5).all()


class TestJsDivergence:
    """q91 — pairwise corpus Jensen-Shannon divergence."""

    def _ds(self, rows):
        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array([r[0] for r in rows], pa.string()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        ).repartition(3)

    def test_identical_corpora_zero(self, ray_session):
        from ner_ray.stages.lm import corpus_js_divergence

        rows = [("a", "the cat sat on the mat"), ("b", "the cat sat on the mat")]
        out = corpus_js_divergence(self._ds(rows))
        assert len(out) == 1
        assert out["js_pico"].iloc[0] == 0

    def test_disjoint_corpora_ln2(self, ray_session):
        from ner_ray.stages.lm import corpus_js_divergence

        rows = [("a", "alpha beta gamma"), ("b", "delta epsilon zeta")]
        out = corpus_js_divergence(self._ds(rows))
        assert abs(out["js_divergence"].iloc[0] - np.log(2)) < 1e-6

    def test_matches_bruteforce(self, ray_session):
        """Distributed bucketed kernel == single-process dense reference on
        the fixture corpus (all 190 source pairs)."""
        import re

        import pyarrow.parquet as pq

        from ner_ray.stages.lm import corpus_js_divergence

        tbl = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
        out = corpus_js_divergence(rd.from_arrow(tbl).repartition(5))
        # brute force
        from collections import Counter, defaultdict

        cnt: dict[str, Counter] = defaultdict(Counter)
        for s, t in zip(tbl["source"].to_pylist(), tbl["text"].to_pylist()):
            cnt[s].update(re.findall(r"[a-z0-9]+", (t or "").lower()))
        keys = sorted(cnt)
        vocab = sorted(set().union(*[set(c) for c in cnt.values()]))
        tot = {k: sum(cnt[k].values()) for k in keys}
        ref = {}
        for i, a in enumerate(keys):
            for b in keys[i + 1 :]:
                pico = 0
                for term in vocab:
                    pa_ = cnt[a][term] / tot[a]
                    pb_ = cnt[b][term] / tot[b]
                    c = 0.0
                    if pa_ > 0:
                        c += 0.5 * pa_ * np.log(2 * pa_ / (pa_ + pb_))
                    if pb_ > 0:
                        c += 0.5 * pb_ * np.log(2 * pb_ / (pa_ + pb_))
                    pico += int(np.floor(c * 1e12 + 0.5))
                ref[(a, b)] = pico
        got = {
            (r["source_a"], r["source_b"]): int(r["js_pico"]) for _, r in out.iterrows()
        }
        assert got == ref

    def test_bucket_count_invariance(self, ray_session):
        import pyarrow.parquet as pq

        from ner_ray.stages.lm import corpus_js_divergence

        tbl = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
        a = corpus_js_divergence(rd.from_arrow(tbl), num_buckets=7)
        b = corpus_js_divergence(rd.from_arrow(tbl), num_buckets=512)
        pd.testing.assert_frame_equal(
            a.sort_values(["source_a", "source_b"]).reset_index(drop=True),
            b.sort_values(["source_a", "source_b"]).reset_index(drop=True),
        )


class TestTrainTestSplit:
    """q92 — deterministic hash split assignment."""

    def test_disjoint_complete_and_deterministic(self, ray_session):
        from ner_ray.pipelines.queries import q92_train_test_split

        a = q92_train_test_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = q92_train_test_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        import pyarrow.parquet as pq

        n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
        assert len(a) == n_docs and a["doc_id"].is_unique
        assert set(a["split"]) <= {"train", "val", "test"}
        assert ((a["bucket100"] >= 0) & (a["bucket100"] < 100)).all()
        # split boundaries honor the bucket
        assert (a.loc[a["split"] == "train", "bucket100"] < 80).all()
        assert (a.loc[a["split"] == "val", "bucket100"].between(80, 89)).all()
        assert (a.loc[a["split"] == "test", "bucket100"] >= 90).all()

    def test_proportions_at_scale(self, ray_session):
        """splitmix64 avalanche makes the 80/10/10 target hold tightly on a
        large id range."""
        from ner_ray.stages.sketches import splitmix64

        ids = np.arange(200_000, dtype=np.uint64)
        r = splitmix64(ids) % np.uint64(100)
        frac_train = float((r < 80).mean())
        frac_val = float(((r >= 80) & (r < 90)).mean())
        assert abs(frac_train - 0.80) < 0.005
        assert abs(frac_val - 0.10) < 0.005


class TestNewTwinsSf0001:
    """q90/q91/q92 twin equality in-suite (the driver-style gate at
    sf0.001; tools/oracle_check.py sweeps sf0.01)."""

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
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            )
        mine = canon(to_pandas(RAY_QUERIES[name](SF)))
        oracle = canon(con.execute(sql).df())
        ok, why = compare(mine, oracle)
        assert ok, f"{name}: {why}"

    def test_q90_twin(self, ray_session):
        self._check("q90_histogram_quantiles")

    def test_q91_twin(self, ray_session):
        self._check("q91_js_divergence")

    def test_q92_twin(self, ray_session):
        self._check("q92_train_test_split")


class TestStableHash64:
    """The NUL-safe bucket-hash primitive (utils.stable_hash64): pandas'
    factorize path compares C strings, so \\x00-joined composite keys that
    share a prefix before the first NUL collided and inherited a
    BLOCK-ORDER-DEPENDENT hash — the same key could land in different
    shuffle buckets in different blocks (observed: duplicate output rows
    from the triple-provenance and dedup bucketed merges)."""

    def test_nul_keys_distinct_and_order_independent(self):
        from ner_ray.utils import stable_hash64

        a = stable_hash64(pa.array(["a\x00p\x00x", "a\x00p\x00y", "plain"]))
        b = stable_hash64(pa.array(["a\x00p\x00y", "plain", "a\x00p\x00x"]))
        assert a[0] != a[1]  # distinct keys -> distinct hashes
        assert a[0] == b[2] and a[1] == b[0] and a[2] == b[1]

    def test_nul_free_values_unchanged(self):
        """For NUL-free input the values are bit-identical to the old
        categorize=True path, so existing hash-partitioned layouts and
        green twins are unaffected."""
        from ner_ray.utils import stable_hash64

        arr = np.array(["plain", "k2", "conv_000123"], dtype=object)
        assert (stable_hash64(arr) == pd.util.hash_array(arr)).all()
        ints = np.arange(100, dtype=np.int64)
        assert (stable_hash64(ints) == pd.util.hash_array(ints)).all()

    def test_dedup_distributed_path_no_duplicate_triples(self, ray_session):
        """Regression: same-subj triples (shared prefix before the first
        NUL of the joined key) must merge to ONE row per (s,p,o) through
        the BUCKETED path regardless of block layout."""
        from ner_ray.stages.dedup import dedup_triples

        tbl = pa.table(
            {
                "subj": pa.array(["acme"] * 120 + ["zeta"] * 40, pa.string()),
                "pred": pa.array(
                    (["p"] * 60 + ["q"] * 60 + ["p"] * 40), pa.string()
                ),
                "obj": pa.array(
                    (["x"] * 30 + ["y"] * 30) * 2 + ["x"] * 40, pa.string()
                ),
                "conv_id": pa.array([f"c{i%5}" for i in range(160)], pa.string()),
                "turn_idx": pa.array([i % 9 for i in range(160)], pa.int32()),
                "confidence": pa.array([0.5] * 160, pa.float32()),
            }
        )
        out = (
            dedup_triples(rd.from_arrow(tbl).repartition(7), driver_threshold=0)
            .to_pandas()
            .sort_values(["subj", "pred", "obj"])
            .reset_index(drop=True)
        )
        assert not out.duplicated(["subj", "pred", "obj"]).any()
        assert int(out["n_support"].sum()) == 160


class TestTripleProvenance:
    """q94 — per-triple temporal lineage."""

    def _toy(self):
        canon = pa.table(
            {
                "subj": pa.array(["a", "a", "a", "b"] * 50, pa.string()),
                "pred": pa.array(["p"] * 200, pa.string()),
                "obj": pa.array(["x", "x", "y", "y"] * 50, pa.string()),
                "conv_id": pa.array([f"c{i%7}" for i in range(200)], pa.string()),
                "turn_idx": pa.array([i % 13 for i in range(200)], pa.int32()),
            }
        )
        ts = pa.table(
            {
                "conv_id": pa.array(
                    [f"c{i}" for i in range(7) for _ in range(13)], pa.string()
                ),
                "turn_idx": pa.array(
                    [j for _ in range(7) for j in range(13)], pa.int32()
                ),
                "ts_us": pa.array(range(91), pa.int64()),
            }
        )
        return canon, ts

    def test_merges_and_counts(self, ray_session):
        from ner_ray.stages.dedup import triple_provenance

        canon, ts = self._toy()
        out = (
            triple_provenance(
                rd.from_arrow(canon).repartition(6), rd.from_arrow(ts).repartition(3)
            )
            .to_pandas()
            .sort_values(["subj", "pred", "obj"])
            .reset_index(drop=True)
        )
        assert len(out) == 3  # (a,p,x), (a,p,y), (b,p,y)
        assert out["n_support"].tolist() == [100, 50, 50]
        assert (out["n_convs"] == 7).all()
        assert (out["first_ts_us"] <= out["last_ts_us"]).all()

    def test_partition_invariance(self, ray_session):
        from ner_ray.stages.dedup import triple_provenance

        canon, ts = self._toy()
        outs = []
        for parts in (1, 6):
            outs.append(
                triple_provenance(
                    rd.from_arrow(canon).repartition(parts),
                    rd.from_arrow(ts).repartition(2),
                    num_buckets=5,
                )
                .to_pandas()
                .sort_values(["subj", "pred", "obj"])
                .reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_q94_consistent_with_flagship_dedup(self, ray_session):
        """q94's (triple, n_support) set must equal the flagship dedup
        output's — both aggregate the same pre-dedup canonical stream."""
        from ner_ray.pipelines.queries import RAY_QUERIES

        prov = (
            RAY_QUERIES["q94_kg_triple_provenance"](SF)
            .to_pandas()
            .sort_values(["subj", "pred", "obj"])
            .reset_index(drop=True)
        )
        canon = (
            RAY_QUERIES["kg_canon_triples"](SF)
            .to_pandas()
            .sort_values(["subj", "pred", "obj"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            prov[["subj", "pred", "obj", "n_support"]],
            canon[["subj", "pred", "obj", "n_support"]],
        )


class TestToolTransitions:
    """q93 — tool-call transition matrix over agent transcripts."""

    def test_twin_sf0001(self, ray_session):
        import sys

        import duckdb

        sys.path.insert(0, "tools")
        from oracle_check import canon, compare, to_pandas

        from ner_ray.pipelines.queries import (
            RAY_QUERIES,
            _q93_sql,
            transcripts_path_for,
        )

        con = duckdb.connect()
        mine = canon(to_pandas(RAY_QUERIES["q93_tool_transitions"](SF)))
        oracle = canon(con.execute(_q93_sql(transcripts_path_for(SF))).df())
        ok, why = compare(mine, oracle)
        assert ok, why

    def test_toy_semantics(self, ray_session):
        """Transitions are between consecutive TOOL-BEARING turns within a
        conversation (non-tool turns are skipped), never across convs."""
        import pandas as pd

        from ner_ray.pipelines.queries import RAY_QUERIES  # noqa: F401  (import check)
        from ner_ray.stages.relational import grouped_agg_partial  # noqa: F401

        # drive the same kernel shape directly over a toy table
        import numpy as np
        import pyarrow.compute as pc

        from ner_ray.utils import stable_hash64

        rows = [
            ("c1", 0, "search"),
            ("c1", 1, ""),            # skipped
            ("c1", 2, "calc"),        # search -> calc
            ("c1", 3, "calc"),        # calc -> calc
            ("c2", 0, "lookup"),      # no cross-conv transition from c1
            ("c2", 1, "search"),      # lookup -> search
        ]
        t = pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "tool": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        keep = pc.not_equal(t["tool"], "")
        t = t.filter(keep).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        convs = t["conv_id"].to_numpy(zero_copy_only=False)
        tools = t["tool"].to_numpy(zero_copy_only=False)
        same = convs[1:] == convs[:-1]
        got = sorted(zip(tools[:-1][same], tools[1:][same]))
        assert got == [("calc", "calc"), ("lookup", "search"), ("search", "calc")]


class TestGroupedHistogramQuantiles:
    """q95 — per-group quantiles on one global fixed grid."""

    def test_within_one_bin_of_exact(self, ray_session):
        from ner_ray.stages.sketches import grouped_histogram_quantiles

        rng = np.random.default_rng(7)
        keys = np.repeat([f"s{i}" for i in range(6)], 500)
        vals = np.concatenate(
            [rng.integers(10 * i, 10 * i + 200, 500) for i in range(6)]
        ).astype(np.int64)
        tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
        bins = 64
        w = (vals.max() - vals.min()) / bins
        out = grouped_histogram_quantiles(
            rd.from_arrow(tbl).repartition(5), "k", "v", bins=bins, ps=(0.5, 0.9)
        )
        assert len(out) == 12
        for _, r in out.iterrows():
            exact = float(np.quantile(vals[keys == r["k"]], r["p"]))
            assert abs(r["estimate"] - exact) <= w + 1e-6, (r["k"], r["p"])

    def test_partition_invariance(self, ray_session):
        from ner_ray.stages.sketches import grouped_histogram_quantiles

        tbl = pa.table(
            {
                "k": pa.array([f"s{i%4}" for i in range(1000)]),
                "v": pa.array([(i * 37) % 500 for i in range(1000)], pa.int64()),
            }
        )
        a = grouped_histogram_quantiles(rd.from_arrow(tbl).repartition(1), "k", "v")
        b = grouped_histogram_quantiles(rd.from_arrow(tbl).repartition(11), "k", "v")
        pd.testing.assert_frame_equal(a, b)

    def test_twin_sf0001(self, ray_session):
        import sys

        import duckdb

        sys.path.insert(0, "tools")
        from oracle_check import TABLES, canon, compare, to_pandas

        from ner_ray.pipelines.queries import RAY_QUERIES, oracle_sql_catalog

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            )
        mine = canon(to_pandas(RAY_QUERIES["q95_grouped_length_quantiles"](SF)))
        oracle = canon(
            con.execute(oracle_sql_catalog()["q95_grouped_length_quantiles"]).df()
        )
        ok, why = compare(mine, oracle)
        assert ok, why


class TestPqEncode:
    """q96 — product-quantization encoding."""

    def test_codes_in_range_and_deterministic(self, ray_session):
        from ner_ray.pipelines.queries import _PQ_K, _PQ_M, q96_pq_encode

        a = q96_pq_encode(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
        b = q96_pq_encode(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        for m in range(_PQ_M):
            assert a[f"code_{m}"].between(0, _PQ_K - 1).all()

    def test_centroid_encodes_to_itself(self, ray_session):
        """A vector equal to a codebook centroid in every subspace must
        encode to exactly that centroid's id per subspace."""
        import pyarrow.parquet as pq_

        from ner_ray.stages.ann import pq_encode

        rng = np.random.default_rng(3)
        cbs = [rng.normal(size=(8, 4)) for _ in range(2)]
        vec = np.concatenate([cbs[0][5], cbs[1][2]])
        tbl = pa.table(
            {
                "vec_id": pa.array([1], pa.int64()),
                "embedding": pa.array([vec.tolist()], pa.list_(pa.float64())),
            }
        )
        out = pq_encode(rd.from_arrow(tbl), cbs).to_pandas()
        assert out["code_0"].iloc[0] == 5 and out["code_1"].iloc[0] == 2

    def test_quantization_beats_random_codes(self, ray_session):
        """Reconstruction from argmin codes has lower squared error than
        from deterministic wrong codes — the op actually quantizes."""
        import os

        import pyarrow.parquet as pq_

        from ner_ray.pipelines.queries import (
            _PQ_DSUB,
            _PQ_M,
            _pq_codebooks_fixture_dir,
            q96_pq_encode,
        )

        d = _pq_codebooks_fixture_dir(SF)
        t = pq_.read_table(os.path.join(d, "part-0.parquet"))
        cbs = []
        for m in range(_PQ_M):
            mask = np.asarray(t["sub"].to_pylist()) == m
            cid = np.asarray(t["cid"].to_pylist())[mask]
            cent = np.asarray(t["centroid"].to_pylist(), dtype=np.float64)[mask]
            cbs.append(cent[np.argsort(cid)])
        emb = pq_.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        x = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
        ids = np.asarray(emb["vec_id"].to_pylist(), dtype=np.int64)
        out = q96_pq_encode(SF).to_pandas().set_index("vec_id").loc[ids]
        err_pq, err_rot = 0.0, 0.0
        for m in range(_PQ_M):
            sub = x[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
            codes = out[f"code_{m}"].to_numpy()
            err_pq += ((sub - cbs[m][codes]) ** 2).sum()
            err_rot += ((sub - cbs[m][(codes + 1) % len(cbs[m])]) ** 2).sum()
        assert err_pq < err_rot

    def test_twin_sf0001(self, ray_session):
        import sys

        import duckdb

        sys.path.insert(0, "tools")
        from oracle_check import TABLES, canon, compare, to_pandas

        from ner_ray.pipelines.queries import (
            RAY_QUERIES,
            _pq_codebooks_fixture_dir,
            _q96_sql,
        )

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            )
        mine = canon(to_pandas(RAY_QUERIES["q96_pq_encode"](SF)))
        oracle = canon(con.execute(_q96_sql(_pq_codebooks_fixture_dir(SF))).df())
        ok, why = compare(mine, oracle)
        assert ok, why


class TestPqAdcTopk:
    """q97 — asymmetric-distance top-k over PQ codes."""

    def test_twin_sf0001(self, ray_session):
        import sys

        import duckdb

        sys.path.insert(0, "tools")
        from oracle_check import TABLES, canon, compare, to_pandas

        from ner_ray.pipelines.queries import (
            RAY_QUERIES,
            _pq_codebooks_fixture_dir,
            _q97_sql,
        )

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            )
        mine = canon(to_pandas(RAY_QUERIES["q97_pq_adc_topk"](SF)))
        oracle = canon(con.execute(_q97_sql(_pq_codebooks_fixture_dir(SF))).df())
        ok, why = compare(mine, oracle)
        assert ok, why

    def test_adc_tracks_exact_l2(self, ray_session):
        """ADC is approximate (random 64-d fixture embeddings are the
        hardest case for 4x16 codes), but its distance must TRACK exact
        L2: rank correlation > 0.3 over the corpus, and the ADC top-10
        must sit well inside the exact distance distribution (mean exact
        distance of ADC picks below the corpus median)."""
        import os

        import pyarrow.parquet as pq_

        from ner_ray.pipelines.queries import (
            _PQ_DSUB,
            _PQ_M,
            _pq_codebooks_fixture_dir,
            RAY_QUERIES,
        )

        emb = pq_.read_table(f"{SF}/embeddings.parquet")
        x = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
        ids = np.asarray(emb["vec_id"].to_pylist(), dtype=np.int64)
        q = x[ids == 0][0]
        mask = ids != 0
        d_exact = ((x[mask] - q) ** 2).sum(axis=1)
        # recompute ADC distances for every vector (same tables as the op)
        t = pq_.read_table(
            os.path.join(_pq_codebooks_fixture_dir(SF), "part-0.parquet")
        )
        d_adc = np.zeros(mask.sum())
        for m in range(_PQ_M):
            sm = np.asarray(t["sub"].to_pylist()) == m
            cid = np.asarray(t["cid"].to_pylist())[sm]
            cb = np.asarray(t["centroid"].to_pylist(), dtype=np.float64)[sm][
                np.argsort(cid)
            ]
            sub = x[mask][:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
            codes = np.argmin(((sub[:, None, :] - cb[None, :, :]) ** 2).sum(2), 1)
            qm = q[m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
            d_adc += ((qm[None, :] - cb) ** 2).sum(1)[codes]
        ra = np.argsort(np.argsort(d_exact))
        rb = np.argsort(np.argsort(d_adc))
        rho = np.corrcoef(ra, rb)[0, 1]
        assert rho > 0.3, rho
        adc10 = RAY_QUERIES["q97_pq_adc_topk"](SF)["vec_id"].tolist()
        idmap = {int(v): i for i, v in enumerate(ids[mask])}
        picked = d_exact[[idmap[v] for v in adc10]]
        assert picked.mean() < np.median(d_exact), (picked.mean(), np.median(d_exact))

    def test_ranks_are_1_to_k_and_sorted(self, ray_session):
        from ner_ray.pipelines.queries import RAY_QUERIES

        out = RAY_QUERIES["q97_pq_adc_topk"](SF)
        assert out["rank"].tolist() == list(range(1, len(out) + 1))
        assert (np.diff(out["d_micro"].to_numpy()) >= 0).all()
        assert 0 not in set(out["vec_id"])


class TestCompactCheckpoint:
    """Small-file compaction preserves content, layout, and resume."""

    def test_compacts_preserving_rows_and_resume(self, ray_session, tmp_path):
        from ner_ray.stages.materialize import (
            compact_checkpoint,
            read_manifest,
            run_stage,
        )

        root = str(tmp_path)
        tbl = pa.table(
            {
                "subj": pa.array([f"e{i%50}" for i in range(4000)], pa.string()),
                "part": pa.array([i % 4 for i in range(4000)], pa.int32()),
                "v": pa.array(range(4000), pa.int64()),
            }
        )

        def build():
            return rd.from_arrow(tbl).repartition(32)  # many tiny blocks

        ds1, m1 = run_stage("graph", root, "sig-A", build, partition_cols=["part"])
        before = ds1.to_pandas().sort_values("v").reset_index(drop=True)
        n_before = len(read_manifest(f"{root}/graph")["files"])

        m2 = compact_checkpoint(f"{root}/graph", target_rows_per_file=2000)
        assert m2["compacted"] and m2["signature"] == "sig-A"
        assert m2["row_count"] == 4000
        n_after = len(m2["files"])
        assert n_after < n_before, (n_before, n_after)

        # content identical after compaction
        import ray.data as rdd

        after = (
            rdd.read_parquet(f"{root}/graph/data")
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        after["part"] = after["part"].astype(before["part"].dtype)
        pd.testing.assert_frame_equal(before[["subj", "part", "v"]], after[["subj", "part", "v"]])

        # resume still skips: same signature loads the compacted data
        ds3, m3 = run_stage("graph", root, "sig-A", build, partition_cols=["part"])
        assert m3["skipped"] is True
        assert len(ds3.to_pandas()) == 4000

    def test_missing_manifest_raises(self, tmp_path):
        from ner_ray.stages.materialize import compact_checkpoint

        with pytest.raises(FileNotFoundError):
            compact_checkpoint(str(tmp_path / "nope"))


class TestWindowedDistinct:
    """q98 — HLL approx-distinct per event-time day window."""

    def test_twin_sf0001(self, ray_session):
        import sys

        import duckdb

        sys.path.insert(0, "tools")
        from oracle_check import TABLES, canon, compare, to_pandas

        from ner_ray.pipelines.queries import RAY_QUERIES, oracle_sql_catalog

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            )
        mine = canon(to_pandas(RAY_QUERIES["q98_windowed_distinct_users"](SF)))
        oracle = canon(
            con.execute(oracle_sql_catalog()["q98_windowed_distinct_users"]).df()
        )
        ok, why = compare(mine, oracle)
        assert ok, why

    def test_error_bound_vs_exact(self, ray_session):
        import duckdb

        from ner_ray.pipelines.queries import _Q98_DAY_US, RAY_QUERIES

        got = RAY_QUERIES["q98_windowed_distinct_users"](SF).to_pandas()
        con = duckdb.connect()
        exact = con.execute(
            f"SELECT (epoch_us(ts) // {_Q98_DAY_US})::BIGINT AS day,"
            " count(DISTINCT user_id) AS n"
            f" FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
        ).df()
        m = got.merge(exact, on="day")
        assert len(m) == len(exact)
        rel = np.abs(m["approx_distinct"] - m["n"]) / np.maximum(m["n"], 1)
        assert rel.max() < 0.10, rel.max()  # p=12 -> ~1.6% stderr


class TestCliCompact:
    """`python -m ner_ray --compact N` runs the maintenance pass after the
    build and reports per-stage file counts; the compacted output still
    resumes (same signature)."""

    def test_build_then_compact_then_resume(self, ray_session, tmp_path):
        from ner_ray.__main__ import main
        from ner_ray.pipelines.queries import transcripts_path_for

        out = str(tmp_path / "kg")
        tx = transcripts_path_for(SF)
        import contextlib
        import io
        import json

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(["--input", tx, "--out", out, "--tagger", "rule",
                       "--compact", "1000000"])
        assert rc == 0
        metrics = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert set(metrics["compacted"]) >= {"graph", "turn_mentions"}
        # resume after compaction: every stage skips
        buf2 = io.StringIO()
        with contextlib.redirect_stdout(buf2):
            rc = main(["--input", tx, "--out", out, "--tagger", "rule"])
        assert rc == 0
        metrics2 = json.loads(buf2.getvalue().strip().splitlines()[-1])
        assert all(s["skipped"] for s in metrics2["stages"].values())


class TestStableHash64Laws:
    """Property law: stable_hash64 is a pure per-VALUE function — the hash
    of an element never depends on its position or on the other elements
    in the array (the exact property pandas' factorize path violated for
    NUL-containing strings)."""

    def test_value_purity_over_arbitrary_unicode(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ner_ray.utils import stable_hash64

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.text(min_size=0, max_size=24), min_size=1, max_size=40))
        def law(vals):
            a = stable_hash64(np.array(vals, dtype=object))
            b = stable_hash64(np.array(vals[::-1], dtype=object))
            assert (a[::-1] == b).all()
            # singleton hash equals in-array hash (no cross-element effect)
            lone = stable_hash64(np.array([vals[0]], dtype=object))
            assert lone[0] == a[0]

        law()


class TestEntityAudit:
    """Toy-pinned semantics of stages/canonicalize.entity_audit — the
    fixture gazetteer is type-consistent, so the conflict arm
    (n_types >= 2) must be exercised synthetically."""

    def _audit(self, rows):
        import ray

        from ner_ray.stages.canonicalize import entity_audit

        mapping = ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([r[0] for r in rows], pa.string()),
                    "surface": pa.array([r[1] for r in rows], pa.string()),
                    "type": pa.array([r[2] for r in rows], pa.string()),
                    "entity_id": pa.array([r[3] for r in rows], pa.int64()),
                    "canonical": pa.array([r[4] for r in rows], pa.string()),
                    "n_mentions": pa.array([r[5] for r in rows], pa.int64()),
                }
            )
        ).repartition(3)
        return (
            entity_audit(mapping)
            .to_pandas()
            .sort_values("canonical")
            .reset_index(drop=True)
        )

    def test_type_conflict_and_profile(self, ray_session):
        rows = [
            # two surface forms + TWO TYPES resolving to "Smith" -> conflict
            ("PER:smith", "Smith", "PER", 1, "Smith", 5),
            ("PER:mr. smith", "Mr. Smith", "PER", 1, "Smith", 2),
            ("LOC:smith", "Smith", "LOC", -1, "Smith", 3),
            # clean single-type entity with two forms
            ("ORG:acme", "Acme", "ORG", 7, "Acme Corp", 4),
            ("ORG:acme corp", "Acme Corp", "ORG", 7, "Acme Corp", 1),
            # unlinked singleton
            ("LOC:ruritania", "Ruritania", "LOC", -1, "Ruritania", 1),
        ]
        out = self._audit(rows)
        assert list(out["canonical"]) == ["Acme Corp", "Ruritania", "Smith"]
        smith = out.iloc[2]
        assert smith["n_forms"] == 3
        assert smith["n_types"] == 2
        assert smith["types"] == "LOC,PER"
        assert smith["n_mentions"] == 10
        acme = out.iloc[0]
        assert (acme["n_forms"], acme["n_types"], acme["types"]) == (2, 1, "ORG")
        assert acme["n_mentions"] == 5
        single = out.iloc[1]
        assert (single["n_forms"], single["n_types"], single["n_mentions"]) == (1, 1, 1)
        # conflict filter is a trivial predicate over the audit
        assert list(out[out["n_types"] >= 2]["canonical"]) == ["Smith"]

    def test_bucket_invariance(self, ray_session):
        """The audit is independent of the bucket count (pure reshuffle)."""
        import ray

        from ner_ray.stages.canonicalize import entity_audit

        rows = [
            (f"PER:e{i}", f"E{i}", "PER" if i % 3 else "LOC", i, f"C{i % 7}", i + 1)
            for i in range(40)
        ]
        t = pa.table(
            {
                "node": pa.array([r[0] for r in rows], pa.string()),
                "surface": pa.array([r[1] for r in rows], pa.string()),
                "type": pa.array([r[2] for r in rows], pa.string()),
                "entity_id": pa.array([r[3] for r in rows], pa.int64()),
                "canonical": pa.array([r[4] for r in rows], pa.string()),
                "n_mentions": pa.array([r[5] for r in rows], pa.int64()),
            }
        )
        outs = []
        for nb in (1, 7, 256):
            df = (
                entity_audit(ray.data.from_arrow(t).repartition(4), num_buckets=nb)
                .to_pandas()
                .sort_values("canonical")
                .reset_index(drop=True)
            )
            outs.append(df)
        assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
