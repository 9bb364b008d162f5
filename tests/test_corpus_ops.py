"""Tests for text analysis, dedup family, ANN, and the DuckDB oracle twins."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ner_ray.functions.hashing import (
    MinHasher,
    hamming64,
    jaccard,
    simhash64,
    word_shingles,
)
from ner_ray.functions.texttools import (
    lang_id,
    md5_fingerprint,
    quality_score,
    tokenize_ws,
    winnow_fingerprint,
)


class TestTextTools:
    def test_tokenize_matches_duckdb(self):
        con = duckdb.connect()
        for s in ["a  b c ", "  ", "one", "x\t y\nz"]:
            mine = tokenize_ws(s)
            theirs = con.execute(
                "select regexp_split_to_array(trim(?), '\\s+')", [s]
            ).fetchone()[0]
            if s.strip() == "":
                assert mine == []
            else:
                assert mine == theirs

    def test_md5_matches_duckdb(self):
        con = duckdb.connect()
        for s in ["Hello  World ", "a\tb", "张伟 在 南京"]:
            theirs = con.execute(
                "select md5(lower(trim(regexp_replace(?, '\\s+', ' ', 'g'))))", [s]
            ).fetchone()[0]
            assert md5_fingerprint(s) == theirs

    def test_lang_id(self):
        assert lang_id("the quick brown fox jumps over the lazy dog") == "en"
        assert lang_id("张伟在南京大学工作了十年") == "zh"
        assert lang_id("") == "unk"

    def test_quality_score_bounds(self):
        good = quality_score("the system processed the batch of records quickly and correctly")
        bad = quality_score("a a a a a a a a a a a a")
        assert 0 <= bad < good <= 1

    def test_winnow_deterministic_and_shift_tolerant(self):
        a = winnow_fingerprint("the quick brown fox jumps over the lazy dog near the river bank")
        b = winnow_fingerprint("PREFIX the quick brown fox jumps over the lazy dog near the river bank")
        assert a == winnow_fingerprint("the quick brown fox jumps over the lazy dog near the river bank")
        overlap = len(set(a) & set(b)) / max(1, len(set(a)))
        assert overlap > 0.6  # local fingerprints survive a prefix shift


class TestSketches:
    def test_minhash_estimates_jaccard(self):
        mh = MinHasher(num_perm=256)
        a = word_shingles("the cat sat on the mat and purred softly today", 3)
        b = word_shingles("the cat sat on the mat and purred loudly today", 3)
        est = MinHasher.est_jaccard(mh.signature(a), mh.signature(b))
        true = jaccard(a, b)
        assert abs(est - true) < 0.15

    def test_minhash_identical(self):
        mh = MinHasher()
        s = word_shingles("alpha beta gamma delta epsilon zeta", 3)
        assert MinHasher.est_jaccard(mh.signature(s), mh.signature(s)) == 1.0

    def test_simhash_near_for_similar(self):
        a = simhash64(tokenize_ws("the quick brown fox jumps over the lazy dog again and again"))
        b = simhash64(tokenize_ws("the quick brown fox jumps over the lazy cat again and again"))
        c = simhash64(tokenize_ws("completely unrelated words describing database systems design"))
        assert hamming64(a, b) < hamming64(a, c)


def _docs_table():
    base = "the quick brown fox jumps over the lazy dog while the rain falls on the quiet town"
    texts = [
        base,
        base,  # exact dup of 0
        base + " tonight",  # near dup of 0
        base.replace("quick", "Quick") + " ",  # case/ws variant (exact after norm)
        "a completely different document about distributed query engines and arrow",
        "another unrelated text mentioning streaming shuffles and object stores",
        "张伟 在 南京 大学 工作 张伟 在 南京 大学 工作 张伟 在 南京 大学 工作",
    ]
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts, pa.string())}
    )


@pytest.mark.usefixtures("ray_session")
class TestDedupStages:
    def test_exact_dedup(self):
        from ner_ray.stages.text_dedup import exact_dedup

        out = exact_dedup(rd.from_arrow(_docs_table())).to_pandas()
        # docs 0,1,3 share a normalized fingerprint -> one row with n_dups=3
        assert len(out) == 5
        assert int(out[out.doc_id == 0].n_dups.iloc[0]) == 3

    def test_minhash_near_dup_groups(self):
        from ner_ray.stages.text_dedup import minhash_near_dup

        out = minhash_near_dup(
            rd.from_arrow(_docs_table()), threshold=0.5, bands=32, num_perm=128
        ).to_pandas()
        assert len(out) == 7  # every doc classified exactly once
        g = dict(zip(out.doc_id, out.group_id))
        assert g[0] == g[1] == g[2] == g[3] == 0  # dup cluster
        assert g[4] == 4 and g[5] == 5 and g[6] == 6  # singletons
        keep = dict(zip(out.doc_id, out.keep))
        assert keep[0] and not keep[1]

    def test_simhash_near_dup_groups(self):
        from ner_ray.stages.text_dedup import simhash_near_dup

        out = simhash_near_dup(rd.from_arrow(_docs_table()), max_hamming=3).to_pandas()
        g = dict(zip(out.doc_id, out.group_id))
        assert g[0] == g[1] == g[3]  # identical-after-case texts collide
        assert g[4] != g[0] and g[5] != g[0]

    def test_ngram_jaccard_pairs(self):
        from ner_ray.stages.text_dedup import ngram_jaccard_pairs

        out = ngram_jaccard_pairs(rd.from_arrow(_docs_table()), [(0, 1), (0, 4)])
        j = dict(zip(zip(out.a, out.b), out.jaccard))
        assert j[(0, 1)] == 1.0
        assert j[(0, 4)] < 0.1


@pytest.mark.usefixtures("ray_session")
class TestANN:
    def _emb_ds(self, n=200, dim=32, seed=3):
        rng = np.random.default_rng(seed)
        m = rng.standard_normal((n, dim))
        return (
            rd.from_arrow(
                pa.table(
                    {
                        "vec_id": pa.array(range(n), pa.int64()),
                        "embedding": pa.array(m.tolist(), pa.list_(pa.float32())),
                    }
                )
            ),
            m,
        )

    def test_brute_topk_matches_numpy(self):
        from ner_ray.stages.ann import ann_topk

        ds, m = self._emb_ds()
        q = m[7]
        out = ann_topk(ds, q[None, :], k=5)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        # embeddings stored as float32 — compare against the float32 matrix
        m32 = np.asarray(m, dtype=np.float32).astype(np.float64)
        mn = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q)
        scores = mn @ qn
        expect = list(np.argsort(-scores)[:5])
        assert list(out.vec_id) == expect

    def test_lsh_recall(self):
        from ner_ray.stages.ann import ann_topk, lsh_topk

        ds, m = self._emb_ds(n=500)
        q = m[3]
        exact = set(ann_topk(ds, q[None, :], k=10).vec_id)
        approx = set(lsh_topk(ds, q[None, :], k=10, n_planes=8, n_probe_bits=3).vec_id)
        assert len(exact & approx) >= 5  # multi-probe recall is decent

    def test_ivf_recall_and_determinism(self):
        from ner_ray.stages.ann import ann_topk, ivf_topk

        ds, m = self._emb_ds(n=500)
        q = m[3]
        exact = set(ann_topk(ds, q[None, :], k=10).vec_id)
        a = ivf_topk(ds, q[None, :], k=10, n_centroids=8, n_probe=4)
        b = ivf_topk(ds, q[None, :], k=10, n_centroids=8, n_probe=4)
        assert list(a.vec_id) == list(b.vec_id)  # seeded quantizer
        assert len(exact & set(a.vec_id)) >= 5  # probing half the cells
        full = ivf_topk(ds, q[None, :], k=10, n_centroids=8, n_probe=8)
        assert set(full.vec_id) == exact  # probing every cell == brute force

    def test_near_dup_pairs_symmetric_once(self):
        from ner_ray.stages.ann import embedding_near_dup_pairs

        ds, m = self._emb_ds(n=60)
        out = embedding_near_dup_pairs(ds, threshold=0.2).to_pandas()
        assert (out.vec_id_a < out.vec_id_b).all()
        assert not out.duplicated(["vec_id_a", "vec_id_b"]).any()


@pytest.mark.usefixtures("ray_session")
class TestOracleSubset:
    """Fast local replica of the driver's DuckDB comparison at sf0.001."""

    SF = "/root/testdata/sf0.001"
    NAMES = ["q01_pricing_summary", "q07_events_tumbling", "q13_dedup_exact",
             "q15_token_stats", "q17_term_frequency", "q18_ann_topk",
             "q40_jaccard_all_pairs"]

    def test_subset_matches_oracle(self):
        import sys

        sys.path.insert(0, "tools")
        from oracle_check import TABLES, canon, compare, to_pandas

        from ner_ray.pipelines.queries import ORACLE_SQL, RAY_QUERIES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{self.SF}/{t}.parquet')"
            )
        for name in self.NAMES:
            mine = canon(to_pandas(RAY_QUERIES[name](self.SF)))
            oracle = canon(con.execute(ORACLE_SQL[name]).df())
            ok, why = compare(mine, oracle)
            assert ok, f"{name}: {why}"


class TestHashEmbed:
    def test_near_identical_texts_high_cosine(self):
        import numpy as np

        from ner_ray.functions.texttools import hash_embed

        a = hash_embed("the quick brown fox jumps over the lazy dog")
        b = hash_embed("the quick brown fox jumps over the lazy dogs today")
        c = hash_embed("completely different content about databases and shuffles")
        assert float(a @ b) > 0.7
        assert float(a @ c) < 0.5
        assert np.isclose(np.linalg.norm(a), 1.0)

    def test_deterministic(self):
        import numpy as np

        from ner_ray.functions.texttools import hash_embed

        assert np.array_equal(hash_embed("abc def"), hash_embed("abc def"))
