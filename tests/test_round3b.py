"""Round-3 second batch: decontamination (and siblings added after it).

Twin checks replicate the driver's rows+schema+hash comparison locally for
catalog entries past the driver's 50-entry recording cap; hybrid-path
equality follows the minhash/canonicalize discipline (force the distributed
path with a zero threshold, assert identical output).
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.01"


def _twin_check(name: str) -> None:
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


@pytest.mark.usefixtures("ray_session")
class TestDecontaminate:
    def _toy(self):
        bench = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1000, 1001], pa.int64()),
                    "text": pa.array(
                        ["the quick brown fox jumps", "pack my box with jugs"],
                        pa.string(),
                    ),
                }
            )
        )
        corpus = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "text": pa.array(
                        [
                            # shares "the quick brown" and "quick brown fox"
                            "see the quick brown fox run",
                            "completely clean document here",
                            # shares "pack my box"
                            "please pack my box today",
                            None,
                        ],
                        pa.string(),
                    ),
                }
            )
        )
        return corpus, bench

    def test_hits_and_counts(self):
        from ner_ray.stages.decontam import decontaminate

        corpus, bench = self._toy()
        out = (
            decontaminate(corpus, bench, n=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [1, 3]
        assert out["n_hits"].tolist() == [2, 1]

    def test_driver_vs_distributed_equality(self):
        from ner_ray.stages.decontam import decontaminate

        corpus, bench = self._toy()
        fast = (
            decontaminate(corpus, bench, n=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        dist = (
            decontaminate(corpus, bench, n=3, driver_threshold=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert fast.equals(dist)

    def test_short_docs_emit_no_shingles(self):
        from ner_ray.stages.decontam import _doc_shingles

        assert _doc_shingles("one two", 3) == set()
        assert _doc_shingles(None, 3) == set()
        assert _doc_shingles("a b c", 3) == {"a b c"}

    def test_q55_twin(self):
        _twin_check("q55_decontaminate")


@pytest.mark.usefixtures("ray_session")
class TestBM25:
    def test_ranking_and_absence(self):
        """tf monotonicity at equal length; docs without query terms are
        absent; rank is dense from 1 with deterministic doc_id tie-break."""
        from ner_ray.stages.retrieval import bm25_topk

        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "text": pa.array(
                        [
                            "apple apple apple pie crust",
                            "apple banana cherry date fig",
                            "nothing relevant in here whatsoever",
                            "apple banana cherry date fig",  # tie with doc 2
                        ],
                        pa.string(),
                    ),
                }
            )
        )
        out = (
            bm25_topk(docs, {"qa": ["apple"]}, k=10)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [1, 2, 4]  # tf=3 first, then tie by id
        assert out["rank"].tolist() == [1, 2, 3]
        assert out["score"].iloc[0] > out["score"].iloc[1]
        assert out["score"].iloc[1] == out["score"].iloc[2]
        assert 3 not in set(out["doc_id"])

    def test_q56_twin(self):
        _twin_check("q56_bm25_topk")


@pytest.mark.usefixtures("ray_session")
class TestRepetitionFilter:
    def test_kernel_exact_fracs(self):
        from ner_ray.functions.texttools import repetition_stats

        # 'a b a b a b x': 6 bigram slots, (a,b) x3 -> 0.5; 5 trigram slots,
        # (a,b,a) x2 + (b,a,b) x2 -> 4/5
        assert repetition_stats("a b a b a b x") == (7, 0.5, 0.8)
        assert repetition_stats("") == (0, 0.0, 0.0)
        assert repetition_stats(None) == (0, 0.0, 0.0)
        assert repetition_stats("solo") == (1, 0.0, 0.0)
        assert repetition_stats("two words") == (2, 1.0, 0.0)

    def test_q57_twin(self):
        _twin_check("q57_repetition_filter")


@pytest.mark.usefixtures("ray_session")
class TestHllSplitmix:
    """The SQL-replicable splitmix64 hash path added for q49's twin: same
    error-bound and partition-independence laws as the pandas-hash path,
    plus the twin comparison itself (register-level HUGEINT re-derivation)."""

    def test_error_bound(self):
        import numpy as np

        from ner_ray.stages.sketches import approx_distinct

        vals = np.arange(20_000, dtype=np.int64) % 7_500
        ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(6)
        est = approx_distinct(ds, "v", p=14, hash_fn="splitmix")
        assert abs(est - 7_500) / 7_500 < 0.03

    def test_partition_independence(self):
        import numpy as np

        from ner_ray.stages.sketches import approx_distinct

        vals = np.arange(5_000, dtype=np.int64) * 13
        t = pa.table({"v": pa.array(vals)})
        e1 = approx_distinct(rd.from_arrow(t).repartition(1), "v", p=12, hash_fn="splitmix")
        e8 = approx_distinct(rd.from_arrow(t).repartition(8), "v", p=12, hash_fn="splitmix")
        assert e1 == e8

    def test_q49_twin(self):
        _twin_check("q49_approx_distinct_users")


@pytest.mark.usefixtures("ray_session")
class TestInvertedIndex:
    """Bucket-partitioned inverted index: layout-independence (bucket count
    must not change results — the IVF law) and genuinely pruned reads
    (deleting every un-probed bucket partition must not change results,
    which it would if search scanned the whole index)."""

    def _docs(self):
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "text": pa.array(
                        [
                            "alpha beta gamma alpha",
                            "alpha beta",
                            "beta gamma",
                            "delta only here",
                            None,
                        ],
                        pa.string(),
                    ),
                }
            )
        )

    def _build(self, tmpdir, num_buckets):
        from ner_ray.stages.retrieval import index_build

        d = f"{tmpdir}/idx_b{num_buckets}"
        index_build(self._docs(), d, num_buckets=num_buckets)
        return d

    def test_and_or_and_layout_independence(self, tmp_path):
        from ner_ray.stages.retrieval import index_search

        outs = {}
        for nb in (1, 7, 64):
            d = self._build(tmp_path, nb)
            got = (
                index_search(d, ["alpha", "beta"], mode="and")
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            outs[nb] = got
        assert outs[64]["doc_id"].tolist() == [1, 2]
        assert outs[64]["total_tf"].tolist() == [3, 2]  # alpha x2 + beta x1
        assert outs[1].equals(outs[64]) and outs[7].equals(outs[64])

        disj = (
            index_search(self._build(tmp_path, 8), ["alpha", "delta"], mode="or")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert disj["doc_id"].tolist() == [1, 2, 4]

    def test_pruned_read(self, tmp_path):
        import os
        import shutil

        from ner_ray.stages.retrieval import _term_bucket, index_search

        d = self._build(tmp_path, 64)
        keep = {_term_bucket(t, 64) for t in ("alpha", "beta")}
        data = os.path.join(d, "data")
        removed = 0
        for entry in os.listdir(data):
            b = int(entry.split("=", 1)[1])
            if b not in keep:
                shutil.rmtree(os.path.join(data, entry))
                removed += 1
        assert removed > 0  # the corpus used other buckets
        got = (
            index_search(d, ["alpha", "beta"], mode="and")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # identical results with every un-probed partition gone == the
        # search never touched them
        assert got["doc_id"].tolist() == [1, 2]

    def test_q58_twin(self):
        _twin_check("q58_inverted_search")


@pytest.mark.usefixtures("ray_session")
class TestFullOuterJoin:
    def test_all_three_row_classes(self):
        """Matched, left-only and right-only keys in one join, including a
        hot matched key (cross product 2x2)."""
        from ner_ray.stages.joins import hash_join

        left = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([1, 2, 2, 7], pa.int64()),
                    "lv": pa.array(["a", "b1", "b2", "g"], pa.string()),
                }
            )
        )
        right = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([2, 2, 9], pa.int64()),
                    "rv": pa.array([10, 20, 99], pa.int64()),
                }
            )
        )
        out = (
            hash_join(left, right, on="k", how="full")
            .to_pandas()
            .sort_values(["k", "lv", "rv"], na_position="last")
            .reset_index(drop=True)
        )
        # k=1,7 left-only; k=2 hot: 2x2 cross; k=9 right-only
        assert len(out) == 2 + 4 + 1
        assert out[out.k == 9]["lv"].isna().all()
        assert out[out.k.isin([1, 7])]["rv"].isna().all()
        assert len(out[out.k == 2]) == 4
        assert set(out[out.k == 2]["rv"]) == {10, 20}

    def test_q59_twin(self):
        _twin_check("q59_full_outer_join")


class TestSplitmixSqlLaw:
    """The law the q49 twin rests on: DuckDB's HUGEINT re-derivation of
    splitmix64 (32-bit-halved multiplies, floor-division shifts, xor)
    equals numpy's uint64 wraparound implementation bit-for-bit — probed
    over random int64 keys including negatives and both extremes."""

    def test_hash_equivalence(self):
        import duckdb
        import numpy as np

        from ner_ray.stages.sketches import splitmix64

        rng = np.random.default_rng(7)
        keys = np.concatenate(
            [
                rng.integers(-(2**62), 2**62, size=500, dtype=np.int64),
                np.array([0, 1, -1, 2**63 - 1, -(2**63)], dtype=np.int64),
            ]
        )
        expect = splitmix64(keys)

        t64, t32 = 1 << 64, 1 << 32
        a0, b1, c1 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

        def mul(x, const):
            hi, lo = const >> 32, const & (t32 - 1)
            return (
                f"((((({x}) // {t32}) * {lo} + (({x}) % {t32}) * {hi}) % {t32}) * {t32}"
                f" + (({x}) % {t32}) * {lo}) % {t64}::HUGEINT"
            )

        con = duckdb.connect()
        con.execute("CREATE TABLE k(i INTEGER, v BIGINT)")
        con.executemany(
            "INSERT INTO k VALUES (?, ?)", [(i, int(v)) for i, v in enumerate(keys)]
        )
        got = con.execute(
            f"""
WITH z0 AS (SELECT i, ((v::HUGEINT + {a0}::HUGEINT) % {t64}::HUGEINT + {t64}::HUGEINT)
                       % {t64}::HUGEINT AS z FROM k),
x1 AS (SELECT i, xor(z, z // {1 << 30}) AS x FROM z0),
z1 AS (SELECT i, {mul('x', b1)} AS z FROM x1),
x2 AS (SELECT i, xor(z, z // {1 << 27}) AS x FROM z1),
z2 AS (SELECT i, {mul('x', c1)} AS z FROM x2)
SELECT xor(z, z // {1 << 31}) FROM z2 ORDER BY i
"""
        ).fetchall()
        assert [int(r[0]) for r in got] == [int(v) for v in expect]


@pytest.mark.usefixtures("ray_session")
class TestWindowFuncs:
    def test_small_groups_and_moving_window(self):
        """Groups smaller than, equal to, and larger than the moving window;
        lag null on each group head; exact integer micro sums."""
        from ner_ray.stages.window import window_funcs

        t = pa.table(
            {
                "k": pa.array([1, 1, 1, 1, 1, 2, 2, 3], pa.int64()),
                "i": pa.array([10, 11, 12, 13, 14, 20, 21, 30], pa.int64()),
                "o": pa.array([5, 1, 2, 3, 4, 2, 1, 9], pa.int64()),
                "v": pa.array([1.5, 2.0, 0.25, 1.0, 3.0, 10.0, 4.0, 7.0]),
            }
        )
        out = (
            window_funcs(
                rd.from_arrow(t).repartition(4),
                key_col="k",
                order_cols=["o", "i"],
                value_col="v",
                id_col="i",
                moving_rows=3,
            )
            .to_pandas()
            .sort_values(["k", "rn"])
            .reset_index(drop=True)
        )
        # key 1 ordered by o: i=11(2.0),12(0.25),13(1.0),14(3.0),10(1.5)
        g1 = out[out.k == 1]
        assert list(g1["i"]) == [11, 12, 13, 14, 10]
        assert list(g1["rn"]) == [1, 2, 3, 4, 5]
        assert g1["lag_value_micro"].iloc[0] is None or str(g1["lag_value_micro"].iloc[0]) in ("nan", "<NA>")
        assert list(g1["cum_value_micro"]) == [2000000, 2250000, 3250000, 6250000, 7750000]
        # moving window of 3: row 4 (i=14) = 0.25+1.0+3.0
        assert g1["mov_value_micro"].iloc[3] == 4250000
        # trailing window on the head rows equals the cumsum
        assert list(g1["mov_value_micro"][:3]) == list(g1["cum_value_micro"][:3])
        # single-row group: lag null, mov == cum == value
        g3 = out[out.k == 3]
        assert len(g3) == 1 and g3["mov_value_micro"].iloc[0] == 7000000

    def test_q60_twin(self):
        _twin_check("q60_window_funcs")


@pytest.mark.usefixtures("ray_session")
class TestPivotSetOps:
    def test_pivot_other_bucket(self):
        from ner_ray.stages.window import pivot_agg

        t = pa.table(
            {
                "k": pa.array([1, 1, 1, 2], pa.int64()),
                "c": pa.array(["x", "x", "zzz", "y"], pa.string()),
                "v": pa.array([1.0, 2.0, 4.0, 0.5]),
            }
        )
        out = (
            pivot_agg(rd.from_arrow(t).repartition(3), "k", "c", ["x", "y"], "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        r1 = out[out.k == 1].iloc[0]
        assert r1["n_x"] == 2 and r1["sum_x_micro"] == 3000000
        assert r1["n_y"] == 0 and r1["sum_y_micro"] == 0
        assert r1["n_other"] == 1 and r1["sum_other_micro"] == 4000000
        r2 = out[out.k == 2].iloc[0]
        assert r2["n_y"] == 1 and r2["sum_y_micro"] == 500000 and r2["n_other"] == 0

    def test_set_ops_three_classes(self):
        from ner_ray.stages.window import set_ops

        left = rd.from_arrow(pa.table({"u": pa.array([1, 1, 2, 3], pa.int64())}))
        right = rd.from_arrow(pa.table({"u": pa.array([2, 4, 4], pa.int64())}))
        out = set_ops(left, right, on="u").to_pandas().set_index("u")["op"]
        assert out[1] == "left_only" and out[3] == "left_only"
        assert out[2] == "both" and out[4] == "right_only"
        assert len(out) == 4  # distinct semantics

    def test_q61_q62_twins(self):
        _twin_check("q61_pivot")
        _twin_check("q62_set_ops")


@pytest.mark.usefixtures("ray_session")
class TestSaltedJoin:
    def test_equals_hash_join_with_hot_key(self):
        """Hot key (100 left x 7 right) + left-only rows: the salted output
        row MULTISET equals the unsalted hash_join's, inner and left."""
        import numpy as np

        from ner_ray.stages.joins import hash_join, salted_join

        lk = np.concatenate([np.full(100, 7), np.array([1, 2, 999])])
        left = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array(lk, pa.int64()),
                    "lid": pa.array(np.arange(len(lk)), pa.int64()),
                }
            )
        ).repartition(5)
        right = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([7] * 7 + [1], pa.int64()),
                    "rv": pa.array(list(range(7)) + [100], pa.int64()),
                }
            )
        ).repartition(3)

        def key(df):
            return sorted(map(tuple, df.fillna(-1).to_numpy().tolist()))

        for how in ("inner", "left"):
            a = salted_join(left, right, on="k", how=how, salt=4).to_pandas()
            b = hash_join(left, right, on="k", how=how).to_pandas()
            cols = ["k", "lid", "rv"]
            assert key(a[cols]) == key(b[cols]), how

    def test_full_rejected(self):
        from ner_ray.stages.joins import salted_join

        with pytest.raises(ValueError):
            salted_join(None, None, on="k", how="full")

    def test_q64_twin(self):
        _twin_check("q64_salted_join")


@pytest.mark.usefixtures("ray_session")
class TestQualityClassifier:
    def test_empty_and_known_doc(self):
        from ner_ray.functions.texttools import linear_quality_score

        assert linear_quality_score("") == (0, False)
        assert linear_quality_score(None) == (0, False)
        # "the the the": n_stop=3, n_uniq=1, n_tokens=3 -> 120*3+40+24 = 424
        s, keep = linear_quality_score("the the the")
        assert s == 424 and keep

    def test_q63_twin(self):
        _twin_check("q63_quality_classifier")


@pytest.mark.usefixtures("ray_session")
class TestDupNgramSpans:
    def test_toy_semantics(self):
        """Cross-doc duplicate counted per POSITION; a shingle repeated only
        WITHIN one doc is not a duplicate; docs under k tokens are absent."""
        from ner_ray.stages.text_dedup import duplicate_ngram_spans

        shared = "alpha beta gamma delta"  # 4 tokens; k=4 -> one shingle
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        shared + " one two three",
                        "x y z " + shared,
                        # within-doc repetition only: not cross-doc
                        "p q r s p q r s p q r s",
                        "too short",
                    ],
                    pa.string(),
                ),
            }
        )
        out = (
            duplicate_ngram_spans(rd.from_arrow(docs).repartition(3), k=4)
            .to_pandas()
            .set_index("doc_id")
        )
        assert 4 not in out.index  # 2 tokens < k
        assert out.loc[1, "n_shingles"] == 4 and out.loc[1, "n_dup"] == 1
        assert out.loc[2, "n_shingles"] == 4 and out.loc[2, "n_dup"] == 1
        assert out.loc[3, "n_dup"] == 0
        assert out.loc[1, "dup_frac_micro"] == 250000

    def test_q65_twin(self):
        _twin_check("q65_dup_ngram_spans")


@pytest.mark.usefixtures("ray_session")
class TestShuffleShards:
    def test_shards_and_positions(self):
        from ner_ray.pipelines.queries import RAY_QUERIES

        out = RAY_QUERIES["q66_shuffle_shards"](SF).to_pandas()
        assert set(out.columns) == {"doc_id", "shard", "pos"}
        assert out["shard"].between(0, 15).all()
        assert out["doc_id"].is_unique
        for _, g in out.groupby("shard"):
            assert sorted(g["pos"]) == list(range(1, len(g) + 1))

    def test_q66_twin(self):
        _twin_check("q66_shuffle_shards")


@pytest.mark.usefixtures("ray_session")
class TestSequenceChunks:
    def test_toy_layout(self):
        """Doc straddling several chunks emits one row per overlap; the
        rows partition [start, end); zero-token docs are absent; domains
        lay out independently."""
        from ner_ray.stages.packing import sequence_chunks

        # domain 0: ids 0,4,8 (n=3,10,2); domain 1: id 1 (n=5); id 2 has 0
        t = pa.table(
            {
                "doc_id": pa.array([0, 4, 8, 1, 2], pa.int64()),
                "n_tokens": pa.array([3, 10, 2, 5, 0], pa.int64()),
            }
        )
        out = (
            sequence_chunks(rd.from_arrow(t).repartition(2), chunk_tokens=4, n_domains=4)
            .to_pandas()
            .sort_values(["domain", "doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        assert 2 not in set(out["doc_id"])
        d0 = out[out.domain == 0]
        # stream: doc0 [0,3), doc4 [3,13), doc8 [13,15); chunks of 4
        rows4 = d0[d0.doc_id == 4]
        assert list(rows4["chunk_id"]) == [0, 1, 2, 3]
        assert list(rows4["tok_start"]) == [3, 4, 8, 12]
        assert list(rows4["tok_end"]) == [4, 8, 12, 13]
        rows8 = d0[d0.doc_id == 8]
        assert list(rows8["tok_start"]) == [13] and list(rows8["tok_end"]) == [15]
        d1 = out[out.domain == 1]
        assert list(d1["tok_start"]) == [0, 4] and list(d1["tok_end"]) == [4, 5]

    def test_q67_twin(self):
        _twin_check("q67_sequence_chunks")


class TestBpeTrain:
    def test_classic_sennrich_fixture(self):
        """Hand-computed merges on the canonical {low, lower, newest,
        widest} corpus (Sennrich et al. 2016, Fig. 1 counts)."""
        from ner_ray.functions.bpe import train_merges

        wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        merges = train_merges(wc, 5)
        # pair counts round 1: (e,s)=9 (w,e)=8... ties deterministic
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")
        assert merges[2] == ("est", "</w>")
        assert merges[3] == ("l", "o")
        assert merges[4] == ("lo", "w")

    def test_word_pieces_greedy_rank_order(self):
        from ner_ray.functions.bpe import train_merges, word_pieces

        wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        ranks = {p: i for i, p in enumerate(train_merges(wc, 10))}
        assert "".join(word_pieces("lowest", ranks)) == "lowest</w>"
        # unseen characters survive as singletons
        assert word_pieces("xyz", {}) == ["x", "y", "z", "</w>"]


@pytest.mark.usefixtures("ray_session")
class TestBpeStage:
    def test_distributed_equals_reference(self):
        """Actor-pool encoder + distributed-trained merges equal the
        single-process reference on every doc."""
        from ner_ray.functions.bpe import TOKEN_RE, encode_reference
        from ner_ray.stages.tokenizer import bpe_tokenize, bpe_train, bpe_word_counts

        import pyarrow.parquet as pq

        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        ds = rd.from_arrow(docs).repartition(6)
        # distributed word counts == driver Counter
        from collections import Counter

        ref_wc = Counter()
        for x in docs["text"].to_pylist():
            ref_wc.update(TOKEN_RE.findall((x or "").lower()))
        assert bpe_word_counts(ds) == dict(ref_wc)

        merges = bpe_train(ds, n_merges=32)
        out = (
            bpe_tokenize(ds, merges)
            .to_pandas()
            .set_index("doc_id")["n_pieces"]
            .to_dict()
        )
        for d, x in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
            assert out[d] == len(encode_reference(x, merges)), d
        # merging must compress: pieces < raw characters for real text
        total_chars = sum(len(w) + 1 for x in docs["text"].to_pylist()
                          for w in TOKEN_RE.findall((x or "").lower()))
        assert sum(out.values()) < total_chars

    def test_vocab_truncation_deterministic(self):
        from ner_ray.stages.tokenizer import bpe_word_counts

        t = pa.table(
            {
                "text": pa.array(
                    ["aa bb cc dd", "aa bb cc", "aa bb", "aa"], pa.string()
                )
            }
        )
        ds = rd.from_arrow(t).repartition(2)
        top2 = bpe_word_counts(ds, max_vocab_words=2)
        assert top2 == {"aa": 4, "bb": 3}


@pytest.mark.usefixtures("ray_session")
class TestNormalizeText:
    def test_kernel_semantics(self):
        from ner_ray.functions.texttools import normalize_text_array

        arr = pa.array(
            [
                "café \t Å",   # decomposed é / Å must compose
                "a\x00b\x07c\x1fd\x7fe",    # C0 controls + DEL stripped
                "  x \n\n y\tz  ",          # ws runs collapse, edges trim
                None,
                "",
            ],
            pa.string(),
        )
        norm, n = normalize_text_array(arr)
        assert norm.to_pylist() == ["café Å", "abcde", "x y z", None, ""]
        # composed forms are single codepoints: é=U+00E9, Å=U+00C5
        assert [ord(c) for c in norm[0].as_py()] == [
            0x63, 0x61, 0x66, 0xE9, 0x20, 0xC5,
        ]
        assert n.to_pylist() == [6, 5, 5, None, 0]

    def test_q69_twin(self):
        _twin_check("q69_normalize_text")


class TestDomainRollup:
    def test_q70_twin(self):
        _twin_check("q70_domain_rollup")
