"""Cross-cutting property laws for the exactness arguments the scale
shapes rely on.

Each distributed plan in this repo that bounds a shuffle with a
per-block pre-combiner, replaces a sort with a sketch, or quantizes a
float kernel for cross-engine hashing leans on a small mathematical
claim stated in its docstring.  These tests pin the three claims that
the most operators share:

1. the per-block top-N **containment law** (`relational._block_topn`) —
   the exact top-N of a group is contained in the union of its per-block
   top-Ns, for every block split, tie pattern and N (q29/q72/q74/q88
   and every "pre-combiner bounds the shuffle at N·blocks rows" plan);
2. the fixed-grid histogram quantile **error bound**
   (`sketches.histogram_quantiles`) — the estimate is within one bin
   width of a true order statistic, whatever the data distribution
   (q90/q95 replace an all-to-all percentile sort with this);
3. PQ/ADC **exactness at zero quantization error**
   (`ann.pq_encode`/`ann.pq_adc_topk`) — when a vector IS a product of
   codebook words, encoding recovers the codeword indices and the ADC
   distance equals the floor-quantized exact per-subspace distance sum
   (q96/q97; the approximation error of ADC comes ONLY from
   quantization, so the zero-error case must be exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class TestBlockTopNContainmentLaw:
    """brute(concat(blocks)) == brute(concat(map(_block_topn, blocks)))
    for arbitrary tables, block splits, duplicate keys/orders/ties and N
    — the distributivity argument every top-N pre-combiner cites."""

    def test_precombine_exactness_over_arbitrary_splits(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ner_ray.stages.relational import _block_topn

        rows = st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 9), st.integers(0, 99)),
            min_size=1,
            max_size=60,
        )

        def brute(d: pd.DataFrame, n: int, ascending: bool) -> pd.DataFrame:
            d = d.sort_values(
                ["k", "o", "t"],
                ascending=[True, ascending, True],
                kind="mergesort",
            )
            return d.groupby("k", sort=True).head(n).reset_index(drop=True)

        @settings(max_examples=150, deadline=None)
        @given(rows, st.integers(1, 4), st.booleans(), st.data())
        def law(rws, n, ascending, data):
            df = pd.DataFrame(rws, columns=["k", "o", "t"])
            cuts = sorted(data.draw(st.lists(st.integers(0, len(df)), max_size=4)))
            bounds = [0] + cuts + [len(df)]
            parts = [df.iloc[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]
            pre_parts = [
                _block_topn(
                    pa.Table.from_pandas(p, preserve_index=False),
                    "k",
                    "o",
                    n,
                    "t",
                    ascending=ascending,
                ).to_pandas()
                for p in parts
            ]
            pre = (
                pd.concat(pre_parts, ignore_index=True)
                if pre_parts
                else df.iloc[:0]
            )
            assert brute(pre, n, ascending).equals(brute(df, n, ascending))

        law()


class TestHistogramQuantileErrorBound:
    """|estimate - exact quantile| <= one bin width for uniform, skewed,
    heavy-tailed, integer-lattice and near-constant data — the accuracy
    claim that lets q90/q95 drop the percentile sort at any scale."""

    def test_error_bounded_by_bin_width(self, ray_session):
        import ray

        from ner_ray.stages.sketches import histogram_quantiles

        rng = np.random.default_rng(20260819)
        datasets = {
            "uniform": rng.uniform(0, 1000, size=5000),
            "lognormal": rng.lognormal(3.0, 2.0, size=5000),
            "integer_lattice": rng.integers(0, 50, size=5000).astype(float),
            "bimodal": np.r_[rng.normal(0, 1, 2500), rng.normal(100, 1, 2500)],
            "tight": 7.0 + rng.uniform(0, 1e-3, size=2000),
        }
        bins = 128
        ps = (0.25, 0.5, 0.9, 0.99)
        for name, x in datasets.items():
            ds = ray.data.from_pandas(pd.DataFrame({"v": x})).repartition(5)
            out = histogram_quantiles(ds, "v", bins=bins, ps=ps)
            w = (x.max() - x.min()) / bins
            xs = np.sort(x)
            for _, row in out.iterrows():
                # the estimator's own quantile definition is the ORDER
                # STATISTIC its cumulative rule targets — the k-th smallest
                # with k = ceil(p*n) — not numpy's default interpolation,
                # which can land mid-gap between modes where NO data lives
                # (bimodal p=0.5).  One-bin-width error is promised against
                # that order statistic.
                k = max(1, int(np.ceil(row["p"] * len(xs))))
                exact = float(xs[k - 1])
                assert abs(row["estimate"] - exact) <= w + 1e-6, (
                    name,
                    row["p"],
                    row["estimate"],
                    exact,
                    w,
                )

    def test_constant_column_degenerate(self, ray_session):
        import ray

        from ner_ray.stages.sketches import histogram_quantiles

        ds = ray.data.from_pandas(pd.DataFrame({"v": np.full(100, 3.25)}))
        out = histogram_quantiles(ds, "v", ps=(0.5, 0.99))
        assert (out["estimate"] == 3.25).all()


class TestPQAdcZeroErrorLaw:
    """Vectors constructed as exact products of codebook words: encoding
    must recover the chosen indices, and the ADC distance must equal the
    floor-quantized exact per-subspace distance sum (ADC's error is
    quantization error and nothing else)."""

    M, K, DSUB, N = 3, 8, 4, 64

    def _fixture(self):
        rng = np.random.default_rng(7)
        codebooks = [rng.normal(0, 1, (self.K, self.DSUB)) for _ in range(self.M)]
        picks = rng.integers(0, self.K, size=(self.N, self.M))
        vecs = np.hstack(
            [codebooks[m][picks[:, m]] for m in range(self.M)]
        )
        query = rng.normal(0, 1, self.M * self.DSUB)
        return codebooks, picks, vecs, query

    def test_encode_recovers_codewords(self, ray_session):
        import ray

        from ner_ray.stages.ann import pq_encode

        codebooks, picks, vecs, _ = self._fixture()
        df = pd.DataFrame(
            {"vec_id": np.arange(self.N, dtype=np.int64), "embedding": list(vecs)}
        )
        out = (
            pq_encode(ray.data.from_pandas(df).repartition(4), codebooks)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        for m in range(self.M):
            assert (out[f"code_{m}"].to_numpy() == picks[:, m]).all()

    def test_adc_equals_exact_at_zero_quantization_error(self, ray_session):
        import ray

        from ner_ray.stages.ann import pq_adc_topk

        codebooks, _, vecs, query = self._fixture()
        df = pd.DataFrame(
            {"vec_id": np.arange(self.N, dtype=np.int64), "embedding": list(vecs)}
        )
        top = pq_adc_topk(
            ray.data.from_pandas(df).repartition(4),
            codebooks,
            query,
            k=self.N,
        )
        # expected: per-subspace EXACT distances, floor-quantized to the
        # same integer micros as the ADC tables, then summed
        expected = np.zeros(self.N, dtype=np.int64)
        for m in range(self.M):
            qm = query[m * self.DSUB : (m + 1) * self.DSUB]
            xm = vecs[:, m * self.DSUB : (m + 1) * self.DSUB]
            d2 = ((qm[None, :] - xm) ** 2).sum(axis=1)
            expected += np.floor(d2 * 1e6 + 0.5).astype(np.int64)
        got = (
            top.sort_values("vec_id").reset_index(drop=True)["d_micro"].to_numpy()
        )
        assert (got == expected[top.sort_values("vec_id")["vec_id"].to_numpy()]).all()
        # and the ranking is the exact-distance ranking (ties by id)
        order = np.lexsort((np.arange(self.N), expected))
        assert (
            top.sort_values("rank")["vec_id"].to_numpy() == order
        ).all()


class TestSplitmix64KnownAnswers:
    """Pin `sketches.splitmix64` to the PUBLISHED splitmix64 reference
    sequence (Steele, Lea & Flood 2014; seed 0), not just to the repo's own
    HUGEINT-SQL reimplementation (test_round3b already proves engine==SQL;
    this proves both == the public algorithm).  The finalizer form takes
    the pre-advanced state, so the k-th output of the seed-0 generator is
    ``splitmix64(k * GAMMA)``."""

    GAMMA = 0x9E3779B97F4A7C15
    # first three outputs of the reference generator seeded with 0
    EXPECT = (0xE220A8397B1DCDAF, 0x6E789E6AA1B965F4, 0x06C45D188009454F)

    def test_reference_sequence(self):
        from ner_ray.stages.sketches import splitmix64

        states = np.array(
            [(k * self.GAMMA) % (1 << 64) for k in range(3)], dtype=np.uint64
        )
        got = splitmix64(states)
        assert tuple(int(v) for v in got) == self.EXPECT


class TestPrefixThresholdLaw:
    """The q103 distributed prefix-threshold selection (bucket masses +
    whole-bucket flags + one boundary-bucket resolution) must equal the
    window-cumsum definition (ORDER BY h, id; cum_before < budget) on
    ARBITRARY corpora — including h-collisions, empty buckets, and budgets
    landing exactly on bucket edges.  The op's contract excludes
    zero-token docs (they occupy no budget): WITH them, a doc whose
    cum_before equals a full-bucket edge equal to the budget splits the
    two definitions — this law originally generated n=0 docs and caught
    exactly that, which is why q103 filters n > 0 on both sides."""

    @staticmethod
    def _window_rule(ids, h, n, budget):
        order = np.lexsort((ids, h))
        cb = np.zeros(len(ids), dtype=np.int64)
        cb[order] = np.cumsum(n[order]) - n[order]
        return set(ids[cb < budget].astype(int))

    @staticmethod
    def _bucket_algo(ids, h, n, budget, nb=16):
        # the q103 algorithm at a tiny bucket count so boundaries are hit
        shift = np.uint64(64 - int(np.log2(nb)))
        bkt = (h >> shift).astype(np.int64)
        mass = np.bincount(bkt, weights=n, minlength=nb).astype(np.int64)
        prefix = np.zeros(nb + 1, dtype=np.int64)
        prefix[1:] = np.cumsum(mass)
        full = prefix[1:] <= budget
        boundary = np.flatnonzero((prefix[:-1] < budget) & (prefix[1:] > budget))
        sel = set(ids[full[bkt]].astype(int))
        if len(boundary):
            b = int(boundary[0])
            base = int(prefix[b])
            m = bkt == b
            sub_ids, sub_h, sub_n = ids[m], h[m], n[m]
            o = np.lexsort((sub_ids, sub_h))
            cb = base + np.cumsum(sub_n[o]) - sub_n[o]
            sel |= set(sub_ids[o][cb < budget].astype(int))
        return sel

    def test_equal_on_random_corpora(self):
        rng = np.random.default_rng(7)
        for trial in range(200):
            m = int(rng.integers(1, 60))
            ids = rng.choice(10_000, size=m, replace=False).astype(np.int64)
            # force h-collisions sometimes: quantize hashes coarsely
            if trial % 3 == 0:
                h = (rng.integers(0, 8, size=m, dtype=np.uint64)
                     << np.uint64(61))
            else:
                h = rng.integers(0, 2**63, size=m, dtype=np.uint64) * np.uint64(2)
            n = rng.integers(1, 51, size=m).astype(np.int64)
            total = int(n.sum())
            for budget in {0, 1, total // 2, total, total + 5}:
                want = self._window_rule(ids, h, n, budget)
                got = self._bucket_algo(ids, h, n, budget)
                assert got == want, (trial, budget)
