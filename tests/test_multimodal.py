"""Multimodal stages: deterministic fixture, decode/featurize/resize/frame
sampling plumbing over binary Arrow columns (SURVEY.md §2 extension; stubbed
codec backend per the no-media-libs container)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ner_ray import schemas
from ner_ray.fixtures.media import MediaConfig, gen_media_row, make_media_table
from ner_ray.stages.multimodal import (
    AudioFeaturizer,
    ImageFeaturizer,
    ImageResizer,
    audio_features,
    image_features,
    media_stats,
    resize_images,
    sample_frames,
    video_frames,
)

CFG = MediaConfig(n_media=60, seed=42)


class TestFixture:
    def test_deterministic(self):
        a = make_media_table(CFG)
        b = make_media_table(CFG)
        ha = hashlib.md5(b"".join(a["payload"].to_pylist())).hexdigest()
        hb = hashlib.md5(b"".join(b["payload"].to_pylist())).hexdigest()
        assert ha == hb
        assert a.schema.equals(schemas.MEDIA)

    def test_payload_sizes_match_metadata(self):
        t = make_media_table(CFG)
        for r in t.to_pylist():
            if r["kind"] == "image":
                assert len(r["payload"]) == r["width"] * r["height"]
            elif r["kind"] == "audio":
                assert len(r["payload"]) == 2 * (r["sample_rate"] * r["duration_ms"] // 1000)
            else:
                assert len(r["payload"]) == r["n_frames"] * r["width"] * r["height"]

    def test_subset_regeneration_bit_identical(self):
        full = make_media_table(CFG)
        sub = make_media_table(CFG, ids=[5, 6])
        assert sub["payload"][0].as_py() == full["payload"][5].as_py()


class TestImageOps:
    def test_featurizer_values(self):
        t = make_media_table(CFG)
        feats = ImageFeaturizer()(t)
        assert feats.schema.equals(schemas.IMAGE_FEATURES)
        row = feats.to_pylist()[0]
        mid = row["media_id"]
        src = gen_media_row(mid, CFG)
        img = np.frombuffer(src["payload"], dtype=np.uint8).reshape(src["height"], src["width"])
        assert row["mean_lum"] == pytest.approx(img.mean(), rel=1e-6)
        assert abs(sum(row["histogram"]) - 1.0) < 1e-5

    def test_phash_stable_under_resize(self):
        # dhash of the block-mean-resized image should stay close (it IS a
        # block-mean reduction) — sanity that the hash is content-derived.
        t = make_media_table(CFG)
        f1 = ImageFeaturizer()(t)
        resized = ImageResizer(target_w=16, target_h=16)(t)
        f2 = ImageFeaturizer()(resized)
        h1 = {r["media_id"]: r["phash"] for r in f1.to_pylist()}
        h2 = {r["media_id"]: r["phash"] for r in f2.to_pylist()}
        dists = [
            bin(np.uint64(h1[m]) ^ np.uint64(h2[m])).count("1") for m in h1
        ]
        assert np.mean(dists) < 16  # far below random 32

    def test_resize_dims(self):
        t = make_media_table(CFG)
        out = ImageResizer(target_w=8, target_h=6)(t)
        for r in out.to_pylist():
            assert (r["width"], r["height"]) == (8, 6)
            assert len(r["payload"]) == 48

    def test_real_backend_gated(self):
        with pytest.raises(NotImplementedError):
            ImageFeaturizer(backend="real")


class TestAudioVideo:
    def test_audio_features(self):
        t = make_media_table(CFG)
        feats = AudioFeaturizer()(t)
        assert feats.schema.equals(schemas.AUDIO_FEATURES)
        for r in feats.to_pylist():
            assert 0.0 < r["rms_mean"] <= r["rms_max"] <= 1.0
            assert 0.0 < r["zero_cross_rate"] < 1.0

    def test_frame_sampling_exact(self):
        t = make_media_table(CFG)
        frames = sample_frames(t, every_n=4)
        assert frames.schema.equals(schemas.FRAMES)
        vids = {r["media_id"]: r for r in t.to_pylist() if r["kind"] == "video"}
        counts: dict[int, int] = {}
        for r in frames.to_pylist():
            counts[r["media_id"]] = counts.get(r["media_id"], 0) + 1
            src = vids[r["media_id"]]
            fsz = src["width"] * src["height"]
            start = r["frame_idx"] * fsz
            assert r["frame"] == src["payload"][start : start + fsz]
        for mid, src in vids.items():
            assert counts[mid] == -(-src["n_frames"] // 4)  # ceil


class TestDatasetPlumbing:
    """Actor-pool / task stages over a real Ray Dataset (session Ray)."""

    def _ds(self):
        return rd.from_arrow(make_media_table(CFG)).repartition(4)

    def test_image_pipeline(self):
        out = image_features(self._ds(), concurrency=(1, 2)).to_pandas()
        assert len(out) == sum(1 for i in range(CFG.n_media) if i % 3 == 0)
        assert set(out.columns) == set(schemas.IMAGE_FEATURES.names)

    def test_resize_then_featurize_composes(self):
        ds = resize_images(self._ds(), 8, 8, concurrency=(1, 2))
        out = image_features(ds, concurrency=(1, 2)).to_pandas()
        assert (out["width"] == 8).all()

    def test_audio_and_frames(self):
        a = audio_features(self._ds(), concurrency=(1, 2)).to_pandas()
        assert len(a) == sum(1 for i in range(CFG.n_media) if i % 3 == 1)
        f = video_frames(self._ds(), every_n=8).to_pandas()
        assert (f["frame_idx"] % 8 == 0).all()

    def test_media_stats(self):
        st = media_stats(self._ds()).to_pandas().set_index("kind")
        t = make_media_table(CFG)
        sizes = [(k, len(p)) for k, p in zip(t["kind"].to_pylist(), t["payload"].to_pylist())]
        for kind in ("image", "audio", "video"):
            expect = sum(s for k, s in sizes if k == kind)
            assert int(st.loc[kind, "total_bytes"]) == expect
