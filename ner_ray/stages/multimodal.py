"""Multimodal stages: decode / feature-extract / resize / frame-sample over
opaque binary media columns (``schemas.MEDIA``).

Design for 100 TB of media, not the fixture scale:

- Payloads are **binary Arrow columns** end to end — a block holds raw bytes,
  never Python-object images; slicing frames / resized rasters produces new
  binary arrays without copying through Python lists where possible.
- Decoders are **actor-pool ``map_batches`` stages** with deliberately SMALL
  ``batch_size`` (payloads are KB–MB each; batch_size × concurrency × payload
  must fit a worker heap — the inverse of the wide-and-tiny-row tuning used
  for text).  Codec state (libraries, LUTs) loads once per actor in
  ``__init__``.
- Real codec decode (PIL / libsndfile / ffmpeg) is **stubbed**: the libraries
  are not in this container, so the default backend is the deterministic
  raw-raster interpretation the fixture generates
  (``fixtures.media``), and ``backend="real"`` raises ``NotImplementedError``
  at actor construction unless the import succeeds.  The Ray-side plumbing —
  schemas, batch shapes, actor signatures, output layout — is real and tested
  either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ner_ray import schemas


def _real_image_backend():
    try:
        import PIL.Image  # noqa: F401

        return "pil"
    except ImportError:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "real image codec backend requires PIL, which is not installed in "
            "this container; use backend='raw' (deterministic raw-raster stub)"
        )


class ImageFeaturizer:
    """Actor: decode image payloads -> luminance stats + 16-bin histogram +
    64-bit difference-hash (``schemas.IMAGE_FEATURES``)."""

    def __init__(self, backend: str = "raw"):
        if backend == "real":
            self.backend = _real_image_backend()
        else:
            self.backend = "raw"
        self.bins = np.linspace(0, 256, 17)

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        return np.frombuffer(payload, dtype=np.uint8, count=h * w).reshape(h, w)

    @staticmethod
    def _dhash64(img: np.ndarray) -> int:
        """8x8 difference hash: block-mean downsample to 8x9, compare
        horizontal neighbours, pack 64 bits (signed int64 for Arrow)."""
        h, w = img.shape
        ys = np.linspace(0, h, 9, dtype=int)
        xs = np.linspace(0, w, 10, dtype=int)
        small = np.empty((8, 9))
        for i in range(8):
            for j in range(9):
                small[i, j] = img[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
        bits = (small[:, 1:] > small[:, :-1]).flatten()
        return int(np.uint64(np.packbits(bits).view(">u8")[0]).astype(np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.compute.equal(batch["kind"], "image"))
        out = {n: [] for n in schemas.IMAGE_FEATURES.names}
        for mid, payload, w, h in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            img = self._decode(payload, w, h)
            hist = np.histogram(img, bins=self.bins)[0] / img.size
            out["media_id"].append(mid)
            out["width"].append(w)
            out["height"].append(h)
            out["mean_lum"].append(float(img.mean()))
            out["std_lum"].append(float(img.std()))
            out["phash"].append(self._dhash64(img))
            out["histogram"].append(hist.astype(np.float32))
        return pa.table(
            {n: pa.array(out[n], schemas.IMAGE_FEATURES.field(n).type) for n in out},
            schema=schemas.IMAGE_FEATURES,
        )


class ImageResizer:
    """Actor: block-mean resize to (target_w, target_h); emits the MEDIA
    schema with updated payload/dims (a real backend would swap in
    ``PIL.Image.resize`` here)."""

    def __init__(self, target_w: int = 16, target_h: int = 16, backend: str = "raw"):
        if backend == "real":
            _real_image_backend()
        self.tw, self.th = target_w, target_h

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape
        ys = np.linspace(0, h, self.th + 1, dtype=int)
        xs = np.linspace(0, w, self.tw + 1, dtype=int)
        out = np.empty((self.th, self.tw), dtype=np.uint8)
        for i in range(self.th):
            for j in range(self.tw):
                out[i, j] = int(img[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean())
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.compute.equal(batch["kind"], "image"))
        payloads, widths, heights = [], [], []
        for payload, w, h in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            img = np.frombuffer(payload, dtype=np.uint8, count=h * w).reshape(h, w)
            payloads.append(self._resize(img).tobytes())
            widths.append(self.tw)
            heights.append(self.th)
        cols = {n: batch[n] for n in batch.column_names}
        cols["payload"] = pa.array(payloads, pa.binary())
        cols["width"] = pa.array(widths, pa.int32())
        cols["height"] = pa.array(heights, pa.int32())
        return pa.table(cols, schema=batch.schema)


class AudioFeaturizer:
    """Actor: int16 PCM payloads -> RMS / zero-crossing features
    (``schemas.AUDIO_FEATURES``)."""

    def __init__(self, frame: int = 256, backend: str = "raw"):
        if backend == "real":  # pragma: no cover
            raise NotImplementedError(
                "real audio codec backend requires soundfile/ffmpeg, not in "
                "this container; use backend='raw' (int16 PCM stub)"
            )
        self.frame = frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.compute.equal(batch["kind"], "audio"))
        out = {n: [] for n in schemas.AUDIO_FEATURES.names}
        for mid, payload, sr in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["sample_rate"].to_pylist(),
        ):
            x = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
            n = len(x)
            nf = max(1, n // self.frame)
            frames = x[: nf * self.frame].reshape(nf, self.frame)
            rms = np.sqrt((frames**2).mean(axis=1))
            zc = float(np.mean(np.abs(np.diff(np.signbit(x))))) if n > 1 else 0.0
            out["media_id"].append(mid)
            out["sample_rate"].append(sr)
            out["n_samples"].append(n)
            out["rms_mean"].append(float(rms.mean()))
            out["rms_max"].append(float(rms.max()))
            out["zero_cross_rate"].append(zc)
        return pa.table(
            {n: pa.array(out[n], schemas.AUDIO_FEATURES.field(n).type) for n in out},
            schema=schemas.AUDIO_FEATURES,
        )


def sample_frames(batch: pa.Table, every_n: int = 4) -> pa.Table:
    """Stateless flat-map: video payload -> one row per sampled frame
    (``schemas.FRAMES``).  Frame slicing is zero-copy on the buffer level
    (numpy views over the payload bytes)."""
    batch = batch.filter(pa.compute.equal(batch["kind"], "video"))
    out = {n: [] for n in schemas.FRAMES.names}
    for mid, payload, w, h, n_frames, dur in zip(
        batch["media_id"].to_pylist(),
        batch["payload"].to_pylist(),
        batch["width"].to_pylist(),
        batch["height"].to_pylist(),
        batch["n_frames"].to_pylist(),
        batch["duration_ms"].to_pylist(),
    ):
        raw = np.frombuffer(payload, dtype=np.uint8, count=n_frames * h * w)
        frame_ms = dur // n_frames if n_frames else 0
        for fi in range(0, n_frames, every_n):
            out["media_id"].append(mid)
            out["frame_idx"].append(fi)
            out["ts_ms"].append(fi * frame_ms)
            out["width"].append(w)
            out["height"].append(h)
            out["frame"].append(raw[fi * h * w : (fi + 1) * h * w].tobytes())
    return pa.table(
        {n: pa.array(out[n], schemas.FRAMES.field(n).type) for n in out},
        schema=schemas.FRAMES,
    )


def image_features(ds: Dataset, concurrency=(1, 8), batch_size: int = 64) -> Dataset:
    """Actor-pool image decode+featurize.  batch_size is small by design:
    payload bytes dominate block memory (see module docstring)."""
    return ds.map_batches(
        ImageFeaturizer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_images(ds: Dataset, target_w: int = 16, target_h: int = 16, concurrency=(1, 8)) -> Dataset:
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs=dict(target_w=target_w, target_h=target_h),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,
        concurrency=concurrency,
    )


def audio_features(ds: Dataset, concurrency=(1, 8), batch_size: int = 64) -> Dataset:
    return ds.map_batches(
        AudioFeaturizer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def video_frames(ds: Dataset, every_n: int = 4) -> Dataset:
    """Stateless frame sampling (task pool — no per-actor state needed)."""
    import functools

    return ds.map_batches(
        functools.partial(sample_frames, every_n=every_n),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=32,
    )


def media_stats(ds: Dataset) -> Dataset:
    """Per-kind payload accounting (count, total/mean payload bytes) — the
    partial-aggregate pattern: byte sizes computed per block, tiny groupby."""
    from ray.data.aggregate import Count, Mean, Sum

    def sizes(batch: pa.Table) -> pa.Table:
        nbytes = pa.compute.binary_length(batch["payload"])
        return pa.table(
            {"kind": batch["kind"], "payload_bytes": pa.compute.cast(nbytes, pa.int64())}
        )

    return (
        ds.map_batches(sizes, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("kind")
        .aggregate(
            Count(alias_name="n_media"),
            Sum("payload_bytes", alias_name="total_bytes"),
            Mean("payload_bytes", alias_name="mean_bytes"),
        )
    )
