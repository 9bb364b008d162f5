"""Deterministic synthetic media table (images / audio / video as binary).

The sandbox has no image/audio libraries and no real media, so payloads are
deterministic pseudo-media: raw uint8 grayscale rasters for images, int16
PCM-ish samples for audio, and concatenated rasters for video — each a pure
function of ``(seed, media_id)``.  This makes every decode/resize/frame-sample
stage exactly testable (the "decoded" output is recomputable bit-identically)
while keeping the Ray-side plumbing — binary Arrow columns, typed metadata,
actor-pool batch sizing — identical to what a real codec path needs.

Schema: ``schemas.MEDIA``.  Like the transcripts fixture, generation is
sharded over Ray tasks and any subset regenerates bit-identically.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ner_ray import schemas

KINDS = ("image", "audio", "video")
MIME = {"image": "image/x-raw8", "audio": "audio/x-pcm16", "video": "video/x-raw8seq"}
IMAGE_DIMS = ((32, 24), (64, 48), (48, 48), (16, 16))
AUDIO_RATES = (8000, 16000)
VIDEO_DIMS = ((16, 12), (24, 16))


@dataclass(frozen=True)
class MediaConfig:
    n_media: int = 200
    seed: int = 42


def gen_media_row(media_id: int, cfg: MediaConfig) -> dict:
    """One media row, pure function of (seed, media_id)."""
    rng = np.random.default_rng((cfg.seed << 22) ^ (media_id * 2 + 1))
    kind = KINDS[media_id % len(KINDS)]
    row = {
        "media_id": media_id,
        "doc_id": media_id % 97,
        "kind": kind,
        "mime": MIME[kind],
        "width": 0,
        "height": 0,
        "sample_rate": 0,
        "n_frames": 0,
        "duration_ms": 0,
    }
    if kind == "image":
        w, h = IMAGE_DIMS[int(rng.integers(0, len(IMAGE_DIMS)))]
        row.update(width=w, height=h, n_frames=1)
        row["payload"] = rng.integers(0, 256, size=h * w, dtype=np.uint8).tobytes()
    elif kind == "audio":
        sr = AUDIO_RATES[int(rng.integers(0, len(AUDIO_RATES)))]
        dur_ms = int(rng.integers(100, 400))
        n = sr * dur_ms // 1000
        # tone + noise so RMS / zero-crossings are non-degenerate
        t = np.arange(n, dtype=np.float64)
        freq = float(rng.integers(100, 1000))
        wave = 0.5 * np.sin(2 * np.pi * freq * t / sr) + 0.05 * rng.standard_normal(n)
        row.update(sample_rate=sr, duration_ms=dur_ms)
        row["payload"] = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
    else:  # video
        w, h = VIDEO_DIMS[int(rng.integers(0, len(VIDEO_DIMS)))]
        n_frames = int(rng.integers(8, 33))
        row.update(width=w, height=h, n_frames=n_frames, duration_ms=n_frames * 40)
        row["payload"] = rng.integers(0, 256, size=n_frames * h * w, dtype=np.uint8).tobytes()
    return row


def make_media_table(cfg: MediaConfig | None = None, ids: list[int] | None = None) -> pa.Table:
    cfg = cfg or MediaConfig()
    ids = ids if ids is not None else list(range(cfg.n_media))
    rows = [gen_media_row(i, cfg) for i in ids]
    cols = {name: [r.get(name) for r in rows] for name in schemas.MEDIA.names}
    return pa.table(
        {n: pa.array(cols[n], schemas.MEDIA.field(n).type) for n in schemas.MEDIA.names},
        schema=schemas.MEDIA,
    )


def write_media(out_dir: str, cfg: MediaConfig | None = None, shards: int = 8) -> str:
    """Sharded distributed generation (same pattern as fixtures.transcripts)."""
    import os

    import ray.data as rd

    cfg = cfg or MediaConfig()
    os.makedirs(out_dir, exist_ok=True)

    def gen_shard(batch: dict[str, np.ndarray]) -> pa.Table:
        return make_media_table(cfg, ids=[int(i) for i in np.sort(batch["id"])])

    (
        rd.range(cfg.n_media, override_num_blocks=shards)
        .map_batches(gen_shard, batch_format="numpy", batch_size=max(1, cfg.n_media // shards))
        .write_parquet(out_dir)
    )
    return out_dir
