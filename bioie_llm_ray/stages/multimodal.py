"""Multimodal column stages — binary payloads with typed metadata.

Image/audio/video ride as opaque ``binary`` columns plus metadata columns
(``media_type``, ``width``/``height``/``duration_ms``…).  The Ray-side
plumbing (schema, small batch sizes for big payloads, actor-pool signature,
output layout) is real and tested.  Since round 3 the codec step is real
too for PNG images and PCM16 WAV audio, via the pure-stdlib codecs in
``functions/media_codecs.py`` (zlib + ``wave``) — no PIL/librosa needed.
``fake=True`` keeps the deterministic md5-seeded decode the CI SQL oracles
replay bit-for-bit.  Video containers genuinely need av/ffmpeg, so
``FrameSampleStub`` stays fake-only.

Scale notes: payload rows are wide — callers should keep
``batch_size`` small (64–256) and rely on ``DataContext.target_max_block_size``
so a block of binaries never exceeds worker heap; feature outputs drop the
payload column immediately (project early).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # "image/png", "audio/wav", ...
        ("payload", pa.binary()),
        ("meta_json", pa.string()),
    ]
)


class DecodeStub:
    """Actor-pool decode stage: payload binary → fixed-size feature vector.

    Real mode (``fake=False``) decodes PNG payloads (pure-stdlib codec,
    ``media_codecs.decode_png``) into a mean-pooled pixel-intensity grid and
    WAV payloads (``decode_wav``) into per-segment RMS energy — both
    deterministic.  The contract (binary in, ``feature: list<float>`` +
    carried metadata out, payload dropped) is identical in both modes;
    ``fake=True`` keeps the md5-seeded decode the SQL oracle replays.
    Dispatch is by the ``media_type`` column when present, else by payload
    magic bytes.
    """

    def __init__(self, feature_dim: int = 16, fake: bool = False):
        self.feature_dim = feature_dim
        self.fake = fake

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # md5 digest bytes cycled to feature_dim, scaled by 1/256: every
        # value is exactly representable in float32 (b * 2^-8), so the fake
        # is bit-reproducible in any arithmetic — including a SQL oracle.
        digest = hashlib.md5(payload).digest()
        reps = -(-self.feature_dim // len(digest))
        b = np.frombuffer(digest * reps, dtype=np.uint8)[: self.feature_dim]
        return (b.astype(np.float32)) / np.float32(256.0)

    def _real_decode(self, payload: bytes, media_type: str) -> np.ndarray:
        from ..functions.media_codecs import decode_png, decode_wav

        d = self.feature_dim
        if media_type == "image/png" or payload[:8] == b"\x89PNG\r\n\x1a\n":
            img = decode_png(payload).astype(np.float64)
            if img.ndim == 3:  # luminance over channels
                img = img.mean(axis=2)
            # mean-pool onto a fixed grid: d cells over the flattened image
            flat = img.reshape(-1)
            idx = (np.arange(flat.size, dtype=np.int64) * d) // flat.size
            sums = np.bincount(idx, weights=flat, minlength=d)
            cnts = np.bincount(idx, minlength=d)
            return (sums / np.maximum(cnts, 1) / 255.0).astype(np.float32)
        if media_type == "audio/wav" or payload[:4] == b"RIFF":
            samples, _rate = decode_wav(payload)
            if samples.ndim == 2:
                samples = samples.mean(axis=1)
            x = samples.astype(np.float64) / 32768.0
            idx = (np.arange(x.size, dtype=np.int64) * d) // max(x.size, 1)
            sums = np.bincount(idx, weights=x * x, minlength=d)
            cnts = np.bincount(idx, minlength=d)
            return np.sqrt(sums / np.maximum(cnts, 1)).astype(np.float32)
        raise NotImplementedError(
            f"no pure-python codec for media_type={media_type!r} "
            "(PNG and PCM16 WAV are supported; video needs av/ffmpeg)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self.fake:
            feats = [self._fake_decode(p) for p in payloads]
        else:
            mts = (
                batch["media_type"].to_pylist()
                if "media_type" in batch.column_names
                else [""] * len(payloads)
            )
            feats = [
                self._real_decode(p, mt or "") for p, mt in zip(payloads, mts)
            ]
        out = batch.drop_columns(["payload"])  # project early: payloads are wide
        return out.append_column(
            "feature",
            pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
        )


def decode_features(
    ds,
    feature_dim: int = 16,
    fake: bool = False,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 128,
):
    """docs-with-payload → features; small batches for wide binary rows."""
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"feature_dim": feature_dim, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeStub:
    """Actor-pool image-resize stage: payload binary → resized payload binary.

    Real mode decodes PNG with the pure-stdlib codec, nearest-neighbor
    resizes, and re-encodes (filter-0 PNG — deterministic bytes); fake mode
    emits a deterministic payload (md5-derived, length ∝ target area).  Both
    rewrite ``meta_json`` with the new dimensions — the contract
    (binary→binary, metadata updated, payload REPLACED not duplicated) is
    identical.
    """

    def __init__(self, width: int, height: int, fake: bool = False):
        self.width = width
        self.height = height
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        metas = (
            batch["meta_json"].to_pylist()
            if "meta_json" in batch.column_names
            else ["{}"] * len(batch)
        )
        if not self.fake:
            from ..functions.media_codecs import (
                decode_png,
                encode_png,
                resize_nearest,
            )
        new_payloads, new_metas = [], []
        for payload, meta in zip(batch["payload"].to_pylist(), metas):
            if self.fake:
                digest = hashlib.md5(payload).digest()
                size = max(16, (self.width * self.height) // 64)
                new_payloads.append((digest * (size // 16 + 1))[:size])
            else:
                img = resize_nearest(
                    decode_png(payload), self.width, self.height
                )
                new_payloads.append(encode_png(img))
            m = json.loads(meta or "{}")
            m["width"], m["height"] = self.width, self.height
            new_metas.append(json.dumps(m, sort_keys=True))
        batch = batch.set_column(
            batch.column_names.index("payload"),
            "payload",
            pa.array(new_payloads, type=pa.binary()),
        )
        if "meta_json" in batch.column_names:
            batch = batch.set_column(
                batch.column_names.index("meta_json"),
                "meta_json",
                pa.array(new_metas, type=pa.string()),
            )
        return batch


class FrameSampleStub:
    """Actor-pool video frame sampler: one payload row → N frame rows.

    Real implementation opens the container with av/ffmpeg per actor and
    seeks; fake mode derives the frame count from ``duration_ms`` in
    ``meta_json`` and emits one deterministic frame payload per sample
    point.  Output explodes rows (media_id, frame_idx, ts_ms, payload) —
    downstream image stages (``DecodeStub``/``ResizeStub``) consume it
    unchanged.
    """

    def __init__(
        self, every_ms: int = 1000, max_frames: int = 8, fake: bool = False
    ):
        self.every_ms = every_ms
        self.max_frames = max_frames
        if not fake:
            raise NotImplementedError(
                "video container demuxing needs av/ffmpeg, which this "
                "environment lacks (no pure-stdlib path exists, unlike "
                "PNG/WAV); construct with fake=True"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        out = {"media_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
        for mid, payload, meta in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta_json"].to_pylist(),
        ):
            duration = int(json.loads(meta or "{}").get("duration_ms", 0))
            n = min(self.max_frames, max(1, duration // self.every_ms))
            for i in range(n):
                ts = i * self.every_ms
                out["media_id"].append(mid)
                out["frame_idx"].append(i)
                out["ts_ms"].append(ts)
                out["payload"].append(
                    hashlib.md5(payload + ts.to_bytes(8, "big")).digest()
                )
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], type=pa.string()),
                "frame_idx": pa.array(out["frame_idx"], type=pa.int32()),
                "ts_ms": pa.array(out["ts_ms"], type=pa.int64()),
                "payload": pa.array(out["payload"], type=pa.binary()),
            }
        )


def resize_images(
    ds,
    width: int,
    height: int,
    fake: bool = False,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 64,
):
    """Payload rows → resized payload rows (small batches: wide binaries)."""
    return ds.map_batches(
        ResizeStub,
        fn_constructor_kwargs={"width": width, "height": height, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(
    ds,
    every_ms: int = 1000,
    max_frames: int = 8,
    fake: bool = False,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 32,
):
    """Video rows → frame rows (row-exploding stage; smallest batches)."""
    return ds.map_batches(
        FrameSampleStub,
        fn_constructor_kwargs={
            "every_ms": every_ms,
            "max_frames": max_frames,
            "fake": fake,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
