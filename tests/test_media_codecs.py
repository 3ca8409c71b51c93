"""Pure-stdlib PNG/WAV codecs and the real (non-fake) multimodal stages.

Round 3 closes VERDICT #6: `DecodeStub`/`ResizeStub` get real codec paths
with no third-party dependency (zlib + stdlib `wave`), while `fake=True`
stays the oracle-checked CI mode (`multimodal_features` unchanged).
"""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest
import ray

from bioie_llm_ray.functions.media_codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resize_nearest,
)
from bioie_llm_ray.stages.multimodal import (
    DecodeStub,
    FrameSampleStub,
    ResizeStub,
    decode_features,
    resize_images,
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png_from_raw(raw: bytes, w: int, h: int, color_type: int = 0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


class TestPng:
    @pytest.mark.parametrize("shape", [(7, 5), (1, 1), (8, 6, 3), (4, 4, 4)])
    def test_roundtrip(self, shape):
        rng = np.random.RandomState(hash(shape) % 2**31)
        img = rng.randint(0, 256, shape).astype(np.uint8)
        back = decode_png(encode_png(img))
        assert back.shape == img.shape
        assert (back == img).all()

    def test_deterministic_bytes(self):
        img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        assert encode_png(img) == encode_png(img)

    def test_all_filter_types_decode(self):
        """Hand-encode scanlines with filters Sub/Up/Average/Paeth (PNG
        spec §9) — the encoder only emits None, but external baseline PNGs
        use all five."""
        rng = np.random.RandomState(3)
        h, w, c = 5, 6, 3
        img = rng.randint(0, 256, (h, w, c)).astype(np.uint8)

        def paeth(a, b, cc):
            p = a + b - cc
            pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
            if pa_ <= pb_ and pa_ <= pc_:
                return a
            return b if pb_ <= pc_ else cc

        stride = w * c
        flat = img.reshape(h, stride).astype(np.int32)
        raw = []
        prev = np.zeros(stride, dtype=np.int32)
        for y, f in enumerate([0, 1, 2, 3, 4]):
            cur = flat[y]
            enc = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = cur[i - c] if i >= c else 0
                ul = prev[i - c] if i >= c else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = left
                elif f == 2:
                    pred = prev[i]
                elif f == 3:
                    pred = (left + prev[i]) >> 1
                else:
                    pred = paeth(int(left), int(prev[i]), int(ul))
                enc[i] = (cur[i] - pred) & 0xFF
            raw.append(bytes([f]) + bytes(enc.astype(np.uint8)))
            prev = cur
        png = _png_from_raw(b"".join(raw), w, h, color_type=2)
        assert (decode_png(png) == img).all()

    def test_crc_corruption_raises(self):
        png = bytearray(encode_png(np.zeros((3, 3), dtype=np.uint8)))
        png[40] ^= 0xFF
        with pytest.raises(ValueError, match="CRC|signature"):
            decode_png(bytes(png))

    def test_unsupported_rejected(self):
        with pytest.raises(ValueError):
            encode_png(np.zeros((3, 3), dtype=np.float32))
        # 16-bit depth
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported"):
            decode_png(png)

    def test_resize_nearest(self):
        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        up = resize_nearest(img, 8, 6)
        assert up.shape == (6, 8)
        # corners preserved under nearest-neighbor
        assert up[0, 0] == img[0, 0] and up[-1, -1] == img[-1, -1]
        down = resize_nearest(up, 4, 3)
        assert (down == img).all()


class TestWav:
    def test_roundtrip_mono(self):
        s = (np.sin(np.linspace(0, 90, 4000)) * 30000).astype(np.int16)
        back, rate = decode_wav(encode_wav(s, 16_000))
        assert rate == 16_000 and (back == s).all()

    def test_roundtrip_stereo(self):
        s = (np.sin(np.linspace(0, 90, 4000)) * 30000).astype(np.int16)
        st = np.stack([s, -s], axis=1)
        back, rate = decode_wav(encode_wav(st, 44_100))
        assert rate == 44_100 and back.shape == st.shape and (back == st).all()

    def test_dtype_rejected(self):
        with pytest.raises(ValueError):
            encode_wav(np.zeros(10, dtype=np.float32))


def _media_ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array([r[0] for r in rows], type=pa.string()),
                "media_type": pa.array([r[1] for r in rows], type=pa.string()),
                "payload": pa.array([r[2] for r in rows], type=pa.binary()),
                "meta_json": pa.array([r[3] for r in rows], type=pa.string()),
            }
        )
    )


class TestRealDecodeStage:
    def test_png_and_wav_features(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        wav = encode_wav(
            (np.sin(np.linspace(0, 60, 2000)) * 20000).astype(np.int16), 8000
        )
        ds = _media_ds(
            [
                ("img1", "image/png", encode_png(img), "{}"),
                ("aud1", "audio/wav", wav, "{}"),
            ]
        )
        out = decode_features(ds, feature_dim=8, fake=False).to_pandas()
        assert set(out["media_id"]) == {"img1", "aud1"}
        assert "payload" not in out.columns
        feats = {m: np.asarray(f) for m, f in zip(out["media_id"], out["feature"])}
        # image features = mean-pooled luminance / 255 ∈ (0, 1)
        lum = img.astype(np.float64).mean(axis=2).reshape(-1)
        assert feats["img1"].shape == (8,)
        assert abs(feats["img1"].mean() - lum.mean() / 255.0) < 1e-3
        # audio features = per-segment RMS of a loud sine ≈ 0.43
        assert feats["aud1"].shape == (8,)
        assert 0.2 < feats["aud1"].mean() < 0.7

    def test_magic_byte_dispatch_without_media_type(self):
        img = np.full((4, 4), 128, dtype=np.uint8)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "media_id": pa.array(["x"], type=pa.string()),
                    "payload": pa.array([encode_png(img)], type=pa.binary()),
                }
            )
        )
        out = decode_features(ds, feature_dim=4, fake=False).to_pandas()
        f = np.asarray(out["feature"][0])
        assert np.allclose(f, 128.0 / 255.0)

    def test_unknown_media_raises(self):
        stub = DecodeStub(feature_dim=4, fake=False)
        with pytest.raises(NotImplementedError, match="codec"):
            stub(
                pa.table(
                    {
                        "media_type": pa.array(["video/mp4"]),
                        "payload": pa.array([b"\x00\x01"], type=pa.binary()),
                    }
                )
            )

    def test_fake_path_unchanged(self):
        """The md5 fake (the mode the SQL oracle replays) must not drift."""
        import hashlib

        stub = DecodeStub(feature_dim=4, fake=True)
        out = stub(
            pa.table(
                {
                    "media_id": pa.array(["a"]),
                    "payload": pa.array([b"payload-bytes"], type=pa.binary()),
                }
            )
        )
        want = [
            b / 256.0
            for b in hashlib.md5(b"payload-bytes").digest()[:4]
        ]
        assert np.allclose(out["feature"][0].as_py(), want)


class TestRealResizeStage:
    def test_resize_roundtrips_through_codec(self):
        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, (10, 8, 3)).astype(np.uint8)
        ds = _media_ds([("m1", "image/png", encode_png(img), "{}")])
        out = resize_images(ds, width=4, height=5, fake=False).to_pandas()
        back = decode_png(out["payload"][0])
        assert back.shape == (5, 4, 3)
        assert (back == resize_nearest(img, 4, 5)).all()
        import json

        meta = json.loads(out["meta_json"][0])
        assert meta["width"] == 4 and meta["height"] == 5

    def test_frame_sample_still_gated(self):
        with pytest.raises(NotImplementedError, match="av/ffmpeg"):
            FrameSampleStub(fake=False)


class TestRealDecodeThenKnn:
    def test_composed_pipeline(self):
        """Real decode feeds the similarity stage unchanged — the plumbing
        contract (feature: list<float32>) is what downstream depends on."""
        imgs = [
            np.full((6, 6), v, dtype=np.uint8) for v in (0, 60, 120, 200)
        ]
        ds = _media_ds(
            [
                (f"m{i}", "image/png", encode_png(im), "{}")
                for i, im in enumerate(imgs)
            ]
        )
        feats = decode_features(ds, feature_dim=4, fake=False).to_pandas()
        mat = np.stack([np.asarray(f) for f in feats["feature"]])
        # constant images → features equal v/255 exactly
        assert np.allclose(mat.mean(axis=1) * 255.0, [0, 60, 120, 200])
