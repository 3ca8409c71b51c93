"""Multimodal column stages — binary payloads with typed metadata.

Image/audio/video ride as opaque ``binary`` columns plus metadata columns
(``media_type``, ``width``/``height``/``duration_ms``…).  The Ray-side
plumbing (schema, small batch sizes for big payloads, actor-pool signature,
output layout) is real and tested; the codec step itself is stubbed because
no image/audio library exists in this container — ``DecodeStub`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces a
deterministic fake decode (seeded by the payload hash) so downstream feature
stages can be exercised end-to-end.

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

    Real implementation would decode with PIL/librosa/av in ``__init__``-loaded
    codecs; the contract (binary in, ``feature: list<float>`` +
    carried metadata out, payload dropped) is what downstream stages depend on.
    """

    def __init__(self, feature_dim: int = 16, fake: bool = False):
        self.feature_dim = feature_dim
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "media codecs (PIL/librosa/av) are not available in this "
                "environment; construct with fake=True for a deterministic "
                "payload-hash-seeded fake decode"
            )

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
        rng = np.random.RandomState(seed)
        return rng.randn(self.feature_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = [self._fake_decode(p) for p in payloads]
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
