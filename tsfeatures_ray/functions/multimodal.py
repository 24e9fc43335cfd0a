"""Multimodal (image/audio/video) column stages.

Media payloads are opaque ``binary`` columns with typed metadata
(media_type, width/height or sample_rate, n_frames). The decode /
resize / frame-sample kernels are STUBS in this container (no
image/audio libraries available) -- clearly marked and swappable -- but
the Ray-side plumbing is real and tested: schema handling, actor-pool
signature, small batches for large binary rows, deterministic fake
decode so tests can assert the output layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.Generator(np.random.PCG64(seed))
    types = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.bytes(int(rng.integers(256, 4096))) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(32, 512, n).astype("int32")),
            "height": pa.array(rng.integers(32, 512, n).astype("int32")),
            "sample_rate": pa.array(np.full(n, 16000, dtype="int32")),
            "n_frames": pa.array(rng.integers(1, 300, n).astype("int32")),
        },
        schema=MEDIA_SCHEMA,
    )


def _decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB: real deployments plug a PIL/libav decode here. The stub is
    deterministic (hash-seeded) so the downstream feature layout is
    testable without media libraries."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.random(64, dtype=np.float64)


class MediaFeatures:
    """Actor-pool decode + feature-extract stage. Small batch_size on
    purpose: binary payloads are large, batch x concurrency must fit the
    worker heap (ray_guide memory note)."""

    def __init__(self, decode=None, out_dim: int = 64):
        self.decode = decode or _decode_stub
        self.out_dim = out_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        feats = np.stack([self.decode(p, t)[: self.out_dim] for p, t in zip(payloads, types)])
        flat = pa.array(feats.reshape(-1), pa.float64())
        offs = pa.array(
            np.arange(0, (len(payloads) + 1) * self.out_dim, self.out_dim, dtype="int32")
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "features": pa.ListArray.from_arrays(offs, flat),
            }
        )


def media_features(
    ds: "ray.data.Dataset", concurrency: int = 2, batch_size: int = 32
) -> "ray.data.Dataset":
    return ds.map_batches(
        MediaFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,  # small: large binary rows
        concurrency=(1, concurrency),
        num_cpus=1,
    )
