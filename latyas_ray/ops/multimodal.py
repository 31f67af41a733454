"""Multimodal column plumbing: opaque binary media + typed metadata.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic fake (``FakeImageDecoder``) — but everything
Ray-side is real and tested: the media table schema, the actor-pool stage
signature (decoder "weights" loaded once per actor in ``__init__``), the
byte-budgeted small batches for large binary payloads, and the feature
output layout (``list<float>`` + dims).  Swapping in a real
PIL/torchvision decoder changes only ``_decode``.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image/png" | "audio/wav"
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("payload", pa.binary()),
    ]
)

FEATURE_DIM = 32


def generate_media_table(out_path: str, n_rows: int = 200) -> str:
    """Deterministic synthetic media table (binary payloads of varying
    size with plausible headers)."""
    if os.path.exists(out_path):
        return out_path
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    ids, types, ws, hs, payloads = [], [], [], [], []
    for i in range(n_rows):
        seed = hashlib.md5(f"media:{i}".encode()).digest()
        rng = np.random.RandomState(int.from_bytes(seed[:4], "little"))
        is_image = i % 4 != 3
        w, h = (int(rng.randint(16, 256)), int(rng.randint(16, 256))) if is_image else (0, 0)
        size = int(rng.randint(1_000, 80_000))
        body = rng.randint(0, 256, size=size, dtype=np.uint8).tobytes()
        header = b"\x89PNG\r\n\x1a\n" if is_image else b"RIFFxxxxWAVE"
        ids.append(i)
        types.append("image/png" if is_image else "audio/wav")
        ws.append(w)
        hs.append(h)
        payloads.append(header + body)
    t = pa.table(
        {"media_id": ids, "media_type": types, "width": ws, "height": hs,
         "payload": payloads},
        schema=MEDIA_SCHEMA,
    )
    tmp = out_path + ".tmp"
    pq.write_table(t, tmp, compression="zstd")
    os.replace(tmp, out_path)
    return out_path


class FakeImageDecoder:
    """STUB — stands in for a real image decode + feature extractor.

    A real implementation would do ``PIL.Image.open(BytesIO(payload))`` →
    resize → model forward in ``_decode``; none of the surrounding Ray
    plumbing would change.  The fake derives a deterministic
    ``FEATURE_DIM``-float vector from the payload bytes so outputs are
    stable and testable.
    """

    def __init__(self, model_name: str = "fake-feature-extractor/1") -> None:
        # once-per-actor warm-up slot (the analog of loading CNN weights)
        self.model_name = model_name
        self.projection = np.random.RandomState(0xFEA7).standard_normal((64, FEATURE_DIM))

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if not media_type.startswith("image/"):
            raise NotImplementedError(f"no decoder for {media_type}")
        digest = hashlib.sha256(payload).digest() * 2  # 64 bytes
        raw = np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0
        return raw @ self.projection

    def __call__(self, batch: pa.Table) -> pa.Table:
        # failed decodes emit a zero vector (uniform shape keeps the column
        # tensor-castable downstream) with decoded=False as the signal
        feats, ok = [], []
        for payload, mtype in zip(
            batch.column("payload").to_pylist(), batch.column("media_type").to_pylist()
        ):
            try:
                feats.append([float(x) for x in self._decode(payload, mtype)])
                ok.append(True)
            except NotImplementedError:
                feats.append([0.0] * FEATURE_DIM)
                ok.append(False)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "decoded": pa.array(ok, pa.bool_()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def media_features(media_path: str, batch_size: int = 16) -> rd.Dataset:
    """Actor-pool decode/feature stage over the media table.  Small
    ``batch_size`` by design: batches of large binary payloads must be
    byte-bounded, not row-bounded (ray_guide memory notes)."""
    ds = rd.read_parquet(media_path)
    return ds.map_batches(
        FakeImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )
