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
        concurrency=(1, 8),
    )


# ------------------------------------------------------------ resize stage

RESIZE_TO = 64


class ImageResizeStage:
    """Actor-pool resize stage: fake-decode the payload into an (h, w)
    uint8 array (deterministic byte-tiling — a real decoder swaps in
    here), nearest-neighbor resize to ``RESIZE_TO``², then emit compact
    per-image statistics.  Resize math is real (vectorized index maps);
    only the pixel source is fake."""

    def __init__(self) -> None:
        idx = np.arange(RESIZE_TO)
        self._grid = idx  # reused per call; real weights would load here

    def _fake_decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        need = w * h
        raw = np.frombuffer(payload, dtype=np.uint8)
        reps = -(-need // max(1, len(raw)))
        return np.tile(raw, reps)[:need].reshape(h, w)

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape
        ys = (np.arange(RESIZE_TO) * h) // RESIZE_TO
        xs = (np.arange(RESIZE_TO) * w) // RESIZE_TO
        return img[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "out_w": [], "out_h": [], "px_mean": [], "px_std": []}
        for mid, mtype, w, h, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("media_type").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if not mtype.startswith("image/") or not w or not h:
                continue
            small = self._resize(self._fake_decode(payload, w, h))
            out["media_id"].append(mid)
            out["out_w"].append(RESIZE_TO)
            out["out_h"].append(RESIZE_TO)
            out["px_mean"].append(round(float(small.mean()), 4))
            out["px_std"].append(round(float(small.std()), 4))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "out_w": pa.array(out["out_w"], pa.int32()),
                "out_h": pa.array(out["out_h"], pa.int32()),
                "px_mean": pa.array(out["px_mean"], pa.float64()),
                "px_std": pa.array(out["px_std"], pa.float64()),
            }
        )


def media_resize(media_path: str, batch_size: int = 16) -> rd.Dataset:
    """Actor-pool resize over the media table (image rows only)."""
    ds = rd.read_parquet(media_path)
    return ds.map_batches(
        ImageResizeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )


# ------------------------------------------------------- video frame-sample

VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "video/mp4"
        ("n_frames", pa.int32()),
        ("fps", pa.float32()),
        ("payload", pa.binary()),  # fake container: FRAME_BYTES per frame
    ]
)

FRAME_BYTES = 256


def generate_video_table(out_path: str, n_rows: int = 60) -> str:
    """Deterministic synthetic video table: payload = ``n_frames`` fixed
    ``FRAME_BYTES`` blocks (the fake container a real mp4 demuxer would
    replace)."""
    if os.path.exists(out_path):
        return out_path
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    ids, types, nfs, fps, payloads = [], [], [], [], []
    for i in range(n_rows):
        seed = hashlib.md5(f"video:{i}".encode()).digest()
        rng = np.random.RandomState(int.from_bytes(seed[:4], "little"))
        n_frames = int(rng.randint(8, 240))  # skew: some long videos
        body = rng.randint(0, 256, size=n_frames * FRAME_BYTES, dtype=np.uint8)
        ids.append(i)
        types.append("video/mp4")
        nfs.append(n_frames)
        fps.append(float(rng.choice([24.0, 25.0, 30.0])))
        payloads.append(body.tobytes())
    t = pa.table(
        {"media_id": ids, "media_type": types, "n_frames": nfs, "fps": fps,
         "payload": payloads},
        schema=VIDEO_SCHEMA,
    )
    tmp = out_path + ".tmp"
    pq.write_table(t, tmp, compression="zstd")
    os.replace(tmp, out_path)
    return out_path


class FrameSampleStage:
    """Actor-pool frame sampler: one input video row → one OUTPUT ROW PER
    SAMPLED FRAME (every ``stride``-th frame), each with the shared
    feature projection applied — the row-expanding (flat-map-shaped)
    stage a video pipeline needs.  A real demuxer replaces the
    fixed-block slicing; the Ray plumbing (actor pool, row expansion,
    ragged outputs from skewed frame counts) is real."""

    def __init__(self, stride: int = 10) -> None:
        self.stride = stride
        self.projection = np.random.RandomState(0xF4A3).standard_normal(
            (FRAME_BYTES, FEATURE_DIM)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame, out_ts, feats = [], [], [], []
        for mid, n_frames, fps, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("n_frames").to_pylist(),
            batch.column("fps").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            frames = np.frombuffer(payload, dtype=np.uint8).reshape(
                n_frames, FRAME_BYTES
            )
            picks = np.arange(0, n_frames, self.stride)
            fmat = (frames[picks].astype(np.float64) / 255.0) @ self.projection
            for j, fi in enumerate(picks):
                out_id.append(mid)
                out_frame.append(int(fi))
                out_ts.append(round(float(fi) / float(fps), 4))
                feats.append([float(x) for x in fmat[j]])
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_frame, pa.int32()),
                "ts_sec": pa.array(out_ts, pa.float64()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def video_frame_features(video_path: str, stride: int = 10,
                         batch_size: int = 8) -> rd.Dataset:
    """Frame-sample + per-frame features over the video table.  Small
    batches: payloads are the big column and frame expansion multiplies
    output rows (skew-aware sizing)."""
    ds = rd.read_parquet(video_path)
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )
