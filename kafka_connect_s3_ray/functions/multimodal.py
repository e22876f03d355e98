"""Multimodal (image/audio/video) column handling.

Media payloads are opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``/``height``/``duration_ms``…). Decode / feature
extraction / resize / frame-sampling run as actor-pool ``map_batches`` stages:
the (real) codec or model loads once per actor in ``__init__``; ``__call__``
processes one Arrow batch. Batch sizes must be small for large payloads — size
by bytes, not rows (see ``suggest_batch_size``).

The actual image/audio codecs are NOT available in this environment, so the
decode step is STUBBED two ways:

- ``decoder="real"`` raises ``NotImplementedError`` with the dependency name —
  the seam where PIL/librosa/av would plug in.
- ``decoder="fake"`` (default in tests) derives a deterministic feature vector
  from the raw bytes (byte histogram + moments) so the Ray-side plumbing —
  schema, actor signature, batch sizing, output layout — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 40  # 32-bin byte histogram + 8 moments


def synth_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    types = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(256, 8192, n)]
    return pa.Table.from_arrays(
        [
            pa.array(np.arange(n), pa.int64()),
            pa.array(types, pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(rng.integers(16, 512, n).astype(np.int32), pa.int32()),
            pa.array(rng.integers(16, 512, n).astype(np.int32), pa.int32()),
            pa.array(rng.integers(100, 60000, n).astype(np.int32), pa.int32()),
        ],
        schema=MEDIA_SCHEMA,
    )


def _fake_features(payload: bytes) -> np.ndarray:
    b = np.frombuffer(payload, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    hist = np.bincount(b >> 3, minlength=32).astype(np.float32)
    hist /= max(1, len(b))
    moments = np.array(
        [len(b), b.mean(), b.std(), np.median(b), b.min(), b.max(),
         float((b == 0).mean()), float(b[0] if len(b) else 0)],
        dtype=np.float32,
    )
    return np.concatenate([hist, moments])


class MediaFeatureExtractor:
    """Actor-pool stage: payload bytes -> feature vector (list<float32>).

    ``decoder="real"`` is the seam for an actual decode+model pipeline (PIL /
    torchvision / librosa) — one model load per actor, batched inference per
    call. Not available in this container: raises NotImplementedError."""

    def __init__(self, decoder: str = "fake"):
        self.decoder = decoder
        if decoder == "real":
            raise NotImplementedError(
                "real media decoding needs PIL/librosa/av — not present in this "
                "environment; use decoder='fake' for deterministic plumbing"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [_fake_features(p) for p in batch.column("payload").to_pylist()]
        out = batch.drop_columns(["payload"])  # features replace the heavy bytes
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


class FrameSampler:
    """Video frame-sampling stub: emits ``n_frames`` evenly-spaced byte slices
    per payload (standing in for decoded frames), one output row per frame —
    a flat-map-shaped stage showing the row-expansion layout."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            step = max(1, len(payload) // self.n_frames)
            for fi in range(self.n_frames):
                ids.append(mid)
                idxs.append(fi)
                frames.append(payload[fi * step : (fi + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


class Resizer:
    """Image-resize stub: real decode+resize (PIL/torchvision) is the
    ``decoder="real"`` seam; the fake path deterministically subsamples the
    payload bytes to a target 'resolution' and rewrites width/height metadata,
    so the batch plumbing (binary in -> smaller binary out, metadata update)
    is real and tested."""

    def __init__(self, target_w: int = 64, target_h: int = 64, decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError(
                "real image resize needs PIL — not present in this environment"
            )
        self.target_w, self.target_h = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_out = self.target_w * self.target_h // 8  # fake byte budget
        out = []
        for p in batch.column("payload").to_pylist():
            step = max(1, len(p) // n_out)
            out.append(p[::step][:n_out])
        batch = batch.set_column(
            batch.schema.get_field_index("payload"), "payload",
            pa.array(out, pa.binary()),
        )
        n = len(batch)
        batch = batch.set_column(
            batch.schema.get_field_index("width"), "width",
            pa.array(np.full(n, self.target_w, np.int32)),
        )
        return batch.set_column(
            batch.schema.get_field_index("height"), "height",
            pa.array(np.full(n, self.target_h, np.int32)),
        )


def suggest_batch_size(avg_payload_bytes: int, budget_bytes: int = 64 * 1024 * 1024) -> int:
    """Rows per batch so one batch stays under ``budget_bytes`` of payload —
    large binary rows need small row counts (bytes-based sizing)."""
    return max(1, budget_bytes // max(1, avg_payload_bytes))
