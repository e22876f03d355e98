"""Multimodal (image/audio/video) column handling.

Media payloads are opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``/``height``/``duration_ms``…). Decode / feature
extraction / resize / frame-sampling run as actor-pool ``map_batches`` stages:
the (real) codec or model loads once per actor in ``__init__``; ``__call__``
processes one Arrow batch. Batch sizes must be small for large payloads — size
by bytes, not rows (see ``suggest_batch_size``).

Decode support in this environment, three tiers:

- **Real, dependency-free codecs**: PCM WAV audio (stdlib ``wave``),
  COMPRESSED IMA-ADPCM WAV audio (pure numpy, format tag 0x11 — see
  ``adpcm.py``), binary PPM (P6) images (pure numpy header parse),
  COMPRESSED PNG images (pure stdlib-zlib + numpy: chunk walk, inflate,
  all five scanline filters), and COMPRESSED baseline JPEG (pure numpy:
  Huffman entropy layer, vectorized DCT/IDCT, 4:4:4 / 4:2:0, restart
  markers — see ``jpeg.py``) — decode, feature extraction, and image
  resize are genuinely executed on the bytes (``decode_wav`` /
  ``decode_ppm`` / ``decode_png`` / ``decode_jpeg`` / ``encode_*``).
- ``decoder="real"`` for the REMAINING compressed formats (MP3/FLAC/H.264)
  raises ``NotImplementedError`` naming the dependency — the seam where
  librosa/av would plug in; not installable in this container.
- ``decoder="fake"`` derives a deterministic feature vector from the raw
  bytes (byte histogram + moments) so plumbing tests never need codecs.

``decoder="auto"`` (default) sniffs magic bytes: RIFF/WAVE -> real WAV path,
``P6`` -> real PPM path, PNG signature -> real PNG path, JPEG SOI -> real
JPEG path, anything else -> fake features.
"""

from __future__ import annotations

import io
import wave
import zlib

import numpy as np
import pyarrow as pa

from .adpcm import decode_wav_adpcm, encode_wav_adpcm
from .jpeg import decode_jpeg, encode_jpeg

JPEG_SIG = b"\xff\xd8\xff"

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


# ---------------------------------------------------------------------------
# real dependency-free codecs: PCM WAV (stdlib wave) and binary PPM (numpy)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono PCM samples -> WAV bytes (stdlib wave — a real encoder)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 mono samples, sample_rate). PCM goes through
    stdlib ``wave``; IMA ADPCM (format tag 0x11, the COMPRESSED case) goes
    through the pure-numpy codec in ``adpcm.py``. Multi-channel PCM is
    averaged to mono."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise NotImplementedError(
                    f"only 16-bit PCM WAV supported, got sampwidth={w.getsampwidth()}"
                )
            rate = w.getframerate()
            nch = w.getnchannels()
            raw = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    except wave.Error:
        # stdlib wave rejects compressed format tags — real ADPCM decode
        return decode_wav_adpcm(payload)
    if nch > 1:
        raw = raw.reshape(-1, nch).mean(axis=1).astype(np.int16)
    return raw, rate


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array -> binary PPM (P6) bytes."""
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(img, np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes -> (h, w, 3) uint8 array. Pure numpy header
    parse — a real image decode with no external codec."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval, then one whitespace byte
    parts, pos = [], 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        parts.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    return np.frombuffer(payload, np.uint8, count=h * w * 3, offset=pos).reshape(h, w, 3)


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    body = tag + data
    return (len(data).to_bytes(4, "big") + body
            + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big"))


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 array -> PNG bytes. Pure stdlib-zlib encoder:
    8-bit truecolor (color type 2) or truecolor+alpha (6), no interlace,
    filter 0 on every scanline. A REAL compressed-format encoder — any
    standards-compliant PNG reader decodes its output."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    if c not in (3, 4):
        raise ValueError("encode_png wants (h, w, 3|4) uint8")
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2 if c == 3 else 6, 0, 0, 0]))
    raw = np.zeros((h, 1 + w * c), np.uint8)  # filter byte 0 + scanline
    raw[:, 1:] = img.reshape(h, w * c)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3|4) uint8 array. Pure zlib + numpy decoder: 8-bit
    truecolor / truecolor+alpha, no interlace, ALL five scanline filters
    (None/Sub/Up/Average/Paeth). Sub and Up reconstruct vectorized (uint8
    wraparound cumsum / row add); Average and Paeth carry a per-pixel left
    dependency, so those rows walk pixels — fine for the test-scale images
    this container handles, and the seam for a native codec stays at the
    JPEG tier. Reference behavior cross-checked against the PNG spec's
    filter definitions (RFC 2083 §6)."""
    if not payload.startswith(PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, w = len(PNG_SIG), 0
    h = channels = 0
    idat = []
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        pos += 12 + ln  # len + tag + data + crc
        if tag == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, color, comp, filt, interlace = data[8:13]
            if depth != 8 or color not in (2, 6) or comp or filt or interlace:
                raise NotImplementedError(
                    "only 8-bit truecolor(+alpha) non-interlaced PNG "
                    f"supported (depth={depth} color={color} "
                    f"interlace={interlace})")
            channels = 3 if color == 2 else 4
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if not w or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = 1 + w * channels
    if len(raw) != h * stride:
        raise ValueError("PNG scanline data has the wrong length")
    raw = raw.reshape(h, stride)
    recon = np.zeros((h, w * channels), np.uint8)
    prev = np.zeros(w * channels, np.uint8)
    c = channels
    for y in range(h):
        f, line = raw[y, 0], raw[y, 1:]
        if f == 0:
            rec = line.copy()
        elif f == 1:  # Sub: recon[x] = line[x] + recon[x - c] -> cumsum mod 256
            rec = (np.cumsum(line.reshape(w, c).astype(np.uint64), axis=0)
                   % 256).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            rec = line + prev  # uint8 wraparound
        elif f in (3, 4):  # Average / Paeth: left-recursive, walk pixels
            rec = np.zeros(w * c, np.uint8)
            up = prev.reshape(w, c).astype(np.int32)
            ln2 = line.reshape(w, c).astype(np.int32)
            left = np.zeros(c, np.int32)
            ul = np.zeros(c, np.int32)
            for x in range(w):
                if f == 3:
                    px = (left + up[x]) >> 1
                else:
                    p = left + up[x] - ul
                    pa_, pb, pc_ = (np.abs(p - left), np.abs(p - up[x]),
                                    np.abs(p - ul))
                    px = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                                  np.where(pb <= pc_, up[x], ul))
                left = (ln2[x] + px) & 0xFF
                ul = up[x]
                rec[x * c:(x + 1) * c] = left.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        recon[y] = rec
        prev = rec
    return recon.reshape(h, w, channels)


def _wav_features(payload: bytes) -> np.ndarray:
    """Real audio features: duration, RMS, zero-crossing rate, peak, + a
    16-bin amplitude histogram — padded to FEATURE_DIM."""
    samples, rate = decode_wav(payload)
    return _pcm_features(samples, rate)


def _pcm_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """Audio feature math over ALREADY-DECODED int16 samples — split out so
    stages that need both features and other per-sample derivations (e.g.
    the exact decode sums the gate oracle checks) decode each payload
    once."""
    x = samples.astype(np.float64) / 32768.0
    if len(x) == 0:  # zero-frame WAV is valid; means on empty slices are NaN
        return np.zeros(FEATURE_DIM, np.float32)
    n = max(1, len(x))
    hist = np.histogram(np.abs(x), bins=16, range=(0, 1))[0] / n
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
    head = np.array(
        [len(x) / rate * 1000.0, float(np.sqrt(np.mean(x**2))), zcr,
         float(np.abs(x).max(initial=0.0)), float(x.mean()), rate / 1e5],
        dtype=np.float32,
    )
    out = np.zeros(FEATURE_DIM, np.float32)
    out[: len(head)] = head
    out[len(head) : len(head) + 16] = hist
    return out


def _rgb_features(img: np.ndarray) -> np.ndarray:
    """Real image features from a decoded (h, w, 3|4) array: per-channel
    mean/std + a 16-bin luma histogram + dims — padded to FEATURE_DIM.
    Alpha (if present) is dropped: features describe the color planes."""
    img = img[:, :, :3].astype(np.float32)
    luma = img @ np.array([0.299, 0.587, 0.114], np.float32)
    hist = np.histogram(luma, bins=16, range=(0, 256))[0] / luma.size
    head = np.concatenate(
        [img.mean(axis=(0, 1)) / 255.0, img.std(axis=(0, 1)) / 255.0,
         [img.shape[1] / 4096.0, img.shape[0] / 4096.0]]
    ).astype(np.float32)
    out = np.zeros(FEATURE_DIM, np.float32)
    out[: len(head)] = head
    out[len(head) : len(head) + 16] = hist
    return out


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


def synth_real_media(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic table of REAL media payloads: seeded sine-wave PCM WAVs
    and gradient+noise PPM images — decodable by the codecs above."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        if i % 2 == 0:  # audio: PCM WAV, every 4th one COMPRESSED (ADPCM)
            rate = 8000
            dur_ms = int(rng.integers(50, 400))
            t = np.arange(int(rate * dur_ms / 1000))
            freq = float(rng.uniform(100, 1500))
            amp = float(rng.uniform(0.2, 0.9))
            samples = (amp * 32767 * np.sin(2 * np.pi * freq * t / rate)).astype(np.int16)
            rows["payload"].append(encode_wav_adpcm(samples, rate) if i % 8 == 6
                                   else encode_wav(samples, rate))
            rows["media_type"].append("audio")
            rows["width"].append(0)
            rows["height"].append(0)
            rows["duration_ms"].append(dur_ms)
        else:  # image: cycle uncompressed PPM / compressed PNG / compressed JPEG
            w, h = int(rng.integers(16, 96)), int(rng.integers(16, 96))
            base = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
            img = (base + rng.integers(0, 64, (h, w, 3))).clip(0, 255).astype(np.uint8)
            if i % 8 == 7:
                rows["payload"].append(encode_jpeg(img, quality=90,
                                                   subsample="420"))
            elif i % 4 == 3:
                rows["payload"].append(encode_png(img))
            else:
                rows["payload"].append(encode_ppm(img))
            rows["media_type"].append("image")
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(0)
        rows["media_id"].append(i)
    return pa.Table.from_arrays(
        [pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA], schema=MEDIA_SCHEMA
    )


def synth_real_video(n: int = 16, seed: int = 43) -> pa.Table:
    """Deterministic table of REAL MJPM clips: each holds 6-12 gradient+
    noise frames (PPM, with every 3rd frame JPEG-compressed) whose pixel
    content drifts linearly frame to frame — decodable end to end by
    ``FrameSampler`` + ``MediaFeatureExtractor``."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        w, h = int(rng.integers(16, 48)), int(rng.integers(16, 48))
        n_frames = int(rng.integers(6, 13))
        base = np.linspace(0, 200, w, dtype=np.float32)[None, :, None]
        noise = rng.integers(0, 40, (h, w, 3)).astype(np.float32)
        payloads = []
        for f in range(n_frames):
            img = (base + noise + 5.0 * f).clip(0, 255).astype(np.uint8)
            payloads.append(encode_jpeg(img, quality=90, subsample="444")
                            if f % 3 == 2 else encode_ppm(img))
        rows["media_id"].append(i)
        rows["payload"].append(encode_mjpm(payloads, fps=8))
        rows["media_type"].append("video")
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(n_frames * 125)
    return pa.Table.from_arrays(
        [pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA],
        schema=MEDIA_SCHEMA)


def sniff_decode(payload: bytes):
    """The extractor's sniff-and-dispatch, shared so every consumer (the
    extractor, the gate's fused feature+sum stages) exercises the SAME
    signature checks and decode paths: ``("pcm", (samples, rate))`` for
    RIFF/WAVE, ``("img", ndarray)`` for P6/PNG/JPEG, ``("bytes", payload)``
    for anything unrecognized. Raises whatever the codec raises on a
    corrupt magic-prefixed payload — the caller picks the error policy."""
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "pcm", decode_wav(payload)
    if payload.startswith(b"P6"):
        return "img", decode_ppm(payload)
    if payload.startswith(PNG_SIG):
        return "img", decode_png(payload)
    if payload.startswith(JPEG_SIG):
        return "img", decode_jpeg(payload)
    return "bytes", payload


def _img_int_sums(img: np.ndarray) -> tuple:
    """(sum R, sum G, n_pixels) as exact int64 — the gate-oracle sums,
    shared by the media and video fused stages so channel handling can
    never silently diverge between them."""
    ii = img[:, :, :3].astype(np.int64)
    return (int(ii[:, :, 0].sum()), int(ii[:, :, 1].sum()),
            int(ii.shape[0] * ii.shape[1]))


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

    ``decoder="auto"``: sniff the payload — RIFF/WAVE decodes through the real
    WAV path, ``P6`` through the real PPM path, the PNG signature through the
    real zlib PNG path, the JPEG SOI through the real pure-numpy baseline
    JPEG path, anything else falls back to the deterministic byte-level
    features. ``decoder="real"`` additionally demands a real decode for the
    remaining compressed formats (MP3/FLAC/H.264), which needs librosa/av —
    not present in this container: raises NotImplementedError (the
    model-load seam; one codec/model per actor, batched inference per
    call)."""

    def __init__(self, decoder: str = "auto"):
        if decoder not in ("auto", "fake", "real"):
            raise ValueError(f"unknown decoder: {decoder}")
        self.decoder = decoder

    def _features(self, p: bytes) -> np.ndarray:
        if self.decoder != "fake":
            try:
                kind, obj = sniff_decode(p)
            except Exception:
                if self.decoder == "real":
                    raise  # a corrupt payload must fail loudly in real mode
                return _fake_features(p)  # auto: sniff false-positive
            if kind == "pcm":
                return _pcm_features(*obj)
            if kind == "img":
                return _rgb_features(obj)
            if self.decoder == "real":
                raise NotImplementedError(
                    "MP3/FLAC/H.264 decoding needs librosa/av — not "
                    "present in this environment; WAV/PPM/PNG/JPEG decode "
                    "natively, other formats use decoder='auto' byte features"
                )
        return _fake_features(p)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch.column("payload").to_pylist()]
        out = batch.drop_columns(["payload"])  # features replace the heavy bytes
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


MJPM_MAGIC = b"MJPM"


def encode_mjpm(frame_payloads: list, fps: int = 8) -> bytes:
    """Motion-image container: magic, frame count, fps, then an absolute
    per-frame OFFSET TABLE, then the concatenated frame payloads (each a
    self-describing PPM/PNG/JPEG image). The offset table is the video
    analogue of the reference's per-block chunk index
    (common/.../json/ChunksIndex.java:7-37 — chunkContaining(offset) turns
    a whole-object read into a ranged GET): a frame sampler reads ONLY the
    selected frames' byte ranges, never the full clip."""
    import struct

    n = len(frame_payloads)
    head = MJPM_MAGIC + struct.pack("<II", n, fps)
    base = len(head) + 8 * (n + 1)
    offs, pos = [], base
    for p in frame_payloads:
        offs.append(pos)
        pos += len(p)
    offs.append(pos)  # end sentinel: lengths = diff(offsets)
    return head + struct.pack(f"<{n + 1}Q", *offs) + b"".join(frame_payloads)


def mjpm_index(payload: bytes) -> tuple:
    """(offsets ndarray incl. end sentinel, fps) from an MJPM header —
    O(header) work, no frame bytes touched."""
    import struct

    if not payload.startswith(MJPM_MAGIC):
        raise ValueError("not an MJPM payload")
    n, fps = struct.unpack_from("<II", payload, 4)
    offs = np.frombuffer(payload, dtype="<u8", count=n + 1, offset=12)
    return offs.astype(np.int64), int(fps)


class FrameSampler:
    """Video frame sampling: ``n_frames`` evenly-spaced frames per payload,
    one output row per frame (the flat-map row-expansion layout). MJPM
    payloads are REALLY sampled — the header's offset table selects the
    frames and only those byte ranges are sliced out, each a decodable
    PPM/PNG/JPEG image for the downstream ``MediaFeatureExtractor``
    (the pruned-read discipline of the reference's chunk index, see
    ``encode_mjpm``). Non-MJPM payloads keep the byte-slice stub so the
    stage stays drivable on opaque formats (H.264 needs av — absent
    here)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            if payload.startswith(MJPM_MAGIC):
                # a magic-prefixed but corrupt/truncated payload must not
                # kill the stage (the MediaFeatureExtractor sniff-false-
                # positive contract): parse defensively, stub on failure
                try:
                    offs, _ = mjpm_index(payload)
                    # full consistency: first offset lands exactly after the
                    # header (12-byte head + (n+1) u64 table), monotone from
                    # there, end sentinel == payload length — a crafted
                    # table pointing into the header must not pass (ADVICE
                    # r4)
                    if (len(offs) < 2 or offs[-1] != len(payload)
                            or offs[0] != 12 + 8 * len(offs)
                            or (np.diff(offs) < 0).any()):
                        raise ValueError("inconsistent MJPM offset table")
                except Exception:
                    offs = None
                if offs is not None:
                    n_avail = len(offs) - 1
                    take = min(self.n_frames, n_avail)
                    # evenly spaced, first frame always included
                    sel = np.unique((np.arange(take) * n_avail)
                                    // max(take, 1)) if take else []
                    for fi in sel:
                        ids.append(mid)
                        idxs.append(int(fi))
                        frames.append(payload[offs[fi]:offs[fi + 1]])
                    continue
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
    """Image resize as an actor-pool stage. PPM (P6), PNG, and baseline
    JPEG payloads are REALLY decoded, nearest-neighbor-resampled
    (vectorized index gather), and re-encoded in their own format
    (JPEG re-encodes at quality 90, 4:4:4); exotic formats under
    ``decoder="real"`` raise per payload naming the dependency; other
    payloads fall back to deterministic byte subsampling so the batch
    plumbing (binary in -> smaller binary out, metadata update) stays
    testable without codecs."""

    def __init__(self, target_w: int = 64, target_h: int = 64, decoder: str = "auto"):
        if decoder not in ("auto", "fake", "real"):
            raise ValueError(f"unknown decoder: {decoder}")
        self.decoder = decoder
        self.target_w, self.target_h = target_w, target_h

    def _resample(self, img: np.ndarray) -> np.ndarray:
        h, w, _ = img.shape
        yi = (np.arange(self.target_h) * h // self.target_h).clip(0, h - 1)
        xi = (np.arange(self.target_w) * w // self.target_w).clip(0, w - 1)
        return img[yi[:, None], xi[None, :]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_out = self.target_w * self.target_h // 8  # fake-path byte budget
        out = []
        for p in batch.column("payload").to_pylist():
            if self.decoder != "fake":
                try:
                    if p.startswith(b"P6"):
                        out.append(encode_ppm(self._resample(decode_ppm(p))))
                        continue
                    if p.startswith(PNG_SIG):
                        out.append(encode_png(self._resample(decode_png(p))))
                        continue
                    if p.startswith(JPEG_SIG):
                        out.append(encode_jpeg(self._resample(decode_jpeg(p)),
                                               quality=90))
                        continue
                except Exception:
                    if self.decoder == "real":
                        raise  # corrupt payload fails loudly in real mode
                if self.decoder == "real":
                    raise NotImplementedError(
                        "resizing this format needs PIL/av — not present in "
                        "this environment; PPM, PNG and JPEG resize natively"
                    )
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
