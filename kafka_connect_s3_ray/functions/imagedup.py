"""Image near-duplicate detection via perceptual difference-hash (dHash) +
pigeonhole band exchange — the LAION/DataComp-style image dedup stage, built
on the repo's REAL dependency-free codecs (PPM / zlib-PNG / pure-numpy
baseline JPEG, `functions/multimodal.py`).

Why dHash: a 64-bit gradient fingerprint of the 9x8 downsampled luma plane.
It is invariant to re-encoding (JPEG quality churn), global brightness /
contrast shifts, and resizing — exactly the perturbations that make
byte-level exact dedup useless for images — while structurally different
images land ~32 bits apart (measured: seeded low-frequency corpora separate
at re-encode <= ~10 vs unrelated >= ~19).

Reference analog: none — the reference (sugarcrm/kafka-connect-s3) moves
opaque bytes; this is the content-aware dedup tier a training-data pipeline
adds on top. The exchange layout is shared with SimHash text near-dup
(`functions/dedup.py::simhash_candidates`), generalized to any Hamming
radius:

  1. decode+hash stage (actor pool — the codec is per-actor state, decode
     dominates cost; only 8 hash bytes per image survive it);
  2. pigeonhole banding: split the 64-bit hash into ``max_hamming + 1``
     bands — two hashes within Hamming distance d agree EXACTLY on at least
     one band, so grouping by (band, band_val) yields a candidate superset
     with zero false negatives (up to the documented bucket cap);
  3. one coarse bucket exchange of the (d+1) band rows per image
     (~24 bytes each — never pixels), per-bucket vectorized self-merge +
     popcount-table verify, second tiny exchange dedups pairs.

100 TB posture: pixels never cross a shuffle; per-image wire cost is
(d+1) x 24 bytes regardless of image size. The per-bucket self-merge is
quadratic in bucket occupancy, so ``bucket_cap`` drops degenerate buckets
(flat/black images all hash alike) the way SimHash's cap drops token-spam
buckets — a loud, documented recall trade at the pathological tail only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .dedup import N_COARSE, _popcount64
from .multimodal import JPEG_SIG

_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def _resample(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor index gather (same kernel as multimodal.Resizer)."""
    h, w = img.shape[:2]
    yi = (np.arange(th) * h // th).clip(0, h - 1)
    xi = (np.arange(tw) * w // tw).clip(0, w - 1)
    return img[yi[:, None], xi[None, :]]


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff-and-decode through the real codecs (PPM / PNG / JPEG) — one
    shared dispatch (``multimodal.sniff_decode``), so a signature fix can
    never diverge between the hash pipeline and the feature extractor."""
    from .multimodal import sniff_decode

    kind, obj = sniff_decode(payload)
    if kind != "img":
        raise ValueError("undecodable image payload (not PPM/PNG/JPEG)")
    return obj


def _thumb_scale(h: int, w: int) -> int:
    """Largest block-mean factor in {8, 4, 1} whose thumbnail still covers
    the 9x8 dHash grid (ceil(h/s) >= 8 rows, ceil(w/s) >= 9 cols). The rule
    depends only on (h, w) — re-encode invariant — so every member of a
    near-dup clique hashes through the SAME downsample geometry regardless
    of format. Below (29, 33) even 4x is too coarse (too few degrees of
    freedom -> unrelated images would collide) and we hash full-res."""
    for s in (8, 4):
        if -(-h // s) >= 8 and -(-w // s) >= 9:
            return s
    return 1


def luma_thumb(payload: bytes) -> np.ndarray:
    """Adaptive-scale float32 luma plane — the ONE decode the hash pipeline
    needs. JPEGs large enough for the 8x grid (h >= 57, w >= 65 — i.e.
    every real-scale image) never leave the entropy layer
    (``decode_jpeg_luma_dc``: block means ARE the DC coefficients — no
    IDCT, no AC storage, no chroma, ~7x faster than full decode, and exact
    for ANY content up to DC quantization, <= ~1 luma level at q90).
    Mid-band JPEGs (scale 4) decode fully and take TRUE box means like
    PPM/PNG — the 2x2 scaled decode (``decode_jpeg_luma_quad``) is NOT used
    for hashing because its odd-frequency leakage diverges from true box
    means on noisy content (measured up to ~15 luma levels), which would
    break the cross-format near-dup contract exactly where images are
    cheap to decode anyway. Tiny images (scale 1) hash the full-res
    luma in every format."""
    from .jpeg import _parse_headers, decode_jpeg_luma_dc

    if payload.startswith(JPEG_SIG):
        parsed = _parse_headers(payload)
        fh, fw, _ = parsed[0]
        if _thumb_scale(fh, fw) == 8:
            return decode_jpeg_luma_dc(payload, _parsed=parsed)
    img = decode_image(payload)
    y = img[:, :, :3].astype(np.float32) @ _LUMA
    h, w = y.shape
    s = _thumb_scale(h, w)
    if s == 1:
        return y
    ph, pw = (-h) % s, (-w) % s
    if ph or pw:
        y = np.pad(y, ((0, ph), (0, pw)), mode="edge")
    return (y.reshape(y.shape[0] // s, s, y.shape[1] // s, s)
            .mean(axis=(1, 3)))


def dhash64_payload(payload: bytes) -> np.uint64:
    """64-bit dHash of a payload via the adaptive block-mean luma thumbnail
    — the hash the ``ImageHasher`` pipeline computes (brute-force oracles
    must use THIS, not ``dhash64(decode_image(p))``, to reproduce pipeline
    hashes)."""
    return dhash64_stack(_resample(luma_thumb(payload), 9, 8)[None])[0]


def dhash64(img: np.ndarray) -> np.uint64:
    """64-bit difference hash of one decoded (h, w, 3|4) uint8 image."""
    return dhash64_stack(
        _resample(img[:, :, :3], 9, 8)[None].astype(np.float32))[0]


def dhash64_stack(lumastack_or_rgb: np.ndarray) -> np.ndarray:
    """Vectorized dHash over a (n, 8, 9, 3) RGB or (n, 8, 9) luma stack:
    bit i = luma[row, col+1] > luma[row, col], packed little-endian."""
    g = lumastack_or_rgb
    if g.ndim == 4:
        g = g.astype(np.float32) @ _LUMA
    bits = (g[:, :, 1:] > g[:, :, :-1]).reshape(len(g), 64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return (bits * weights).sum(axis=1, dtype=np.uint64)


class ImageHasher:
    """Actor-pool stage: (id, payload) -> (id, dhash uint64).

    Decode is per-image (formats vary within a batch) through ``luma_thumb``
    — JPEGs take the DC-only path (no IDCT/chroma; ~7x cheaper), PPM/PNG
    take identical block means — and the resampled 9x8 planes are stacked so
    the hash itself is one vectorized pass over the batch.
    ``on_error="skip"`` drops undecodable payloads (row vanishes — the
    curation-filter contract); default raises, naming the id."""

    def __init__(self, id_col: str = "media_id", payload_col: str = "payload",
                 on_error: str = "raise"):
        if on_error not in ("raise", "skip"):
            raise ValueError(f"unknown on_error: {on_error}")
        self.id_col, self.payload_col = id_col, payload_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        payloads = batch.column(self.payload_col).to_pylist()
        keep_ids, planes = [], []
        for i, p in zip(ids, payloads):
            try:
                if p is None:
                    raise ValueError("NULL image payload")
                planes.append(_resample(luma_thumb(p), 9, 8))
                keep_ids.append(i)
            except Exception as e:
                if self.on_error == "raise":
                    raise ValueError(
                        f"image id={i!r} failed to decode: {e}") from e
        hashes = (dhash64_stack(np.stack(planes)) if planes
                  else np.empty(0, np.uint64))
        return pa.table({self.id_col: pa.array(keep_ids, pa.int64()),
                         "dhash": pa.array(hashes, pa.uint64())})


def _band_layout(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) per band: 64 bits split into max_hamming+1 bands as
    evenly as possible (pigeonhole: d differing bits can dirty at most d of
    d+1 bands, so one band always matches exactly)."""
    if not 0 <= max_hamming <= 15:
        raise ValueError("max_hamming must be in [0, 15] (64-bit hash; "
                         ">15 leaves <4-bit bands — bucket everything)")
    n = max_hamming + 1
    base, rem = divmod(64, n)
    out, shift = [], 0
    for b in range(n):
        w = base + (1 if b < rem else 0)
        out.append((shift, w))
        shift += w
    return out


def hamming_pairs(ds: "ray.data.Dataset", id_col: str = "media_id",
                  hash_col: str = "dhash", max_hamming: int = 6,
                  bucket_cap: int = 256) -> "ray.data.Dataset":
    """All (left_id < right_id) pairs with Hamming(hash) <= max_hamming.

    Zero false negatives by pigeonhole banding, except in (band, band_val)
    buckets larger than ``bucket_cap`` — degenerate popular-hash spam —
    which are dropped whole (loud in the docstring, cheap on the wire)."""
    layout = _band_layout(max_hamming)
    n_bands = len(layout)

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = t.column(hash_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        vals = np.concatenate([
            ((h >> np.uint64(shift)) & np.uint64((1 << width) - 1)).astype(np.int64)
            for shift, width in layout]) if len(h) else np.empty(0, np.int64)
        bands = np.repeat(np.arange(n_bands, dtype=np.int32), len(h))
        coarse = ((bands.astype(np.int64) * 1_048_576 + vals) % 509).astype(np.int32)
        return pa.table({
            id_col: pa.array(np.tile(ids, n_bands)),
            "hash": pa.array(np.tile(h, n_bands), pa.uint64()),
            "band": pa.array(bands, pa.int32()),
            "band_val": pa.array(vals, pa.int64()),
            "coarse": pa.array(coarse, pa.int32()),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["band", "band_val"])[id_col].transform("size")
        g = g[(sizes > 1) & (sizes <= bucket_cap)]
        if g.empty:
            return pd.DataFrame({"left_id": pd.Series([], dtype=np.int64),
                                 "right_id": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        m = g.merge(g, on=["band", "band_val"], suffixes=("_l", "_r"))
        m = m[m[f"{id_col}_l"] < m[f"{id_col}_r"]]
        ham = _popcount64(m["hash_l"].to_numpy(dtype=np.uint64)
                          ^ m["hash_r"].to_numpy(dtype=np.uint64))
        m = m.assign(hamming=ham)[ham <= max_hamming]
        return m.rename(columns={f"{id_col}_l": "left_id",
                                 f"{id_col}_r": "right_id"})[
            ["left_id", "right_id", "hamming"]
        ].drop_duplicates(["left_id", "right_id"])

    cand = (ds.map_batches(band_rows, batch_format="pyarrow")
            .groupby("coarse").map_groups(pairs, batch_format="pandas"))

    # a pair found via k matching bands appears k times; one tiny pair-keyed
    # exchange keeps one copy (hamming is identical across copies)
    def add_coarse(t: pa.Table) -> pa.Table:
        l = t.column("left_id").to_numpy(zero_copy_only=False).astype(np.int64)
        r = t.column("right_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "coarse", pa.array(((l * 1000003 + r) % N_COARSE).astype(np.int32)))

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["left_id", "right_id"]).drop(columns=["coarse"])

    return (cand.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("coarse").map_groups(dedup_pairs, batch_format="pandas"))


def image_near_dup(ds: "ray.data.Dataset", id_col: str = "media_id",
                   payload_col: str = "payload", max_hamming: int = 6,
                   on_error: str = "raise", concurrency: int = 2,
                   bucket_cap: int = 256) -> "ray.data.Dataset":
    """End-to-end image near-dup pairs: decode -> dHash -> banded Hamming
    join. Returns (left_id, right_id, hamming); max_hamming=6 separates
    re-encode/brightness variants (<= ~10 bits) from unrelated content
    (>= ~19 bits) with margin on the measured corpus."""
    hashes = ds.map_batches(
        ImageHasher(id_col, payload_col, on_error=on_error),
        batch_format="pyarrow", concurrency=concurrency)
    return hamming_pairs(hashes, id_col=id_col, hash_col="dhash",
                         max_hamming=max_hamming, bucket_cap=bucket_cap)


# ---------------------------------------------------------------------------
# deterministic planted corpus (tests + the rows-only gate entry)
# ---------------------------------------------------------------------------

def _synth_img(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Random LOW-FREQUENCY content (6x6 random blocks, bilinear upsample,
    +noise): unlike a shared global gradient, each draw has its own
    structure, so unrelated images are far in dHash space (>= ~19 bits)."""
    coarse = rng.uniform(0, 255, (6, 6, 3))
    yi = np.linspace(0, 5, h)
    xi = np.linspace(0, 5, w)
    y0 = np.floor(yi).astype(int).clip(0, 4)
    x0 = np.floor(xi).astype(int).clip(0, 4)
    fy = (yi - y0)[:, None, None]
    fx = (xi - x0)[None, :, None]
    img = ((1 - fy) * (1 - fx) * coarse[y0][:, x0]
           + (1 - fy) * fx * coarse[y0][:, x0 + 1]
           + fy * (1 - fx) * coarse[y0 + 1][:, x0]
           + fy * fx * coarse[y0 + 1][:, x0 + 1])
    return (img + rng.normal(0, 8, (h, w, 3))).clip(0, 255).astype(np.uint8)


def _is_variant(i: int) -> bool:
    return i % 4 == 1 or i % 8 == 2 or i % 16 == 3


def planted_cliques(n: int) -> list[list[int]]:
    """Ground truth for ``synth_image_corpus(n)``: consecutive ids group into
    cliques — a base image followed by its planted variants (each variant is
    derived from the BASE: i % 4 == 1 -> JPEG q90 re-encode, i % 8 == 2 ->
    +12 brightness shift, i % 16 == 3 -> exact byte dup)."""
    cliques: list[list[int]] = []
    for i in range(n):
        if _is_variant(i) and cliques:
            cliques[-1].append(i)
        else:
            cliques.append([i])
    return cliques


def planted_pairs(n: int) -> list[tuple[int, int]]:
    """(base, variant) pairs — the recall contract: every one is within the
    dHash tolerance by construction. Variant-variant pairs inside a clique
    MAY also be detected (allowed, not required); cross-clique pairs are
    false positives."""
    return [(c[0], v) for c in planted_cliques(n) for v in c[1:]]


def synth_image_corpus(n: int = 64, seed: int = 1234) -> pa.Table:
    """Deterministic (media_id, fmt, payload) corpus with planted near-dups
    per ``planted_cliques``: base images cycle PPM/PNG/JPEG; each variant
    re-enters as a JPEG re-encode, brightness shift, or exact copy OF ITS
    CLIQUE'S BASE (never variant-of-variant, so planted distances don't
    compound)."""
    rng = np.random.default_rng(seed)
    from .multimodal import encode_jpeg, encode_png, encode_ppm

    ids, fmts, payloads = [], [], []
    base_img, base_payload = None, None
    for i in range(n):
        if _is_variant(i) and base_img is not None:
            if i % 4 == 1:  # requantized copy
                payloads.append(encode_jpeg(base_img, quality=90))
                fmts.append("jpeg")
            elif i % 8 == 2:  # brightness-shifted copy, stored PPM
                b = (base_img.astype(np.int16) + 12).clip(0, 255).astype(np.uint8)
                payloads.append(encode_ppm(b))
                fmts.append("ppm")
            else:  # exact byte dup
                payloads.append(base_payload)
                fmts.append("dup")
            ids.append(i)
            continue
        w, h = int(rng.integers(24, 96)), int(rng.integers(24, 96))
        img = _synth_img(rng, w, h)
        fmt = ("ppm", "png", "jpeg")[i % 3]
        enc = {"ppm": encode_ppm, "png": encode_png,
               "jpeg": lambda x: encode_jpeg(x, quality=95)}[fmt]
        payloads.append(enc(img))
        # the dup anchor is the DECODED stored payload (JPEG loss included),
        # so a planted re-encode of it stays within the hash tolerance
        base_img = decode_image(payloads[-1])
        base_payload = payloads[-1]
        ids.append(i)
        fmts.append(fmt)
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "fmt": pa.array(fmts, pa.string()),
                     "payload": pa.array(payloads, pa.binary())})
