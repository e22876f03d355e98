"""Deterministic per-file key bloom sidecars for point-lookup file pruning.

Every committed lake file gets a tiny ``<file>.bloom`` sidecar holding a
bloom filter over its distinct conv_ids. ``lookup`` tests the key against
each candidate file's sidecar and skips files that definitely don't hold it —
at scale a partition accumulates many bounded files (rotation, delta mode),
and without the sidecar a point read opens every footer. Parquet row-group
statistics still prune WITHIN the files that survive.

Design constraints, in order:
- **Deterministic bytes.** Replayed commits must stay byte-identical (the
  engine's idempotence story), so the filter is built from the SORTED
  distinct key set with fixed hash constants — no randomness, no wall clock.
- **Optional.** A missing/corrupt sidecar means "might contain" — readers of
  lakes written before this feature (or with sidecars vacuumed) stay correct.
- **Tiny + mergeable-free.** One filter per file, never merged; sized from
  the file's own key count at a fixed target false-positive rate.

Analog: the reference keeps a ``.index.json`` sidecar per data chunk for
offset-ranged reads (source/.../S3FilesReader.java, ChunksIndex) — this is
the same data-beside-index layout applied to key membership.

Format (little-endian): magic ``KB01`` | uint32 k | uint64 m_bits |
uint64 n_keys | packed bit array (ceil(m_bits/8) bytes).
"""

from __future__ import annotations

import os
import struct

import numpy as np

_MAGIC = b"KB01"
_HDR = struct.Struct("<4sIQQ")
_SEED2 = np.uint64(0xA5B35705987C2DD5)


def bloom_path(data_path: str) -> str:
    return data_path + ".bloom"


def _hashes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 hashes per key (Kirsch–Mitzenmacher double
    hashing: bit_i = (h1 + i*h2) mod m). Vectorized over the key array.
    Integer arrays take the pure-numpy splitmix path (no per-key Python);
    everything else hashes utf-8 token bytes. Sidecar blooms always pass
    object/string arrays (build_bloom normalizes), so their bytes are
    unaffected by the integer dispatch; distributed callers must use the
    SAME dtype on build and probe sides."""
    from ..functions.dedup import _splitmix64_mix, _stable_token_hash

    if keys.dtype.kind in ("i", "u"):
        h1 = _splitmix64_mix(keys.astype(np.uint64))
    else:
        h1 = _stable_token_hash(keys)
    with np.errstate(over="ignore"):
        h2 = _splitmix64_mix(h1 ^ _SEED2)
    return h1, h2


def build_bloom(keys, fp_rate: float = 0.01) -> bytes:
    """Serialize a bloom filter over the distinct values of ``keys`` (an
    Arrow array/chunked array or any string iterable). Deterministic for a
    given key SET. Arrow inputs dedup through the native ``pc.unique``
    kernel first, so the expensive object conversion only touches the
    distinct keys — commit hot paths pass columns straight in."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        keys = pc.unique(keys).to_numpy(zero_copy_only=False)
    uniq = np.unique(np.asarray(list(keys) if not isinstance(keys, np.ndarray)
                                else keys, dtype=object))
    n = max(1, len(uniq))
    m = max(64, int(np.ceil(-n * np.log(fp_rate) / (np.log(2) ** 2))))
    k = max(1, min(16, int(round(m / n * np.log(2)))))
    # one bit-set kernel for sidecar AND distributed blooms (bytes unchanged:
    # build_bloom_bits runs the identical loop this body used to inline)
    packed = build_bloom_bits(uniq, m, k)
    return _HDR.pack(_MAGIC, k, m, len(uniq)) + packed.tobytes()


def bloom_contains(blob: bytes, key: str) -> bool:
    """Membership test; True = might contain, False = definitely absent.
    Raises ValueError on a blob that isn't a KB01 filter."""
    if len(blob) < _HDR.size:
        raise ValueError("bloom blob too short")
    magic, k, m, _n = _HDR.unpack_from(blob)
    if magic != _MAGIC or len(blob) != _HDR.size + -(-m // 8):
        raise ValueError("not a KB01 bloom blob")
    bitmap = np.frombuffer(blob, np.uint8, offset=_HDR.size)
    return bool(bloom_contains_many(
        bitmap, m, k, np.array([key], dtype=object))[0])


def write_bloom_sidecar(data_path: str, keys) -> str:
    """Write ``<data_path>.bloom`` atomically (tmp + rename, like the data
    file itself). Called AFTER the data file's rename: a crash between the
    two leaves a data file without a sidecar, which readers treat as
    'might contain' — never wrong, and the deterministic replay rewrites
    identical bytes for both."""
    import uuid

    path = bloom_path(data_path)
    blob = build_bloom(keys)
    tmp = f"{path}.inprogress-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def file_might_contain(data_path: str, key: str) -> bool:
    """Sidecar-gated membership for a lake file. Missing or unreadable
    sidecar = True (must read the file)."""
    try:
        with open(bloom_path(data_path), "rb") as f:
            return bloom_contains(f.read(), key)
    except (OSError, ValueError):
        return True


# ---------------------------------------------------------------------------
# fixed-geometry partial blooms (mergeable) + vectorized membership — the
# join-prefilter building blocks. Sidecar blooms above size m from each
# file's own key count (deterministic bytes per file); a DISTRIBUTED bloom
# must instead fix (m, k) up front so per-block partial bitmaps OR together.
# ---------------------------------------------------------------------------

def build_bloom_bits(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Packed uint8 bitmap of a fixed-geometry bloom over ``keys`` (object
    array of strings; caller dedups or not — sets are idempotent). Partial
    bitmaps with the same (m_bits, k) merge by bitwise OR."""
    bits = np.zeros(m_bits, dtype=bool)
    if len(keys):
        h1, h2 = _hashes(keys)
        for i in range(k):
            with np.errstate(over="ignore"):
                bits[((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(
                    np.int64)] = True
    return np.packbits(bits)


def bloom_contains_many(bitmap: np.ndarray, m_bits: int, k: int,
                        keys: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``keys`` against a packed fixed-geometry
    bitmap: True = might contain, False = definitely absent. One
    (hash, index, gather) pass per hash function — no per-key Python."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    h1, h2 = _hashes(keys)
    member = np.ones(len(keys), dtype=bool)
    for i in range(k):
        with np.errstate(over="ignore"):
            pos = ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(
                np.int64)
        member &= (bitmap[pos >> 3] >> (7 - (pos & 7))) & 1 == 1
    return member
