"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF).

A REAL compressed-image codec with no external dependency, closing the
JPEG tier of the multimodal seam (`multimodal.py` — the reference treats
payload bytes as opaque, `common/.../S3SinkTask`-style; decode here is the
engine-side feature-extraction story). Scope:

- **encode_jpeg**: baseline sequential DCT, 8-bit, YCbCr, 4:4:4 or 4:2:0
  chroma subsampling, Annex-K quantization tables scaled by an IJG-style
  quality factor, canonical Huffman tables emitted in DHT — output is a
  standards-compliant JFIF file any JPEG reader decodes.
- **decode_jpeg**: baseline sequential DCT streams — arbitrary sampling
  factors (h, v <= 2 per component), 1 or 3 components, restart markers,
  tables read from the stream (DQT/DHT), byte-stuffing removal. Progressive
  / arithmetic / 12-bit streams raise ``NotImplementedError`` loudly.

The DCT/IDCT is a vectorized 8x8 basis-matrix einsum over all blocks at
once; only the entropy (Huffman) layer walks symbols in Python, which is
fine at the payload sizes an actor-pool decode stage handles per batch.
"""

from __future__ import annotations

import numpy as np

# --- zigzag: index i of the scan order -> row-major coefficient index ----
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# --- Annex K quantization tables (quality 50 reference) ------------------
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int32).reshape(8, 8)

# --- Huffman table shapes (Annex K BITS; symbol order is canonical-valid:
# any order yields a spec-compliant table because the table ships in DHT.
# DC symbols are magnitude sizes 0..11; AC symbols are (run<<4 | size) for
# run 0..15 x size 1..10, plus EOB=0x00 and ZRL=0xF0 — exactly 162.) ------
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_VALS = (
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA]
)

# 8x8 DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_x = np.arange(8)
DCT_M = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) / 2.0
DCT_M[0] /= np.sqrt(2)
del _x


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """BITS/HUFFVAL -> {symbol: (code, length)} per T.81 Annex C."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """BITS/HUFFVAL -> {(length, code): symbol} for the reader."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = [np.clip((t * scale + 50) // 100, 1, 255).astype(np.int32)
         for t in (QUANT_LUMA, QUANT_CHROMA)]
    return q[0], q[1]


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (H//8 * W//8, 8, 8) row-major."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 8, w // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(h, w))


def _fdct(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", DCT_M, blocks, DCT_M, optimize=True)


def _idct(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nuv,vy->nxy", DCT_M, blocks, DCT_M, optimize=True)


def _pad_edge(plane: np.ndarray, mult_h: int, mult_w: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_h
    pw = (-w) % mult_w
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """Signed coefficient -> (size, extra-bits code) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def _encode_block(zz: np.ndarray, pred: int, dc_codes, ac_codes,
                  bw: _BitWriter) -> int:
    """One zigzagged quantized block -> entropy bits. Returns new DC pred."""
    dc = int(zz[0])
    size, extra = _magnitude(dc - pred)
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(extra, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL
            bw.write(c, l)
            run -= 16
        size, extra = _magnitude(v)
        c, l = ac_codes[(run << 4) | size]
        bw.write(c, l)
        bw.write(extra, size)
        run = 0
    if last < 63:
        c, l = ac_codes[0x00]  # EOB
        bw.write(c, l)
    return dc


def _marker(tag: int, body: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(img: np.ndarray, quality: int = 90, subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) uint8 grayscale -> baseline JFIF
    bytes. ``subsample`` is ``"444"`` (no chroma subsampling) or ``"420"``
    (2x2 box-averaged chroma, the common camera layout). A nonzero
    ``restart_interval`` emits DRI + RSTn markers every that many MCUs
    (the fault-isolation feature real camera streams use)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg wants (h, w, 3) RGB or (h, w) gray uint8")
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg wants uint8 samples")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    h, w = img.shape[:2]
    sub = 1 if gray else (2 if subsample == "420" else 1)

    if gray:
        y = img.astype(np.float64)
        cb = cr = None
    else:
        rgb = img.astype(np.float64)
        y = rgb @ [0.299, 0.587, 0.114]
        cb = rgb @ [-0.168736, -0.331264, 0.5] + 128.0
        cr = rgb @ [0.5, -0.418688, -0.081312] + 128.0

    qy, qc = _quality_tables(quality)
    dc_l = _canonical_codes(DC_BITS, DC_VALS)
    ac_l = _canonical_codes(AC_BITS, AC_VALS)
    dc_c = _canonical_codes(DC_BITS, DC_VALS)  # same shape, table id 1
    ac_c = _canonical_codes(AC_BITS, AC_VALS)

    # component planes padded to the MCU grid, then quantized zigzag blocks
    y = _pad_edge(y, 8 * sub, 8 * sub)
    if not gray:
        if sub == 2:
            cb = _pad_edge(cb, 16, 16)
            cr = _pad_edge(cr, 16, 16)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
        else:
            cb = _pad_edge(cb, 8, 8)
            cr = _pad_edge(cr, 8, 8)

    def qzz(plane: np.ndarray, qt: np.ndarray) -> tuple[np.ndarray, int]:
        blocks = _blockify(plane - 128.0)
        coef = np.round(_fdct(blocks) / qt).astype(np.int32)
        return coef.reshape(-1, 64)[:, ZIGZAG], plane.shape[1] // 8

    zzy, ybw = qzz(y, qy)
    if not gray:
        zzb, cbw_ = qzz(cb, qc)
        zzr, _ = qzz(cr, qc)

    out_chunks: list[bytes] = []
    bw = _BitWriter()
    mcus_x = y.shape[1] // (8 * sub)
    mcus_y = y.shape[0] // (8 * sub)
    py = pb = pr = 0
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                out_chunks.append(bytes(bw.out))
                out_chunks.append(bytes([0xFF, 0xD0 + ((mcu_i // restart_interval - 1) % 8)]))
                bw = _BitWriter()
                py = pb = pr = 0
            for by in range(sub):
                for bx in range(sub):
                    i = (my * sub + by) * ybw + mx * sub + bx
                    py = _encode_block(zzy[i], py, dc_l, ac_l, bw)
            if not gray:
                i = my * cbw_ + mx
                pb = _encode_block(zzb[i], pb, dc_c, ac_c, bw)
                pr = _encode_block(zzr[i], pr, dc_c, ac_c, bw)
            mcu_i += 1
    bw.flush()
    out_chunks.append(bytes(bw.out))

    def dqt(qt: np.ndarray, tid: int) -> bytes:
        return _marker(0xDB, bytes([tid]) + bytes(qt.reshape(-1)[ZIGZAG].tolist()))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _marker(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    if gray:
        sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
            [1, 1, 0x11, 0])
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    else:
        sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
            [3,
             1, (sub << 4) | sub, 0,   # Y: sampling (sub, sub), quant table 0
             2, 0x11, 1,               # Cb
             3, 0x11, 1])              # Cr
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    head = (b"\xff\xd8"
            + _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
            + dqt(qy, 0) + dqt(qc, 1)
            + _marker(0xC0, sof)
            + dht(0, 0, DC_BITS, DC_VALS) + dht(1, 0, AC_BITS, AC_VALS)
            + dht(0, 1, DC_BITS, DC_VALS) + dht(1, 1, AC_BITS, AC_VALS))
    if restart_interval:
        head += _marker(0xDD, restart_interval.to_bytes(2, "big") + b"")
    return (head + _marker(0xDA, sos) + b"".join(out_chunks) + b"\xff\xd9")


class _BitReader:
    """Bit reader over the entropy segment with 0xFF00 de-stuffing; stops
    at any non-RST marker. ``resync`` skips to just past the next RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0  # trailing pad
                self.n += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    # marker: feed pad bits, leave pos at the marker
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def resync(self) -> None:
        """Drop buffered bits and skip past the next RSTn marker."""
        self.acc = self.n = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        raise ValueError("expected restart marker")


def _extend(code: int, size: int) -> int:
    if size == 0:
        return 0
    if code < (1 << (size - 1)):
        return code - (1 << size) + 1
    return code


def _parse_headers(d: bytes):
    """Marker walk up to (and including) SOS. Returns
    ``(frame, scan, qtables, htables_raw, restart, scan_pos)`` where
    ``htables_raw`` maps (class, id) -> (bits, vals) and ``scan_pos`` is the
    byte offset of the entropy-coded data. Shared by the full decoder and
    the DC-only thumbnail path."""
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables_raw: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        tag = d[pos + 1]
        if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        ln = int.from_bytes(d[pos + 2:pos + 4], "big")
        body = d[pos + 4:pos + 2 + ln]
        if tag == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int32)
                qtables[tid] = zz[UNZIGZAG].reshape(8, 8)
                i += 65
        elif tag == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                htables_raw[(cls, tid)] = (bits, vals)
                i += 17 + nv
        elif tag in (0xC0, 0xC1):  # baseline / extended sequential SOF
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit samples unsupported")
            fh = int.from_bytes(body[1:3], "big")
            fw = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fh, fw, comps)
        elif tag in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG supported (SOF 0xFF{tag:02X})")
        elif tag == 0xDD:  # DRI
            restart = int.from_bytes(body[:2], "big")
        elif tag == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns != len(frame[2]):
                # T.81 allows multi-scan sequential (one scan per component);
                # decoding only the first scan would silently return a
                # wrongly-tinted image — refuse loudly like the other
                # unsupported shapes
                raise NotImplementedError(
                    f"non-interleaved multi-scan baseline unsupported "
                    f"(scan codes {ns} of {len(frame[2])} components)")
            scan = []  # (comp_idx, dc_table, ac_table)
            for s in range(ns):
                cs, tt = body[1 + 2 * s], body[2 + 2 * s]
                ci = next(i for i, c in enumerate(frame[2]) if c[0] == cs)
                scan.append((ci, tt >> 4, tt & 0xF))
            return frame, scan, qtables, htables_raw, restart, pos + 2 + ln
        elif tag == 0xD9:  # EOI before SOS
            break
        pos += 2 + ln
    raise ValueError("no SOS scan found")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes -> (h, w, 3) uint8 RGB (grayscale input
    replicates to 3 channels). Sampling factors up to 2x2, restart
    intervals, stream-carried DQT/DHT. Progressive (SOF2) and arithmetic
    coding raise ``NotImplementedError``."""
    frame, scan, qtables, htables_raw, restart, pos = _parse_headers(payload)
    htables = {k: _decode_map(b, v) for k, (b, v) in htables_raw.items()}
    return _decode_scan(payload, pos, frame, scan, qtables, htables, restart)


def _decode_scan(d: bytes, pos: int, frame, scan, qtables, htables,
                 restart: int) -> np.ndarray:
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 unsupported")
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    # per component: coefficient array over its own block grid
    grids = []
    for cid, ch, cv, tq in comps:
        bw_ = mcus_x * ch
        bh_ = mcus_y * cv
        grids.append(np.zeros((bh_ * bw_, 64), np.int32))

    br = _BitReader(d, pos)
    preds = [0] * len(comps)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_i and mcu_i % restart == 0:
                br.resync()
                preds = [0] * len(comps)
            for (ci, tdc, tac) in scan:
                _, ch, cv, _ = comps[ci]
                dc_t = htables[(0, tdc)]
                ac_t = htables[(1, tac)]
                for by in range(cv):
                    for bx in range(ch):
                        zz = grids[ci]
                        row = (my * cv + by) * (mcus_x * ch) + mx * ch + bx
                        # DC
                        size = br.huff(dc_t)
                        preds[ci] += _extend(br.bits(size), size)
                        zz[row, 0] = preds[ci]
                        # AC
                        k = 1
                        while k < 64:
                            sym = br.huff(ac_t)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[row, k] = _extend(br.bits(size), size)
                            k += 1
            mcu_i += 1

    # dequantize, IDCT, reassemble, upsample to the luma grid
    planes = []
    for (cid, ch, cv, tq), zz in zip(comps, grids):
        coef = np.zeros_like(zz)
        coef[:, ZIGZAG] = zz
        blocks = coef.reshape(-1, 8, 8).astype(np.float64) * qtables[tq]
        spat = _idct(blocks) + 128.0
        plane = _unblockify(spat, mcus_y * cv * 8, mcus_x * ch * 8)
        if ch != hmax or cv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        g = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# --- DC-only luma thumbnail path -------------------------------------------
# The classic JPEG thumbnail trick: each 8x8 block's dequantized DC
# coefficient IS 8x the block's pixel mean, so an 8x-downsampled luma plane
# falls out of the entropy walk with no IDCT, no AC storage, no chroma math,
# and no color conversion. T.81 still forces a full Huffman walk (AC symbols
# must be decoded to find block boundaries), so the speed comes from a
# 16-bit LUT Huffman reader over a pre-destuffed buffer (one list index per
# symbol instead of up-to-16 dict probes) in one tight local-variable loop.
# This is what a 100 TB image-dedup pipeline does: dHash needs a 9x8 luma
# grid, so decoding anything beyond block means is wasted work.

_LUT_CACHE: dict = {}
_LUT_CACHE_CAP = 32  # ~0.5 MB per LUT; real corpora carry per-file optimized
#                      tables (mozjpeg/Pillow optimize=True), so an unbounded
#                      cache would grow with corpus size in long-lived actors


def _lut16(bits: list[int], vals: list[int]) -> list[int]:
    """BITS/HUFFVAL -> 65536-entry lookup: lut[peek16] = (symbol << 5) | len,
    0 where no code matches. LRU-cached (bounded): the Annex-K tables recur
    across files, per-file optimized tables cycle through the cap."""
    key = (bytes(bits), bytes(vals))
    hit = _LUT_CACHE.pop(key, None)
    if hit is not None:
        _LUT_CACHE[key] = hit  # true LRU: a hit refreshes recency, so the
        return hit             # recurring standard tables outlive per-file
        #                        optimized ones cycling through the cap
    lut = [0] * 65536
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            sym = vals[k]
            k += 1
            base = code << (16 - ln)
            packed = (sym << 5) | ln
            lut[base:base + (1 << (16 - ln))] = \
                [packed] * (1 << (16 - ln))
            code += 1
        code <<= 1
    if len(_LUT_CACHE) >= _LUT_CACHE_CAP:  # evict oldest (insertion order)
        _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
    _LUT_CACHE[key] = lut
    return lut


def _destuff_segments(d: bytes, pos: int) -> list[bytes]:
    """Entropy bytes from ``pos``: remove 0xFF00 stuffing, split at RSTn
    markers (each segment restarts byte-aligned), stop at the first other
    marker (EOI). Vectorized over the whole scan."""
    arr = np.frombuffer(d, np.uint8, len(d) - pos, pos)
    ff = np.nonzero(arr[:-1] == 0xFF)[0]
    nxt = arr[ff + 1] if len(ff) else np.empty(0, np.uint8)
    # scan end: first 0xFF followed by neither 0x00 nor RSTn
    hard = ff[(nxt != 0x00) & ((nxt < 0xD0) | (nxt > 0xD7))]
    end = int(hard[0]) if len(hard) else len(arr)
    keep = np.ones(end, bool)
    stuffed = ff[(ff < end - 1) & (arr[np.minimum(ff + 1, len(arr) - 1)] == 0)]
    keep[stuffed + 1] = False  # drop the stuffed 0x00, keep the 0xFF
    rst = ff[(ff < end - 1)
             & (arr[np.minimum(ff + 1, len(arr) - 1)] >= 0xD0)
             & (arr[np.minimum(ff + 1, len(arr) - 1)] <= 0xD7)]
    segs, start = [], 0
    for r in rst:
        r = int(r)
        segs.append(arr[start:r][keep[start:r]].tobytes())
        start = r + 2
    segs.append(arr[start:end][keep[start:end]].tobytes())
    return segs


def _walk_scan_luma(payload: bytes, want_lowac: bool, _parsed=None):
    """Single LUT-Huffman pass over the entropy stream collecting the luma
    component's low-frequency coefficients: DC always; with ``want_lowac``
    also scan-order coefficients 1, 2, 4 — (0,1), (1,0), (1,1) — the three
    ACs the 2x2 scaled reconstruction needs. Chroma and higher ACs are
    decoded-and-skipped (T.81 gives no way around walking every symbol).
    Pass ``_parsed`` (a ``_parse_headers`` result) to skip re-walking the
    marker stream when the caller already parsed it for the size check.
    Returns ``(dc, a01, a10, a11, geometry)`` where geometry is
    ``(fh, fw, rows, cols, qtable)`` for the luma block grid."""
    frame, scan, qtables, htables_raw, restart, pos = (
        _parsed if _parsed is not None else _parse_headers(payload))
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 unsupported")
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    # per scan member: (is_luma, blocks_per_mcu, h_sampling, dc_lut, ac_lut)
    members = []
    for (ci, tdc, tac) in scan:
        _, ch, cv, _ = comps[ci]
        members.append((ci == 0, ch * cv, ch,
                        _lut16(*htables_raw[(0, tdc)]),
                        _lut16(*htables_raw[(1, tac)])))
    ch0, cv0 = comps[0][1], comps[0][2]
    luma_bw = mcus_x * ch0
    nblk = mcus_y * cv0 * luma_bw
    dc_grid = np.zeros(nblk, np.int32)
    if want_lowac:
        a01 = np.zeros(nblk, np.int32)
        a10 = np.zeros(nblk, np.int32)
        a11 = np.zeros(nblk, np.int32)
    else:
        a01 = a10 = a11 = None

    segs = _destuff_segments(payload, pos)
    seg_i = 0
    buf = segs[0]
    L = len(buf)
    bp = acc = n = 0
    pred0 = 0
    mcu_total = mcus_x * mcus_y
    for mcu_i in range(mcu_total):
        if restart and mcu_i and mcu_i % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("expected restart marker")
            buf = segs[seg_i]
            L = len(buf)
            bp = acc = n = 0
            pred0 = 0
        my, mx = divmod(mcu_i, mcus_x)
        for is_luma, nblocks, ch, dc_lut, ac_lut in members:
            for b in range(nblocks):
                # --- DC symbol ---
                while n < 16 and bp < L:
                    acc = (acc << 8) | buf[bp]
                    bp += 1
                    n += 8
                peek = (acc << (16 - n)) if n < 16 else (acc >> (n - 16))
                e = dc_lut[peek & 0xFFFF]
                if e == 0:
                    raise ValueError("invalid Huffman code in scan")
                ln = e & 31
                size = e >> 5
                n -= ln
                need = size + 16  # extras + headroom for next peek
                while n < need and bp < L:
                    acc = (acc << 8) | buf[bp]
                    bp += 1
                    n += 8
                if size:
                    extra = (acc >> max(n - size, 0)) & ((1 << size) - 1)
                    n -= size
                    if is_luma:
                        if extra < (1 << (size - 1)):
                            extra += 1 - (1 << size)
                        pred0 += extra
                if is_luma:
                    by, bx = divmod(b, ch)
                    row = (my * cv0 + by) * luma_bw + mx * ch + bx
                    dc_grid[row] = pred0
                # --- AC run (capture scan 1/2/4 for luma if asked; skip
                # everything else to the block boundary) ---
                k = 1
                while k < 64:
                    while n < 16 and bp < L:
                        acc = (acc << 8) | buf[bp]
                        bp += 1
                        n += 8
                    peek = (acc << (16 - n)) if n < 16 else (acc >> (n - 16))
                    e = ac_lut[peek & 0xFFFF]
                    if e == 0:
                        raise ValueError("invalid Huffman code in scan")
                    ln = e & 31
                    sym = e >> 5
                    n -= ln
                    if sym == 0x00:  # EOB
                        break
                    run = sym >> 4
                    size = sym & 0xF
                    if size == 0:
                        if run != 15:
                            raise ValueError("bad AC symbol")
                        k += 16
                        continue
                    k += run + 1
                    if k > 64:
                        raise ValueError("AC run past block end")
                    while n < size and bp < L:
                        acc = (acc << 8) | buf[bp]
                        bp += 1
                        n += 8
                    if want_lowac and is_luma and k <= 5:
                        kc = k - 1  # scan index of this coefficient
                        if kc == 1 or kc == 2 or kc == 4:
                            extra = ((acc >> max(n - size, 0))
                                     & ((1 << size) - 1))
                            if extra < (1 << (size - 1)):
                                extra += 1 - (1 << size)
                            if kc == 1:
                                a01[row] = extra
                            elif kc == 2:
                                a10[row] = extra
                            else:
                                a11[row] = extra
                    n -= size
                acc &= (1 << max(n, 0)) - 1 if n > 0 else 0
                if n < 0:
                    n = 0

    geom = (fh, fw, mcus_y * cv0, luma_bw, qtables[comps[0][3]])
    return dc_grid, a01, a10, a11, geom


def decode_jpeg_luma_dc(payload: bytes, _parsed=None) -> np.ndarray:
    """Baseline JPEG bytes -> (ceil(h/8), ceil(w/8)) float32 plane of 8x8
    block-mean luma (the DC thumbnail: the dequantized DC coefficient is 8x
    the block's pixel mean — no IDCT, no chroma). Same stream support as
    ``decode_jpeg``; same loud ``NotImplementedError`` for
    progressive/12-bit."""
    dc, _, _, _, (fh, fw, rows, cols, qt) = \
        _walk_scan_luma(payload, False, _parsed)
    thumb = dc.astype(np.float32).reshape(rows, cols)
    thumb = thumb * (int(qt[0, 0]) / 8.0) + 128.0
    return np.clip(thumb[: -(-fh // 8), : -(-fw // 8)], 0.0, 255.0)


# quadrant half-means of the 8-point DCT basis rows 0 and 1:
# _HM[u, q] = mean(DCT_M[u, 4q:4q+4]) — all that survives 4x4 box-averaging
# of a DC + (0,1)/(1,0)/(1,1) reconstruction
_HM = np.stack([DCT_M[0, :4].mean() * np.ones(2),
                np.array([DCT_M[1, :4].mean(), DCT_M[1, 4:].mean()])])


def decode_jpeg_luma_quad(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (ceil(h/4), ceil(w/4)) float32 plane of 4x4
    quadrant-mean luma — the libjpeg-style 1/4-scale decode: per block the
    DC plus the three lowest ACs ((0,1), (1,0), (1,1)) reconstruct the 2x2
    quadrant means exactly up to odd-frequency leakage (u,v >= 2 terms with
    nonzero half-means), which natural quantized content keeps small. Costs
    the same entropy walk as the DC path plus three captured
    coefficients."""
    dc, a01, a10, a11, (fh, fw, rows, cols, qt) = \
        _walk_scan_luma(payload, True)
    dcq = dc.astype(np.float32) * float(qt[0, 0])
    c01 = a01.astype(np.float32) * float(qt[0, 1])
    c10 = a10.astype(np.float32) * float(qt[1, 0])
    c11 = a11.astype(np.float32) * float(qt[1, 1])
    # quad[n, qy, qx] = dc*HM00^2 + c10*HM[1,qy]*HM00 + c01*HM00*HM[1,qx]
    #                   + c11*HM[1,qy]*HM[1,qx]
    hm0 = float(_HM[0, 0])
    hmy = _HM[1][None, :, None]  # (1, 2, 1) over qy
    hmx = _HM[1][None, None, :]  # (1, 1, 2) over qx
    quad = (dcq[:, None, None] * (hm0 * hm0)
            + c10[:, None, None] * hmy * hm0
            + c01[:, None, None] * hmx * hm0
            + c11[:, None, None] * hmy * hmx) + 128.0
    plane = (quad.reshape(rows, cols, 2, 2)
             .transpose(0, 2, 1, 3).reshape(rows * 2, cols * 2))
    return np.clip(plane[: -(-fh // 4), : -(-fw // 4)], 0.0, 255.0)
