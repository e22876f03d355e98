"""Record framing codecs + registry: the reference's pluggable S3RecordFormat
surface (api/.../S3RecordFormat.java:7-42; registry by alias or class path,
common/.../Configure.java:125-150).

Two built-ins, mirroring the reference:

- ``TrailingDelimiterCodec`` — value (+ optional key) with per-field delimiter
  and charset, default UTF-8 + ``\\n`` (common/.../TrailingDelimiterFormat.java:19-68,
  reader common/.../DelimitedRecordReader.java:41-121).
- ``ByteLengthCodec`` — 4-byte big-endian length prefix per (optional key and)
  value (common/.../ByteLengthFormat.java:13-56, reader
  common/.../BytesRecordReader.java:30-93), raising ``CorruptRecordError`` with
  the reference's "Corrupt record at ..." shape on truncation.

These are *import-boundary* codecs: a decode stage turns archived byte blocks
into Arrow ``(key, value, offset)`` batches (offset assignment by position —
the reference RecordReader's ``offset++``, common/.../RecordReader.java:22-61);
inside the engine everything is columnar Parquet/Arrow and framing is obsolete.
Decoding is per-record by the formats' nature (variable-length byte scanning),
so it is kept off the hot path and parallelized per *file* via
``read_binary_files`` + ``map_batches`` (see ``decode_blocks``).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np
import pyarrow as pa


class CorruptRecordError(ValueError):
    pass


RECORD_SCHEMA = pa.schema(
    [("offset", pa.int64()), ("key", pa.binary()), ("value", pa.binary())]
)


def _records_table(offsets, keys, values) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array(offsets, pa.int64()), pa.array(keys, pa.binary()), pa.array(values, pa.binary())],
        schema=RECORD_SCHEMA,
    )


@dataclass
class TrailingDelimiterCodec:
    """value[+key] framing with trailing delimiters.

    Frame: ``[key key_delimiter]? value value_delimiter``. A record whose value
    contains the delimiter is the user's problem, exactly as in the reference.

    ``charset`` converts between user-facing *strings* and the framed bytes
    (``encode_strings``/``decode_strings`` — the reference's per-field charset
    support incl. UTF-16BE, common/.../TrailingDelimiterFormat.java:43-48);
    the core ``encode``/``decode`` stay bytes end-to-end."""

    value_delimiter: bytes | str = "\n"
    key_delimiter: bytes | str = "\t"
    include_keys: bool = False
    charset: str = "utf-8"

    name = "text"

    def __post_init__(self):
        # str delimiters are encoded in the configured charset — the
        # reference's '\n'.getBytes(encoding) semantics (UTF-16BE newline is
        # 0x00 0x0A, not a bare 0x0A); bytes pass through verbatim.
        if isinstance(self.value_delimiter, str):
            self.value_delimiter = self.value_delimiter.encode(self.charset)
        if isinstance(self.key_delimiter, str):
            self.key_delimiter = self.key_delimiter.encode(self.charset)

    def encode_strings(self, keys: list[str | None], values: list[str]) -> bytes:
        enc = self.charset
        return self.encode(
            [None if k is None else k.encode(enc) for k in keys],
            [v.encode(enc) for v in values],
        )

    def decode_strings(self, data: bytes, start_offset: int = 0) -> pa.Table:
        tbl = self.decode(data, start_offset)
        enc = self.charset
        keys = [None if k is None else k.decode(enc) for k in tbl.column("key").to_pylist()]
        values = [v.decode(enc) for v in tbl.column("value").to_pylist()]
        return pa.table(
            {
                "offset": tbl.column("offset"),
                "key": pa.array(keys, pa.string()),
                "value": pa.array(values, pa.string()),
            }
        )

    def encode(self, keys: list[bytes | None], values: list[bytes]) -> bytes:
        out = bytearray()
        for k, v in zip(keys, values):
            if self.include_keys:
                out += (k or b"") + self.key_delimiter
            out += v + self.value_delimiter
        return bytes(out)

    def _parse(self, data: bytes, stop_on_error: bool):
        """Sequential parse in the REFERENCE's read order: with keys enabled,
        the key is scanned up to ``key_delimiter`` FIRST (so a key may legally
        contain the value delimiter, common/.../DelimitedRecordReader.java:41-121),
        then the value up to ``value_delimiter``. Splitting on the value
        delimiter first would mis-frame such keys and desync every later
        positional offset. Returns (keys, values, error_message | None)."""
        keys: list[bytes | None] = []
        values: list[bytes] = []
        if not self.include_keys:
            # values cannot contain the delimiter by contract — split is exact
            for rec in data.split(self.value_delimiter)[:-1] if data else []:
                keys.append(None)
                values.append(rec)
            return keys, values, None
        kd, vd = self.key_delimiter, self.value_delimiter
        pos, n = 0, len(data)
        while pos < n:
            kidx = data.find(kd, pos)
            if kidx < 0:
                err = f"missing key delimiter after byte {pos}"
                if stop_on_error:
                    return keys, values, err
                raise CorruptRecordError(err)
            vidx = data.find(vd, kidx + len(kd))
            if vidx < 0:
                err = f"missing value delimiter after byte {kidx}"
                if stop_on_error:
                    return keys, values, err
                raise CorruptRecordError(err)
            keys.append(data[pos:kidx])
            values.append(data[kidx + len(kd):vidx])
            pos = vidx + len(vd)
        return keys, values, None

    def decode(self, data: bytes, start_offset: int = 0) -> pa.Table:
        if data and not data.endswith(self.value_delimiter):
            raise CorruptRecordError(
                f"no trailing delimiter at end of input (len={len(data)})"
            )
        keys, values, _ = self._parse(data, stop_on_error=False)
        offs = np.arange(start_offset, start_offset + len(values), dtype=np.int64)
        return _records_table(offs, keys, values)

    def decode_prefix(self, data: bytes, start_offset: int = 0,
                      source: str = "<block>"):
        """Decode up to the last complete record; never raises on a truncated
        tail. -> (table, error_message | None)."""
        try:
            return self.decode(data, start_offset), None
        except CorruptRecordError as e:
            keys, values, err = self._parse(data, stop_on_error=True)
            offs = np.arange(start_offset, start_offset + len(values), dtype=np.int64)
            return _records_table(offs, keys, values), str(err or e)


@dataclass
class ByteLengthCodec:
    """4-byte big-endian length-prefixed framing:
    ``[len(key)][key]?[len(value)][value]``."""

    include_keys: bool = True

    name = "binary"

    def encode(self, keys: list[bytes | None], values: list[bytes]) -> bytes:
        out = bytearray()
        for k, v in zip(keys, values):
            if self.include_keys:
                k = k or b""
                out += struct.pack(">i", len(k)) + k
            out += struct.pack(">i", len(v)) + v
        return bytes(out)

    def decode(self, data: bytes, start_offset: int = 0,
               source: str = "<block>") -> pa.Table:
        keys: list[bytes | None] = []
        values: list[bytes] = []
        pos, n = 0, len(data)

        def read_field() -> bytes:
            nonlocal pos
            if pos + 4 > n:
                raise CorruptRecordError(
                    f"Corrupt record at {source}:{start_offset + len(values)}"
                )
            (length,) = struct.unpack_from(">i", data, pos)
            pos += 4
            if length < 0 or pos + length > n:
                raise CorruptRecordError(
                    f"Corrupt record at {source}:{start_offset + len(values)}"
                )
            field = data[pos : pos + length]
            pos += length
            return field

        while pos < n:
            keys.append(read_field() if self.include_keys else None)
            values.append(read_field())
        offs = np.arange(start_offset, start_offset + len(values), dtype=np.int64)
        return _records_table(offs, keys, values)

    def decode_prefix(self, data: bytes, start_offset: int = 0,
                      source: str = "<block>"):
        """Decode as many whole records as possible; on corruption return the
        good prefix instead of raising. -> (table, error_message | None)."""
        try:
            return self.decode(data, start_offset, source), None
        except CorruptRecordError as e:
            # replay record-by-record up to the failure point
            keys, values = [], []
            pos, n = 0, len(data)
            while pos < n:
                try:
                    fields = []
                    p2 = pos
                    for _ in range(2 if self.include_keys else 1):
                        if p2 + 4 > n:
                            raise CorruptRecordError("truncated")
                        (length,) = struct.unpack_from(">i", data, p2)
                        p2 += 4
                        if length < 0 or p2 + length > n:
                            raise CorruptRecordError("truncated")
                        fields.append(data[p2 : p2 + length])
                        p2 += length
                    pos = p2
                    if self.include_keys:
                        keys.append(fields[0])
                        values.append(fields[1])
                    else:
                        keys.append(None)
                        values.append(fields[0])
                except CorruptRecordError:
                    break
            offs = np.arange(start_offset, start_offset + len(values), dtype=np.int64)
            return _records_table(offs, keys, values), str(e)


FORMATS: dict[str, type] = {
    TrailingDelimiterCodec.name: TrailingDelimiterCodec,
    ByteLengthCodec.name: ByteLengthCodec,
}


def register_format(name: str, cls: type) -> None:
    """User-extension hook (reference: ``format=<fqcn>``,
    common/.../Configure.java:125-150)."""
    FORMATS[name] = cls


def get_format(name: str, **config):
    if name in FORMATS:
        return FORMATS[name](**config)
    if "." in name:  # dotted-path custom class, the <fqcn> escape hatch
        import importlib

        mod, _, cls = name.rpartition(".")
        return getattr(importlib.import_module(mod), cls)(**config)
    raise KeyError(f"unknown format {name!r}; known: {sorted(FORMATS)}")
