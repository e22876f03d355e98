"""Block-GZIP chunk files: one file = concatenation of independently-valid GZIP
members ("chunks") + a JSON chunk index enabling ranged-read seek to an offset.

Reference analog: BlockGZIPFileWriter (sink/.../BlockGZIPFileWriter.java:18-35,
167-227) — chunks rotate when the *uncompressed* bytes of the current chunk
would exceed ``chunk_threshold`` (default 64 MiB, sink/.../S3SinkTask.java:47);
the sidecar ``*.index.json`` lists per chunk ``{first_record_offset,
num_records, byte_offset, byte_length, byte_length_uncompressed}``
(common/.../json/ChunkDescriptor.java:5-16), and ChunksIndex offers
``totalSize/lastOffset/chunkContaining`` (common/.../json/ChunksIndex.java:7-37).

In the Ray engine the Parquet path replaces all of this (row groups = chunks,
footer stats = index). This module exists as the byte-level *import/export
codec* for archives the reference produced — and as the parity proof for
S2/S7/O4. It is an edge format: files are read whole-or-ranged into a
map_batches decode stage; nothing here runs per-record in the hot path at
scale beyond the sequential gzip scan the format itself demands.
"""

from __future__ import annotations

import gzip
import io
import json
import os
import zlib
from dataclasses import dataclass


@dataclass
class ChunkDescriptor:
    first_record_offset: int
    num_records: int
    byte_offset: int
    byte_length: int
    byte_length_uncompressed: int

    def to_json(self) -> dict:
        return {
            "first_record_offset": self.first_record_offset,
            "num_records": self.num_records,
            "byte_offset": self.byte_offset,
            "byte_length": self.byte_length,
            "byte_length_uncompressed": self.byte_length_uncompressed,
        }


class ChunksIndex:
    def __init__(self, chunks: list[ChunkDescriptor]):
        self.chunks = chunks

    @classmethod
    def from_json(cls, doc: dict | str) -> "ChunksIndex":
        if isinstance(doc, str):
            doc = json.loads(doc)
        return cls([ChunkDescriptor(**c) for c in doc["chunks"]])

    def to_json(self) -> str:
        return json.dumps({"chunks": [c.to_json() for c in self.chunks]})

    def total_size(self) -> int:
        return sum(c.byte_length for c in self.chunks)

    def last_offset(self) -> int:
        """First offset past the block = last chunk's first_record_offset +
        num_records (the sink-side offset recovery arithmetic,
        sink/.../S3Writer.java:92-96)."""
        if not self.chunks:
            return 0
        last = self.chunks[-1]
        return last.first_record_offset + last.num_records

    def chunk_containing(self, offset: int) -> ChunkDescriptor | None:
        for c in self.chunks:
            if c.first_record_offset <= offset < c.first_record_offset + c.num_records:
                return c
        return None


class BlockGzipWriter:
    """Accumulates framed records into concatenated gzip members; rotates a
    member when its uncompressed size would cross ``chunk_threshold``. The
    whole file is also one valid gzip stream (multi-member). ``init_bytes``
    (format header, reference U2) is written as its own chunk of 0 records so
    ranged readers can skip it (sink/.../BlockGZIPFileWriter.java:133-141)."""

    def __init__(self, path: str, start_offset: int = 0,
                 chunk_threshold: int = 64 * 1024 * 1024,
                 init_bytes: bytes = b""):
        self.path = path
        self.chunk_threshold = chunk_threshold
        self._file = open(path + ".tmp", "wb")
        self.chunks: list[ChunkDescriptor] = []
        self._next_offset = start_offset
        self._buf = io.BytesIO()
        self._buf_records = 0
        self._buf_first_offset = start_offset
        if init_bytes:
            self._buf.write(init_bytes)
            self._rotate(record_chunk=False)

    def _rotate(self, record_chunk: bool = True) -> None:
        raw = self._buf.getvalue()
        if not raw and self._buf_records == 0:
            return
        compressed = gzip.compress(raw, compresslevel=6, mtime=0)  # mtime=0: deterministic bytes
        byte_offset = self._file.tell()
        self._file.write(compressed)
        self.chunks.append(
            ChunkDescriptor(
                first_record_offset=self._buf_first_offset,
                num_records=self._buf_records if record_chunk else 0,
                byte_offset=byte_offset,
                byte_length=len(compressed),
                byte_length_uncompressed=len(raw),
            )
        )
        self._buf = io.BytesIO()
        self._buf_records = 0
        self._buf_first_offset = self._next_offset

    def write(self, framed: bytes, record_count: int = 1) -> None:
        if self._buf.tell() and self._buf.tell() + len(framed) > self.chunk_threshold:
            self._rotate()
        self._buf.write(framed)
        self._buf_records += record_count
        self._next_offset += record_count

    @property
    def index_path(self) -> str:
        return index_path_for(self.path)

    def close(self) -> ChunksIndex:
        self._rotate()
        self._file.close()
        os.replace(self.path + ".tmp", self.path)  # atomic, idempotent overwrite
        index = ChunksIndex(self.chunks)
        idx_tmp = self.index_path + ".tmp"
        with open(idx_tmp, "w") as f:
            f.write(index.to_json())
        os.replace(idx_tmp, self.index_path)  # atomic, like the cursor
        return index


def index_path_for(data_path: str) -> str:
    """Index sidecar name, REFERENCE-compatible: the '.gz' suffix is REPLACED
    by '.index.json' ('{base}.index.json', sink/.../S3Writer.java:54-55;
    the source derives it the same way, source/.../S3FilesReader.java:416).
    Naming it '{base}.gz.index.json' would break resuming reference-produced
    archives and the original connector's replay of ours."""
    base = data_path[:-3] if data_path.endswith(".gz") else data_path
    return base + ".index.json"


def read_block(path: str) -> bytes:
    """Decompress a whole block file (valid as a single multi-member stream)."""
    with open(path, "rb") as f:
        return read_bytes_multimember(f.read())


def read_block_from_offset(path: str, index: ChunksIndex, offset: int) -> tuple[bytes, int]:
    """Ranged-read resume: seek to the chunk containing ``offset`` and
    decompress from there, returning (bytes, first_record_offset) — the caller
    skips ``offset - first_record_offset`` records. An offset BEFORE the
    file's first record replays the whole file (every record is newer than
    the checkpoint); an offset past the last record returns nothing.
    Reference: source/.../S3FilesReader.java:244-311."""
    chunk = index.chunk_containing(offset)
    if chunk is None:
        record_chunks = [c for c in index.chunks if c.num_records > 0]
        if record_chunks and offset < record_chunks[0].first_record_offset:
            chunk = record_chunks[0]
        else:
            return b"", index.last_offset()
    with open(path, "rb") as f:
        f.seek(chunk.byte_offset)
        data = f.read()  # this chunk + the rest of the file
    return read_bytes_multimember(data), chunk.first_record_offset


def read_bytes_multimember(data: bytes, strict: bool = True) -> bytes:
    """Decompress a concatenated-member gzip stream. ``strict`` (default)
    raises on a TRUNCATED final member instead of silently returning the
    decodable prefix — a truncation landing on a record-frame boundary would
    otherwise vanish records with no error; the decode stage's corrupt-record
    policy decides what to do with the exception."""
    if data[:2] != b"\x1f\x8b":
        return data  # not gzip (e.g. the reader already decompressed upstream)
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data[pos:]))
        pos = len(data) - len(d.unused_data)
        if not d.eof:
            if strict:
                raise zlib.error(
                    f"truncated gzip member at byte {pos} of {len(data)}"
                )
            break
    return b"".join(out)
