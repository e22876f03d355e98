"""Property tests for the round-4 session-B kernels: the shared NTILE
closed form vs DuckDB's NTILE on randomized (n, k), and the chunker's
coverage/overlap invariants on randomized documents."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_s3_ray.functions.quantiles import ntile_of_rank


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 300), st.integers(1, 60))
def test_ntile_closed_form_equals_duckdb(n, k):
    got = ntile_of_rank(np.arange(n), n, k)
    exp = np.array([t for (t,) in duckdb.sql(
        f"SELECT ntile({k}) OVER (ORDER BY i) FROM range({n}) r(i) "
        "ORDER BY i").fetchall()], np.int64)
    assert (got == exp).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(1, 200), min_size=1, max_size=8),
       st.integers(1, 60))
def test_ntile_closed_form_per_row_n(sizes, k):
    """The vectorized per-row-n path (grouped_ntile's) must equal the
    scalar path applied per group."""
    r = np.concatenate([np.arange(n) for n in sizes])
    n = np.concatenate([np.full(sz, sz) for sz in sizes])
    got = ntile_of_rank(r, n, k)
    exp = np.concatenate([ntile_of_rank(np.arange(sz), sz, k)
                          for sz in sizes])
    assert (got == exp).all()


TOKEN = st.text(alphabet="abxy", min_size=1, max_size=3)


@settings(max_examples=40, deadline=None)
@given(st.lists(TOKEN, max_size=60), st.integers(1, 12), st.integers(1, 12))
def test_chunker_covers_every_token_with_exact_overlap(toks, size, stride):
    """Reference invariants of the chunk walk (pure-python replica of the
    chunk_documents inner loop): concatenating chunks with the first
    `overlap` tokens of each non-first chunk removed rebuilds the document;
    every chunk but the last has exactly `size` tokens when stride <= size."""
    n = len(toks)
    chunks = [toks[s:s + size] for s in range(0, n, stride)]
    if n == 0:
        assert chunks == []
        return
    assert len(chunks) == -(-n // stride)
    if stride <= size:
        rebuilt = list(chunks[0])
        for c in chunks[1:]:
            overlap = size - stride
            rebuilt += c[overlap:] if overlap <= len(c) else []
        # full coverage with stride <= size: rebuild equals the document
        assert rebuilt[:n] == toks
    for ci, c in enumerate(chunks):
        assert len(c) == min(size, n - ci * stride)
