"""Regression tests for the round-4 ADVICE findings closed in round 5:

- ewma: float NaN in ``value`` now raises loudly (the NULL contract extended
  — the engine's renormalize-over-missing and the oracle's NaN-propagating
  list_dot_product cannot agree, so silence was a latent divergence).
- FrameSampler: a crafted MJPM offset table that points into the header
  (offs[0] != 12 + 8*(n+1)) is rejected and falls back to the byte-slice
  stub instead of yielding header bytes as "frames".
- CLI ``query`` verb: the streaming preview path executes the lazy plan
  exactly ONCE (materialize before count + preview), not once per consumer.
"""

import json
import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_ewma_raises_on_nan_value(tmp_path, ray_session):
    from kafka_connect_s3_ray.pipelines.queries import q_ewma

    base = pd.Timestamp("2026-03-01")
    # built column-wise in Arrow: pandas->Arrow would silently turn the
    # NaN payload into a NULL, and a TRUE float NaN is the point here
    tbl = pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([base + pd.Timedelta(minutes=i) for i in range(3)],
                       pa.timestamp("us")),
        "value": pa.array([1.0, float("nan"), 3.0], pa.float64()),
        "event_type": pa.array(["click"] * 3),
        "props": pa.array(["{}"] * 3)})
    assert tbl.column("value").null_count == 0
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    with pytest.raises(Exception, match="NaN"):
        q_ewma(str(tmp_path)).to_pandas()


def test_ewma_still_accepts_clean_values(tmp_path, ray_session):
    from kafka_connect_s3_ray.pipelines.queries import q_ewma

    base = pd.Timestamp("2026-03-01")
    df = pd.DataFrame(
        {"event_id": [0, 1], "user_id": [1, 1],
         "ts": [base, base + pd.Timedelta(minutes=1)],
         "value": [1.0, 2.0], "event_type": "click", "props": "{}"})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(str(tmp_path), "events.parquet"))
    out = q_ewma(str(tmp_path)).to_pandas().sort_values("event_id")
    assert abs(out["ewma"].iloc[1] - (2 + 0.9) / 1.9) < 1e-12


def test_framesampler_rejects_offsets_into_header(ray_session):
    """A magic-prefixed payload whose offset table points at the header must
    NOT surface header bytes as frames — it takes the byte-slice stub path
    (which covers the whole payload, not the frame ranges)."""
    import ray

    from kafka_connect_s3_ray.functions.multimodal import (MJPM_MAGIC,
                                                           FrameSampler,
                                                           encode_mjpm)

    good = encode_mjpm([b"frameAAA", b"frameBBB"], fps=4)
    # corrupt copy: same length/sentinel, but offsets shifted INTO the header
    n = 2
    head = MJPM_MAGIC + struct.pack("<II", n, 4)
    base = len(head) + 8 * (n + 1)
    evil_offs = [4, base, len(good)]  # offs[0]=4 points into the header
    evil = head + struct.pack("<3Q", *evil_offs) + good[base:]
    assert len(evil) == len(good)

    ds = ray.data.from_arrow(pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([good, evil], pa.binary())}))
    out = ds.map_batches(FrameSampler(2), batch_format="pyarrow").to_pandas()
    by_id = {k: g for k, g in out.groupby("media_id")}
    # good payload: real frames, exactly the encoded bytes
    assert sorted(by_id[1]["frame"]) == [b"frameAAA", b"frameBBB"]
    # evil payload fell back to the stub: no frame equals header bytes
    # sliced at the crafted offsets (the pre-fix failure mode yielded
    # good[4:base] — header/table bytes — as a "frame")
    assert not any(f == evil[4:base] for f in by_id[2]["frame"])


def test_query_verb_executes_plan_once(tmp_path, ray_session, monkeypatch):
    """The streaming preview path must run the lazy pipeline exactly once
    (materialize -> metadata count + bounded preview), not once for count()
    and again for limit().to_pandas()."""
    import ray

    import kafka_connect_s3_ray.__main__ as cli

    marker_dir = tmp_path / "runs"
    marker_dir.mkdir()

    def counting_query(sf_dir):
        def tag(t: pa.Table) -> pa.Table:
            # one single-block dataset -> one file per plan EXECUTION
            fn = marker_dir / f"run-{os.getpid()}-{np.random.randint(1 << 30)}"
            fn.write_bytes(b"x")
            return t

        return (ray.data.range(5, override_num_blocks=1)
                .map_batches(tag, batch_format="pyarrow"))

    # the CLI does `from ...queries import QUERIES` inside main(), so
    # patching the module dict is sufficient
    from kafka_connect_s3_ray.pipelines import queries as qmod
    monkeypatch.setitem(qmod.QUERIES, "_probe", counting_query)

    rc = cli.main(["query", "--name", "_probe", "--sf", str(tmp_path),
                   "--limit", "3"])
    assert rc == 0
    runs = list(marker_dir.iterdir())
    assert len(runs) == 1, f"plan executed {len(runs)} times, want 1"


def _editdist_docs_ds(ray_session):
    import ray

    base = "the quick brown fox jumps over it"
    docs = [(0, base), (1, base), (2, "thX quick brown fox jumps"),
            (3, "he quick brown fox Zjumps"), (4, base + " again")]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string())}))


def test_edit_distance_join_pair_budget(ray_session):
    """max_pairs: generous budget changes nothing; a tight budget raises
    loudly by default and truncates to the deterministic sorted prefix with
    on_budget='truncate'."""
    from kafka_connect_s3_ray.functions.editdist import edit_distance_join

    full = (edit_distance_join(_editdist_docs_ds(ray_session), k=4, width=20)
            .to_pandas().sort_values(["left_id", "right_id"])
            .reset_index(drop=True))
    n = len(full)
    assert n >= 3  # planted dups guarantee pairs

    same = (edit_distance_join(_editdist_docs_ds(ray_session), k=4, width=20,
                               max_pairs=n)
            .to_pandas().sort_values(["left_id", "right_id"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(same, full, check_dtype=False)

    with pytest.raises(ValueError, match="max_pairs"):
        edit_distance_join(_editdist_docs_ds(ray_session), k=4, width=20,
                           max_pairs=n - 1)

    trunc = (edit_distance_join(_editdist_docs_ds(ray_session), k=4,
                                width=20, max_pairs=n - 1,
                                on_budget="truncate")
             .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(trunc, full.iloc[: n - 1],
                                  check_dtype=False)

    with pytest.raises(ValueError, match="on_budget"):
        edit_distance_join(_editdist_docs_ds(ray_session), k=4, width=20,
                           max_pairs=1, on_budget="bogus")


def test_sniff_decode_dispatch_and_shared_paths():
    """sniff_decode is the ONE dispatch every consumer shares: signatures
    route to the real codecs, unknown bytes route to the bytes path, and a
    corrupt magic-prefixed payload raises (callers pick the policy)."""
    from kafka_connect_s3_ray.functions.multimodal import (encode_jpeg,
                                                           encode_png,
                                                           encode_ppm,
                                                           encode_wav,
                                                           sniff_decode)

    img = (np.arange(16 * 24 * 3) % 251).astype(np.uint8).reshape(16, 24, 3)
    for enc in (encode_ppm, encode_png,
                lambda x: encode_jpeg(x, quality=90)):
        kind, obj = sniff_decode(enc(img))
        assert kind == "img" and obj.shape[:2] == (16, 24)
    samples = (np.sin(np.arange(500)) * 1000).astype(np.int16)
    kind, (s, rate) = sniff_decode(encode_wav(samples, 8000))
    assert kind == "pcm" and rate == 8000 and np.array_equal(s, samples)
    kind, obj = sniff_decode(b"no magic here")
    assert kind == "bytes" and obj == b"no magic here"
    with pytest.raises(Exception):
        sniff_decode(b"P6 corrupt ppm header with no dims")


def test_lut_cache_bounded():
    """The Huffman LUT cache must stay bounded under per-file optimized
    tables (mozjpeg-style corpora) — long-lived actors must not grow RSS
    with corpus size."""
    from kafka_connect_s3_ray.functions import jpeg as J

    J._LUT_CACHE.clear()
    # synthesize MORE distinct valid tables than the cap: single-code
    # tables over distinct byte symbols (canonical-valid: one 2-bit code)
    bits = [0, 1] + [0] * 14
    n_keys = 2 * J._LUT_CACHE_CAP  # 64 distinct keys > cap
    for sym in range(n_keys):
        lut = J._lut16(bits, [sym])
        assert lut[0] != 0
    assert len(J._LUT_CACHE) == J._LUT_CACHE_CAP  # eviction actually ran
    # the earliest keys were evicted, the latest survive
    assert (bytes(bits), bytes([0])) not in J._LUT_CACHE
    assert (bytes(bits), bytes([n_keys - 1])) in J._LUT_CACHE
    # re-requesting a cached key is a hit (same object back)...
    a = J._lut16(bits, [n_keys - 1])
    b = J._lut16(bits, [n_keys - 1])
    assert a is b
    # ...and a hit REFRESHES recency (LRU, not FIFO): touch the oldest
    # surviving key, insert fresh keys to evict all its cohort, and it
    # must still be cached
    oldest = n_keys - J._LUT_CACHE_CAP
    J._lut16(bits, [oldest])
    for sym in range(n_keys, n_keys + J._LUT_CACHE_CAP - 1):
        J._lut16(bits, [sym])
    assert (bytes(bits), bytes([oldest])) in J._LUT_CACHE


def test_destuff_segments_roundtrip_many_restarts():
    """Restart-marker segmentation + 0xFF00 destuffing across adversarial
    content: images whose entropy stream is dense in 0xFF bytes (high
    quality, noisy) must decode identically through the DC walk at every
    restart interval."""
    from kafka_connect_s3_ray.functions.jpeg import (decode_jpeg,
                                                     decode_jpeg_luma_dc,
                                                     encode_jpeg)

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (64, 72, 3)).astype(np.uint8)
    base = None
    for ri in (0, 1, 2, 7):
        jp = encode_jpeg(img, quality=95, restart_interval=ri)
        th = decode_jpeg_luma_dc(jp)
        full = decode_jpeg(jp)  # the slow reference walks the same stream
        assert th.shape == (8, 9)
        if base is None:
            base = th
        else:
            # restart markers change framing, not content: DC planes equal
            np.testing.assert_allclose(th, base, atol=1e-4)
        y = full.astype(np.float64) @ [0.299, 0.587, 0.114]
        bm = y.reshape(8, 8, 9, 8).mean(axis=(1, 3))
        assert np.abs(th - bm).max() <= 2.5


def test_lut_huffman_equals_dict_walk_on_random_tables():
    """The 16-bit-LUT reader and the reference dict-walk decoder must agree
    symbol-for-symbol on RANDOM canonical Huffman tables — the invariant the
    fast DC path rests on. We encode random symbol streams with the
    canonical codes and decode them back through the LUT."""
    from kafka_connect_s3_ray.functions.jpeg import _canonical_codes, _lut16

    rng = np.random.default_rng(31)
    for trial in range(10):
        # random valid BITS shape: distribute n_syms codes over lengths
        # 2..12 such that the Kraft sum stays <= 1 (build greedily)
        bits = [0] * 16
        vals = []
        budget = 1.0
        next_sym = 0
        for ln in range(2, 13):
            cap = int(budget / (2.0 ** -ln))
            take = int(rng.integers(0, min(cap, 5) + 1))
            bits[ln - 1] = take
            budget -= take * (2.0 ** -ln)
            for _ in range(take):
                vals.append(next_sym)
                next_sym += 1
        if not vals:
            continue
        codes = _canonical_codes(bits, vals)
        lut = _lut16(bits, vals)
        # random symbol stream -> bit string -> LUT decode
        stream = rng.choice(vals, size=50)
        acc, n = 0, 0
        for s in stream:
            code, ln = codes[int(s)]
            acc = (acc << ln) | code
            n += ln
        # pad to a whole number of bits for the reader (1-bits, like T.81)
        pad = (-n) % 8
        acc = (acc << pad) | ((1 << pad) - 1)
        n += pad
        decoded = []
        while len(decoded) < len(stream):
            peek = (acc >> (n - 16)) & 0xFFFF if n >= 16 else \
                (acc << (16 - n)) & 0xFFFF
            e = lut[peek]
            assert e != 0, "LUT missed a valid code"
            ln = e & 31
            decoded.append(e >> 5)
            n -= ln
            acc &= (1 << max(n, 0)) - 1 if n > 0 else 0
        np.testing.assert_array_equal(np.array(decoded), stream)
