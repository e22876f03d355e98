"""Regression tests for the late-round-4 review batch: empty-batch
featurize, id_col-parametrized spans output, int64 precision through the
seen anti-join, compaction meta truth, grace-clock validation, multi-scan
JPEG rejection, and the empty-group IVF kernel guard."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _docs(rows, id_col="doc_id"):
    return rd.from_arrow(pa.table({
        id_col: pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))


def test_sigs_from_sets_empty_batch():
    """A fully-filtered block featurizes to empty instead of IndexError
    (np.minimum.reduceat with starts=[0] over a width-0 array raises)."""
    from kafka_connect_s3_ray.functions.dedup import MinHasher

    h = MinHasher(num_perm=16, bands=4)
    sigs = h.sigs_from_sets(np.array([], np.uint64), np.array([], np.int64))
    assert sigs.shape == (16, 0)
    assert h.band_buckets(sigs).shape == (0,)


def test_near_seen_update_with_all_filtered_batch(ray_session, tmp_path):
    """filter-then-remember where the filter drops EVERYTHING: the update
    must index zero docs without crashing on the empty block."""
    from kafka_connect_s3_ray.functions.seen import (
        build_near_seen_index, filter_near_seen, update_near_seen_index)

    idx = str(tmp_path / "ns")
    hist = _docs([(i, f"shared boilerplate paragraph common to all {i % 2}")
                  for i in range(8)])
    build_near_seen_index(hist, idx)
    dup = _docs([(100, "shared boilerplate paragraph common to all 0")])
    surv = filter_near_seen(dup, idx, threshold=0.5).materialize()
    assert surv.count() == 0
    assert update_near_seen_index(surv, idx) == 0


def test_duplicate_spans_custom_id_col(ray_session):
    """The output surface carries the caller's id column name, and the
    remover keys its joins on it."""
    from kafka_connect_s3_ray.functions.spans import (
        duplicate_spans, remove_duplicate_spans)

    passage = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs([(1, f"start {passage} end"),
                  (2, f"other {passage} tail"),
                  (3, "completely unrelated text with no repeats at all ok")],
                 id_col="media_id")
    spans = duplicate_spans(docs, k=4, id_col="media_id").to_pandas()
    assert list(spans.columns) == ["media_id", "span_start", "span_end"]
    assert set(spans["media_id"]) == {1, 2}
    out = remove_duplicate_spans(docs, k=4, id_col="media_id").to_pandas()
    assert sorted(out["media_id"]) == [1, 2, 3]
    for t in out.loc[out["media_id"] != 3, "text_clean"]:
        assert "gamma" not in t


def test_filter_unseen_preserves_big_int64(ray_session, tmp_path):
    """doc ids above 2^53 survive the anti-join exactly (the pandas float64
    round-trip would silently round them)."""
    from kafka_connect_s3_ray.functions.seen import (
        build_seen_index, filter_unseen)

    idx = str(tmp_path / "seen")
    build_seen_index(_docs([(1, "old content")]), idx, n_buckets=4)
    big = (1 << 53) + 1
    out = filter_unseen(_docs([(big, "fresh content")]), idx).to_pandas()
    assert out["doc_id"].tolist() == [big]
    assert out["doc_id"].dtype == np.int64


def test_compact_seen_index_resets_meta_to_truth(ray_session, tmp_path):
    """Replaying the same update inflates the running meta count (the
    updater never sees the index side); compaction recomputes it."""
    from kafka_connect_s3_ray.functions.seen import (
        build_seen_index, compact_seen_index, update_seen_index)

    idx = str(tmp_path / "seen")
    batch = _docs([(i, f"document {i}") for i in range(20)])
    build_seen_index(batch, idx, n_buckets=4)
    update_seen_index(batch, idx)
    update_seen_index(batch, idx)
    meta = json.load(open(os.path.join(idx, "seen_meta.json")))
    assert meta["fingerprints"] == 60  # inflated running total
    compact_seen_index(idx)
    meta = json.load(open(os.path.join(idx, "seen_meta.json")))
    assert meta["fingerprints"] == 20  # the truth, recomputed
    assert meta["generation"] == 0


def test_tail_rejects_grace_on_wrong_clock(tmp_path):
    from kafka_connect_s3_ray.pipelines.tail import tail_changelog

    kw = dict(changelog_dir=str(tmp_path / "cl"),
              out_dir=str(tmp_path / "out"),
              manifest_path=str(tmp_path / "m.json"), max_rounds=0)
    with pytest.raises(ValueError, match="grace_ms requires"):
        tail_changelog(**kw, flush_interval_rounds=10, grace_ms=500.0)
    with pytest.raises(ValueError, match="grace_rounds requires"):
        tail_changelog(**kw, flush_interval_ms=500.0, grace_rounds=2)


def test_jpeg_rejects_multi_scan():
    """A spec-legal baseline stream with a single-component first scan of a
    3-component frame must refuse loudly, not decode a wrongly-tinted
    image."""
    from kafka_connect_s3_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    blob = encode_jpeg(img, quality=90)
    i = blob.find(b"\xff\xda")
    assert i > 0
    ln = int.from_bytes(blob[i + 2:i + 4], "big")
    body = blob[i + 4:i + 2 + ln]
    # rewrite the SOS header to code only the first component
    new_body = bytes([1]) + body[1:3] + body[-3:]
    new_sos = b"\xff\xda" + (len(new_body) + 2).to_bytes(2, "big") + new_body
    patched = blob[:i] + new_sos + blob[i + 2 + ln:]
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(patched)


def test_ivf_cluster_topk_empty_group():
    from kafka_connect_s3_ray.functions.similarity import _ivf_cluster_topk

    g = pa.table({"vec_id": pa.array([], pa.int64()),
                  "is_member": pa.array([], pa.bool_()),
                  "normed": pa.array([], pa.list_(pa.float64()))})
    out = _ivf_cluster_topk(g, k=3, id_col="vec_id")
    assert len(out) == 0
    assert out.schema.names == ["vec_id", "neighbor_id", "score"]
