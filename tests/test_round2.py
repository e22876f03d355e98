"""Round-2 hardening: delta-aware streaming merge, task-side compaction reads,
W4 grace flush in tail mode, coarse-bucket hash join, exact/dense-bucket
embedding near-dup, vectorized + partitioned jaccard verify, archive bridge
schema-evolution robustness, IVF empty-block guard."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from kafka_connect_s3_ray.pipelines.upsert import (
    _commit_partition,
    compact_partitions,
    lake_table,
    run_upsert,
)
from kafka_connect_s3_ray.synth import oracle_apply, synth_changelog, synth_lake, write_fixture

P = 4


# ---------------------------------------------------------------------------
# delta-aware streaming merge (bounded memory stays available in delta mode)
# ---------------------------------------------------------------------------

def _sorted_lake(n_conv=150, seed=7):
    return synth_lake(n_conv, seed=seed).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )


def test_streaming_commit_with_pending_deltas(tmp_path):
    lake = _sorted_lake()
    events = synth_changelog(150, 2400, seed=7, num_partitions=1)
    half = len(events) // 2
    ev1, ev2 = events.slice(0, half), events.slice(half)
    wm1 = int(pa.compute.max(ev1.column("offset")).as_py())
    lf = str(tmp_path / "lake.parquet")
    pq.write_table(lake, lf)
    target = lake.schema

    # round 1: merge-on-read delta commit -> pending delta file
    d = _commit_partition(0, ev1, [lf], -1, str(tmp_path / "out"), target,
                          commit_mode="delta")
    delta_path = d.column("path")[0].as_py()
    assert os.path.basename(delta_path).startswith("delta-")
    files = [lf, delta_path]

    # round 2 rewrite with pending deltas: in-memory vs streaming paths agree
    mem = _commit_partition(0, ev2, files, wm1, str(tmp_path / "mem"), target,
                            streaming_threshold_rows=10**9)
    stream = _commit_partition(0, ev2, files, wm1, str(tmp_path / "stream"), target,
                               streaming_threshold_rows=0)
    # the streaming writer always names files with a -NNNN sequence suffix —
    # proof the bounded-memory path actually ran despite the pending delta
    assert "-0000.parquet" in stream.column("path")[0].as_py()
    t_mem = pq.read_table(mem.column("path")[0].as_py().split(";")[0])
    t_str = pa.concat_tables(
        [pq.read_table(f) for f in stream.column("path")[0].as_py().split(";")]
    )
    assert t_mem.equals(t_str)
    # and both equal the naive oracle over lake + all events
    exp = oracle_apply(lake, events)
    got = t_str.to_pandas()[exp.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)


# ---------------------------------------------------------------------------
# compaction: subset fold + delta reads inside the task (not on the driver)
# ---------------------------------------------------------------------------

@pytest.fixture()
def delta_rounds(tmp_path):
    root = str(tmp_path)
    fx = write_fixture(root, n_conv=60, n_events=1200, num_partitions=P,
                       files_per_partition=2)
    per_part = {
        p: sorted(glob.glob(os.path.join(fx["changelog_dir"], f"partition={p}", "*.parquet")))
        for p in range(P)
    }
    out, mpath = os.path.join(root, "out"), os.path.join(root, "m.json")
    for i in range(2):
        files = [fs[i] for fs in per_part.values() if i < len(fs)]
        m = run_upsert(files, out, mpath, lake_dir=fx["lake_dir"],
                       num_partitions=P, commit_mode="delta")
    return {"root": root, "out": out, "mpath": mpath, "m": m, **fx}


def test_compact_partitions_subset(delta_rounds):
    m = delta_rounds["m"]
    assert max(m.delta_counts().values()) == 2
    before = lake_table(m)
    m2 = compact_partitions(delta_rounds["mpath"], delta_rounds["out"],
                            partitions={0, 1})
    counts = m2.delta_counts()
    assert counts.get(0, 0) == 0 and counts.get(1, 0) == 0
    assert counts.get(2, 0) == 2 and counts.get(3, 0) == 2
    assert lake_table(m2).equals(before)  # fold changes layout, not content
    m3 = compact_partitions(delta_rounds["mpath"], delta_rounds["out"])
    assert max(m3.delta_counts().values(), default=0) == 0
    assert lake_table(m3).equals(before)


def test_compact_partitions_driver_reads_metadata_only(delta_rounds, monkeypatch):
    """The driver loop must never read delta CONTENTS (pq.read_table) — only
    schemas; the fold task reads the files on the worker."""
    import kafka_connect_s3_ray.pipelines.upsert as up

    calls = []
    real = pq.read_table
    monkeypatch.setattr(up.pq, "read_table",
                        lambda *a, **k: (calls.append(a), real(*a, **k))[1])
    compact_partitions(delta_rounds["mpath"], delta_rounds["out"])
    # monkeypatch only affects the driver process; worker tasks import the
    # real module — zero driver-side content reads proves the move
    assert calls == []


# ---------------------------------------------------------------------------
# W4: wall-time flush + grace for idle partitions in tail mode
# ---------------------------------------------------------------------------

def test_tail_grace_flush_idle_partition(tmp_path):
    from kafka_connect_s3_ray.pipelines.tail import tail_changelog

    root = str(tmp_path)
    fx = write_fixture(root, n_conv=60, n_events=1200, num_partitions=P)
    out, mpath = os.path.join(root, "out"), os.path.join(root, "m.json")
    seen = []

    def on_round(i, m):
        seen.append({p: c for p, c in m.delta_counts().items() if c})

    m = tail_changelog(
        fx["changelog_dir"], out, mpath, lake_dir=fx["lake_dir"],
        num_partitions=P, commit_mode="delta", max_rounds=4,
        poll_interval_s=0.0, sleep=lambda s: None, on_round=on_round,
        flush_interval_rounds=2, grace_rounds=1,
    )
    # round 1 buffered deltas; rounds 2-3 are idle no-ops (still pending);
    # round 4 (= 1 + interval + grace) grace-flushes every idle partition
    assert seen[0] and max(seen[0].values()) == 1
    assert seen[2]  # still pending before the grace deadline
    assert not seen[3], f"deltas survived the grace flush: {seen[3]}"
    exp = oracle_apply(fx["lake"], fx["events"])
    got = lake_table(m).to_pandas()[exp.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)


# ---------------------------------------------------------------------------
# coarse-bucket hash join
# ---------------------------------------------------------------------------

def test_hash_join_shared_keys_and_left():
    from kafka_connect_s3_ray.stages.joins import hash_join

    left = pa.table({"user_id": pa.array([1, 1, 2, 3], pa.int64()),
                     "v": pa.array([10.0, 11.0, 20.0, 30.0])})
    right = pa.table({"user_id": pa.array([1, 2, 4], pa.int64()),
                      "seg": ["a", "b", "c"]})
    lds, rds = ray.data.from_arrow(left), ray.data.from_arrow(right)
    inner = hash_join(lds, rds, on="user_id", num_partitions=3).to_pandas()
    exp = left.to_pandas().merge(right.to_pandas(), on="user_id")
    pd.testing.assert_frame_equal(
        inner.sort_values(["user_id", "v"]).reset_index(drop=True),
        exp.sort_values(["user_id", "v"]).reset_index(drop=True),
    )
    assert inner["user_id"].dtype == np.int64  # null-fill must not degrade ints
    lj = hash_join(lds, rds, on="user_id", join_type="left",
                   num_partitions=3).to_pandas()
    assert len(lj) == 4 and lj[lj["user_id"] == 3]["seg"].isna().all()


def test_hash_join_string_keys_and_collision_rename():
    from kafka_connect_s3_ray.stages.joins import hash_join

    left = pa.table({"k": ["a", "b", "c", "a"], "v": pa.array([1, 2, 3, 4], pa.int64())})
    right = pa.table({"kk": ["a", "c"], "v": pa.array([100, 300], pa.int64())})
    out = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    on="k", right_on="kk", num_partitions=2).to_pandas()
    assert set(out.columns) == {"k", "v", "kk", "v_right"}
    assert len(out) == 3
    assert set(zip(out["k"], out["v_right"])) == {("a", 100), ("c", 300)}
    assert out["v"].dtype == np.int64 and out["v_right"].dtype == np.int64


# ---------------------------------------------------------------------------
# embedding near-dup: exact path + dense-bucket LSH
# ---------------------------------------------------------------------------

def _emb_ds(n=300, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim))
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": list(mat)})


def test_embedding_exact_matches_numpy():
    from kafka_connect_s3_ray.functions.dedup import embedding_near_dup

    pdf = _emb_ds()
    ds = ray.data.from_pandas(pdf)
    got = embedding_near_dup(ds, threshold=0.5, method="exact").to_pandas()
    mat = np.stack(pdf["embedding"].to_list())
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sim = mat @ mat.T
    li, ri = np.triu_indices(len(mat), k=1)
    keep = sim[li, ri] >= 0.5
    exp = set(zip(li[keep], ri[keep]))
    assert set(zip(got["left_id"], got["right_id"])) == exp
    assert len(got) == len(exp) > 0


def test_embedding_lsh_dense_bucket_bounded():
    """A degenerate cluster (hundreds of near-identical vectors: signs never
    diverge, so re-splitting can't help) must still finish with ALL its pairs
    via the chunked-matmul fallback — bounded memory, exact within-bucket."""
    from kafka_connect_s3_ray.functions.dedup import embedding_near_dup

    rng = np.random.default_rng(9)
    base = rng.standard_normal(16)
    dense = base + rng.standard_normal((400, 16)) * 1e-4  # near-identical
    other = rng.standard_normal((100, 16))
    pdf = pd.DataFrame({
        "vec_id": np.arange(500, dtype=np.int64),
        "embedding": list(np.vstack([dense, other])),
    })
    ds = ray.data.from_pandas(pdf)
    got = embedding_near_dup(ds, threshold=0.999, method="lsh",
                             bucket_cap=64).to_pandas()
    found = set(zip(got["left_id"], got["right_id"]))
    expect = {(i, j) for i in range(400) for j in range(i + 1, 400)}
    assert expect <= found  # every within-cluster pair survives the cap


def test_embedding_lsh_recursive_split_keeps_separable_pairs():
    """Distinct planted duplicate groups must survive the recursive re-split
    of an over-cap bucket (the groups' signs diverge on extra planes)."""
    from kafka_connect_s3_ray.functions.dedup import embedding_near_dup

    rng = np.random.default_rng(11)
    groups = []
    ids = []
    for g in range(30):
        v = rng.standard_normal(16)
        groups.append(np.vstack([v, v * 1.0000001]))  # one dup pair per group
        ids.extend([2 * g, 2 * g + 1])
    pdf = pd.DataFrame({"vec_id": np.array(ids, np.int64),
                        "embedding": list(np.vstack(groups))})
    # n_planes=0 -> every vector in ONE bucket, far over cap -> must re-split
    ds = ray.data.from_pandas(pdf)
    got = embedding_near_dup(ds, threshold=0.999, method="lsh", n_planes=0,
                             bucket_cap=8).to_pandas()
    found = set(zip(got["left_id"], got["right_id"]))
    planted = {(2 * g, 2 * g + 1) for g in range(30)}
    assert planted <= found


# ---------------------------------------------------------------------------
# jaccard verify: vectorized kernel + partitioned-join path
# ---------------------------------------------------------------------------

def test_batch_jaccard_kernel_matches_reference():
    from kafka_connect_s3_ray.functions.dedup import _batch_jaccard

    rng = np.random.default_rng(3)
    lsets, rsets, exp = [], [], []
    for _ in range(50):
        a = np.unique(rng.integers(0, 200, rng.integers(0, 40)).astype(np.uint64))
        b = np.unique(rng.integers(0, 200, rng.integers(0, 40)).astype(np.uint64))
        lsets.append(a)
        rsets.append(b)
        inter = np.intersect1d(a, b, assume_unique=True).size
        union = a.size + b.size - inter
        exp.append(inter / union if union else 0.0)
    got = _batch_jaccard(lsets, rsets)
    assert np.allclose(got, exp)


def test_jaccard_joined_path_matches_broadcast():
    from kafka_connect_s3_ray.functions.dedup import (
        jaccard_verify,
        minhash_lsh_candidates,
    )

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.to_pandas().head(120)
    near = base.head(6).copy()
    near["doc_id"] = near["doc_id"] + 50_000
    near["text"] = near["text"] + " x"
    ds = ray.data.from_pandas(pd.concat([base, near], ignore_index=True))
    cand = minhash_lsh_candidates(ds)
    bro = jaccard_verify(cand, ds, threshold=0.6).to_pandas()
    joined = jaccard_verify(cand, ds, threshold=0.6,
                            broadcast_threshold=0).to_pandas()

    def canon(df):
        return (df[["left_id", "right_id", "jaccard"]]
                .sort_values(["left_id", "right_id"]).reset_index(drop=True))

    pd.testing.assert_frame_equal(canon(bro), canon(joined))
    assert len(bro) >= 6  # the planted near-dups verified


# ---------------------------------------------------------------------------
# archive bridge: schema evolution + third-party payload robustness
# ---------------------------------------------------------------------------

def test_encode_decode_preserves_extra_payload_columns():
    from kafka_connect_s3_ray.sources.changelog import (
        _decode_change_batch,
        encode_change_payload,
    )

    events = pa.table({
        "partition": pa.array([0, 0], pa.int32()),
        "offset": pa.array([0, 1], pa.int64()),
        "op": ["I", "U"],
        "conv_id": ["c1", "c2"],
        "turn_idx": pa.array([0, 1], pa.int32()),
        "role": ["user", None],
        "text": ["hello", "world"],
        "tool": [None, "search"],
        "ts": pa.array([1_700_000_000_000_000, None], pa.timestamp("us")),
        "meta": ["m1", None],  # evolved column beyond the fixed contract
    })
    recs = encode_change_payload(events)
    assert b"meta" in recs.column("value")[0].as_py()
    back = _decode_change_batch(recs)
    assert "meta" in back.column_names
    assert back.column("meta").to_pylist() == ["m1", None]
    assert back.column("text").to_pylist() == ["hello", "world"]


def test_decode_payloads_with_omitted_optional_keys():
    """Third-party archives may omit optional keys entirely rather than null
    them — decode must null-fill, not crash."""
    from kafka_connect_s3_ray.sources.changelog import _decode_change_batch

    vals = [json.dumps({"op": "I", "conv_id": "c", "turn_idx": i}).encode()
            for i in range(3)]
    batch = pa.table({
        "partition": pa.array([0, 0, 0], pa.int32()),
        "offset": pa.array([0, 1, 2], pa.int64()),
        "key": pa.array([b"c"] * 3, pa.binary()),
        "value": pa.array(vals, pa.binary()),
    })
    out = _decode_change_batch(batch)
    assert out.column("role").null_count == 3
    assert out.column("text").null_count == 3
    assert out.column("tool").null_count == 3
    assert out.column("ts").null_count == 3
    assert out.column("conv_id").to_pylist() == ["c"] * 3


# ---------------------------------------------------------------------------
# IVF: empty input block must not crash the assignment stage
# ---------------------------------------------------------------------------

def test_ivf_topk_with_empty_block():
    from kafka_connect_s3_ray.functions.similarity import ivf_topk

    rng = np.random.default_rng(2)
    pdf = pd.DataFrame({"vec_id": np.arange(64, dtype=np.int64),
                        "embedding": list(rng.standard_normal((64, 8)))})
    empty = pdf.head(0)
    ds = ray.data.from_pandas([pdf, empty])  # second block is zero-row
    out = ivf_topk(ds, np.stack(pdf["embedding"].head(2).to_list()), k=3,
                   n_clusters=4, nprobe=4)
    assert len(out) == 6


def test_hash_join_left_consistent_block_dtypes():
    """Left-join nulls must not give integer right columns float64 blocks in
    unmatched buckets and int64 blocks elsewhere — every non-empty output
    block carries the same Arrow schema (int64 with nulls)."""
    from kafka_connect_s3_ray.stages.joins import hash_join

    left = pa.table({"k": pa.array(range(1, 9), pa.int64())})
    right = pa.table({"k": pa.array([1, 2], pa.int64()),
                      "rv": pa.array([10, 20], pa.int64())})
    out = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    on="k", join_type="left", num_partitions=4)
    blocks = [b for b in out.iter_batches(batch_format="pyarrow") if len(b)]
    assert blocks
    for b in blocks:
        assert b.schema.field("rv").type == pa.int64(), b.schema
    merged = pa.concat_tables(blocks)
    assert merged.column("rv").null_count == 6


def test_hash_join_with_empty_input_block_keeps_dtypes():
    """An empty input block must not inject a null-typed _side column and
    degrade integer columns to float64 (review finding: untyped literal
    arrays are null-typed for zero-row batches)."""
    from kafka_connect_s3_ray.stages.joins import hash_join

    ldf = pd.DataFrame({"k": np.arange(6, dtype=np.int64)})
    rdf = pd.DataFrame({"k": np.array([1, 2], np.int64),
                        "rv": np.array([10, 20], np.int64)})
    lds = ray.data.from_pandas([ldf, ldf.head(0)])  # second block zero-row
    out = hash_join(lds, ray.data.from_pandas(rdf), on="k",
                    num_partitions=3).to_pandas()
    assert out["rv"].dtype == np.int64
    assert set(zip(out["k"], out["rv"])) == {(1, 10), (2, 20)}


def test_encode_payload_null_timestamp_in_evolved_column():
    """pd.NaT / pd.NA in an evolved payload column must serialize as JSON
    null, not the strings 'NaT'/'<NA>'."""
    from kafka_connect_s3_ray.sources.changelog import (
        _decode_change_batch,
        encode_change_payload,
    )

    events = pa.table({
        "partition": pa.array([0, 0], pa.int32()),
        "offset": pa.array([0, 1], pa.int64()),
        "op": ["I", "I"],
        "conv_id": ["a", "b"],
        "turn_idx": pa.array([0, 0], pa.int32()),
        "role": ["user", "user"],
        "text": ["x", "y"],
        "tool": [None, None],
        "ts": pa.array([1_700_000_000_000_000] * 2, pa.timestamp("us")),
        "evolved_ts": pa.array([None, 1_700_000_000_000_000], pa.timestamp("us")),
        "evolved_n": pa.array([None, 7], pa.int64()),
    })
    recs = encode_change_payload(events)
    v0 = json.loads(recs.column("value")[0].as_py())
    assert v0["evolved_ts"] is None and v0["evolved_n"] is None
    back = _decode_change_batch(recs)
    assert back.column("evolved_n").to_pylist() == [None, 7]


def test_lang_id_null_text_is_und():
    from kafka_connect_s3_ray.functions.text import LanguageId

    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["the and of to in is that", None])})
    out = LanguageId()(batch)
    assert out.column("lang_pred").to_pylist() == ["en", "und"]


def test_ivf_persisted_index_matches_live_and_prunes(tmp_path):
    """build_ivf_index + ivf_topk_indexed: same results as the live ivf_topk
    (same centroids/seed), only probed clusters' files are read, and the
    index is byte-deterministic across rebuilds."""
    import hashlib

    from kafka_connect_s3_ray.functions.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
    )

    emb = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = emb.to_pandas()
    queries = np.stack(pdf["embedding"].head(3).to_list()).astype(np.float64)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_clusters=8)
    got = ivf_topk_indexed(idx, queries, k=5, nprobe=6)
    live = ivf_topk(emb, queries, k=5, n_clusters=8, nprobe=6)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[["query_id", "vec_id"]],
        live.reset_index(drop=True)[["query_id", "vec_id"]],
    )
    # layout: one dir per cluster; full probe reads every cluster = exhaustive
    cdirs = sorted(glob.glob(os.path.join(idx, "cluster=*")))
    assert len(cdirs) == 8
    full = ivf_topk_indexed(idx, queries, k=5, nprobe=8)
    from kafka_connect_s3_ray.functions.similarity import brute_force_topk

    exact = brute_force_topk(emb, queries, k=5)
    assert list(full["vec_id"]) == list(exact["vec_id"])
    # deterministic rebuild
    h1 = [hashlib.sha256(open(f, "rb").read()).hexdigest()
          for f in sorted(glob.glob(os.path.join(idx, "cluster=*", "*.parquet")))]
    build_ivf_index(emb, idx, n_clusters=8)
    h2 = [hashlib.sha256(open(f, "rb").read()).hexdigest()
          for f in sorted(glob.glob(os.path.join(idx, "cluster=*", "*.parquet")))]
    assert h1 == h2


# ---------------------------------------------------------------------------
# real (dependency-free) media codecs: WAV + PPM
# ---------------------------------------------------------------------------

def test_wav_and_ppm_roundtrip():
    from kafka_connect_s3_ray.functions.multimodal import (
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav,
    )

    t = np.arange(800)
    samples = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    back, rate = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000 and np.array_equal(back, samples)
    img = (np.arange(24 * 16 * 3) % 256).astype(np.uint8).reshape(24, 16, 3)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_real_media_features_and_resize():
    from kafka_connect_s3_ray.functions.multimodal import (
        MediaFeatureExtractor,
        Resizer,
        decode_ppm,
        synth_real_media,
    )

    media = synth_real_media(16)
    ds = ray.data.from_arrow(media)
    feats = ds.map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                           concurrency=2).to_pandas()
    assert len(feats) == 16
    # audio rows: feature[0] = duration_ms (real decode), feature[1] = RMS of
    # a sine = amp/sqrt(2) in (0.14, 0.65) for amp in (0.2, 0.9)
    audio = feats[feats["media_type"] == "audio"]
    durations = np.array([f[0] for f in audio["features"]])
    rms = np.array([f[1] for f in audio["features"]])
    exp_dur = audio["duration_ms"].to_numpy().astype(float)
    assert np.allclose(durations, exp_dur, atol=1.0)
    assert ((rms > 0.1) & (rms < 0.7)).all()
    # image rows: features reflect per-channel means (gradient ~ mid-gray)
    image = feats[feats["media_type"] == "image"]
    means = np.stack([np.array(f[:3]) for f in image["features"]])
    assert ((means > 0.2) & (means < 0.9)).all()

    # real resize: output parses in ITS OWN format with the target dims
    from kafka_connect_s3_ray.functions.jpeg import decode_jpeg
    from kafka_connect_s3_ray.functions.multimodal import decode_png

    resized = ds.map_batches(Resizer(target_w=8, target_h=6),
                             batch_format="pyarrow").to_pandas()
    seen_fmt = set()
    for _, row in resized[resized["media_type"] == "image"].iterrows():
        p = bytes(row["payload"])
        if p.startswith(b"\x89PNG"):
            img, fmt = decode_png(p), "png"
        elif p.startswith(b"\xff\xd8\xff"):
            img, fmt = decode_jpeg(p), "jpeg"
        else:
            img, fmt = decode_ppm(p), "ppm"
        seen_fmt.add(fmt)
        assert img.shape == (6, 8, 3)
        assert row["width"] == 8 and row["height"] == 6
    assert seen_fmt == {"ppm", "png", "jpeg"}  # all three real image codecs


def test_real_decoder_rejects_compressed():
    from kafka_connect_s3_ray.functions.multimodal import MediaFeatureExtractor

    ex = MediaFeatureExtractor(decoder="real")
    # MP3 stays the dependency seam; JPEG is now a real codec, so CORRUPT
    # JPEG/PNG payloads fail loudly as decode errors in real mode
    with pytest.raises(NotImplementedError):
        ex._features(b"ID3\x04 mp3 garbage")
    with pytest.raises(Exception):
        ex._features(b"\xff\xd8\xff\xe0 jpeg garbage")
    with pytest.raises(Exception):
        ex._features(b"\x89PNG\r\n\x1a\n garbage")


def test_hash_join_pandas_block_binary_and_left_string_schema():
    """Review regressions: (a) pandas-block datasets with bytes/object
    columns join without crashing (true Arrow type resolved from a block);
    (b) a left join whose buckets have zero right matches still emits
    string columns typed string (not null) in every block."""
    from kafka_connect_s3_ray.stages.joins import hash_join

    ldf = pd.DataFrame({"k": np.array([1, 2], np.int64),
                        "payload": [b"\xff\xfe", b"abc"]})
    rdf = pd.DataFrame({"k": np.array([1], np.int64), "s": ["x"]})
    out = hash_join(ray.data.from_pandas(ldf), ray.data.from_pandas(rdf),
                    on="k", num_partitions=3).to_pandas()
    assert out["payload"].tolist() == [b"\xff\xfe"]

    left = pa.table({"k": pa.array(range(8), pa.int64())})
    right = pa.table({"k": pa.array([0], pa.int64()), "s": ["hit"]})
    lj = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                   on="k", join_type="left", num_partitions=4)
    blocks = [b for b in lj.iter_batches(batch_format="pyarrow") if len(b)]
    for b in blocks:
        assert b.schema.field("s").type == pa.string(), b.schema
    merged = pa.concat_tables(blocks)
    assert merged.column("s").null_count == 7


def test_resizer_corrupt_ppm_falls_back():
    from kafka_connect_s3_ray.functions.multimodal import Resizer

    r = Resizer(target_w=4, target_h=4)
    batch = pa.table({"media_id": pa.array([1], pa.int64()),
                      "media_type": ["image"],
                      "payload": pa.array([b"P6 notreally an image"], pa.binary()),
                      "width": pa.array([0], pa.int32()),
                      "height": pa.array([0], pa.int32()),
                      "duration_ms": pa.array([0], pa.int32())})
    out = r(batch)  # must not raise; byte-subsample fallback
    assert len(out) == 1 and len(out.column("payload")[0].as_py()) > 0


def test_wav_features_zero_frames_no_nan():
    from kafka_connect_s3_ray.functions.multimodal import (
        MediaFeatureExtractor,
        encode_wav,
    )

    f = MediaFeatureExtractor()._features(encode_wav(np.array([], np.int16)))
    assert np.isfinite(f).all()


def test_ivf_rebuild_clears_stale_clusters(tmp_path):
    from kafka_connect_s3_ray.functions.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    rng = np.random.default_rng(4)
    big = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                        "embedding": list(rng.standard_normal((200, 8)))})
    idx = str(tmp_path / "ivf")
    build_ivf_index(ray.data.from_pandas(big), idx, n_clusters=8)
    # rebuild over a much smaller corpus: stale cluster files must vanish
    small = big.head(5)
    build_ivf_index(ray.data.from_pandas(small), idx, n_clusters=8)
    out = ivf_topk_indexed(idx, np.stack(small["embedding"].to_list()), k=3,
                           nprobe=8)
    assert set(out["vec_id"]) <= set(small["vec_id"])


def test_incremental_window_agg_across_rounds(tmp_path):
    """Round-by-round streaming window updates must equal one batch pass, and
    replaying a round must regenerate identical state bytes."""
    import hashlib

    from kafka_connect_s3_ray.stages.windows import (
        IncrementalWindowAgg,
        tumbling_window_agg,
    )

    events = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    full = tumbling_window_agg(events, key="user_id", ts="ts",
                               window_us=3_600_000_000, value="value").to_pandas()
    agg = IncrementalWindowAgg(str(tmp_path / "state"), key="user_id", ts="ts",
                               window_us=3_600_000_000, value="value")
    edf = events.to_pandas().sort_values("event_id")
    thirds = np.array_split(edf, 3)
    paths = [agg.update(ray.data.from_pandas(chunk.reset_index(drop=True)), i)
             for i, chunk in enumerate(thirds)]
    snap = agg.snapshot().to_pandas()

    def canon(df):
        df = df.copy()
        df["total_value"] = df["total_value"].round(6)
        return (df.sort_values(["user_id", "window"])
                [["user_id", "window", "n_events", "total_value"]]
                .reset_index(drop=True))

    pd.testing.assert_frame_equal(canon(snap), canon(full), check_dtype=False)
    # idempotent replay of the last round: byte-identical state file
    h1 = hashlib.sha256(open(paths[-1], "rb").read()).hexdigest()
    agg.update(ray.data.from_pandas(thirds[-1].reset_index(drop=True)), 2)
    h2 = hashlib.sha256(open(paths[-1], "rb").read()).hexdigest()
    assert h1 == h2


def test_range_join_colliding_interval_column_names():
    """A left payload column named like the right interval column must not
    shadow it — the filter resolves the renamed right column."""
    from kafka_connect_s3_ray.stages.joins import range_join

    left = pa.table({"k": pa.array([1, 1], pa.int64()),
                     "t": pa.array([5, 50], pa.int64()),
                     "win_start": pa.array([999, 999], pa.int64())})  # decoy
    right = pa.table({"k": pa.array([1], pa.int64()),
                      "win_start": pa.array([0], pa.int64()),
                      "win_end": pa.array([10], pa.int64()),
                      "rid": pa.array([7], pa.int64())})
    out = range_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     key="k", ts="t", start="win_start", end="win_end",
                     num_partitions=2).to_pandas()
    # only t=5 is inside [0, 10); the decoy left win_start=999 must not be used
    assert out["t"].tolist() == [5] and out["rid"].tolist() == [7]


def test_incremental_window_state_round_parsing_and_empty_first_round(tmp_path):
    from kafka_connect_s3_ray.stages.windows import IncrementalWindowAgg

    agg = IncrementalWindowAgg(str(tmp_path / "s"), key="user_id", ts="ts",
                               window_us=10, value="value")
    # round ids beyond 6 digits parse and order numerically
    assert agg._round_of("state-1000000.parquet") == 1_000_000
    assert agg._round_of("state-000001.parquet") == 1
    # zero-event first round keeps the INPUT's key/value types (string key)
    empty = pd.DataFrame({"conv": pd.Series([], dtype=object),
                          "ts": pd.Series([], dtype=np.int64),
                          "value": pd.Series([], dtype=np.float64)})
    agg2 = IncrementalWindowAgg(str(tmp_path / "s2"), key="conv", ts="ts",
                                window_us=10, value="value")
    agg2.update(ray.data.from_pandas([empty]), 0)
    import pyarrow.parquet as pq

    st = pq.read_table(str(tmp_path / "s2" / "state-000000.parquet"))
    assert st.schema.field("conv").type == pa.string()
    # a later non-empty round merges cleanly against the typed empty state
    ev = pd.DataFrame({"conv": ["a", "a", "b"],
                       "ts": np.array([1, 12, 3], np.int64),
                       "value": [1.0, 2.0, 3.0]})
    agg2.update(ray.data.from_pandas(ev), 1)
    snap = agg2.snapshot().to_pandas().sort_values(["conv", "window"])
    assert snap["n_events"].sum() == 3


# ---------------------------------------------------------------------------
# schema evolution across partitions / mid-stream (review: data-loss paths)
# ---------------------------------------------------------------------------

def _change_tbl(part, offsets, convs, texts, meta=None):
    from kafka_connect_s3_ray.schema import CHANGE_SCHEMA

    n = len(offsets)
    cols = {
        "partition": pa.array([part] * n, pa.int32()),
        "offset": pa.array(offsets, pa.int64()),
        "op": pa.array(["I"] * n, pa.string()),
        "conv_id": pa.array(convs, pa.string()),
        "turn_idx": pa.array([0] * n, pa.int32()),
        "role": pa.array(["user"] * n, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array([None] * n, pa.string()),
        "ts": pa.array([1_700_000_000_000_000 + o for o in offsets],
                       pa.timestamp("us")),
    }
    if meta is not None:
        cols["meta"] = pa.array(meta, pa.string())
    return pa.table(cols)


def _conv_for_partition(p, P):
    from kafka_connect_s3_ray.stages.partitioner import assign_partitions

    i = 0
    while True:
        c = f"conv-ev-{i:04d}"
        if int(assign_partitions(np.array([c], object), P)[0]) == p:
            return c
        i += 1


def test_evolved_column_survives_rounds_touching_other_partitions(tmp_path):
    """A column that evolved in only SOME partitions must survive later
    rewrites of those partitions even when the new round's changelog lacks it
    (the target schema must union EVERY partition's current files)."""
    import pyarrow.parquet as pq

    from kafka_connect_s3_ray.pipelines.upsert import lake_table, run_upsert

    P = 2
    c0, c1 = _conv_for_partition(0, P), _conv_for_partition(1, P)
    log, out, mpath = str(tmp_path / "log"), str(tmp_path / "out"), str(tmp_path / "m.json")
    for p in range(P):
        os.makedirs(os.path.join(log, f"partition={p}"))

    def write_round(p, tbl, name):
        pq.write_table(tbl, os.path.join(log, f"partition={p}", name))

    # round 1: both partitions, base schema (no meta)
    write_round(0, _change_tbl(0, [0], [c0], ["zero"]), "log-000000000000.parquet")
    write_round(1, _change_tbl(1, [0], [c1], ["one"]), "log-000000000000.parquet")
    run_upsert(log, out, mpath, num_partitions=P)
    # round 2: only partition 1 evolves a 'meta' column
    write_round(1, _change_tbl(1, [1], [c1], ["one-v2"], meta=["M"]),
                "log-000000000001.parquet")
    run_upsert(log, out, mpath, num_partitions=P)
    # round 3: partition 1 again, WITHOUT meta in the changelog
    write_round(1, _change_tbl(1, [2], [c1 + "x"], ["other"]),
                "log-000000000002.parquet")
    m = run_upsert(log, out, mpath, num_partitions=P)
    t = lake_table(m).to_pandas().set_index("conv_id")
    assert "meta" in t.columns, "evolved column dropped by a later rewrite"
    assert t.loc[c1, "meta"] == "M"
    assert t.loc[c1, "text"] == "one-v2"


def test_mid_stream_evolution_within_one_round(tmp_path):
    """A round whose LATER changelog files carry an evolved column must not
    lose it to first-fragment schema inference."""
    import pyarrow.parquet as pq

    from kafka_connect_s3_ray.pipelines.upsert import lake_table, run_upsert

    P = 1
    c = _conv_for_partition(0, P)
    log, out, mpath = str(tmp_path / "log"), str(tmp_path / "out"), str(tmp_path / "m.json")
    os.makedirs(os.path.join(log, "partition=0"))
    pq.write_table(_change_tbl(0, [0], [c], ["old"]),
                   os.path.join(log, "partition=0", "log-000000000000.parquet"))
    pq.write_table(_change_tbl(0, [1], [c + "b"], ["new"], meta=["M2"]),
                   os.path.join(log, "partition=0", "log-000000000001.parquet"))
    m = run_upsert(log, out, mpath, num_partitions=P)
    t = lake_table(m).to_pandas().set_index("conv_id")
    assert "meta" in t.columns
    assert t.loc[c + "b", "meta"] == "M2"
    assert pd.isna(t.loc[c, "meta"])


def test_forced_copartitioned_mode_fails_loudly(tmp_path):
    from kafka_connect_s3_ray.pipelines.upsert import run_upsert

    bad = str(tmp_path / "notpartitioned")
    os.makedirs(bad)
    open(os.path.join(bad, "_SUCCESS"), "w").close()
    with pytest.raises(ValueError, match="copartitioned"):
        run_upsert(bad, str(tmp_path / "o"), str(tmp_path / "m.json"),
                   num_partitions=2, mode="copartitioned")


def test_hot_keys_bare_string_rejected(tmp_path):
    from kafka_connect_s3_ray.pipelines.upsert import run_upsert

    with pytest.raises(ValueError, match="bare string"):
        run_upsert(str(tmp_path / "log"), str(tmp_path / "o"),
                   str(tmp_path / "m.json"), num_partitions=2,
                   hot_keys="conv42")


def test_streaming_merge_rejects_unsorted_base():
    from kafka_connect_s3_ray.stages.merge import merge_sorted_stream
    from kafka_connect_s3_ray.synth import synth_changelog, synth_lake

    lake = synth_lake(50, seed=2)  # conv-sorted overall...
    # shuffle WITHIN the table but keep first/last rows in place so a
    # boundary-only check would pass
    df = lake.to_pandas()
    mid = df.iloc[1:-1].sample(frac=1.0, random_state=0)
    shuffled = pd.concat([df.iloc[:1], mid, df.iloc[-1:]])
    bad = pa.Table.from_pandas(shuffled, preserve_index=False)
    events = synth_changelog(50, 200, seed=2, num_partitions=1)
    with pytest.raises(ValueError, match="strictly key-ascending"):
        list(merge_sorted_stream(iter([bad]), events))
