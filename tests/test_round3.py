"""Round-3 additions: IVF index file rotation + sub-splits, archive
start_marker partial replay, vacuum tmp sweep, delta metrics accuracy."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def test_ivf_index_file_rotation_and_subsplits(tmp_path):
    """A dense cluster rotates to multiple part files at max_file_rows, and
    sub_splits shards the write across independent tasks — query results are
    identical to the single-file layout in both cases."""
    from kafka_connect_s3_ray.functions.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    emb = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = emb.to_pandas()
    queries = np.stack(pdf["embedding"].head(3).to_list()).astype(np.float64)

    base = str(tmp_path / "ivf_base")
    build_ivf_index(emb, base, n_clusters=4)
    want = ivf_topk_indexed(base, queries, k=5, nprobe=4)

    rot = str(tmp_path / "ivf_rot")
    build_ivf_index(emb, rot, n_clusters=4, max_file_rows=40)
    # 500 vectors / 4 clusters => ~125 rows per cluster => >=2 files each
    per_cluster = [len(glob.glob(os.path.join(d, "*.parquet")))
                   for d in sorted(glob.glob(os.path.join(rot, "cluster=*")))]
    assert max(per_cluster) > 1
    got = ivf_topk_indexed(rot, queries, k=5, nprobe=4)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))

    sub = str(tmp_path / "ivf_sub")
    build_ivf_index(emb, sub, n_clusters=4, max_file_rows=40, sub_splits=2)
    subs = {os.path.basename(f).split("-")[1]
            for f in glob.glob(os.path.join(sub, "cluster=*", "*.parquet"))}
    assert subs == {"0000", "0001"}
    got2 = ivf_topk_indexed(sub, queries, k=5, nprobe=4)
    pd.testing.assert_frame_equal(got2.reset_index(drop=True),
                                  want.reset_index(drop=True))
    # no _sub bookkeeping column leaks into the persisted files
    import pyarrow.parquet as pq

    f0 = sorted(glob.glob(os.path.join(sub, "cluster=*", "*.parquet")))[0]
    assert "_sub" not in pq.read_schema(f0).names


def test_read_archive_start_marker_partial_replay(tmp_path):
    """s3.start.marker parity (source/.../S3SourceConfig.java:9,
    S3FilesReader.java:131,153): listing begins strictly AFTER the given
    archive-relative key — files at or before the marker are never read."""
    from kafka_connect_s3_ray.sources.archive import archive_records, read_archive

    rows = pa.table({
        "partition": pa.array([0] * 40, pa.int32()),
        "offset": pa.array(list(range(40)), pa.int64()),
        "key": pa.array([b"k"] * 40, pa.binary()),
        "value": pa.array([b"v" * 50] * 40, pa.binary()),
    })
    out = str(tmp_path / "arc")
    archive_records(ray.data.from_arrow(rows), out, topic="t",
                    file_threshold=500)  # rotates into ~5 data files

    full = read_archive(out, topic="t").to_pandas()
    assert sorted(full["offset"]) == list(range(40))

    # marker at the second data file: replay starts at the THIRD (strictly
    # after), exactly like listObjectsV2 startAfter
    marker = "1970-01-01/t-00000-000000000009.gz"
    part = read_archive(out, topic="t", start_marker=marker).to_pandas()
    assert part["offset"].min() == 18
    assert sorted(part["offset"]) == list(range(18, 40))

    # marker between two keys (not an existing file) also works
    part2 = read_archive(out, topic="t",
                         start_marker="1970-01-01/t-00000-000000000010").to_pandas()
    assert part2["offset"].min() == 18

    # marker past every file => empty replay
    assert read_archive(out, topic="t", start_marker="1970-01-02/").count() == 0


def test_ranked_and_bitmap_jaccard_match_flat_kernel():
    """The rank-composite kernel and the bitmap popcount kernel must agree
    exactly with the reference lexsort kernel on random sets (including
    empty sets and identical pairs)."""
    from kafka_connect_s3_ray.functions.dedup import (
        _batch_jaccard_flat,
        _batch_jaccard_ranked,
        _bitmap_inter,
        _flat_gather,
        _rank_bitmaps,
    )

    rng = np.random.default_rng(11)
    n_docs, npool = 60, 500
    sets = [np.unique(rng.integers(0, npool, rng.integers(0, 40)))
            for _ in range(n_docs)]
    sets[3] = np.empty(0, np.int64)  # empty set edge
    sets[5] = np.unique(rng.integers(0, npool, 25))  # guaranteed non-empty
    lens = np.array([len(s) for s in sets], np.int64)
    flat = (np.concatenate(sets) if lens.sum() else np.empty(0, np.int64))
    starts = np.cumsum(lens) - lens

    npairs = 300
    li = rng.integers(0, n_docs, npairs)
    ri = rng.integers(0, n_docs, npairs)
    li[0] = ri[0] = 5  # identical pair => jaccard 1.0
    llen, rlen = lens[li], lens[ri]

    # reference: flat lexsort kernel over uint64 "hashes" (= pool values)
    want = _batch_jaccard_flat(
        _flat_gather(flat.astype(np.uint64), starts[li], llen), llen,
        _flat_gather(flat.astype(np.uint64), starts[ri], rlen), rlen)

    got_ranked = _batch_jaccard_ranked(
        _flat_gather(flat.astype(np.int32), starts[li], llen), llen,
        _flat_gather(flat.astype(np.int32), starts[ri], rlen), rlen, npool)
    np.testing.assert_allclose(got_ranked, want)

    bm = _rank_bitmaps(lens, flat, npool)
    inter = _bitmap_inter(bm, li, ri)
    union = llen + rlen - inter
    got_bm = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    np.testing.assert_allclose(got_bm, want)
    assert got_bm[0] == 1.0


def test_fused_chain_broadcast_verify_matches_exchange_path():
    """The corpus-broadcast verify (bitmap or ranked kernel) must produce
    exactly the same verified pairs as the partitioned payload-exchange path
    (forced via corpus_broadcast_bytes=0)."""
    from kafka_connect_s3_ray.functions.dedup import minhash_near_dup_verified

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    a = minhash_near_dup_verified(docs, threshold=0.6).to_pandas()
    b = minhash_near_dup_verified(docs, threshold=0.6,
                                  corpus_broadcast_bytes=0).to_pandas()
    key = ["left_id", "right_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_ngram_jaccard_pairs_semantics():
    """Planted bigram near-dups recovered with exact jaccard; docs with <n
    words never pair; the exact-path doc cap raises with guidance."""
    import pytest as _pytest

    from kafka_connect_s3_ray.functions.dedup import ngram_jaccard_pairs

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",   # near-dup of 1
            "completely different words entirely here now",
            "one",                                            # <2 words: no grams
            None,                                             # null: no grams
        ],
    })
    out = ngram_jaccard_pairs(ray.data.from_pandas(docs), n=2,
                              threshold=0.3).to_pandas()
    assert list(zip(out["left_id"], out["right_id"])) == [(1, 2)]
    # doc1: 8 bigrams, doc2: 8, shared: 7 ("lazy dog" vs "lazy cat" differ)
    assert abs(out["jaccard"].iloc[0] - 7 / 9) < 1e-12

    with _pytest.raises(ValueError, match="capped"):
        big = pd.DataFrame({"doc_id": np.arange(30), "text": ["a b c"] * 30})
        ngram_jaccard_pairs(ray.data.from_pandas(big), exact_cap=10)
