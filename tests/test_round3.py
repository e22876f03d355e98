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
