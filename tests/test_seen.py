"""Persisted seen-content index (`functions/seen.py`): build / filter /
update lifecycle, bucket-pruned reads, rebuild invalidation, NULL-text
contract, dtype preservation through the union exchange."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from kafka_connect_s3_ray.functions.seen import (
    build_seen_index,
    filter_unseen,
    update_seen_index,
)


def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))


def _hist(n=60):
    return _docs([(i, f"history document number {i} content") for i in range(n)])


def test_build_filter_update_lifecycle(ray_session, tmp_path):
    idx = str(tmp_path / "seen")
    assert build_seen_index(_hist(), idx, n_buckets=8) == 60
    new = _docs([(100, "history document number 3 content"),   # seen
                 (101, "history document number 59 content"),  # seen
                 (102, "brand new content alpha"),
                 (103, "brand new content beta"),
                 (104, None)])
    out = filter_unseen(new, idx).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [102, 103, 104]
    assert out["doc_id"].dtype == np.int64          # survives the union
    assert list(out.columns) == ["doc_id", "text"]  # fingerprint dropped

    # remember the fresh batch; now only NULL text is still unseen
    update_seen_index(new, idx)
    out2 = filter_unseen(new, idx).to_pandas()
    assert out2["doc_id"].tolist() == [104]
    # appended parts are a NEW generation, base parts untouched
    gens = glob.glob(os.path.join(idx, "bucket=*", "part-g*.parquet"))
    assert gens and all("g000001" in g for g in gens)
    meta = json.load(open(os.path.join(idx, "seen_meta.json")))
    assert meta["generation"] == 1


def test_keep_nulls_false_drops_null_text(ray_session, tmp_path):
    idx = str(tmp_path / "seen")
    build_seen_index(_hist(10), idx, n_buckets=4)
    new = _docs([(1, "history document number 1 content"), (2, "fresh"),
                 (3, None)])
    out = filter_unseen(new, idx, keep_nulls=False).to_pandas()
    assert out["doc_id"].tolist() == [2]


def test_case_insensitive_match(ray_session, tmp_path):
    """The fingerprint is md5(lower(text)) — a case variant IS seen."""
    idx = str(tmp_path / "seen")
    build_seen_index(_docs([(1, "Hello World Text")]), idx, n_buckets=4)
    new = _docs([(2, "hello world text"), (3, "HELLO WORLD TEXT"),
                 (4, "hello world text!")])
    out = filter_unseen(new, idx).to_pandas()
    assert out["doc_id"].tolist() == [4]


def test_empty_index_and_no_overlap_pass_everything(ray_session, tmp_path):
    idx = str(tmp_path / "seen")
    build_seen_index(_docs([]), idx, n_buckets=4)
    new = _docs([(1, "anything"), (2, None)])
    out = filter_unseen(new, idx).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2]


def test_rebuild_invalidates_previous_contents(ray_session, tmp_path):
    idx = str(tmp_path / "seen")
    build_seen_index(_docs([(1, "old corpus line")]), idx, n_buckets=4)
    build_seen_index(_docs([(2, "new corpus line")]), idx, n_buckets=4)
    out = filter_unseen(_docs([(3, "old corpus line"),
                               (4, "new corpus line")]), idx).to_pandas()
    assert out["doc_id"].tolist() == [3]  # old content forgotten
    # no stale generation files survive a rebuild
    assert not glob.glob(os.path.join(idx, "bucket=*", "part-g*.parquet"))


def test_bucket_pruning_reads_only_hit_buckets(ray_session, tmp_path):
    """A single-doc batch must hit exactly one bucket dir (file-level
    pruning — the property that keeps per-batch I/O O(batch), not
    O(index))."""
    from kafka_connect_s3_ray.functions import seen as seen_mod

    idx = str(tmp_path / "seen")
    build_seen_index(_hist(200), idx, n_buckets=16)
    probe = _docs([(999, "history document number 7 content")])

    read_dirs = []
    orig = seen_mod.ray.data.read_parquet

    def spy(files, **kw):
        read_dirs.extend({os.path.basename(os.path.dirname(f)) for f in files})
        return orig(files, **kw)

    seen_mod.ray.data.read_parquet = spy
    try:
        out = filter_unseen(probe, idx).to_pandas()
    finally:
        seen_mod.ray.data.read_parquet = orig
    assert out.empty                      # the probe IS seen
    assert len(set(read_dirs)) == 1       # exactly one bucket dir read


def test_unreadable_index_fails_loudly(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError):
        filter_unseen(_docs([(1, "x")]), str(tmp_path / "missing"))


def test_seen_cli_roundtrip(tmp_path):
    """seen-build / seen-filter --update drive the ingest-then-remember
    loop end to end through the CLI (own Ray session per invocation)."""
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    hist = tmp_path / "hist.parquet"
    new = tmp_path / "new.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(30), pa.int64()),
        "text": pa.array([f"cli history {i}" for i in range(30)],
                         pa.string())}), hist)
    pq.write_table(pa.table({
        "doc_id": pa.array([100, 101, 102], pa.int64()),
        "text": pa.array(["cli history 5", "cli fresh", None],
                         pa.string())}), new)

    def run(*argv):
        p = subprocess.run([sys.executable, "-m", "kafka_connect_s3_ray",
                            *argv], capture_output=True, text=True,
                           cwd="/root/repo", timeout=300)
        assert p.returncode == 0, p.stderr[-2000:]
        return json.loads(p.stdout.strip().splitlines()[-1])

    b = run("seen-build", "--docs", str(hist), "--index",
            str(tmp_path / "idx"), "--buckets", "4")
    assert b["fingerprints"] == 30
    f1 = run("seen-filter", "--docs", str(new), "--index",
             str(tmp_path / "idx"), "--out", str(tmp_path / "unseen"),
             "--update")
    assert f1["incoming"] == 3 and f1["unseen"] == 2  # fresh + NULL
    f2 = run("seen-filter", "--docs", str(new), "--index",
             str(tmp_path / "idx"))
    assert f2["unseen"] == 1  # only the NULL row stays unseen
