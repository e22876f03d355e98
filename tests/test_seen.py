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


# --- near-dup tier ---------------------------------------------------------


def test_near_seen_equals_fused_chain_cross_pairs(ray_session, tmp_path):
    """The index probe must produce EXACTLY minhash_near_dup_verified over
    the full corpus restricted to cross pairs (same seed -> same bands ->
    same candidates -> same exact jaccard)."""
    from kafka_connect_s3_ray.functions.dedup import minhash_near_dup_verified
    from kafka_connect_s3_ray.functions.seen import (build_near_seen_index,
                                                     near_seen_pairs)

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).to_pandas()
    hist = docs[docs.doc_id % 2 == 0]
    new = docs[docs.doc_id % 2 == 1]
    idx = str(tmp_path / "near")
    build_near_seen_index(rd.from_pandas(hist), idx)
    got = (near_seen_pairs(rd.from_pandas(new), idx, threshold=0.6)
           .to_pandas().sort_values(["new_id", "hist_id"])
           .reset_index(drop=True))

    ref = minhash_near_dup_verified(rd.from_pandas(docs),
                                    threshold=0.6).to_pandas()
    cross = ref[(ref.left_id % 2) != (ref.right_id % 2)].copy()
    cross["new_id"] = np.where(cross.left_id % 2 == 1,
                               cross.left_id, cross.right_id)
    cross["hist_id"] = np.where(cross.left_id % 2 == 0,
                                cross.left_id, cross.right_id)
    cross = (cross[["new_id", "hist_id", "jaccard"]]
             .sort_values(["new_id", "hist_id"]).reset_index(drop=True)
             .astype({"new_id": "int64", "hist_id": "int64"}))
    assert len(got) > 0, "fixture must have cross-parity near-dups"
    pd.testing.assert_frame_equal(got, cross)


def test_filter_near_seen_drops_matched_new_docs(ray_session, tmp_path):
    from kafka_connect_s3_ray.functions.seen import (build_near_seen_index,
                                                     filter_near_seen,
                                                     near_seen_pairs)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "continues running through the quiet forest for a while longer")
    hist = _docs([(2 * i, f"{base} variant {i}") for i in range(10)])
    idx = str(tmp_path / "near")
    build_near_seen_index(hist, idx)
    new = _docs([(101, f"{base} variant 3"),       # near/exact dup of hist
                 (103, "completely different short text about nothing")])
    pairs = near_seen_pairs(new, idx, threshold=0.6).to_pandas()
    assert 101 in set(pairs["new_id"]) and 103 not in set(pairs["new_id"])
    surv = filter_near_seen(new, idx, threshold=0.6).to_pandas()
    assert surv["doc_id"].tolist() == [103]


def test_near_seen_empty_batch_and_no_candidates(ray_session, tmp_path):
    from kafka_connect_s3_ray.functions.seen import (build_near_seen_index,
                                                     near_seen_pairs)

    idx = str(tmp_path / "near")
    build_near_seen_index(_docs([(1, "some indexed document text here ok "
                                     "with enough words to shingle")]), idx)
    empty = near_seen_pairs(_docs([]), idx).to_pandas()
    assert empty.empty  # ray drops column names on empty to_pandas
    miss = near_seen_pairs(
        _docs([(9, "totally unrelated words everywhere around")]),
        idx).to_pandas()
    assert miss.empty


def test_near_seen_prunes_band_and_doc_buckets(ray_session, tmp_path):
    """A one-doc probe must read a strict subset of the index's band and
    payload bucket dirs."""
    from kafka_connect_s3_ray.functions import seen as seen_mod
    from kafka_connect_s3_ray.functions.seen import (build_near_seen_index,
                                                     near_seen_pairs)

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(400)]
    # mutually dissimilar history docs: disjoint-ish random vocabularies
    hist = _docs([(i, " ".join(rng.choice(words, 25, replace=False)))
                  for i in range(100)])
    idx = str(tmp_path / "near")
    build_near_seen_index(hist, idx, n_band_buckets=32, n_doc_buckets=32)
    n_band_dirs = len(glob.glob(os.path.join(idx, "bandbkt=*")))
    n_doc_dirs = len(glob.glob(os.path.join(idx, "docbkt=*")))

    read_dirs = []
    orig = seen_mod.ray.data.read_parquet

    def spy(files, **kw):
        read_dirs.append({os.path.basename(os.path.dirname(f))
                          for f in files})
        return orig(files, **kw)

    seen_mod.ray.data.read_parquet = spy
    try:
        hist_pd = hist.to_pandas()
        probe_text = hist_pd.loc[hist_pd.doc_id == 7, "text"].iloc[0]
        near_seen_pairs(_docs([(999, probe_text + " extra")]), idx,
                        threshold=0.6).to_pandas()
    finally:
        seen_mod.ray.data.read_parquet = orig
    band_reads = set().union(*(d for d in read_dirs
                               if any(x.startswith("bandbkt") for x in d)))
    assert len(band_reads) < n_band_dirs  # pruned, not a full scan
    doc_reads = set().union(*(d for d in read_dirs
                              if any(x.startswith("docbkt") for x in d)),
                            set())
    if doc_reads:
        assert len(doc_reads) < n_doc_dirs


def test_update_near_seen_index_remembers_new_docs(ray_session, tmp_path):
    """The RefinedWeb loop: filter -> admit survivors -> update; a re-probe
    of the same batch then finds its own near-dups in the index."""
    from kafka_connect_s3_ray.functions.seen import (build_near_seen_index,
                                                     near_seen_pairs,
                                                     update_near_seen_index)

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    hist = _docs([(1, f"{base} one"), (2, "unrelated words entirely "
                                          "different content here today")])
    idx = str(tmp_path / "near")
    build_near_seen_index(hist, idx)
    new = _docs([(10, f"{base} ten")])
    first = near_seen_pairs(new, idx, threshold=0.6).to_pandas()
    assert set(first["hist_id"]) == {1}

    appended = update_near_seen_index(new, idx)
    assert appended == 1
    probe = _docs([(20, f"{base} twenty")])
    second = near_seen_pairs(probe, idx, threshold=0.6).to_pandas()
    assert set(second["hist_id"]) == {1, 10}  # the admitted doc is remembered
    # generation files exist; base parts untouched
    assert glob.glob(os.path.join(idx, "bandbkt=*", "part-g*.parquet"))
    assert glob.glob(os.path.join(idx, "docbkt=*", "part-g*.parquet"))


def test_compact_seen_index_folds_generations(ray_session, tmp_path):
    from kafka_connect_s3_ray.functions.seen import (build_seen_index,
                                                     compact_seen_index,
                                                     filter_unseen,
                                                     update_seen_index)

    idx = str(tmp_path / "seen")
    build_seen_index(_hist(20), idx, n_buckets=4)
    update_seen_index(_docs([(100, "gen one fresh")]), idx)
    update_seen_index(_docs([(101, "gen two fresh"),
                             (102, "gen one fresh")]), idx)  # dup re-presented
    assert glob.glob(os.path.join(idx, "bucket=*", "part-g*.parquet"))
    n = compact_seen_index(idx)
    assert n >= 1
    assert not glob.glob(os.path.join(idx, "bucket=*", "part-g*.parquet"))
    # every bucket with data has exactly one part file now
    for bdir in glob.glob(os.path.join(idx, "bucket=*")):
        assert len(glob.glob(os.path.join(bdir, "*.parquet"))) == 1
    # probes still see everything that was ever admitted
    out = filter_unseen(_docs([(1, "history document number 1 content"),
                               (2, "gen one fresh"), (3, "gen two fresh"),
                               (4, "never seen")]), idx).to_pandas()
    assert out["doc_id"].tolist() == [4]
    meta = json.load(open(os.path.join(idx, "seen_meta.json")))
    assert meta["generation"] == 0


def test_compact_near_seen_index_folds_generations(ray_session, tmp_path):
    from kafka_connect_s3_ray.functions.seen import (
        build_near_seen_index, compact_near_seen_index, near_seen_pairs,
        update_near_seen_index)

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    idx = str(tmp_path / "near")
    build_near_seen_index(_docs([(1, f"{base} one")]), idx)
    update_near_seen_index(_docs([(10, f"{base} ten")]), idx)
    before = (near_seen_pairs(_docs([(20, f"{base} twenty")]), idx,
                              threshold=0.6).to_pandas()
              .sort_values(["new_id", "hist_id"]).reset_index(drop=True))
    assert set(before["hist_id"]) == {1, 10}
    n = compact_near_seen_index(idx)
    assert n >= 2  # at least one band + one payload bucket folded
    assert not glob.glob(os.path.join(idx, "*bkt=*", "part-g*.parquet"))
    after = (near_seen_pairs(_docs([(20, f"{base} twenty")]), idx,
                             threshold=0.6).to_pandas()
             .sort_values(["new_id", "hist_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(before, after)  # byte-identical result
