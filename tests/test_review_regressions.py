"""Regression tests for the round-1 self-review findings."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.pipelines.maintenance import lookup, repartition_lake, vacuum
from kafka_connect_s3_ray.pipelines.upsert import lake_table, run_upsert
from kafka_connect_s3_ray.sources.archive import archive_records, read_archive
from kafka_connect_s3_ray.state.manifest import Manifest
from kafka_connect_s3_ray.synth import oracle_apply, write_fixture

P = 4


def test_grouped_by_topic_layout_replays(tmp_path):
    """Finding 1: 3-component grouped_by_topic keys must parse on replay."""
    rows = pa.table(
        {
            "partition": pa.array([0] * 10, pa.int32()),
            "offset": pa.array(range(10), pa.int64()),
            "key": pa.array([b"k"] * 10, pa.binary()),
            "value": pa.array([f"v{i}".encode() for i in range(10)], pa.binary()),
        }
    )
    from kafka_connect_s3_ray.sources.layout import GroupedByTopicLayout

    out = str(tmp_path / "arc")
    archive_records(ray.data.from_arrow(rows), out, topic="events",
                    layout=GroupedByTopicLayout(), date="2024-02-02")
    back = read_archive(out, layout_name="grouped_by_topic").to_pandas()
    assert len(back) == 10 and (back["topic"] == "events").all()


def test_exclude_filter_with_non_utf8_keys(tmp_path):
    """Finding 5: arbitrary key bytes must not break the exclude filter."""
    rows = pa.table(
        {
            "partition": pa.array([0] * 4, pa.int32()),
            "offset": pa.array(range(4), pa.int64()),
            "key": pa.array([b"\xff\xfe\x80", b"drop-me", b"keep", b"\x00\x01"],
                            pa.binary()),
            "value": pa.array([b"a", b"b", b"c", b"d"], pa.binary()),
        }
    )
    out = str(tmp_path / "arc")
    archive_records(ray.data.from_arrow(rows), out, topic="t")
    back = read_archive(out, exclude_key_substrings=["drop"]).to_pandas()
    assert len(back) == 3 and b"drop-me" not in set(back["key"])


@pytest.fixture()
def delta_state(tmp_path):
    root = str(tmp_path)
    fx = write_fixture(root, n_conv=60, n_events=1200, num_partitions=P,
                       files_per_partition=2)
    out = os.path.join(root, "out")
    mpath = os.path.join(root, "m.json")
    firsts = [sorted(glob.glob(os.path.join(fx["changelog_dir"], f"partition={p}", "*.parquet")))[0]
              for p in range(P)]
    m = run_upsert(firsts, out, mpath, lake_dir=fx["lake_dir"], num_partitions=P,
                   commit_mode="delta")
    assert max(m.delta_counts().values()) >= 1
    return {"root": root, "out": out, "mpath": mpath, "m": m, **fx}


def test_rewrite_after_pending_delta(delta_state):
    """Finding 2: a rewrite round over a partition with pending deltas must
    resolve them, not crash or mis-merge."""
    m2 = run_upsert(delta_state["changelog_dir"], delta_state["out"],
                    delta_state["mpath"], num_partitions=P, commit_mode="rewrite")
    assert max(m2.delta_counts().values(), default=0) == 0
    exp = oracle_apply(delta_state["lake"], delta_state["events"])
    got = lake_table(m2).to_pandas()[exp.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)
    # provenance columns never leak into the snapshot schema (finding 9)
    for fs in m2.current_files().values():
        import pyarrow.parquet as pq

        names = pq.read_schema(fs[0]).names
        assert "op" not in names and "offset" not in names


def test_lookup_with_pending_delta(delta_state):
    """Finding 3: point lookup resolves merge-on-read deltas."""
    m = delta_state["m"]
    exp_partial = oracle_apply(
        delta_state["lake"],
        delta_state["events"].to_pandas().pipe(
            lambda df: pa.Table.from_pandas(
                df[df.apply(lambda r: True, axis=1)], preserve_index=False
            )
        ) if False else delta_state["events"],
    )
    # the manifest only has the FIRST file per partition applied; rebuild the
    # expected state for exactly those events
    applied = []
    ev = delta_state["events"].to_pandas()
    for p in range(P):
        wm = m.watermark(p)
        applied.append(ev[(ev["partition"] == p) & (ev["offset"] <= wm)])
    applied_tbl = pa.Table.from_pandas(pd.concat(applied), preserve_index=False)
    exp = oracle_apply(delta_state["lake"], applied_tbl)
    conv = exp["conv_id"].iloc[3]
    got = lookup(m, conv).to_pandas()
    want = exp[exp["conv_id"] == conv]
    assert list(got["turn_idx"]) == list(want["turn_idx"])
    assert list(got["text"]) == list(want["text"])
    assert "op" not in got.columns


def test_repartition_with_pending_delta(delta_state):
    """Finding 4: repartition reads the resolved snapshot (no tombstones)."""
    new_lake = os.path.join(delta_state["root"], "lake_p8")
    report = repartition_lake(delta_state["mpath"], new_lake, new_partitions=8)
    assert report["rows"] == len(lake_table(delta_state["m"]))
    import pyarrow.parquet as pq

    for f in glob.glob(os.path.join(new_lake, "part=*", "*.parquet")):
        assert "op" not in pq.read_schema(f).names


def test_vacuum_keep_zero(delta_state):
    """Finding 10: keep_generations=0 removes superseded files AND lineage,
    never the current fileset."""
    m2 = run_upsert(delta_state["changelog_dir"], delta_state["out"],
                    delta_state["mpath"], num_partitions=P)
    before = lake_table(m2)
    deleted = vacuum(delta_state["mpath"], keep_generations=0)
    m3 = Manifest.load(delta_state["mpath"])
    current = {f for fs in m3.current_files().values() for f in fs}
    assert not (set(deleted) & current)
    for st in m3.partitions.values():
        for e in st["files"]:
            for path in e["path"].split(";"):
                assert os.path.exists(path)
    assert lake_table(m3).equals(before)


def test_tail_bounded_on_persistent_error(tmp_path):
    """Finding 7: a permanently failing tick aborts with a clear error
    instead of spinning forever."""
    from kafka_connect_s3_ray.pipelines.tail import tail_changelog

    with pytest.raises(RuntimeError, match="consecutive"):
        tail_changelog(str(tmp_path / "missing"), str(tmp_path / "out"),
                       str(tmp_path / "m.json"), num_partitions=2,
                       max_rounds=3, sleep=lambda s: None)


def test_compact_events_huge_key_cardinality():
    """Finding 8: no overflow crash at high per-batch key cardinality."""
    import numpy as np

    from kafka_connect_s3_ray.stages.merge import compact_events

    n = 50_000
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(n)]),
            "turn_idx": pa.array((np.arange(n) * 40_000) % 2_000_000_000, pa.int32()),
            "offset": pa.array(np.arange(n), pa.int64()),
            "op": pa.array(["U"] * n),
        }
    )
    out = compact_events(t)
    assert len(out) == n  # all keys distinct -> nothing dropped


def test_multi_topic_resume_offsets_do_not_bleed(tmp_path):
    """Review-3 finding: resume offsets are keyed by (topic, partition); a
    topic-A checkpoint must not skip topic-B files."""
    import ray.data as rd

    rows = pa.table(
        {
            "partition": pa.array([0] * 10, pa.int32()),
            "offset": pa.array(range(10), pa.int64()),
            "key": pa.array([b"k"] * 10, pa.binary()),
            "value": pa.array([b"v"] * 10, pa.binary()),
        }
    )
    out = str(tmp_path / "arc")
    archive_records(rd.from_arrow(rows), out, topic="topicA")
    archive_records(rd.from_arrow(rows), out, topic="topicB")
    # tuple keys: only topicA skips
    back = read_archive(out, resume_offsets={("topicA", 0): 9}).to_pandas()
    assert set(back["topic"]) == {"topicB"} and len(back) == 10
    # int keys without a topic filter are rejected as ambiguous
    with pytest.raises(ValueError, match="ambiguous"):
        read_archive(out, resume_offsets={0: 9})


def test_utf16_delimiters_with_embedded_0a_byte():
    """Review-3 finding: charset-encoded delimiters (UTF-16BE newline =
    0x00 0x0A) must not split on characters whose low byte is 0x0A."""
    from kafka_connect_s3_ray.sources.codecs import TrailingDelimiterCodec

    codec = TrailingDelimiterCodec(include_keys=False, charset="utf-16-be")
    vals = ["aĊb", "plain", "̊"]  # U+010A / U+030A low byte = 0x0A
    out = codec.decode_strings(codec.encode_strings([None] * 3, vals))
    assert out.column("value").to_pylist() == vals


def test_quarantine_first_record_corrupt(tmp_path):
    """Review-3 finding: a file corrupt at record 0 decodes to an empty typed
    table and the rest of the batch still concats."""
    import gzip as gz

    import ray.data as rd

    rows = pa.table(
        {
            "partition": pa.array([0] * 5 + [1] * 5, pa.int32()),
            "offset": pa.array(list(range(5)) * 2, pa.int64()),
            "key": pa.array([b"k"] * 10, pa.binary()),
            "value": pa.array([b"v" * 20] * 10, pa.binary()),
        }
    )
    out = str(tmp_path / "arc")
    archive_records(rd.from_arrow(rows), out, topic="t")
    victim = sorted(glob.glob(os.path.join(out, "**", "*-00000-*.gz"), recursive=True))[0]
    open(victim, "wb").write(gz.compress(b"\xff\xff\xff\xff", mtime=0))  # garbage framing
    ok = read_archive(out, on_corrupt="quarantine",
                      quarantine_dir=str(tmp_path / "q")).to_pandas()
    assert len(ok) == 5 and set(ok["partition"]) == {1}
