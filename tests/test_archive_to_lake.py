"""End-to-end bridge: a reference-style block-gzip byte archive (the format
the original connector writes) feeding the lake-upsert pipeline — archive
encode -> block files + indexes + cursors -> decode -> LWW merge -> oracle
parity. This is the sink IT's binary round-trip re-targeted at the lake
(sink/src/test/.../S3SinkConnectorIT.java:614-675)."""

import os

import pandas as pd
import pytest

import ray.data

from kafka_connect_s3_ray.pipelines.upsert import lake_table, run_upsert
from kafka_connect_s3_ray.sources.archive import archive_records, fetch_next_offset
from kafka_connect_s3_ray.sources.changelog import (
    changelog_from_archive,
    encode_change_payload,
)
from kafka_connect_s3_ray.synth import oracle_apply, synth_changelog, synth_lake, write_fixture

P = 4


@pytest.fixture(scope="module")
def archived(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bridge"))
    fx = write_fixture(root, n_conv=120, n_events=3000, num_partitions=P)
    records = encode_change_payload(fx["events"])
    arc = os.path.join(root, "byte_archive")
    stats = archive_records(ray.data.from_arrow(records), arc, topic="changelog",
                            file_threshold=64 * 1024)
    return {"root": root, "arc": arc, "stats": stats, **fx}


def test_decode_round_trip(archived):
    back = changelog_from_archive(archived["arc"], topic="changelog").to_pandas()
    orig = archived["events"].to_pandas()
    back = back.sort_values(["partition", "offset"]).reset_index(drop=True)
    orig = orig.sort_values(["partition", "offset"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(back, orig, check_dtype=False)


def test_archive_feeds_lake_upsert(archived):
    ds = changelog_from_archive(archived["arc"], topic="changelog")
    out = os.path.join(archived["root"], "lake_out")
    m = run_upsert(ds, out, os.path.join(archived["root"], "m.json"),
                   lake_dir=archived["lake_dir"], num_partitions=P)
    exp = oracle_apply(archived["lake"], archived["events"])
    got = lake_table(m).to_pandas()[exp.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)


def test_archive_resume_offsets_feed_incremental(archived):
    """Replay from the archive with per-partition resume offsets: only events
    above the offsets flow; merging them onto the phase-1 lake converges."""
    root = archived["root"]
    split = {p: 300 for p in range(P)}
    ds1 = changelog_from_archive(archived["arc"], topic="changelog")

    def below(t, _s=split):
        import numpy as np
        import pyarrow as pa

        part = t.column("partition").to_numpy(zero_copy_only=False)
        off = t.column("offset").to_numpy(zero_copy_only=False)
        wm = np.array([_s.get(int(x), -1) for x in part])
        return t.filter(pa.array(off <= wm))

    phase1 = ds1.map_batches(below, batch_format="pyarrow")
    out = os.path.join(root, "lake_inc")
    mpath = os.path.join(root, "m_inc.json")
    run_upsert(phase1, out, mpath, lake_dir=archived["lake_dir"], num_partitions=P)
    # phase 2: resume directly from the archive using the committed watermarks
    from kafka_connect_s3_ray.state.manifest import Manifest

    m1 = Manifest.load(mpath)
    resume = {p: m1.watermark(p) for p in range(P)}
    ds2 = changelog_from_archive(archived["arc"], topic="changelog",
                                 resume_offsets=resume)
    m2 = run_upsert(ds2, out, mpath, num_partitions=P)
    exp = oracle_apply(archived["lake"], archived["events"])
    got = lake_table(m2).to_pandas()[exp.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)


def test_archive_cursors_present(archived):
    for p in range(P):
        nxt = fetch_next_offset(archived["arc"], "changelog", p)
        ev = archived["events"].to_pandas()
        assert nxt == ev[ev["partition"] == p]["offset"].max() + 1


def test_export_lake_then_reimport_round_trip(archived, tmp_path_factory):
    """Full circle: lake snapshot -> reference-format byte archive -> decode ->
    cold-start upsert -> identical table (the export side of the S5 bridge)."""
    from kafka_connect_s3_ray.pipelines.upsert import run_upsert as _run
    from kafka_connect_s3_ray.sources.changelog import export_lake_to_archive

    root = str(tmp_path_factory.mktemp("export"))
    # build a lake first
    ds = changelog_from_archive(archived["arc"], topic="changelog")
    m = _run(ds, os.path.join(root, "lake1"), os.path.join(root, "m1.json"),
             lake_dir=archived["lake_dir"], num_partitions=P)
    from kafka_connect_s3_ray.pipelines.upsert import lake_table as _lt

    original = _lt(m)
    # export to a byte archive, re-import into a fresh lake
    arc2 = os.path.join(root, "arc2")
    stats = export_lake_to_archive(m, arc2, topic="export")
    assert sum(s["num_records"] for s in stats) == len(original)
    ds2 = changelog_from_archive(arc2, topic="export")
    m2 = _run(ds2, os.path.join(root, "lake2"), os.path.join(root, "m2.json"),
              num_partitions=P)
    reimported = _lt(m2)
    want = original.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    got = reimported.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    assert got.equals(want)
