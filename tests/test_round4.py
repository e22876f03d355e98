"""Round-4 regression tests: the ADVICE r3 findings.

1. stratified_sample: vectorized group lookup, no sentinel collision — a
   genuine group value equal to the old '\\x00null' sentinel takes ITS rate.
2. cohort_retention / event_transitions: NULL ts rejected loudly (a NaT
   becomes int64-min in period math / orders unlike SQL NULLS LAST).
3. vacuum: an aged UNPARSABLE commit token (crashed O_EXCL fallback write)
   is swept, restoring self-healing; fresh or healthy tokens survive.
4. lookup bloom fast-path: a delta-only partition's definitely-absent
   answer carries the PAYLOAD schema (op/offset dropped), identical to the
   schema a bloom-hit read of the same partition returns.
"""

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def test_stratified_sentinel_group_takes_its_rate(ray_session):
    from kafka_connect_s3_ray.functions.sample import stratified_sample

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "event_type": pa.array(["\x00null", "\x00null", None, "a"],
                               pa.string()),
    })
    out = stratified_sample(
        ray.data.from_arrow(t), "event_type", "event_id",
        {"\x00null": 0.0}, default_rate=1.0).to_pandas()
    # the configured rate 0.0 drops the literal '\x00null' GROUP VALUE rows;
    # the genuine NULL row and 'a' keep default_rate=1.0
    assert sorted(out["event_id"]) == [3, 4]


def test_cohort_and_transitions_reject_null_ts(ray_session):
    from kafka_connect_s3_ray.functions.funnel import (cohort_retention,
                                                       event_transitions)

    t = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "event_id": pa.array([10, 11, 12], pa.int64()),
        "event_type": pa.array(["a", "b", "a"], pa.string()),
        "ts": pa.array([pd.Timestamp("2026-01-01"), None,
                        pd.Timestamp("2026-01-02")], pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="NULL timestamps"):
        cohort_retention(ds).to_pandas()
    with pytest.raises(Exception, match="NULL timestamps"):
        event_transitions(ds).to_pandas()
    # funnel keeps SQL min-skips-NULL semantics — NaT ts must NOT raise there
    from kafka_connect_s3_ray.functions.funnel import funnel

    funnel(ds, ["a", "b"]).to_pandas()


@pytest.fixture(scope="module")
def delta_only(tmp_path_factory, ray_session):
    from kafka_connect_s3_ray.pipelines.upsert import run_upsert
    from kafka_connect_s3_ray.synth import write_fixture

    root = str(tmp_path_factory.mktemp("r4"))
    fx = write_fixture(root, n_conv=40, n_events=400, num_partitions=2)
    out = os.path.join(root, "out")
    mpath = os.path.join(root, "m.json")
    # no base lake + delta commits => every partition's fileset is delta-only
    m = run_upsert(fx["changelog_dir"], out, mpath, num_partitions=2,
                   commit_mode="delta")
    return {"m": m, "mpath": mpath, "root": root, **fx}


def test_lookup_absent_key_schema_matches_hit_schema(delta_only):
    from kafka_connect_s3_ray.pipelines.upsert import _is_delta
    from kafka_connect_s3_ray.pipelines.maintenance import lookup

    m = delta_only["m"]
    files = [f for fs in m.current_files().values() for f in fs]
    assert files and all(_is_delta(f) for f in files)  # the premise
    present = lookup(m, delta_only["events"]["conv_id"][0].as_py())
    absent = lookup(m, "conv-99999999")
    assert len(absent) == 0
    assert absent.schema.names == present.schema.names
    for col in ("op", "offset", "partition"):
        assert col not in absent.schema.names


def test_vacuum_sweeps_aged_unparsable_token(delta_only):
    from kafka_connect_s3_ray.pipelines.maintenance import vacuum
    from kafka_connect_s3_ray.state.manifest import Manifest

    mpath = delta_only["mpath"]
    m = Manifest.load(mpath)
    bad = f"{mpath}.v{m.snapshot_id + 1}"
    with open(bad, "w") as f:
        f.write('{"version": 1, "snapsho')  # crashed partial JSON
    # fresh partial: protected by the age gate
    vacuum(mpath)
    assert os.path.exists(bad)
    # aged partial: swept, and the blocked snapshot id becomes committable
    # (vacuum's own commit may immediately claim the freed id — fine: what
    # must hold is that the id's token is now READABLE or absent, where
    # before the sweep every commit of it raised ConcurrentCommitError)
    os.utime(bad, (time.time() - 7200, time.time() - 7200))
    swept = vacuum(mpath)
    assert bad in swept
    if os.path.exists(bad):
        with open(bad) as f:
            json.load(f)
    m = Manifest.load(mpath)
    m.commit()  # would raise ConcurrentCommitError forever before the sweep
    with open(f"{mpath}.v{m.snapshot_id}") as f:
        json.load(f)  # the healed id committed a READABLE token
    # healthy aged tokens are never touched
    tok = f"{mpath}.v{m.snapshot_id}"
    os.utime(tok, (time.time() - 7200, time.time() - 7200))
    vacuum(mpath)
    assert os.path.exists(tok)


def test_tail_grace_flush_wall_clock_ms(tmp_path, ray_session):
    """The reference's flush.interval.ms semantics (12h-idle IT scenario
    shape): a partition that buffered a delta and then sat idle flushes once
    wall-clock interval+grace elapse — driven by an injected clock, no real
    sleeping. Mirrors test_tail_grace_flush_idle_partition's tick-clock
    version."""
    import pandas as pd

    from kafka_connect_s3_ray.pipelines.tail import tail_changelog
    from kafka_connect_s3_ray.pipelines.upsert import lake_table
    from kafka_connect_s3_ray.synth import oracle_apply, write_fixture

    root = str(tmp_path)
    P = 4
    fx = write_fixture(root, n_conv=60, n_events=1200, num_partitions=P)
    out, mpath = os.path.join(root, "out"), os.path.join(root, "m.json")
    fake = {"t": 0.0}  # seconds

    def sleep(_):
        fake["t"] += 7 * 3600.0  # each poll gap is 7h of virtual wall time

    seen = []
    m = tail_changelog(
        fx["changelog_dir"], out, mpath, lake_dir=fx["lake_dir"],
        num_partitions=P, commit_mode="delta", max_rounds=4,
        poll_interval_s=0.0, sleep=sleep, clock=lambda: fake["t"],
        on_round=lambda i, mm: seen.append(
            {p: c for p, c in mm.delta_counts().items() if c}),
        flush_interval_ms=12 * 3600 * 1000.0,  # the IT's 12h interval
    )
    # deltas buffer at t=0; ticks at 7h/14h are inside interval+grace (18h);
    # the 21h tick is past the deadline AND >6h idle -> grace flush
    assert seen[0] and max(seen[0].values()) == 1
    assert seen[2]  # 14h: still pending
    assert not seen[3], f"deltas survived the 12h+grace flush: {seen[3]}"
    exp = oracle_apply(fx["lake"], fx["events"])
    got = lake_table(m).to_pandas()[exp.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True),
                                  check_dtype=False)
    with pytest.raises(ValueError, match="not both"):
        tail_changelog(fx["changelog_dir"], out, mpath, num_partitions=P,
                       max_rounds=1, sleep=lambda s: None,
                       commit_mode="delta", flush_interval_rounds=2,
                       flush_interval_ms=1000.0)


def test_embedding_near_dup_auto_switches_on_corpus_size(ray_session,
                                                         monkeypatch):
    """VERDICT r3 #5: method='auto' must pick the LSH leg past
    exact_max_rows so large corpora never take the O(N^2) exact path."""
    import kafka_connect_s3_ray.functions.dedup as dd

    rng = np.random.default_rng(5)
    def mk(n):
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in
                                   rng.normal(size=(n, 4))],
                                  pa.list_(pa.float32()))}))

    calls = []
    real_exact = dd._embedding_near_dup_exact
    monkeypatch.setattr(dd, "_embedding_near_dup_exact",
                        lambda *a, **k: calls.append("exact") or real_exact(*a, **k))
    # small corpus: auto -> exact
    dd.embedding_near_dup(mk(50), threshold=0.99).to_pandas()
    assert calls == ["exact"]
    # past the switch point: auto -> lsh (exact leg never invoked)
    out = dd.embedding_near_dup(mk(60), threshold=0.99,
                                exact_max_rows=59).to_pandas()
    assert calls == ["exact"]
    assert set(out.columns) == {"left_id", "right_id", "cosine"}


def test_embedding_near_dup_lsh_equals_exact_on_planted_dups(ray_session):
    """The LSH leg recovers exactly the planted high-threshold duplicates
    the exact leg finds: duplicates have identical sign patterns, so they
    always share a bucket — at 0.999 the two legs agree on this corpus."""
    from kafka_connect_s3_ray.functions.dedup import embedding_near_dup

    rng = np.random.default_rng(11)
    base = rng.normal(size=(120, 8))
    vecs = np.vstack([base, base[:15] + rng.normal(scale=1e-5, size=(15, 8))])
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))}))
    key = ["left_id", "right_id"]
    exact = (embedding_near_dup(ds, threshold=0.999, method="exact")
             .to_pandas().sort_values(key).reset_index(drop=True))
    lsh = (embedding_near_dup(ds, threshold=0.999, method="lsh")
           .to_pandas().sort_values(key).reset_index(drop=True))
    assert len(exact) >= 15
    pd.testing.assert_frame_equal(
        lsh[key + ["cosine"]], exact[key + ["cosine"]])


def test_embedding_near_dup_ivf_recall_on_clustered_corpus(ray_session):
    """The IVF leg (auto's scale path) recovers >= 0.95 of the exact leg's
    pairs at a MODERATE threshold on a clustered corpus — the regime where
    the sign-pattern LSH leg collapses (measured 0.04 recall at t=0.5)."""
    from kafka_connect_s3_ray.functions.dedup import (_embedding_near_dup_ivf,
                                                      embedding_near_dup)

    rng = np.random.default_rng(17)
    centers = rng.normal(size=(12, 16)) * 2.5
    vecs = centers[rng.integers(0, 12, 800)] + rng.normal(size=(800, 16))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(800), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))}))
    exact = embedding_near_dup(ds, threshold=0.9, method="exact").to_pandas()
    ivf = _embedding_near_dup_ivf(ds, 0.9, "vec_id", "embedding", 42).to_pandas()
    e = set(zip(exact["left_id"], exact["right_id"]))
    i = set(zip(ivf["left_id"], ivf["right_id"]))
    assert len(e) > 50  # non-vacuous fixture
    assert i <= e  # precision 1.0: every emitted cosine is exact
    assert len(e & i) / len(e) >= 0.95, len(e & i) / len(e)


def _grad_img(h, w, c=3, seed=23):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
    return (base + rng.integers(0, 64, (h, w, c))).clip(0, 255).astype(np.uint8)


def test_png_roundtrip_rgb_and_rgba():
    from kafka_connect_s3_ray.functions.multimodal import (decode_png,
                                                           encode_png)

    for c in (3, 4):
        img = _grad_img(24, 17, c)
        assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_decoder_handles_all_five_filters():
    """Hand-build the filtered scanline stream for every filter type and
    check decode_png reconstructs the original — i.e. the decoder is a real
    PNG reader, not just the inverse of our filter-0 encoder."""
    import zlib

    from kafka_connect_s3_ray.functions.multimodal import (PNG_SIG,
                                                           _png_chunk,
                                                           decode_png)

    img = _grad_img(5, 7)  # 5 rows -> one row per filter type
    h, w, c = img.shape
    rows = img.reshape(h, w * c).astype(np.int32)
    out = []
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = rows[y]
        prev = rows[y - 1] if y else np.zeros(w * c, np.int32)
        left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        ul = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:  # Paeth predictor
            p = left + prev - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, ul))
            filt = cur - pred
        out.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    payload = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"".join(out)))
               + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), img)


def test_png_features_match_ppm_features_for_same_image():
    """The same pixels produce the same features regardless of container
    format — PNG goes through a REAL decompress, not the byte fallback."""
    from kafka_connect_s3_ray.functions.multimodal import (
        MediaFeatureExtractor, encode_png, encode_ppm)

    img = _grad_img(20, 30)
    ex = MediaFeatureExtractor()
    np.testing.assert_array_equal(ex._features(encode_png(img)),
                                  ex._features(encode_ppm(img)))


def test_png_resize_real(ray_session):
    from kafka_connect_s3_ray.functions.multimodal import (Resizer,
                                                           decode_png,
                                                           encode_png)

    img = _grad_img(40, 40, 4)  # RGBA: channel count must survive
    t = pa.table({"payload": pa.array([encode_png(img)], pa.binary()),
                  "width": pa.array([40], pa.int32()),
                  "height": pa.array([40], pa.int32())})
    out = Resizer(target_w=8, target_h=6)(t)
    back = decode_png(out.column("payload")[0].as_py())
    assert back.shape == (6, 8, 4)
    # nearest-neighbor reference
    yi = (np.arange(6) * 40 // 6).clip(0, 39)
    xi = (np.arange(8) * 40 // 8).clip(0, 39)
    assert np.array_equal(back, img[yi[:, None], xi[None, :]])


def _semdedup_fixture():
    """12 vectors: cluster {0,3,7} (near-identical dir A, found pairwise as
    a CHAIN), cluster {2,9} (dir B), the rest orthogonal-ish singletons."""
    rng = np.random.default_rng(5)
    dim = 16
    a = rng.standard_normal(dim)
    b = rng.standard_normal(dim)
    vecs = []
    for i in range(12):
        if i in (0, 3, 7):
            v = a + rng.standard_normal(dim) * 0.02
        elif i in (2, 9):
            v = b + rng.standard_normal(dim) * 0.02
        else:
            v = rng.standard_normal(dim)
        vecs.append((v / np.linalg.norm(v)).astype(np.float64))
    return pa.table({"vec_id": pa.array(range(12), pa.int64()),
                     "embedding": pa.array([v.tolist() for v in vecs],
                                           pa.list_(pa.float64()))})


def test_semdedup_transitive_clusters_drop_all_but_one(ray_session):
    """A 3-cluster found as a pair CHAIN must drop TWO docs (the
    connected-components step), and singletons all keep themselves."""
    from kafka_connect_s3_ray.functions.dedup import semdedup

    ds = ray.data.from_arrow(_semdedup_fixture())
    out = (semdedup(ds, threshold=0.9, method="exact")
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert len(out) == 12
    by = out.set_index("vec_id")
    assert by.loc[[0, 3, 7], "cluster_id"].tolist() == [0, 0, 0]
    assert by.loc[[2, 9], "cluster_id"].tolist() == [2, 2]
    assert by.loc[[0, 2], "kept"].all() and not by.loc[[3, 7, 9], "kept"].any()
    singles = by.drop(index=[0, 3, 7, 2, 9])
    assert (singles["cluster_id"] == singles.index).all()
    assert singles["kept"].all()


def test_semdedup_hash_join_path_equals_broadcast_path(ray_session):
    """broadcast_budget_rows=0 forces the coarse-bucket hash-join decision
    join (the above-budget scale route) — identical output."""
    from kafka_connect_s3_ray.functions.dedup import semdedup

    ds = ray.data.from_arrow(_semdedup_fixture())
    bc = (semdedup(ds, threshold=0.9, method="exact")
          .to_pandas().sort_values("vec_id").reset_index(drop=True))
    hj = (semdedup(ds, threshold=0.9, method="exact",
                   broadcast_budget_rows=0)
          .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(bc, hj.astype(bc.dtypes.to_dict()))


def test_semdedup_no_duplicates_keeps_everything(ray_session):
    from kafka_connect_s3_ray.functions.dedup import semdedup

    rng = np.random.default_rng(11)
    t = pa.table({"vec_id": pa.array(range(8), pa.int64()),
                  "embedding": pa.array(
                      [list(r) for r in rng.standard_normal((8, 12))],
                      pa.list_(pa.float64()))})
    out = (semdedup(ray.data.from_arrow(t), threshold=0.999, method="exact")
           .to_pandas().sort_values("vec_id"))
    assert out["kept"].all()
    assert (out["cluster_id"].to_numpy() == out["vec_id"].to_numpy()).all()


def test_ntile_matches_duckdb_including_ties_and_small_n(ray_session):
    """NTILE split equals DuckDB's on a tied fixture across k values,
    including n < k (one row per leading tile) and k = 1 (all tile 1)."""
    import duckdb

    from kafka_connect_s3_ray.functions.quantiles import ntile

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "event_id": np.arange(101, dtype=np.int64),
        # heavy ties so runs of duplicates straddle bucket bounds
        "value": rng.integers(0, 12, 101).astype(np.float64),
    })
    for k in (1, 4, 7, 200):
        got = (ntile(ray.data.from_pandas(df).repartition(5),
                     "value", "event_id", k=k)
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        exp = duckdb.sql(
            f"SELECT event_id, CAST(ntile({k}) OVER (ORDER BY value, "
            "event_id) AS BIGINT) AS tile FROM df ORDER BY event_id").df()
        assert (got["event_id"].to_numpy() == exp["event_id"].to_numpy()).all()
        assert (got["tile"].to_numpy() == exp["tile"].to_numpy()).all(), k


def test_ntile_degenerate_inputs(ray_session):
    """All-null values give the typed empty result; k < 1 raises."""
    from kafka_connect_s3_ray.functions.quantiles import ntile

    dead = pd.DataFrame({"event_id": [1, 2],
                         "value": pd.array([None, None], dtype="float64")})
    out = ntile(ray.data.from_pandas(dead), "value", "event_id", k=4)
    assert out.schema().names == ["event_id", "value", "tile"]
    assert len(out.to_pandas()) == 0
    with pytest.raises(ValueError):
        ntile(ray.data.from_pandas(dead), "value", "event_id", k=0)


def test_mad_outliers_catch_what_zscore_masks(ray_session):
    """The robust-statistics point: ONE enormous value inflates sd enough
    that its own z stays under 3 (self-masking), while the median/MAD gate
    still flags it — and only it."""
    from kafka_connect_s3_ray.functions.profile import mad_outliers, zscore_outliers

    vals = [10.0, 10.1, 9.9, 10.05, 9.95, 10.2, 9.8, 1000.0]
    df = pd.DataFrame({"event_id": np.arange(len(vals), dtype=np.int64),
                       "event_type": ["a"] * len(vals),
                       "value": vals})
    ds = ray.data.from_pandas(df).repartition(3)
    z = zscore_outliers(ds, "event_type", "value", threshold=3.0).to_pandas()
    assert len(z) == 0  # sd ~ 327: the outlier's own z ~ 2.6 — masked
    m = mad_outliers(ds, "event_type", "value", k=3.0).to_pandas()
    assert list(m["event_id"]) == [7]
    # discrete median of 8 values = rank ceil(.5*8)-1 = 10.0 (not the
    # interpolated 10.05); MAD = median(|v - 10.0|) = 0.1; dev = 990.0
    assert abs(m["dev"].iloc[0] - 990.0) < 1e-9


def test_mad_outliers_zero_mad_and_null_scope(ray_session):
    """A majority-duplicate group (MAD 0) keeps only strictly-off-median
    rows; NULL values and NULL groups are excluded like the SQL scope."""
    from kafka_connect_s3_ray.functions.profile import mad_outliers

    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "event_type": ["c", "c", "c", "c", None, "c"],
        "value": pd.array([5.0, 5.0, 5.0, 7.0, 99.0, None], dtype="float64"),
    })
    out = mad_outliers(ray.data.from_pandas(df), "event_type", "value",
                       k=3.0).to_pandas()
    assert list(out["event_id"]) == [3]  # NULL group/value rows never emit


def test_grouped_ntile_matches_duckdb_per_group(ray_session):
    """Per-partition NTILE equals DuckDB's, including a group smaller than
    k (one row per leading tile) and heavy within-group ties."""
    import duckdb

    from kafka_connect_s3_ray.functions.quantiles import grouped_ntile

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "event_id": np.arange(90, dtype=np.int64),
        "event_type": (["a"] * 50 + ["b"] * 38 + ["tiny"] * 2),
        "value": rng.integers(0, 9, 90).astype(np.float64),
    })
    got = (grouped_ntile(ray.data.from_pandas(df).repartition(4),
                         "event_type", "value", "event_id", k=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    exp = duckdb.sql(
        "SELECT event_id, CAST(ntile(4) OVER (PARTITION BY event_type "
        "ORDER BY value, event_id) AS BIGINT) AS tile "
        "FROM df ORDER BY event_id").df()
    assert (got["tile"].to_numpy() == exp["tile"].to_numpy()).all()
    assert got.loc[got["event_type"] == "tiny", "tile"].tolist() == [1, 2]


def test_winsorize_bounds_and_scope(ray_session):
    """Clip lands exactly on the group's discrete p05/p95; NULL group/value
    rows are excluded; a reversed quantile pair raises."""
    from kafka_connect_s3_ray.functions.profile import winsorize

    df = pd.DataFrame({
        "event_id": np.arange(22, dtype=np.int64),
        "event_type": ["g"] * 20 + [None, "g"],
        "value": pd.array(list(np.arange(1.0, 21.0)) + [5.0, None],
                          dtype="float64"),
    })
    out = (winsorize(ray.data.from_pandas(df), "event_type", "value",
                     lo_q=0.05, hi_q=0.95)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert len(out) == 20  # NULL group + NULL value rows dropped
    # quantile_disc over 1..20: p05 -> rank ceil(.05*20)-1 = 0 -> 1.0;
    # p95 -> rank ceil(.95*20)-1 = 18 -> 19.0
    assert out["clipped"].min() == 1.0 and out["clipped"].max() == 19.0
    assert (out.loc[out["value"] == 20.0, "clipped"] == 19.0).all()
    with pytest.raises(ValueError):
        winsorize(ray.data.from_pandas(df), "event_type", "value",
                  lo_q=0.9, hi_q=0.1)


def test_export_pairs_cli_matches_lead_replay(delta_only, tmp_path, capsys):
    """`export-pairs` writes exactly the user->assistant lead pairs of the
    lake (DuckDB lead-window replay over the merged table), and refuses a
    reused output directory like `export` does."""
    import duckdb
    import pyarrow.dataset as pads

    from kafka_connect_s3_ray.__main__ import main
    from kafka_connect_s3_ray.pipelines.upsert import lake_table

    out = str(tmp_path / "pairs")
    assert main(["export-pairs", "--manifest", delta_only["mpath"],
                 "--out", out]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = (pads.dataset(out).to_table().to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert report["rows"] == len(got)
    lake = lake_table(delta_only["m"]).to_pandas()  # noqa: F841 (duckdb ref)
    exp = duckdb.sql(
        "WITH l AS (SELECT conv_id, turn_idx, role, text, "
        "lead(role) OVER w AS nrole, lead(text) OVER w AS ntext FROM lake "
        "WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)) "
        "SELECT conv_id, turn_idx, text AS prompt, ntext AS response FROM l "
        "WHERE role = 'user' AND nrole = 'assistant' "
        "ORDER BY conv_id, turn_idx").df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)
    # reused directory refused, content untouched
    assert main(["export-pairs", "--manifest", delta_only["mpath"],
                 "--out", out]) == 2


def test_export_pairs_jsonl_format(delta_only, tmp_path, capsys):
    """`--format jsonl` writes one JSON object per line with the same rows
    the parquet export carries, and a jsonl directory refuses re-export."""
    import glob

    from kafka_connect_s3_ray.__main__ import main

    pq_out = str(tmp_path / "pq")
    jl_out = str(tmp_path / "jl")
    assert main(["export-pairs", "--manifest", delta_only["mpath"],
                 "--out", pq_out]) == 0
    assert main(["export-pairs", "--manifest", delta_only["mpath"],
                 "--out", jl_out, "--format", "jsonl"]) == 0
    reports = [json.loads(x) for x in
               capsys.readouterr().out.strip().splitlines() if x.startswith("{")]
    assert reports[-1]["format"] == "jsonl"
    assert reports[-1]["rows"] == reports[-2]["rows"] > 0
    lines = []
    for f in glob.glob(os.path.join(jl_out, "**", "*.json"), recursive=True):
        with open(f) as fh:
            lines += [json.loads(ln) for ln in fh]
    assert len(lines) == reports[-1]["rows"]
    assert set(lines[0]) == {"conv_id", "turn_idx", "prompt", "response"}
    # cross-format refusal: parquet export into the jsonl dir is refused
    assert main(["export-pairs", "--manifest", delta_only["mpath"],
                 "--out", jl_out]) == 2


def test_clean_text_contract(ray_session):
    """Control chars -> space, whitespace collapse, trim, ASCII-only
    lowercase; non-ASCII passes through untouched; NULL -> NULL with
    changed=false."""
    from kafka_connect_s3_ray.functions.text import clean_text

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["Héllo\x01  WORLD\t!", "already clean", None,
                          "  \x7fEdges  "], pa.string()),
    })
    out = (clean_text(ray.data.from_arrow(t)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out["clean"]) == ["héllo world !", "already clean", None,
                                  "edges"]
    assert list(out["changed"]) == [True, False, False, True]


def test_chunk_cli_matches_library(tmp_path, ray_session, capsys):
    """`chunk` writes exactly the library chunking of the input docs and
    refuses a non-empty output directory."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_

    from kafka_connect_s3_ray.__main__ import main
    from kafka_connect_s3_ray.functions.text import chunk_documents

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["one two three four five", None, "a b"],
                         pa.string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq_.write_table(docs, src)
    out = str(tmp_path / "chunks")
    assert main(["chunk", "--docs", src, "--out", out,
                 "--size", "3", "--stride", "2"]) == 0
    got = (pads.dataset(out).to_table().to_pandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    exp = (chunk_documents(ray.data.from_arrow(docs), size=3, stride=2)
           .to_pandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert list(got.loc[got["doc_id"] == 1, "chunk"]) == [
        "one two three", "three four five", "five"]
    assert main(["chunk", "--docs", src, "--out", out]) == 2


def test_value_ranks_ties_match_duckdb(ray_session):
    """dense_rank and cume_dist with heavy ties (runs straddling quantile
    bounds) equal DuckDB's windows; row_number settles by id."""
    import duckdb

    from kafka_connect_s3_ray.functions.quantiles import global_value_ranks

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"event_id": np.arange(120, dtype=np.int64),
                       "value": rng.integers(0, 7, 120).astype(np.float64)})
    got = (global_value_ranks(ray.data.from_pandas(df).repartition(5),
                              "value", "event_id")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    exp = duckdb.sql(
        "SELECT event_id, "
        "CAST(row_number() OVER (ORDER BY value, event_id) - 1 AS BIGINT) "
        "AS rnk, CAST(dense_rank() OVER (ORDER BY value) AS BIGINT) AS d, "
        "round(cume_dist() OVER (ORDER BY value), 6) AS c "
        "FROM df ORDER BY event_id").df()
    assert (got["rnk"].to_numpy() == exp["rnk"].to_numpy()).all()
    assert (got["dense_rnk"].to_numpy() == exp["d"].to_numpy()).all()
    assert np.allclose(got["cume"].to_numpy(), exp["c"].to_numpy())


def test_read_lake_column_pruning_and_evolution_fallback(tmp_path,
                                                         ray_session):
    """`read_lake(columns=...)` prunes the parquet read when every current
    file carries the columns, matches the full read's projection exactly,
    and silently falls back to the full read when schema evolution left a
    file without a requested column (a pruned read of it would hard-error)."""
    import pyarrow.parquet as pq_

    from kafka_connect_s3_ray.pipelines.upsert import read_lake, run_upsert
    from kafka_connect_s3_ray.synth import write_fixture

    root = str(tmp_path)
    fx = write_fixture(root, n_conv=40, n_events=600, num_partitions=2)
    mpath = os.path.join(root, "m.json")
    m = run_upsert(fx["changelog_dir"], os.path.join(root, "out"), mpath,
                   lake_dir=fx["lake_dir"], num_partitions=2)
    cols = ["conv_id", "turn_idx", "role"]
    pruned = read_lake(m, columns=cols)
    assert set(pruned.schema().names) == set(cols)  # actually pruned
    full = (read_lake(m).to_pandas()[cols]
            .sort_values(cols).reset_index(drop=True))
    got = pruned.to_pandas().sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, full, check_dtype=False)
    # evolve one current file: drop 'tool' — the guard must refuse to prune
    victim = next(f for fs in m.current_files().values() for f in fs)
    t = pq_.read_table(victim)
    pq_.write_table(t.drop_columns(["tool"]), victim)
    fb = read_lake(m, columns=["conv_id", "turn_idx", "tool"])
    assert set(fb.schema().names) != {"conv_id", "turn_idx", "tool"}
