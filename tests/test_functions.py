"""Training-data ops: text analysis, dedup (exact + near-dup), similarity
search, multimodal plumbing — over the driver testdata tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.functions.dedup import (
    embedding_near_dup,
    exact_dedup,
    jaccard_verify,
    minhash_lsh_candidates,
    simhash_candidates,
)
from kafka_connect_s3_ray.functions.multimodal import (
    FrameSampler,
    MediaFeatureExtractor,
    suggest_batch_size,
    synth_media,
)
from kafka_connect_s3_ray.functions.similarity import brute_force_topk, ivf_topk, kmeans_fit
from kafka_connect_s3_ray.functions.text import (
    LanguageId,
    add_fingerprint,
    add_quality_stats,
    add_token_counts,
    rolling_hash_fingerprint,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def test_token_counts_and_quality(docs):
    out = docs.map_batches(add_token_counts, batch_format="pyarrow") \
              .map_batches(add_quality_stats, batch_format="pyarrow").to_pandas()
    manual_ws = out["text"].str.split().str.len()
    assert (out["n_tokens_ws"] == manual_ws).all()
    assert (out["n_tokens"] >= out["n_tokens_ws"]).all()
    assert (out["len_chars"] == out["text"].str.len()).all()
    assert out["punct_ratio"].between(0, 1).all()
    assert out["stopword_ratio"].between(0, 1.01).all()


def test_language_id(docs):
    out = docs.map_batches(LanguageId, batch_format="pyarrow", concurrency=2).to_pandas()
    assert set(out["lang_pred"]) <= {"en", "es", "de", "fr", "it", "und"}
    # texts here are English-ish technical words; majority should be en or und
    assert (out["lang_pred"].isin(["en", "und"])).mean() > 0.5


def test_fingerprints(docs):
    out = docs.map_batches(add_fingerprint, batch_format="pyarrow") \
              .map_batches(rolling_hash_fingerprint, batch_format="pyarrow").to_pandas()
    import hashlib

    row = out.iloc[0]
    assert row["fingerprint"] == hashlib.md5(row["text"].lower().strip().encode()).hexdigest()
    # rolling fp deterministic
    out2 = docs.map_batches(rolling_hash_fingerprint, batch_format="pyarrow").to_pandas()
    a = out.set_index("doc_id")["rolling_fp"].sort_index()
    b = out2.set_index("doc_id")["rolling_fp"].sort_index()
    assert (a == b).all()


def test_exact_dedup_with_planted_dups(docs):
    base = docs.to_pandas()
    dup = base.head(10).copy()
    dup["doc_id"] = dup["doc_id"] + 10_000  # same text, higher id
    ds = ray.data.from_pandas(pd.concat([base, dup], ignore_index=True))
    kept = exact_dedup(ds).to_pandas()
    assert len(kept) == len(base)
    assert kept["doc_id"].max() < 10_000  # min-id row won


def test_minhash_lsh_finds_planted_near_dups(docs):
    base = docs.to_pandas()
    near = base.head(5).copy()
    near["doc_id"] = near["doc_id"] + 20_000
    near["text"] = near["text"] + " tail tweak"
    ds = ray.data.from_pandas(pd.concat([base, near], ignore_index=True))
    cand = minhash_lsh_candidates(ds).to_pandas()
    planted = {(i, i + 20_000) for i in range(5)}
    found = set(zip(cand["left_id"], cand["right_id"]))
    assert planted <= found
    verified = jaccard_verify(
        ray.data.from_pandas(cand), ds, threshold=0.6
    ).to_pandas()
    vfound = set(zip(verified["left_id"], verified["right_id"]))
    assert planted <= vfound
    assert (verified["jaccard"] >= 0.6).all()


def test_fused_near_dup_equals_staged_chain(docs):
    """minhash_near_dup_verified (3-shuffle fused form) must emit exactly the
    staged candidates -> jaccard_verify chain's verified pairs. margin_sigmas
    is cranked so the signature prefilter keeps everything — isolating the
    fused plumbing (shared shingles/sigs, pair-keyed dedup) from the
    statistical prefilter, which has its own planted-pair test below."""
    from kafka_connect_s3_ray.functions.dedup import minhash_near_dup_verified

    base = docs.to_pandas()
    near = base.head(8).copy()
    near["doc_id"] = near["doc_id"] + 20_000
    near["text"] = near["text"] + " tail tweak"
    ds = ray.data.from_pandas(pd.concat([base, near], ignore_index=True))

    staged = jaccard_verify(minhash_lsh_candidates(ds), ds,
                            threshold=0.6).to_pandas()
    fused = minhash_near_dup_verified(ds, threshold=0.6,
                                      margin_sigmas=1e6).to_pandas()
    key = lambda df: set(zip(df["left_id"], df["right_id"],
                             np.round(df["jaccard"], 12)))
    assert key(fused) == key(staged)
    assert len(fused) == len(fused[["left_id", "right_id"]].drop_duplicates())


def test_fused_near_dup_partitioned_prefilter_path(docs):
    """sig_broadcast_docs=0 forces the partitioned sig-exchange prefilter
    (the >200k-doc path); output must equal the broadcast-prefilter path."""
    from kafka_connect_s3_ray.functions.dedup import minhash_near_dup_verified

    base = docs.to_pandas()
    near = base.head(5).copy()
    near["doc_id"] = near["doc_id"] + 20_000
    near["text"] = near["text"] + " tail tweak"
    ds = ray.data.from_pandas(pd.concat([base, near], ignore_index=True))
    bc = minhash_near_dup_verified(ds, threshold=0.6).to_pandas()
    part = minhash_near_dup_verified(ds, threshold=0.6,
                                     sig_broadcast_docs=0).to_pandas()
    key = lambda df: set(zip(df["left_id"], df["right_id"],
                             np.round(df["jaccard"], 12)))
    assert key(bc) == key(part)


def test_fused_near_dup_prefilter_keeps_planted_pairs(docs):
    """Default 4-sigma signature prefilter must still recover every planted
    near-dup pair and emit exact jaccard values for them."""
    from kafka_connect_s3_ray.functions.dedup import minhash_near_dup_verified

    base = docs.to_pandas()
    near = base.head(5).copy()
    near["doc_id"] = near["doc_id"] + 20_000
    near["text"] = near["text"] + " tail tweak"
    ds = ray.data.from_pandas(pd.concat([base, near], ignore_index=True))
    out = minhash_near_dup_verified(ds, threshold=0.6).to_pandas()
    found = set(zip(out["left_id"], out["right_id"]))
    assert {(i, i + 20_000) for i in range(5)} <= found
    assert (out["jaccard"] >= 0.6).all()


def test_simhash_candidates(docs):
    base = docs.to_pandas().head(100)
    near = base.head(3).copy()
    near["doc_id"] = near["doc_id"] + 30_000  # identical text -> hamming 0
    ds = ray.data.from_pandas(pd.concat([base, near], ignore_index=True))
    cand = simhash_candidates(ds).to_pandas()
    found = set(zip(cand["left_id"], cand["right_id"]))
    assert {(i, i + 30_000) for i in range(3)} <= found
    assert (cand["hamming"] <= 3).all()


def test_embedding_near_dup(emb):
    base = emb.to_pandas()
    dup = base.head(4).copy()
    dup["vec_id"] = dup["vec_id"] + 40_000  # identical vectors -> cosine 1
    ds = ray.data.from_pandas(pd.concat([base, dup], ignore_index=True))
    pairs = embedding_near_dup(ds, threshold=0.999).to_pandas()
    found = set(zip(pairs["left_id"], pairs["right_id"]))
    assert {(i, i + 40_000) for i in range(4)} <= found


def test_brute_force_topk_matches_numpy(emb):
    pdf = emb.to_pandas()
    mat = np.stack(pdf["embedding"].to_list()).astype(np.float64)
    queries = mat[:3]
    got = brute_force_topk(emb, queries, k=5)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = mn @ qn.T
    for qi in range(3):
        expect_top = pdf["vec_id"].to_numpy()[np.argsort(-sims[:, qi])[:5]]
        g = got[got["query_id"] == qi]
        assert list(g["vec_id"]) == list(expect_top)
        assert g.iloc[0]["score"] >= g.iloc[-1]["score"]
    # self-match is rank 1 with score ~1
    assert got[got["query_id"] == 0].iloc[0]["vec_id"] == pdf["vec_id"].iloc[0]
    assert got[got["query_id"] == 0].iloc[0]["score"] > 0.999


def test_ivf_topk_high_recall(emb):
    pdf = emb.to_pandas()
    mat = np.stack(pdf["embedding"].to_list()).astype(np.float64)
    queries = mat[:3]
    exact = brute_force_topk(emb, queries, k=5)

    def recall(nprobe):
        approx = ivf_topk(emb, queries, k=5, n_clusters=8, nprobe=nprobe)
        return len(
            set(zip(exact["query_id"], exact["vec_id"]))
            & set(zip(approx["query_id"], approx["vec_id"]))
        ) / len(exact)

    # quality gate for the approximate regime (the catalog queries run
    # exhaustive-probe nprobe=8 and are oracle-checked; nprobe=6 is the
    # approximate path) — regressions below 0.9 recall@5 must fail here
    # (measured 0.93 on this fixture)
    assert recall(6) >= 0.9
    # probing every cluster = exhaustive scan; must equal brute force exactly
    assert recall(8) == 1.0


def test_kmeans_deterministic():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 8))
    c1 = kmeans_fit(x, 4, seed=42)
    c2 = kmeans_fit(x, 4, seed=42)
    assert np.allclose(c1, c2)


def test_multimodal_plumbing():
    media = synth_media(48)
    ds = ray.data.from_arrow(media)
    feats = ds.map_batches(
        MediaFeatureExtractor, batch_format="pyarrow", concurrency=2,
        batch_size=suggest_batch_size(4096, budget_bytes=64 * 1024),
    ).to_pandas()
    assert len(feats) == 48 and "payload" not in feats.columns
    assert all(len(f) == 40 for f in feats["features"])
    # determinism
    feats2 = ds.map_batches(
        MediaFeatureExtractor, batch_format="pyarrow", concurrency=2
    ).to_pandas()
    f1 = feats.sort_values("media_id")["features"].apply(tuple)
    f2 = feats2.sort_values("media_id")["features"].apply(tuple)
    assert (f1.values == f2.values).all()
    # frame sampling expands rows
    frames = ds.map_batches(FrameSampler(4), batch_format="pyarrow").to_pandas()
    assert len(frames) == 48 * 4
    assert set(frames["frame_idx"]) == {0, 1, 2, 3}
    # resize stage rewrites payload + metadata
    from kafka_connect_s3_ray.functions.multimodal import Resizer

    resized = ds.map_batches(Resizer(32, 32), batch_format="pyarrow",
                             concurrency=2).to_pandas()
    assert (resized["width"] == 32).all() and (resized["height"] == 32).all()
    orig_sizes = media.to_pandas()["payload"].str.len()
    assert (resized.sort_values("media_id")["payload"].str.len().to_numpy()
            <= orig_sizes.to_numpy()).all()
    # WAV/PPM/PNG/JPEG decode natively; a TRUNCATED JPEG must now fail
    # loudly as a decode error (it is a real codec), while MP3 under
    # decoder="real" remains the explicit dependency seam
    with pytest.raises(ValueError):
        MediaFeatureExtractor(decoder="real")._features(b"\xff\xd8\xff\xe0jpg")
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(decoder="real")._features(b"ID3\x04mp3 frames")
    with pytest.raises(NotImplementedError):
        Resizer(decoder="real")(pa.table({
            "payload": pa.array([b"ID3\x04mp3 frames"], pa.binary()),
            "width": pa.array([4], pa.int32()),
            "height": pa.array([4], pa.int32()),
        }))


def test_ngram_jaccard_empty_when_no_doc_has_ngrams(ray_session):
    """Docs with < n words produce the documented EMPTY pair set, not a
    pa.concat_tables crash."""
    import ray.data as rd

    from kafka_connect_s3_ray.functions.dedup import ngram_jaccard_pairs

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "text": ["one", None]}))
    out = ngram_jaccard_pairs(ds, n=2)
    # NB assert on the Dataset schema: Ray's to_pandas() drops columns of an
    # empty dataset
    assert out.schema().names == ["left_id", "right_id", "jaccard"]
    assert out.count() == 0


def test_fused_verified_empty_docs(ray_session):
    """The fused LSH+verify chain on an empty corpus returns a typed empty
    pair set instead of crashing in the broadcast gather."""
    import ray.data as rd

    from kafka_connect_s3_ray.functions.dedup import minhash_near_dup_verified

    ds = rd.from_pandas(pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                      "text": pd.Series([], dtype="object")}))
    out = minhash_near_dup_verified(ds, threshold=0.6)
    assert {"left_id", "right_id", "jaccard"} <= set(out.schema().names)
    assert out.count() == 0


def test_regex_redact_planted_pii_and_nulls():
    """The default PII rules scrub planted emails/SSNs/IPs/phones (the
    fixture has none — the catalog entry proves digits; this proves the PII
    set), counts are sequential-state counts, and NULL text stays NULL with
    a NULL count."""
    import pyarrow as pa

    from kafka_connect_s3_ray.functions.text import PII_RULES, regex_redact

    t = pa.table({"text": pa.array([
        "mail me at jo.doe+x@corp.example.com or 10.0.0.1",
        "ssn 123-45-6789 call +1 (415) 555-0100",
        "clean row",
        None,
    ])})
    out = regex_redact(t, PII_RULES)
    got = out.column("text").to_pylist()
    assert got[0] == "mail me at <EMAIL> or <IP>"
    assert got[1] == "ssn <ID> call <PHONE>"
    assert got[2] == "clean row"
    assert got[3] is None
    assert out.column("n_redactions").to_pylist() == [2, 2, 0, None]


def test_regex_redact_rule_order_is_sequential():
    """An earlier rule consumes text a later rule would match — counts must
    reflect the post-replacement state (the SQL oracle's nested stages)."""
    import pyarrow as pa

    from kafka_connect_s3_ray.functions.text import regex_redact

    t = pa.table({"text": pa.array(["abc abc"])})
    out = regex_redact(t, [("abc", "X"), ("X", "Y"), ("abc", "Z")])
    assert out.column("text").to_pylist() == ["Y Y"]
    # 2 (abc) + 2 (X) + 0 (abc already gone)
    assert out.column("n_redactions").to_pylist() == [4]


def test_regex_redact_keeps_other_columns_and_out_col():
    import pyarrow as pa

    from kafka_connect_s3_ray.functions.text import regex_redact

    t = pa.table({"id": [1, 2], "text": ["a1", "b22"]})
    out = regex_redact(t, [(r"\d+", "#")], out_col="clean")
    assert out.column_names == ["id", "text", "clean", "n_redactions"]
    assert out.column("text").to_pylist() == ["a1", "b22"]
    assert out.column("clean").to_pylist() == ["a#", "b#"]


def test_tfidf_top_terms_hand_computed():
    """Three tiny docs with a known vocabulary: df/tf/N and the integer
    ranking (tf desc, df asc, token asc) are verified against hand math."""
    import numpy as np
    import pandas as pd

    import ray.data

    from kafka_connect_s3_ray.functions.text import tfidf_top_terms

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["cat cat dog", "dog fish", None],
    }))
    out = tfidf_top_terms(docs, k=2).to_pandas().sort_values(
        ["doc_id", "token"]).reset_index(drop=True)
    # N = 2 docs with tokens; df: cat=1, dog=2, fish=1
    # doc 1 ranking: cat (tf=2) then dog (tf=1); doc 2: fish (tf=1, df=1)
    # beats dog (tf=1, df=2) on the rarity tiebreak
    assert list(zip(out["doc_id"], out["token"])) == [
        (1, "cat"), (1, "dog"), (2, "dog"), (2, "fish")]
    want = {("1", "cat"): 2 * np.log(2 / 1), ("1", "dog"): 1 * np.log(2 / 2),
            ("2", "dog"): 1 * np.log(2 / 2), ("2", "fish"): 1 * np.log(2 / 1)}
    for _, row in out.iterrows():
        assert abs(row["tfidf"] - want[(str(row["doc_id"]), row["token"])]) < 1e-6
    assert list(out.columns) == ["doc_id", "token", "tf", "df", "tfidf"]


def test_value_histogram_clamps_and_drops_nulls():
    import pandas as pd
    import ray.data

    from kafka_connect_s3_ray.functions.profile import value_histogram

    ds = ray.data.from_pandas(pd.DataFrame(
        {"v": [-5.0, 0.0, 9.99, 10.0, 95.0, 200.0, None]}))
    out = value_histogram(ds, "v", lo=0.0, hi=100.0, n_bins=10).to_pandas()
    # -5 clamps into bin 0, 200 into bin 9; 10.0 lands in bin 1 (left edge)
    got = dict(zip(out["bin"], out["n"]))
    assert got == {0: 3, 1: 1, 9: 2}
    assert dict(zip(out["bin"], out["bin_lo"])) == {0: 0.0, 1: 10.0, 9: 90.0}


def test_embedding_centroids_hand_computed():
    import pandas as pd
    import ray.data

    from kafka_connect_s3_ray.functions.profile import embedding_centroids

    ds = ray.data.from_pandas(pd.DataFrame({
        "label": [0, 0, 1],
        "embedding": [[1.0, 2.0], [3.0, 4.0], [10.0, 20.0]]}))
    out = embedding_centroids(ds).to_pandas()
    assert out.values.tolist() == [[0, 0, 2.0], [0, 1, 3.0],
                                   [1, 0, 10.0], [1, 1, 20.0]]


def test_mjpm_frame_sampling_real_decode(ray_session):
    """MJPM clips sample REAL frames: the offset table selects evenly-spaced
    frames whose byte slices decode to the planted images (pruned read ==
    full parse), the downstream extractor's mean-R drifts with the planted
    +5/frame brightness ramp, and clips shorter than n_frames emit every
    frame exactly once."""
    import numpy as np
    import pyarrow as pa

    import ray.data
    from kafka_connect_s3_ray.functions.multimodal import (
        FrameSampler, MediaFeatureExtractor, decode_jpeg, decode_ppm,
        encode_mjpm, encode_ppm, mjpm_index, synth_real_video)

    tbl = synth_real_video(6, seed=7)
    frames = (ray.data.from_arrow(tbl)
              .map_batches(FrameSampler(4), batch_format="pyarrow")
              .to_pandas())
    # every clip has >= 6 frames, so exactly 4 sampled rows per clip
    assert (frames.groupby("media_id").size() == 4).all()
    assert (frames.groupby("media_id")["frame_idx"].min() == 0).all()
    # each sampled slice IS a decodable image equal to a direct full parse
    payload = tbl.column("payload").to_pylist()[0]
    offs, fps = mjpm_index(payload)
    assert fps == 8
    sampled = frames[frames["media_id"] == 0].sort_values("frame_idx")
    for fi, raw in zip(sampled["frame_idx"], sampled["frame"]):
        direct = payload[offs[fi]:offs[fi + 1]]
        assert bytes(raw) == direct
        img = decode_jpeg(direct) if direct.startswith(b"\xff\xd8") \
            else decode_ppm(direct)
        assert img.ndim == 3 and img.shape[2] == 3
    # the planted +5/frame ramp shows up in decoded mean-R (monotone drift)
    fr = (ray.data.from_arrow(pa.table({
        "media_id": pa.array(sampled["media_id"], pa.int64()),
        "frame_idx": pa.array(sampled["frame_idx"], pa.int32()),
        "payload": pa.array([bytes(b) for b in sampled["frame"]],
                            pa.binary())}))
        .map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                     concurrency=1)
        .to_pandas().sort_values("frame_idx"))
    mean_r = np.array([f[0] for f in fr["features"]])
    assert (np.diff(mean_r) > 0).all()
    # short clip: every frame once
    short = encode_mjpm([encode_ppm(np.zeros((4, 4, 3), np.uint8))] * 2)
    two = (ray.data.from_arrow(pa.table({
        "media_id": pa.array([9], pa.int64()),
        "payload": pa.array([short], pa.binary())}))
        .map_batches(FrameSampler(4), batch_format="pyarrow").to_pandas())
    assert sorted(two["frame_idx"]) == [0, 1]


def test_mjpm_corrupt_payload_falls_back(ray_session):
    """A magic-prefixed but corrupt payload must NOT kill the stage: the
    sampler falls back to the byte-slice stub (fourth review batch)."""
    import pyarrow as pa

    import ray.data
    from kafka_connect_s3_ray.functions.multimodal import FrameSampler

    bad = [b"MJPMx", b"MJPM" + b"\xff" * 20]
    out = (ray.data.from_arrow(pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array(bad, pa.binary())}))
        .map_batches(FrameSampler(3), batch_format="pyarrow").to_pandas())
    # stub path: 3 byte-slices per payload, nothing raised
    assert (out.groupby("media_id").size() == 3).all()
