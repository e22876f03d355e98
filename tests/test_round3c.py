"""Late-round-3 additions: per-group z-score outliers, BM25 ranked
retrieval, distributed greedy sequence packing."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def test_zscore_outliers_null_and_degenerate_contracts():
    """NULL groups/values are excluded, a constant group (sd = 0) emits no
    rows, and the surviving z values match the single-machine formula."""
    from kafka_connect_s3_ray.functions.profile import zscore_outliers

    df = pd.DataFrame({
        "event_id": np.arange(12, dtype=np.int64),
        "grp": ["a"] * 8 + ["const", "const", None, "a"],
        "value": [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 100.0,
                  5.0, 5.0, 2.0, None],
    })
    out = zscore_outliers(ray.data.from_pandas(df), "grp", "value",
                          threshold=2.0).to_pandas()
    # group a: mean=13.375, var=(8*1+10000)/8 - mu^2 -> only the 100.0 row
    # has |z| > 2; const group sd=0 -> dropped; NULL group/value -> dropped
    v = np.array([1.0] * 7 + [100.0])
    mu, sd = v.mean(), v.std()
    assert list(out["event_id"]) == [7]
    assert abs(out["z"].iloc[0] - round((100.0 - mu) / sd, 6)) < 1e-12


def test_bm25_ranking_and_null_contracts():
    """Rarer terms outscore common ones at equal tf; NULL/empty docs and
    docs without any query term are excluded; the k-cut keeps the best k by
    (score desc, doc_id asc)."""
    from kafka_connect_s3_ray.functions.text import bm25_search

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "rare word soup",          # 'rare' df=1 -> high idf
            "common common filler",    # 'common' df=3 -> low idf
            "common mix rare common",  # both terms
            "common only",
            "",                        # empty: excluded
            None,                      # null: excluded
        ],
    })
    out = bm25_search(ray.data.from_pandas(df), ["rare", "common"],
                      k=3).to_pandas()
    assert len(out) == 3
    # doc 2 has both terms -> top; doc 0 (rare alone) beats the common-only
    # docs despite equal tf because idf('rare') > idf('common')
    assert out["doc_id"].iloc[0] == 2
    assert out["doc_id"].iloc[1] == 0
    assert (out["score"] > 0).all()
    # single-machine replay of the Robertson formula for doc 0
    # ('rare' is in docs 0 and 2 -> df=2)
    N, dl, avgdl = 6, 3, (3 + 3 + 4 + 2 + 0 + 0) / 6
    idf_rare = np.log(1 + (N - 2 + 0.5) / (2 + 0.5))
    exp = idf_rare * 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert abs(out["score"].iloc[1] - round(exp, 6)) < 1e-9


def _brute_pack(ntok, budget):
    seq, fill, sid = [], None, -1
    for n in ntok:
        if sid < 0 or fill + n > budget:
            sid += 1
            fill = n
        else:
            fill += n
        seq.append(sid)
    return np.array(seq)


def test_pack_sequences_matches_sequential_fold():
    """The two-level scan equals the sequential greedy fold for every
    partition size — including zero-token docs, oversized docs (> budget,
    own sequence), and sparse non-contiguous doc ids."""
    from kafka_connect_s3_ray.functions.packing import pack_sequences

    rng = np.random.default_rng(11)
    for trial in range(3):
        nd = int(rng.integers(50, 300))
        budget = int(rng.choice([16, 64]))
        ntok = rng.integers(0, 12, nd)
        ntok[rng.random(nd) < 0.05] = 0
        ntok[rng.random(nd) < 0.05] = budget + int(rng.integers(1, 9))
        ids = np.sort(rng.choice(5000, nd, replace=False)).astype(np.int64)
        df = pd.DataFrame({"doc_id": ids,
                           "text": [" ".join(["w"] * int(k)) for k in ntok]})
        exp = _brute_pack(ntok, budget)
        for ps in [7, 64, 100000]:
            out = pack_sequences(ray.data.from_pandas(df), budget=budget,
                                 part_size=ps).to_pandas()
            out = out.sort_values("doc_id")
            assert (out["n_tokens"].to_numpy() == ntok).all()
            assert (out["seq_id"].to_numpy() == exp).all(), (trial, ps)


def test_bm25_empty_result_and_case_normalization():
    """An absent term returns a TYPED empty result (no KeyError from Ray's
    empty to_pandas); mixed-case query terms are lowercased once rather than
    silently matching nothing."""
    from kafka_connect_s3_ray.functions.text import bm25_search

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["merge merge", "scan"]})
    empty = bm25_search(ray.data.from_pandas(df), ["absent"], k=5).to_pandas()
    assert list(empty.columns) == ["doc_id", "score"] and len(empty) == 0
    upper = bm25_search(ray.data.from_pandas(df), ["Merge"], k=5).to_pandas()
    assert list(upper["doc_id"]) == [1]


def test_zscore_all_filtered_block_keeps_schema():
    """Blocks whose rows are all NULL-group/NULL-value emit typed empty
    partials — the union's schema stays (g: string, ...) and the result is
    still exact."""
    from kafka_connect_s3_ray.functions.profile import zscore_outliers

    good = pd.DataFrame({"event_id": np.arange(8, dtype=np.int64),
                         "grp": ["a"] * 8,
                         "value": [1.0] * 7 + [100.0]})
    dead = pd.DataFrame({"event_id": np.arange(8, 12, dtype=np.int64),
                         "grp": [None] * 4,
                         "value": [None] * 4})
    ds = ray.data.from_pandas([good, dead])  # one all-filtered block
    out = zscore_outliers(ds, "grp", "value", threshold=2.0).to_pandas()
    assert list(out["event_id"]) == [7]


def test_seeded_shuffle_permutation_properties():
    """A true 0..n-1 permutation; identical across block layouts; a
    different seed yields a different permutation."""
    from kafka_connect_s3_ray.functions.sample import seeded_shuffle

    ids = np.arange(-50, 450, dtype=np.int64)  # negative keys too
    df = pd.DataFrame({"doc_id": ids})

    def run(nblocks, seed):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        out = seeded_shuffle(ds, "doc_id", seed=seed).to_pandas()
        return out.sort_values("doc_id")["shuffle_pos"].to_numpy()

    a = run(1, seed=7)
    assert sorted(a) == list(range(len(ids)))
    assert (a == run(5, seed=7)).all()          # layout-invariant
    assert (a != run(5, seed=8)).any()          # seed changes the order


def test_global_rank_ties_and_constant_column():
    """Duplicate values rank by id; a constant column (one degenerate
    bucket) still yields the exact 0..n-1 ranks; pct spans [0, 1]."""
    from kafka_connect_s3_ray.functions.quantiles import global_rank

    df = pd.DataFrame({"event_id": np.arange(20, dtype=np.int64),
                       "value": [5.0] * 10 + list(range(10))})
    out = global_rank(ray.data.from_pandas(df).repartition(3),
                      "value", "event_id").to_pandas()
    out = out.sort_values("rnk").reset_index(drop=True)
    assert list(out["rnk"]) == list(range(20))
    exp = df.sort_values(["value", "event_id"])["event_id"].to_numpy()
    assert (out["event_id"].to_numpy() == exp).all()
    assert out["pct"].iloc[0] == 0.0 and out["pct"].iloc[-1] == 1.0

    const = pd.DataFrame({"event_id": np.arange(7, dtype=np.int64),
                          "value": [3.0] * 7})
    got = global_rank(ray.data.from_pandas(const), "value",
                      "event_id").to_pandas().sort_values("rnk")
    assert list(got["event_id"]) == list(range(7))


def test_pmi_pairs_hand_computed():
    """Hand-checked PMI on a tiny corpus: pair normalization is unordered,
    cross-doc pairs never form, and the value matches the formula."""
    from kafka_connect_s3_ray.functions.text import pmi_pairs

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b a b", "b a"],  # forward pairs within window 2:
        #   doc1: (a,b) (b,a) (a,b) -> normalized (a,b) x3; doc2: (b,a) -> x1
    })
    out = pmi_pairs(ray.data.from_pandas(df), window=2, min_count=1,
                    k=5).to_pandas()
    assert list(zip(out["u"], out["v"])) == [("a", "b")]
    assert out["pair_count"].iloc[0] == 4
    # T=6 tokens, c_a=3, c_b=3, C=4 pairs, c_ab=4
    exp = np.log((4 / 4) * 6 * 6 / (3 * 3))
    assert abs(out["pmi"].iloc[0] - round(exp, 6)) < 1e-12


def test_degenerate_inputs_return_typed_empty():
    """All-null/zero-token degenerate corpora return typed empty results
    (the oracle's empty set), never a crash or an int64-everything schema."""
    import pyarrow as pa

    from kafka_connect_s3_ray.functions.quantiles import global_rank
    from kafka_connect_s3_ray.functions.sample import sample_exact_k
    from kafka_connect_s3_ray.functions.text import pmi_pairs

    dead_docs = pd.DataFrame({"doc_id": [1, 2], "text": [None, ""]})
    out = pmi_pairs(ray.data.from_pandas(dead_docs)).to_pandas()
    assert len(out) == 0 and list(out.columns) == ["u", "v", "pair_count",
                                                   "pmi"]

    dead_vals = pd.DataFrame({"event_id": [1, 2],
                              "value": pd.array([None, None],
                                                dtype="float64")})
    out = global_rank(ray.data.from_pandas(dead_vals), "value",
                      "event_id").to_pandas()
    assert len(out) == 0

    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "name": pa.array([], pa.string())})
    t = sample_exact_k(ray.data.from_arrow(empty), "event_id", k=3,
                       keep_cols=["name"])
    assert t.num_rows == 0
    assert pa.types.is_string(t.schema.field("name").type)


def test_sample_exact_k_deterministic_and_exact_size():
    """Exactly k rows, identical across block layouts, k >= n returns all
    rows, and the selection equals the single-machine k-smallest-hash set."""
    from kafka_connect_s3_ray.functions.sample import key_hash, sample_exact_k

    ids = np.arange(200, dtype=np.int64)
    df = pd.DataFrame({"event_id": ids, "user_id": ids % 7})
    exp = set(ids[np.argsort(key_hash(ids, salt=3), kind="stable")[:25]])

    for nblocks in [1, 6]:
        out = sample_exact_k(ray.data.from_pandas(df).repartition(nblocks),
                             "event_id", k=25, seed=3,
                             keep_cols=["user_id"]).to_pandas()
        assert len(out) == 25 and set(out["event_id"]) == exp
    allr = sample_exact_k(ray.data.from_pandas(df), "event_id", k=500,
                          seed=3).to_pandas()
    assert len(allr) == 200


def test_grouped_packing_equals_per_group_runs():
    """Grouped packing must equal filtering each group and packing it alone
    (seq_id restarts per group), across partition sizes."""
    from kafka_connect_s3_ray.functions.packing import pack_sequences

    rng = np.random.default_rng(5)
    nd = 120
    ids = np.arange(nd, dtype=np.int64)
    grp = rng.choice(["x", "y", "z"], nd)
    ntok = rng.integers(0, 30, nd)
    df = pd.DataFrame({"doc_id": ids, "src": grp,
                       "text": [" ".join(["w"] * int(k)) for k in ntok]})
    for ps in [16, 100000]:
        got = pack_sequences(ray.data.from_pandas(df), budget=64,
                             part_size=ps, group_col="src").to_pandas()
        got = got.sort_values("doc_id").reset_index(drop=True)
        for g in ["x", "y", "z"]:
            sub = df[df["src"] == g]
            solo = pack_sequences(ray.data.from_pandas(sub), budget=64,
                                  part_size=ps).to_pandas()
            solo = solo.sort_values("doc_id")
            mine = got[got["src"] == g].sort_values("doc_id")
            assert (mine["seq_id"].to_numpy()
                    == solo["seq_id"].to_numpy()).all(), (ps, g)


def test_pack_cli_writes_resumable_shards(tmp_path):
    """The pack CLI writes hive-partitioned shards (one dir per doc-id
    range) whose assignment equals the library call."""
    import pyarrow.dataset as pads

    from kafka_connect_s3_ray.__main__ import main
    from kafka_connect_s3_ray.functions.packing import pack_sequences

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "shards")
    assert main(["pack", "--docs", src, "--out", out,
                 "--part-size", "128", "--budget", "256"]) == 0
    t = pads.dataset(out, partitioning="hive").to_table().to_pandas()
    lib = pack_sequences(ray.data.read_parquet(src), budget=256,
                         part_size=128).to_pandas()
    t = t.sort_values("doc_id").reset_index(drop=True)
    lib = lib.sort_values("doc_id").reset_index(drop=True)
    assert (t["seq_id"].to_numpy() == lib["seq_id"].to_numpy()).all()
    assert (t["shard"].astype(int).to_numpy()
            == t["doc_id"].to_numpy() // 128).all()

    # TRUE resume: delete one shard, re-run -> only it is rewritten, no
    # duplicate rows anywhere (write_parquet alone would APPEND)
    import shutil

    victim = sorted(d for d in (tmp_path / "shards").iterdir()
                    if d.name.startswith("shard="))[1]
    shutil.rmtree(victim)
    assert main(["pack", "--docs", src, "--out", out,
                 "--part-size", "128", "--budget", "256"]) == 0
    t2 = pads.dataset(out, partitioning="hive").to_table().to_pandas()
    t2 = t2.sort_values("doc_id").reset_index(drop=True)
    assert len(t2) == len(t)
    assert (t2["seq_id"].to_numpy() == t["seq_id"].to_numpy()).all()


def test_grouped_packing_preserves_group_dtype():
    """An int64 group column comes back as int64 (never a string cast), and
    a doc id repeated ACROSS groups is legal in grouped mode."""
    from kafka_connect_s3_ray.functions.packing import pack_sequences

    df = pd.DataFrame({"doc_id": [1, 2, 1, 2],
                       "dom": np.array([10, 10, 20, 20], np.int64),
                       "text": ["a b", "c", "d", "e f"]})
    out = pack_sequences(ray.data.from_pandas(df), budget=4,
                         part_size=64, group_col="dom").to_pandas()
    assert out["dom"].dtype == np.int64
    assert len(out) == 4
    assert set(out["dom"]) == {10, 20}


def test_order_revenue_empty_join_returns_typed_empty(tmp_path):
    """No matching segment -> empty 4-column result (Ray's empty to_pandas
    guard), matching the oracle's empty set."""
    import pyarrow.parquet as pq

    from kafka_connect_s3_ray.pipelines.queries import q_order_revenue

    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_mktsegment": pa.array(["NOPE"], pa.string())}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([5], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp("1997-01-01")]),
        "o_orderpriority": pa.array(["1-URGENT"], pa.string())}),
        str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([5], pa.int64()),
        "l_extendedprice": pa.array([10.0], pa.float64()),
        "l_discount": pa.array([0.1], pa.float64()),
        "l_shipdate": pa.array([pd.Timestamp("1999-01-01")])}),
        str(tmp_path / "lineitem.parquet"))
    out = q_order_revenue(str(tmp_path))
    df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert len(df) == 0
    assert list(df.columns) == ["o_orderkey", "o_orderdate",
                                "o_orderpriority", "revenue"]

    # second empty path: segment matches but the date cut empties orders
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_mktsegment": pa.array(["BUILDING"], pa.string())}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([5], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp("1999-01-01")]),
        "o_orderpriority": pa.array(["1-URGENT"], pa.string())}),
        str(tmp_path / "orders.parquet"))
    out = q_order_revenue(str(tmp_path))
    df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert len(df) == 0


def test_pack_sequences_rejects_bad_ids():
    import pytest as _pytest

    from kafka_connect_s3_ray.functions.packing import pack_sequences

    dup = pd.DataFrame({"doc_id": [1, 1, 2], "text": ["a", "b", "c"]})
    with _pytest.raises(Exception, match="duplicate"):
        pack_sequences(ray.data.from_pandas(dup), budget=8).to_pandas()
    nul = pd.DataFrame({"doc_id": [1.0, None], "text": ["a", "b"]})
    with _pytest.raises(Exception, match="NULL"):
        pack_sequences(ray.data.from_pandas(nul), budget=8).to_pandas()
