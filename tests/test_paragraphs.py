"""Chunk (paragraph-level) dedup: planted cross-doc and within-doc dups,
first-occurrence ordering, all-lost docs, boundary math, reference
equality, layout invariance."""
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from kafka_connect_s3_ray.functions.paragraphs import chunk_dedup

C = 4  # small chunk size makes fixtures readable


def _run(docs, chunk_tokens=C, parts=None):
    ds = ray.data.from_arrow(docs)
    if parts:
        ds = ds.repartition(parts)
    out = chunk_dedup(ds, chunk_tokens=chunk_tokens).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _reference(docs, chunk_tokens=C):
    seen, rows = set(), []
    df = docs.to_pandas().sort_values("doc_id")
    for _, r in df.iterrows():
        toks = ("" if r.text is None else r.text).lower().split()
        n = (len(toks) + chunk_tokens - 1) // chunk_tokens
        kept = []
        for j in range(n):
            ch = " ".join(toks[j * chunk_tokens:(j + 1) * chunk_tokens])
            if ch not in seen:
                seen.add(ch)
                kept.append(ch)
        rows.append({"doc_id": r.doc_id, "text": " ".join(kept),
                     "n_chunks_kept": len(kept), "n_chunks_total": n})
    return pd.DataFrame(rows)


def _docs(texts):
    return pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_cross_doc_dup_removed():
    docs = _docs(["a b c d e f g h",          # chunks: 'a b c d', 'e f g h'
                  "a b c d x y z w",          # first chunk is a dup of doc 0's
                  "q r s t"])
    out = _run(docs)
    assert out.loc[1, "text"] == "x y z w"
    assert out.loc[1, "n_chunks_kept"] == 1
    assert out.loc[1, "n_chunks_total"] == 2
    assert out.loc[0, "text"] == "a b c d e f g h"  # first occurrence intact


def test_within_doc_dup_removed():
    docs = _docs(["a b c d a b c d e f"])  # chunk 0 == chunk 1, tail 'e f'
    out = _run(docs)
    assert out.loc[0, "text"] == "a b c d e f"
    assert out.loc[0, "n_chunks_kept"] == 2
    assert out.loc[0, "n_chunks_total"] == 3


def test_doc_losing_everything_surfaces_empty():
    docs = _docs(["a b c d", "a b c d"])
    out = _run(docs)
    assert out.loc[1, "text"] == ""
    assert out.loc[1, "n_chunks_kept"] == 0
    assert out.loc[1, "n_chunks_total"] == 1
    assert len(out) == 2


def test_null_and_empty_docs():
    docs = _docs([None, "", "a b"])
    out = _run(docs)
    assert out["n_chunks_total"].tolist() == [0, 0, 1]
    assert out["text"].tolist() == ["", "", "a b"]


def test_boundary_math():
    toks = " ".join(f"t{i}" for i in range(9))  # 9 tokens, C=4 -> 4+4+1
    out = _run(_docs([toks]))
    assert out.loc[0, "n_chunks_total"] == 3
    assert out.loc[0, "text"] == toks


def test_matches_reference_random():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(6)]  # tiny vocab -> plenty of dup chunks
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 20)))
             for _ in range(60)]
    docs = _docs(texts)
    got = _run(docs, parts=5)
    exp = _reference(docs)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True),
                                  check_dtype=False)


def test_paragraph_split_mode():
    docs = _docs(["Intro para.\n\nShared para.\n\nTail one.",
                  "Shared para.\n\nFresh para."])
    out = (chunk_dedup(ray.data.from_arrow(docs), split_re=r"\n{2,}",
                       join_sep="\n\n").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "text"] == "Intro para.\n\nShared para.\n\nTail one."
    assert out.loc[1, "text"] == "Fresh para."
    assert out.loc[1, "n_chunks_kept"] == 1
    assert out.loc[1, "n_chunks_total"] == 2


def test_layout_invariance():
    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(5)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 15)))
             for _ in range(40)]
    docs = _docs(texts)
    a = _run(docs, parts=2)
    b = _run(docs, parts=9)
    pd.testing.assert_frame_equal(a, b)
