"""Exact repeated-span detection (functions/spans.py): planted passages,
within-doc repetition, merge semantics (overlap AND touch), min_count,
degenerate corpora. The corpus-level oracle parity lives in
tests/test_queries.py (`duplicate_spans` in SQL_CHECKED).
"""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from kafka_connect_s3_ray.functions.spans import duplicate_spans


def _run(texts: dict, k: int = 4, **kw) -> set:
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
    }))
    out = duplicate_spans(docs, k=k, **kw).to_pandas()
    return {(r.doc_id, r.span_start, r.span_end) for r in out.itertuples()}


def test_planted_shared_passage(ray_session):
    # docs 1 and 2 share tokens 2..8 ("c d e f g h"); k=4 windows of the
    # shared run occur twice -> one maximal span per doc covering the run
    texts = {
        1: "a b c d e f g h",
        2: "x y c d e f g h",
        3: "p q r s t u v w",
    }
    spans = _run(texts, k=4)
    assert spans == {(1, 2, 8), (2, 2, 8)}


def test_within_doc_repetition_counts(ray_session):
    # the repeated phrase occurs twice INSIDE one doc: both occurrences
    # are duplicated windows (corpus-wide count >= 2 includes same-doc)
    texts = {7: "m n o p z z z m n o p"}
    spans = _run(texts, k=4)
    assert spans == {(7, 0, 4), (7, 7, 11)}


def test_touching_windows_merge(ray_session):
    # two disjoint duplicated 4-windows at pos 0 and pos 4 in doc 1 merge
    # into one contiguous span [0, 8) (touch rule: pos <= running end)
    texts = {
        1: "a b c d e f g h",
        2: "a b c d q r s t",
        3: "w x y z e f g h",
    }
    spans = _run(texts, k=4)
    assert (1, 0, 8) in spans
    assert (2, 0, 4) in spans and (3, 4, 8) in spans


def test_min_count_three(ray_session):
    texts = {
        1: "a b c d",
        2: "a b c d",
        3: "a b c d",
        4: "p q r s",
        5: "p q r s",
    }
    assert _run(texts, k=4, min_count=3) == {(1, 0, 4), (2, 0, 4),
                                             (3, 0, 4)}
    assert _run(texts, k=4, min_count=2) == {(i, 0, 4) for i in range(1, 6)}


def test_unique_and_short_corpora(ray_session):
    # all-unique corpus -> no spans; sub-k and empty docs never emit
    texts = {1: "a b c d e", 2: "f g h i j", 3: "k", 4: ""}
    out_ds = duplicate_spans(rd.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
    })), k=4)
    assert out_ds.schema().names == ["doc_id", "span_start", "span_end"]
    assert out_ds.count() == 0


def test_spans_match_bruteforce_on_random_corpus(ray_session):
    # randomized cross-check vs a dict-of-strings brute force, incl. the
    # island merge, on a corpus engineered to have many repeats
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    texts = {i: " ".join(rng.choice(vocab, rng.integers(4, 30)))
             for i in range(60)}
    k = 3
    spans = _run(texts, k=k)

    from collections import Counter
    wins = Counter()
    per_doc = {}
    for d, s in texts.items():
        toks = s.split()
        per_doc[d] = [" ".join(toks[i:i + k])
                      for i in range(len(toks) - k + 1)]
        wins.update(per_doc[d])
    expect = set()
    for d, ws in per_doc.items():
        pos = [i for i, w in enumerate(ws) if wins[w] >= 2]
        cur = None
        for p in pos:
            if cur and p <= cur[1]:
                cur = (cur[0], max(cur[1], p + k))
            else:
                if cur:
                    expect.add((d, cur[0], cur[1]))
                cur = (p, p + k)
        if cur:
            expect.add((d, cur[0], cur[1]))
    assert spans == expect and len(expect) > 10


def _mk_docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))


def test_remove_duplicate_spans_cuts_all_copies(ray_session):
    """Lee et al. tool semantics: EVERY occurrence of the duplicated
    passage is removed — from both docs, including within-doc repeats."""
    from kafka_connect_s3_ray.functions.spans import remove_duplicate_spans

    passage = "the quick brown fox jumps over the lazy dog again today"
    ds = _mk_docs([
        (1, f"alpha beta {passage} gamma"),
        (2, f"start tokens here {passage} trailing words"),
        (3, "totally unique text with no duplicated content at all whatsoever"),
        (4, None),
    ])
    out = (remove_duplicate_spans(ds, k=8).to_pandas()
           .sort_values("doc_id").set_index("doc_id"))
    assert out.loc[1, "text_clean"] == "alpha beta gamma"
    assert out.loc[2, "text_clean"] == "start tokens here trailing words"
    assert (out.loc[3, "text_clean"]
            == "totally unique text with no duplicated content at all whatsoever")
    assert out.loc[4, "text_clean"] is None


def test_remove_duplicate_spans_fully_duplicated_doc_becomes_empty(ray_session):
    from kafka_connect_s3_ray.functions.spans import remove_duplicate_spans

    passage = " ".join(f"w{i}" for i in range(10))
    ds = _mk_docs([(1, passage), (2, passage), (3, "something else entirely")])
    out = (remove_duplicate_spans(ds, k=8).to_pandas()
           .sort_values("doc_id").set_index("doc_id"))
    assert out.loc[1, "text_clean"] == "" and out.loc[2, "text_clean"] == ""
    assert out.loc[3, "text_clean"] == "something else entirely"


def test_remove_duplicate_spans_scale_path_equals_broadcast(ray_session):
    """broadcast_budget_rows=0 forces the coarse doc-bucket union path —
    identical output to the broadcast path on a mixed corpus."""
    from kafka_connect_s3_ray.functions.spans import remove_duplicate_spans

    passage = "one two three four five six seven eight nine ten"
    rows = [(i, f"doc {i} filler {passage} tail{i} more words here")
            for i in range(8)]
    rows += [(100, "unique unduplicated document body"), (101, None)]
    ds = _mk_docs(rows)
    bc = (remove_duplicate_spans(ds, k=8).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    sc = (remove_duplicate_spans(ds, k=8, broadcast_budget_rows=0)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(bc, sc)
    # "filler" precedes the passage in EVERY doc, so the duplicated span
    # correctly swallows it too (8-token windows straddle the boundary)
    assert (bc.set_index("doc_id").loc[0, "text_clean"]
            == "doc 0 tail0 more words here")


def test_remove_duplicate_spans_no_dups_is_token_normalized_identity(ray_session):
    from kafka_connect_s3_ray.functions.spans import remove_duplicate_spans

    ds = _mk_docs([(1, "  spaced   out    tokens "), (2, "plain text")])
    out = (remove_duplicate_spans(ds, k=8).to_pandas()
           .sort_values("doc_id").set_index("doc_id"))
    assert out.loc[1, "text_clean"] == "spaced out tokens"
    assert out.loc[2, "text_clean"] == "plain text"
