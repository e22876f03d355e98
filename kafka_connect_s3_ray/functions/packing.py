"""Distributed greedy sequence packing: assign documents, in doc-id order,
to fixed-token-budget training sequences (doc j joins the current sequence
iff fill + n_tokens(j) <= budget, else it starts a new one; an oversized doc
sits alone in its own sequence).

Greedy packing is a SEQUENTIAL fold, but its per-partition effect is a pure
function of one bounded input: the incoming fill state (0..budget, plus one
"saturated" state for fill > budget — behaviour depends only on min(fill,
budget+1)). That makes it a classic two-level scan:

1. partition docs by CONTIGUOUS id range (p = doc_id // part_size — stable
   under any block layout or cluster shape, unlike Ray block identity);
2. pass 1: per partition, compute the full state-transition table
   s -> (out_state, sequences_started) for every incoming state s, fully
   vectorized (one batched searchsorted for the continuation cuts + binary
   lifting over the seq-start chain, O(n log n) numpy, no Python per doc);
3. the driver folds the tiny tables in partition order (O(partitions));
4. pass 2: per partition, replay the greedy walk from its now-known incoming
   (state, seq offset) — O(#sequences) searchsorted steps.

Both groupby exchanges move only (doc_id, n_tokens, p) — 24 bytes/doc, never
text. The SQL oracle is the same fold as a recursive CTE, so the contract is
checkable value-for-value at test scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _pack_table(n: np.ndarray, budget: int):
    """State-transition table of greedy packing over token counts ``n``
    (doc order): for every incoming state s in 0..budget+1 (budget+1 =
    saturated, also the initial state), returns (out_state[s], n_seqs[s]) —
    the partition's outgoing state and how many sequences START inside it."""
    L = int(budget)
    nd = len(n)
    S = L + 2
    out_state = np.empty(S, np.int64)
    n_seqs = np.empty(S, np.int64)
    if nd == 0:
        out_state[:] = np.arange(S)
        n_seqs[:] = 0
        return out_state, n_seqs
    cum = np.cumsum(n)
    total = int(cum[-1])
    # continuation cut per state: leading docs that still fit the incoming
    # sequence (saturated: none — the next doc always starts fresh)
    cuts = np.searchsorted(cum, L - np.arange(L + 1), side="right")
    cuts = np.append(cuts, 0)
    # seq-start chain: a sequence starting at doc j ends before ns[j]
    cumb = cum - n
    ns = np.searchsorted(cum, cumb + L, side="right")
    ns = np.maximum(ns, np.arange(nd) + 1)          # oversized doc sits alone
    anc = [np.append(ns, nd)]                       # sentinel: nd -> nd
    K = max(1, int(np.ceil(np.log2(nd + 1))))
    for _ in range(K):
        anc.append(anc[-1][anc[-1]])
    # chain walk for each DISTINCT cut position (<= S of them)
    uc = np.unique(cuts)
    inner = uc[uc < nd]
    steps = np.ones(len(inner), np.int64)
    cur = inner.copy()
    for k in range(K, -1, -1):
        nxt = anc[k][cur]
        take = nxt < nd
        steps += take.astype(np.int64) << k
        cur = np.where(take, nxt, cur)
    fill = total - (cum[cur] - n[cur])              # last sequence's fill
    state = np.where(fill <= L, fill, L + 1)
    seq_of = dict(zip(inner.tolist(), steps.tolist()))
    st_of = dict(zip(inner.tolist(), state.tolist()))
    for s in range(S):
        c = int(cuts[s])
        if c == nd:          # whole partition joins the open seq (s <= L:
            out_state[s] = s + total                # the saturated cut is 0)
            n_seqs[s] = 0
        else:
            out_state[s] = st_of[c]
            n_seqs[s] = seq_of[c]
    return out_state, n_seqs


def _pack_assign(n: np.ndarray, budget: int, state: int,
                 offset: int) -> np.ndarray:
    """Replay the greedy walk over one partition from a known incoming
    (state, global seq offset): O(#sequences) searchsorted steps."""
    L = int(budget)
    nd = len(n)
    seq = np.empty(nd, np.int64)
    cum = np.cumsum(n)
    c = int(np.searchsorted(cum, L - state, side="right")) if state <= L else 0
    if c > 0:
        seq[:c] = offset - 1                        # continue the open seq
    start, sid = c, offset
    while start < nd:
        end = int(np.searchsorted(cum, cum[start] - n[start] + L,
                                  side="right"))
        end = max(end, start + 1)
        seq[start:end] = sid
        sid += 1
        start = end
    return seq


def pack_sequences(docs, budget: int = 512, part_size: int = 65536,
                   id_col: str = "doc_id", text_col: str = "text",
                   group_col: str | None = None):
    """Greedy fixed-budget sequence packing over a document Dataset, exact
    and deterministic at any parallelism. Returns a Dataset of
    (id_col, [group_col,] n_tokens, seq_id) — seq_id is the 0-based
    sequence index in doc-id order, GLOBAL by default or restarting per
    group when ``group_col`` is given (per-domain training shards: each
    group packs independently, exactly as if filtered and packed alone —
    the driver fold simply resets at each group boundary). Token counts are
    exact whitespace tokens (NULL text -> 0, the ``\\S+`` contract shared
    with the token_count oracle). Requires non-null doc ids, unique GLOBALLY
    by default and unique WITHIN EACH GROUP when grouped (raised otherwise —
    packing order is undefined under duplicates; a doc id repeated across
    two groups is legal in grouped mode, where each group packs alone), and
    non-null group values. The group column's values and dtype pass through
    unchanged."""
    import ray

    keys = (["g"] if group_col else []) + ["p"]

    def project(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        if ids.null_count:
            raise ValueError(f"pack_sequences: NULL {id_col}")
        ids = pc.cast(ids, pa.int64())
        text = pc.fill_null(pc.cast(t.column(text_col), pa.string()), "")
        ntok = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        # exact int64 floor division (floats would drift above 2^53)
        p = ids.to_numpy(zero_copy_only=False) // part_size
        cols = {id_col: ids, "n_tokens": ntok, "p": pa.array(p, pa.int64())}
        if group_col:
            gcol = t.column(group_col)
            if gcol.null_count:
                raise ValueError(f"pack_sequences: NULL {group_col}")
            cols["g"] = gcol  # original values/dtype pass through
        return pa.table(cols)

    meta = docs.map_batches(project, batch_format="pyarrow").materialize()

    def table_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        if g[id_col].duplicated().any():
            raise ValueError(f"pack_sequences: duplicate {id_col}")
        out_state, n_seqs = _pack_table(
            g["n_tokens"].to_numpy(np.int64), budget)
        row = {k: [g[k].iloc[0]] for k in keys}
        row.update({"out_state": [out_state.tolist()],
                    "n_seqs": [n_seqs.tolist()]})
        return pd.DataFrame(row)

    tables = meta.groupby(keys).map_groups(
        table_partial, batch_format="pandas").to_pandas()
    tables = tables.sort_values(keys).reset_index(drop=True)

    state, offset = budget + 1, 0                   # initial: nothing open
    prev_g = None
    incoming: dict = {}
    for _, row in tables.iterrows():
        if group_col and row["g"] != prev_g:        # group boundary: reset
            state, offset, prev_g = budget + 1, 0, row["g"]
        key = (row["g"], int(row["p"])) if group_col else int(row["p"])
        incoming[key] = (state, offset)
        offset += int(row["n_seqs"][state])
        state = int(row["out_state"][state])
    ref = ray.put(incoming)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        inc = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        g = g.sort_values(id_col, kind="mergesort")
        key = ((g["g"].iloc[0], int(g["p"].iloc[0])) if group_col
               else int(g["p"].iloc[0]))
        st, off = inc[key]
        seq = _pack_assign(g["n_tokens"].to_numpy(np.int64), budget, st, off)
        out = {id_col: g[id_col].to_numpy(np.int64)}
        if group_col:
            out[group_col] = g["g"].to_numpy()
        out.update({"n_tokens": g["n_tokens"].to_numpy(np.int64),
                    "seq_id": seq})
        return pd.DataFrame(out)

    return meta.groupby(keys).map_groups(assign, batch_format="pandas")
