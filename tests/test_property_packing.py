"""Property test for the sequence-packing two-level scan: for ANY token
counts, ANY budget, and ANY partition cut points, composing the per-partition
state-transition tables (``_pack_table``) via the driver fold and replaying
(``_pack_assign``) must equal the brute-force sequential greedy fold exactly.
Pure-kernel test — no Ray — so hypothesis can drive hundreds of shapes,
including zero-token and oversized (> budget) docs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_s3_ray.functions.packing import _pack_assign, _pack_table


def _brute(ntok, budget):
    seq, fill, sid = [], None, -1
    for n in ntok:
        if sid < 0 or fill + n > budget:
            sid += 1
            fill = n
        else:
            fill += n
        seq.append(sid)
    return np.array(seq, np.int64)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 40), min_size=1, max_size=120),
    st.integers(1, 48),
    st.data(),
)
def test_two_level_scan_equals_sequential_fold(ntok, budget, data):
    ntok = np.array(ntok, np.int64)
    # sprinkle oversized docs explicitly (> budget)
    for i in data.draw(st.lists(st.integers(0, len(ntok) - 1), max_size=3)):
        ntok[i] = budget + data.draw(st.integers(1, 20))
    # random partition cut points (possibly empty partitions are impossible
    # by construction here; the engine's groupby never creates them either)
    n_cuts = data.draw(st.integers(0, 5))
    cuts = sorted(set(data.draw(
        st.lists(st.integers(1, max(1, len(ntok) - 1)),
                 min_size=n_cuts, max_size=n_cuts)))) if len(ntok) > 1 else []
    pieces = np.split(ntok, cuts)

    state, offset = budget + 1, 0
    got = []
    for piece in pieces:
        out_state, n_seqs = _pack_table(piece, budget)
        got.append(_pack_assign(piece, budget, state, offset))
        offset += int(n_seqs[state])
        state = int(out_state[state])

    got = np.concatenate(got)
    exp = _brute(ntok, budget)
    assert (got == exp).all(), (ntok.tolist(), budget, cuts)
    # the fold's final sequence count equals the brute fold's
    assert offset == int(exp[-1]) + 1
