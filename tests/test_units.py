"""Unit tests for device primitives and kernels against tiny numpy oracles."""

import numpy as np
import jax.numpy as jnp

from miniasm_tpu.utils.arrays import argsort_multi, member_multi, csr_index
from miniasm_tpu.core.hit2arc import hit2arc, MA_HT_INT, MA_HT_QCONT, MA_HT_TCONT


def test_argsort_multi_stable():
    hi = np.array([2, 1, 2, 1, 1], dtype=np.int32)
    lo = np.array([0, 5, 0, 5, 2], dtype=np.int32)
    perm = np.asarray(argsort_multi([hi, lo]))
    # expected stable lexicographic order: (1,2)@4, (1,5)@1, (1,5)@3, (2,0)@0, (2,0)@2
    assert perm.tolist() == [4, 1, 3, 0, 2]


def test_argsort_multi_invalid_tail():
    hi = np.array([3, 1, 2], dtype=np.int32)
    lo = np.array([0, 0, 0], dtype=np.int32)
    perm = np.asarray(argsort_multi([hi, lo], n=2))
    assert perm.tolist()[:2] == [1, 0]
    assert perm.tolist()[2] == 2


def test_member_multi():
    hay_a = np.array([1, 2, 3, 9], dtype=np.int32)
    hay_b = np.array([5, 6, 7, 9], dtype=np.int32)
    q_a = np.array([2, 3, 4, 1, 9], dtype=np.int32)
    q_b = np.array([6, 0, 7, 5, 9], dtype=np.int32)
    got = np.asarray(member_multi([hay_a, hay_b], 3, [q_a, q_b], 4))
    # hay_n=3 excludes (9,9); needle_n=4 excludes last query
    assert got.tolist() == [True, False, False, True, False]


def test_csr_index():
    ids = np.array([0, 0, 2, 2, 2, 5], dtype=np.int32)
    start, cnt = [np.asarray(x) for x in csr_index(jnp.asarray(ids), 6, 7)]
    assert cnt.tolist() == [2, 0, 3, 0, 0, 1, 0]
    assert start[0] == 0 and start[2] == 2 and start[5] == 5


def _h2a_scalar(qs, qe, ts, te, rev, ql, tl, max_hang, int_frac, min_ovlp):
    """Direct transliteration oracle of the reference ma_hit2arc
    (miniasm.h:86-104) for single records."""
    tl5 = tl - te if rev else ts
    tl3 = ts if rev else tl - te
    ext5 = min(qs, tl5)
    ext3 = min(ql - qe, tl3)
    if ext5 > max_hang or ext3 > max_hang or \
       np.float32(qe - qs) < np.float32(np.float32(qe - qs + ext5 + ext3) * np.float32(int_frac)):
        return MA_HT_INT
    if qs <= tl5 and ql - qe <= tl3:
        return MA_HT_QCONT
    if qs >= tl5 and ql - qe >= tl3:
        return MA_HT_TCONT
    if qe - qs + ext5 + ext3 < min_ovlp or te - ts + ext5 + ext3 < min_ovlp:
        return -4
    return (qs - tl5) if qs > tl5 else ((ql - qe) - tl3)


def test_hit2arc_matrix():
    rng = np.random.default_rng(0)
    n = 2000
    ql = rng.integers(3000, 20000, n)
    tl = rng.integers(3000, 20000, n)
    qs = rng.integers(0, 8000, n)
    qe = np.minimum(ql, qs + rng.integers(1000, 15000, n))
    ts = rng.integers(0, 8000, n)
    te = np.minimum(tl, ts + rng.integers(1000, 15000, n))
    rev = rng.integers(0, 2, n)
    out = hit2arc(np.zeros(n, np.int32), qs, qe, np.ones(n, np.int32),
                  ts, te, rev, ql, tl, 1000, 0.8, 2000)
    r = np.asarray(out["r"])
    for i in range(n):
        exp = _h2a_scalar(int(qs[i]), int(qe[i]), int(ts[i]), int(te[i]),
                          int(rev[i]), int(ql[i]), int(tl[i]), 1000, 0.8, 2000)
        if exp < 0:
            assert r[i] == exp, i
        else:
            assert r[i] == exp, i


def test_hit2arc_arc_fields():
    # q overlaps t: query suffix matches target prefix, same strand
    out = hit2arc(np.array([3]), np.array([5000]), np.array([10000]),
                  np.array([7]), np.array([0]), np.array([5000]),
                  np.array([0]), np.array([10000]), np.array([12000]),
                  1000, 0.8, 2000)
    assert int(out["r"][0]) == 5000
    assert int(out["u"][0]) == 3 << 1 | 0
    assert int(out["v"][0]) == 7 << 1 | 0
    assert int(out["l"][0]) == 5000
    assert int(out["ol"][0]) == 5000


def test_sweep_events_matches_naive_sweep():
    """Property test for the transition-compaction sweep core
    (select/fused2.sweep_events) against a direct per-segment numpy sweep
    of the reference rule (hit.c:109-160: longest depth>=min_dp region,
    FIRST on ties): random event sets with presence-only segments, BIG
    (skipped) events, ties at equal positions, multi-region segments, and
    a tr_cap small enough to force the overflow report."""
    import numpy as np

    from miniasm_tpu.select.fused2 import sweep_events, BIG

    rng = np.random.default_rng(7)
    for trial in range(12):
        T = int(rng.integers(4, 40))
        n_iv = int(rng.integers(0, 200))
        min_dp = int(rng.integers(1, 4))
        seg_l, key_l = [], []
        for _ in range(n_iv):
            s = int(rng.integers(0, T))
            a = int(rng.integers(0, 500))
            b = a + int(rng.integers(1, 120))
            seg_l += [s, s]
            key_l += [a * 2, b * 2 + 1]
        # skipped events keep their real segment id (valid row, not-ok
        # side) -> presence without coverage
        for _ in range(int(rng.integers(0, 10))):
            seg_l.append(int(rng.integers(0, T)))
            key_l.append(int(BIG))
        # padding rows
        for _ in range(int(rng.integers(0, 16))):
            seg_l.append(T)
            key_l.append(int(BIG))
        seg = np.asarray(seg_l, np.int32)
        key = np.asarray(key_l, np.int32)

        s_o, e_o, del_o, has_o, n_rem, n_tr = [
            np.asarray(x) for x in sweep_events(
                np.asarray(seg), np.asarray(key), None, T, min_dp, 0, False)]

        # naive: per segment, sweep sorted events
        for t in range(T):
            evs = sorted((key[i] for i in range(len(seg))
                          if seg[i] == t and key[i] != BIG))
            present = bool(np.any(seg[:len(seg_l)] == t))
            best_len, best_s, best_e = 0, 0, 0
            depth = 0
            cur_s = None
            for k in evs:
                pos, is_end = k >> 1, k & 1
                od = depth
                depth += -1 if is_end else 1
                if od < min_dp <= depth:
                    cur_s = pos
                elif od >= min_dp > depth:
                    if pos - cur_s > best_len:
                        best_len, best_s, best_e = pos - cur_s, cur_s, pos
            if not present:
                assert not has_o[t]
                continue
            assert has_o[t]
            if best_len > 0:
                assert (int(s_o[t]), int(e_o[t])) == (best_s, best_e), \
                    (trial, t)
                assert not del_o[t]
            else:
                assert del_o[t]

    # overflow reporting: a tiny tr_cap must be reflected in n_tr > cap
    seg = np.asarray([0, 0, 1, 1, 2, 2, 3, 3], np.int32)
    key = np.asarray([0, 11, 2, 13, 4, 15, 6, 17], np.int32)
    out = sweep_events(seg, key, None, 4, 1, 0, False, tr_cap=2)
    assert int(out[5]) > 2
