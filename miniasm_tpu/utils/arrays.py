"""Device array primitives shared across the pipeline.

TPU-first conventions:
  - no 64-bit integers on device: the reference packs (id<<32|pos) u64 radix
    keys (reference hit.c:12-13, asg.c:8-9); we instead sort with multi-key
    stable `lax.sort` over u32/i32 column pairs, which XLA lowers natively.
  - all kernels take padded, fixed-shape arrays plus a dynamic count `n`;
    invalid rows are masked.  This keeps shapes static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INT32_MAX = np.int32(2**31 - 1)


def argsort_multi(keys, n=None, size=None):
    """Stable lexicographic argsort by a sequence of integer key arrays.

    Equivalent role to the reference's stable LSB radix sort over packed u64
    keys (ksort.h:132-183).  `keys[0]` is the most significant key.  If `n`
    is given, rows >= n are forced to the end (sorted as +inf keys).

    Implemented as LSD rounds of 2-operand stable sorts: XLA TPU has a fast
    path for <=3-operand sorts but degrades to a very slow variadic
    comparator sort beyond that (measured ~300x at 33M rows).
    """
    ks = [jnp.asarray(k) for k in keys]
    m = ks[0].shape[0]
    iota = jnp.arange(m, dtype=jnp.int32)
    if n is not None:
        invalid = iota >= n
        ks = [jnp.where(invalid, INT32_MAX, k.astype(jnp.int32)) for k in ks]
    else:
        ks = [k.astype(jnp.int32) for k in ks]
    perm = iota
    for k in reversed(ks):
        kk = k if perm is iota else k[perm]
        p2 = jax.lax.sort((kk, iota), dimension=0, is_stable=True, num_keys=1)[1]
        perm = p2 if perm is iota else perm[p2]
    return perm


def sort_rows_multi(cols, keys_idx, n=None):
    """Stable-sort a list of equally-shaped 1-D columns by the columns named
    in `keys_idx` (most significant first). Returns the permuted columns."""
    perm = argsort_multi([cols[i] for i in keys_idx], n=n)
    return [c[perm] for c in cols], perm


def segment_starts(sorted_ids, n):
    """Boolean mask of rows starting a new id-segment in a sorted id column.

    Row i starts a segment iff i < n and (i == 0 or id[i] != id[i-1]).
    """
    m = sorted_ids.shape[0]
    iota = jnp.arange(m, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -1, sorted_ids.dtype), sorted_ids[:-1]])
    return (iota < n) & (sorted_ids != prev)


def csr_index(sorted_ids, n, num_segments):
    """Build a CSR row index over a sorted id column.

    Returns (start, count) int32 arrays of length `num_segments`; ids absent
    from the column get count 0.  Equivalent of asg_arc_index_core
    (reference asg.c:27-36) built with searchsorted instead of a scan.
    """
    m = sorted_ids.shape[0]
    iota = jnp.arange(m, dtype=jnp.int32)
    ids = jnp.where(iota < n, sorted_ids.astype(jnp.int32), INT32_MAX)
    seg = jnp.arange(num_segments, dtype=jnp.int32)
    start = jnp.searchsorted(ids, seg, side="left").astype(jnp.int32)
    end = jnp.searchsorted(ids, seg, side="right").astype(jnp.int32)
    return start, end - start


def member_multi(hay_keys, hay_n, needle_keys, needle_n):
    """Vectorized set membership with composite integer keys.

    Returns a bool mask over needles: True iff the needle tuple equals some
    hay tuple.  Implemented with one stable multi-key sort of the
    concatenation (hay tagged 0, needles tagged 1) followed by a
    predecessor-equality check — no 64-bit packing needed.
    """
    nk = len(hay_keys)
    assert len(needle_keys) == nk
    h = [jnp.asarray(k).astype(jnp.int32) for k in hay_keys]
    q = [jnp.asarray(k).astype(jnp.int32) for k in needle_keys]
    mh, mq = h[0].shape[0], q[0].shape[0]
    ih = jnp.arange(mh, dtype=jnp.int32)
    iq = jnp.arange(mq, dtype=jnp.int32)
    h = [jnp.where(ih >= hay_n, INT32_MAX, k) for k in h]
    q = [jnp.where(iq >= needle_n, INT32_MAX, k) for k in q]
    keys = [jnp.concatenate([a, b]) for a, b in zip(h, q)]
    tag = jnp.concatenate([jnp.zeros(mh, jnp.int32), jnp.ones(mq, jnp.int32)])
    src = jnp.concatenate([jnp.full(mh, -1, jnp.int32), iq])
    perm = argsort_multi(keys + [tag])
    skeys = [k[perm] for k in keys]
    stag = tag[perm]
    ssrc = src[perm]
    # After the sort, within an equal-key run all hay rows (tag 0) precede
    # needle rows (tag 1).  A needle is present iff the running "last hay key"
    # equals its own key.  Compute via cummax over an encoded position of the
    # most recent hay row, then gather that hay row's key and compare.
    total = mh + mq
    pos = jnp.arange(total, dtype=jnp.int32)
    last_hay = jax.lax.cummax(jnp.where(stag == 0, pos, -1))
    found = last_hay >= 0
    gidx = jnp.maximum(last_hay, 0)
    eq = found
    for k in skeys:
        eq = eq & (k[gidx] == k)
    result = jnp.zeros(mq, dtype=bool)
    needle_rows = stag == 1
    result = result.at[jnp.where(needle_rows, ssrc, 0)].max(
        jnp.where(needle_rows, eq, False)
    )
    return result & (iq < needle_n)


def compact(mask, cols, n=None):
    """Stable compaction: move rows where mask is True to the front,
    preserving order. Returns (new_cols, new_n).

    Device equivalent of the reference's in-place `a[m++] = a[i]` filters
    (e.g. hit.c:162-193, asg.c:57-70).
    """
    mask = jnp.asarray(mask)
    m = mask.shape[0]
    if n is not None:
        mask = mask & (jnp.arange(m, dtype=jnp.int32) < n)
    key = jnp.where(mask, jnp.int32(0), jnp.int32(1))
    perm = argsort_multi([key])
    new_n = jnp.sum(mask).astype(jnp.int32)
    return [jnp.asarray(c)[perm] for c in cols], new_n


def np_u32(x):
    return np.asarray(x, dtype=np.uint32)


def np_i32(x):
    return np.asarray(x, dtype=np.int32)
