"""Segmented-scan primitives for the TPU select/graph kernels.

TPU gathers cost ~7 ns/index (measured, v5e via lax gather) while
log-depth scans over the same arrays are essentially free, so every
"gather with sorted / monotone indices" in the pipeline is reformulated
as a scatter-into-rows + forward-fill scan.  These helpers implement the
two shapes we need:

  - ffill(flag, val): per row, the most recent `val` at or before it where
    `flag` was set (undefined before the first flag; callers guarantee one);
  - seg_cummax(seg, val, reverse=False): running max of `val` within each
    contiguous `seg` run, inclusive of the current row.

Both lower to jax.lax.associative_scan over small tuples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ffill(flag, val):
    """Forward-fill `val` from rows where `flag` is true."""
    def combine(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, av)

    _, out = jax.lax.associative_scan(combine, (flag, val))
    return out


def seg_cummax(seg, val, reverse: bool = False):
    """Inclusive running max within contiguous equal-`seg` runs."""
    def combine(a, b):
        as_, av = a
        bs_, bv = b
        return bs_, jnp.where(as_ == bs_, jnp.maximum(av, bv), bv)

    _, out = jax.lax.associative_scan(combine, (seg, val), reverse=reverse)
    return out


def seg_argcummax(seg, val, payload):
    """Inclusive running LEXICOGRAPHIC max of (val, payload) within
    contiguous equal-`seg` runs; returns (best_val, best_payload) per row.
    With payload = -row_index, the value at a segment's last row identifies
    the FIRST row attaining the segment max."""
    def combine(a, b):
        as_, av, ap = a
        bs_, bv, bp = b
        take_a = (as_ == bs_) & ((av > bv) | ((av == bv) & (ap > bp)))
        return (bs_, jnp.where(take_a, av, bv), jnp.where(take_a, ap, bp))

    _, v, p = jax.lax.associative_scan(combine, (seg, val, payload))
    return v, p


def seg_base(seg, val):
    """Per row, `val` at the first row of its contiguous `seg` run.

    Equivalent to ffill at run starts; used to rebase running sums per
    segment (val at run start is the prefix total *before* the run when the
    caller passes `cum - delta`).
    """
    n = seg.shape[0]
    prev = jnp.concatenate([seg[:1] - 1, seg[:-1]])
    is_start = seg != prev
    return ffill(is_start, val)
