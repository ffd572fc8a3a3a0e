"""Segmented-scan primitives for the TPU select/graph kernels.

These used to lower to jax.lax.associative_scan over small tuples, but the
TPU compiler's time on an associative_scan grows catastrophically with
array length (measured on v5e: fine at 3.5M rows, compile does NOT finish
within 15 minutes at 14M rows).  jax.lax.cummax/cumsum compile in seconds
at any size, so the helper is built from native scatter reductions.

(The former ffill helper — cummax of flagged row ids plus one gather —
was removed when the select sweep switched to transition compaction: a
56M-element forward-fill gather costs ~1.25 s on v5e, ~half the whole
kernel, which is exactly why no production path uses that shape anymore.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def seg_reduce_argmax(seg, val, num_segments: int):
    """Per-segment (max val, first row index attaining it) over UNsorted
    segment ids in [0, num_segments); empty segments return (int32 min,
    n).  Ties resolve to the smallest row index, matching the reference's
    `len > max` keep-first rule (hit.c:142).  Built from two native
    scatter reductions (segment_max + segment_min) — compile-friendly at
    any size, ~10 ms per 14M rows at runtime."""
    n = val.shape[0]
    vmax = jax.ops.segment_max(val, seg, num_segments=num_segments)
    idxs = jnp.arange(n, dtype=jnp.int32)
    tie = val == vmax[seg]
    wi = jax.ops.segment_min(jnp.where(tie, idxs, jnp.int32(n)), seg,
                             num_segments=num_segments)
    return vmax, wi
