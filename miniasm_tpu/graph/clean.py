"""Order-independent graph-cleaning passes as data-parallel device kernels.

Each pass is a pure function of the pre-pass graph (verified against the
reference's loop structure — these passes never read mid-pass mutations,
asg.c), so a vectorized implementation is exactly order-equivalent to the
reference's sequential scan:

  - del_multi  (asg.c:104-121): keep the first arc per (v, w) in arc order;
  - del_asymm  (asg.c:124-138): delete u->v lacking complement v'->u';
  - del_trans  (asg.c:148-193): Myers transitive reduction; sequential only
    *within* a vertex's neighbor list (bounded by max degree), which maps to
    a fori_loop over padded neighbor slots, all vertices in parallel;
  - del_short  (asg.c:83-101): per-vertex weak-overlap threshold drop.

All passes compute a bool deletion mask over the arc array, then recompact
(cleanup) and re-run symm exactly where the reference does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.arrays import argsort_multi, member_multi
from ..utils.timers import log
from .asg import Graph, cleanup


def del_multi_mask(u, vcol) -> np.ndarray:
    """Mask of duplicate arcs: same (u, v) as an earlier arc (the reference
    keeps the first occurrence in arc order, asg.c:108-115)."""
    u = jnp.asarray(u)
    vcol = jnp.asarray(vcol)
    order = argsort_multi([u, vcol])
    su, sv = u[order], vcol[order]
    dup = jnp.concatenate([jnp.zeros(1, bool),
                           (su[1:] == su[:-1]) & (sv[1:] == sv[:-1])])
    mask = jnp.zeros(u.shape[0], dtype=bool).at[order].set(dup)
    return np.asarray(mask)


def del_asymm_mask(u, vcol) -> np.ndarray:
    """Mask of arcs u->v with no complement v^1 -> u^1 present
    (asg.c:124-138)."""
    n = u.shape[0]
    present = member_multi([u, vcol], n, [jnp.asarray(vcol) ^ 1, jnp.asarray(u) ^ 1], n)
    return ~np.asarray(present)


def del_multi(g: Graph) -> Graph:
    if g.n_arc:
        mask = del_multi_mask(g.u, g.v)
        n = int(mask.sum())
    else:
        n = 0
    if n:
        g.adel |= mask
        g = cleanup(g)
    log("del_multi", "removed %d multi-arcs", n)
    return g


def del_asymm(g: Graph) -> Graph:
    if g.n_arc:
        mask = del_asymm_mask(g.u, g.v)
        n = int(mask.sum())
    else:
        n = 0
    if n:
        g.adel |= mask
        g = cleanup(g)
    log("del_asymm", "removed %d asymmetric arcs", n)
    return g


def symm(g: Graph) -> Graph:
    """asg_symm (asg.c:140-145)."""
    g = del_multi(g)
    g = del_asymm(g)
    g.is_symm = True
    return g


def del_short(g: Graph, drop_ratio: float) -> Graph:
    """Weak-overlap drop (asg.c:83-101): per vertex with >=2 arcs, delete
    the suffix of arcs with ol below av[0].ol * ratio.  ol is non-increasing
    within a vertex (ol = ql - l with a fixed per-read ql), so the
    reference's backward suffix scan equals a plain threshold on slots >= 1.

    The threshold rounding reproduces the C expression
    (uint32)(float(ol0 * ratio) + .499) exactly: f32 multiply, f64 add,
    truncate (asg.c:90).  Returns (graph, n_removed)."""
    if g.n_arc == 0:
        log("del_short", "removed 0 short overlaps")
        return g, 0
    first_ol = np.zeros(g.n_vtx, dtype=np.int64)
    has = g.idx_cnt > 0
    first_ol[has] = g.ol[g.idx_start[has]]
    part = first_ol.astype(np.float32) * np.float32(drop_ratio)
    thres = (part.astype(np.float64) + 0.499).astype(np.uint32).astype(np.int64)

    slot = np.arange(g.n_arc, dtype=np.int64) - g.idx_start[g.u]
    nv = g.idx_cnt[g.u]
    mask = (nv >= 2) & (slot >= 1) & (g.ol < thres[g.u])
    n = int(mask.sum())
    if n:
        g.adel |= mask
        g = cleanup(g)
        g = symm(g)
    log("del_short", "removed %d short overlaps", n)
    return g, n


@functools.partial(jax.jit, static_argnames=("clen", "max_deg"))
def _trans_chunk(nbr_v, nbr_l, nv, bound, active, c0, *, clen, max_deg):
    """Transitive-reduction mark kernel for vertices [c0, c0+clen).

    mark per neighbor slot: 1 = in-play, 2 = eliminated; duplicate targets
    demote together, so per-slot marks equal the reference's per-vertex-id
    marks (asg.c:162-184).  Neighbor-of-neighbor gathers read the full
    tables; the chunk only bounds the live (clen, D, D) compare tensor."""
    D = max_deg
    cv = jax.lax.dynamic_slice_in_dim(nbr_v, c0, clen, 0)
    cl = jax.lax.dynamic_slice_in_dim(nbr_l, c0, clen, 0)
    cnv = jax.lax.dynamic_slice_in_dim(nv, c0, clen, 0)
    cb = jax.lax.dynamic_slice_in_dim(bound, c0, clen, 0)
    cact = jax.lax.dynamic_slice_in_dim(active, c0, clen, 0)

    slot_valid = jax.lax.broadcasted_iota(jnp.int32, (clen, D), 1) < cnv[:, None]
    mark = jnp.where(slot_valid & cact[:, None], 1, 0).astype(jnp.int8)

    def body(i, mark):
        w = cv[:, i]                              # (clen,) neighbor at slot i
        li = cl[:, i]
        scan_ok = cact & (i < cnv) & (mark[:, i] == 1)
        wi = jnp.maximum(w, 0)
        wn_v = nbr_v[wi]                          # (clen, D)
        wn_l = nbr_l[wi]
        within = wn_l + li[:, None] <= cb[:, None]   # monotone => equals the
        # reference's break-on-first-violation inner loop (asg.c:169)
        wn_valid = jax.lax.broadcasted_iota(jnp.int32, (clen, D), 1) < nv[wi][:, None]
        cand = within & wn_valid & scan_ok[:, None]
        hit = (cv[:, :, None] == wn_v[:, None, :]) & cand[:, None, :]
        demote = jnp.any(hit, axis=2) & (mark != 0)
        return jnp.where(demote, jnp.int8(2), mark)

    mark = jax.lax.fori_loop(0, D, body, mark)
    return mark == 2


def del_trans(g: Graph, fuzz: int) -> Graph:
    """Myers transitive reduction (asg.c:148-193)."""
    V = g.n_vtx
    if g.n_arc == 0 or V == 0:
        log("del_trans", "transitively reduced 0 arcs")
        return g
    D = int(g.idx_cnt.max())
    rows = g.u.astype(np.int64)
    slots = np.arange(g.n_arc, dtype=np.int64) - g.idx_start[rows]
    nbr_v = np.full((V, D), -1, dtype=np.int32)
    nbr_l = np.full((V, D), np.int32(2**31 - 1), dtype=np.int32)
    nbr_v[rows, slots] = g.v
    nbr_l[rows, slots] = g.l
    nv = g.idx_cnt.astype(np.int32)
    last = np.maximum(g.idx_start + g.idx_cnt - 1, 0)
    bound = np.where(nv > 0, g.l[last] + fuzz, 0).astype(np.int32)
    active = (nv > 0) & ~g.sdel[np.arange(V) >> 1]

    # chunk so the (clen, D, D) compare tensor stays ~256 MB
    clen = max(64, min(V, (1 << 28) // max(D * D, 1)))
    Vp = ((V + clen - 1) // clen) * clen
    if Vp > V:
        pad = Vp - V
        nbr_v = np.vstack([nbr_v, np.full((pad, D), -1, np.int32)])
        nbr_l = np.vstack([nbr_l, np.full((pad, D), np.int32(2**31 - 1), np.int32)])
        nv = np.concatenate([nv, np.zeros(pad, np.int32)])
        bound = np.concatenate([bound, np.zeros(pad, np.int32)])
        active = np.concatenate([active, np.zeros(pad, bool)])

    jv, jl = jnp.asarray(nbr_v), jnp.asarray(nbr_l)
    jnv, jb, ja = jnp.asarray(nv), jnp.asarray(bound), jnp.asarray(active)
    elim = np.zeros((Vp, D), dtype=bool)
    for c0 in range(0, Vp, clen):
        elim[c0:c0 + clen] = np.asarray(
            _trans_chunk(jv, jl, jnv, jb, ja, c0, clen=clen, max_deg=D))

    mask = elim[rows, slots]
    n = int(mask.sum())
    log("del_trans", "transitively reduced %d arcs", n)
    if n:
        g.adel |= mask
        g = cleanup(g)
        g = symm(g)
    return g
