"""Device-side bubble popping (reference asg_pop_bubble, asg.c:360-433).

SURVEY.md §7 architecture: the per-source Kahn BFS runs ON DEVICE for all
candidate sources at once (jax.vmap over sources of a lax.while_loop that
pops one frontier vertex per step and processes its whole padded arc row
vectorially), and the HOST commits the verdicts in the reference's
ascending-source order.

Exact-semantics notes (all mirrored from asg_bub_pop1):
  - an arc pointing back at v0 aborts the bubble EVEN IF the arc is
    deleted (the w==v0 test precedes the del test, asg.c:379-381);
  - a distance overrun (d+l > max_dist) on any live arc aborts;
  - first visit sets p/d/r but NOT c (c stays 0 until a second in-edge
    relaxes it, asg.c:383-389) — the parent tie-break is c+1 > c_w, or
    c+1 == c_w and d+l > d_w, against the RUNNING values;
  - a popped vertex's arc row has pairwise-distinct live targets (the
    graph is symm'd, so no multi-arcs), which makes the reference's
    serial per-arc sweep equal to our vectorized row step;
  - visited vertices with NO raw arc slots (idx_cnt==0) count as tips
    and never enter the stack (asg.c:393-396);
  - success == stack holds exactly one vertex (the sink) and nothing is
    pending; the kept path is the max-read-count chain via p from sink.

Vectorization-vs-reference divergence exists ONLY on abort paths: the
reference stops mid-row at the offending arc, we process the whole row —
the visited set of a FAILED source can be a superset, which only widens
the (conservative) staleness radius used by the ordered commit.

Ordered commit (pop order matters: each pop mutates the graph later
sources read): walk sources ascending; a device verdict is valid while
the bubble's read set {v0,v0^1} ∪ visited ∪ visited^1 is disjoint from
rows touched by earlier commits; at the first stale source, re-dispatch
the kernel for the remaining candidates against the live graph.  Commits
only shrink live-arc sets, so candidates never grow and the scan-order
equivalence argument of graph/hybrid.py applies unchanged.

Capacity: visited sets are capped at K per source; any overflow re-runs
the whole dispatch with K doubled (no host fallback path), so results
are always exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .asg import Graph

I32 = jnp.int32


def _pow2(x: int) -> int:
    n = 1
    while n < x:
        n <<= 1
    return n


@functools.partial(jax.jit, static_argnames=("Vp", "Dp", "K", "max_dist"))
def _bub_kernel(au, al, av, adel, sources, *, Vp, Dp, K, max_dist):
    """For each source v0 (padded with -1): run the bounded Kahn BFS.

    The (Vp, Dp) neighbor tables are scattered ON DEVICE from the
    compacted per-arc columns (compare devclean._clean_kernel): uploading
    O(n_arc) columns instead of the padded tables keeps the per-dispatch
    H2D at a few MB on worm-scale graphs.  `adel` rides along because the
    deleted-arc v0 test needs tombstoned slots too.

    Returns per source: ok (bubble found), ovf (visited cap hit), nb
    (#visited incl. v0), ntip, sink vertex (-1 if none), vis (K,) visited
    vertices in visit order (vis[0]=v0), par (K,) parent vertex per slot.
    """
    au = au.astype(I32)
    first = jnp.searchsorted(au, jnp.arange(Vp + 1, dtype=I32), side="left")
    nraw = (first[1:] - first[:Vp]).astype(I32)
    slots = jnp.arange(au.shape[0], dtype=I32) - first[jnp.minimum(au, Vp)]
    nbr_v = jnp.full((Vp, Dp), -1, I32).at[au, slots].set(
        av.astype(I32), mode="drop")
    nbr_l = jnp.zeros((Vp, Dp), I32).at[au, slots].set(
        al.astype(I32), mode="drop")
    present = (jax.lax.broadcasted_iota(I32, (Vp, Dp), 1) < nraw[:, None])
    alv_tab = jnp.zeros((Vp, Dp), bool).at[au, slots].set(
        ~adel, mode="drop")
    alive = present & alv_tab
    outdeg_raw = nraw
    live_out = jnp.sum(alive, axis=1).astype(I32)
    iota_k = jnp.arange(K, dtype=I32)

    def one(v0):
        vis0 = jnp.full((K,), -1, I32).at[0].set(v0)
        par0 = jnp.full((K,), -1, I32)
        d0 = jnp.zeros((K,), I32)
        c0 = jnp.zeros((K,), I32)
        r0 = jnp.zeros((K,), I32)
        stk0 = jnp.zeros((K + 1,), I32)  # local slot ids; stk0[0] = slot 0
        state = dict(vis=vis0, par=par0, d=d0, c=c0, r=r0, stk=stk0,
                     sp=jnp.int32(1), nb=jnp.int32(1), npend=jnp.int32(0),
                     ntip=jnp.int32(0), fail=jnp.bool_(v0 < 0),
                     ovf=jnp.bool_(False), done=jnp.bool_(v0 < 0),
                     ok=jnp.bool_(False), sink=jnp.int32(-1))

        def cond(s):
            return ~s["done"]

        def body(s):
            slot = s["stk"][s["sp"] - 1]
            v = s["vis"][slot]
            dv = s["d"][slot]
            cv = s["c"][slot]
            row_w = nbr_v[v]
            row_l = nbr_l[v]
            row_pres = present[v]
            row_live = alive[v]
            # w==v0 aborts even on deleted arcs (asg.c:379-381)
            fail1 = jnp.any(row_pres & (row_w == v0))
            dd = dv + row_l
            fail2 = jnp.any(row_live & (dd > max_dist))
            w = jnp.where(row_live, row_w, -1)
            # local slot lookup
            eq = (s["vis"][None, :] == w[:, None]) & \
                 (iota_k[None, :] < s["nb"])
            found = jnp.any(eq, axis=1)
            wslot_ex = jnp.argmax(eq, axis=1).astype(I32)
            is_new = row_live & ~found
            new_excl = jnp.cumsum(is_new.astype(I32)) - is_new.astype(I32)
            nb_new = s["nb"] + jnp.sum(is_new)
            ovf_now = nb_new > K
            wslot = jnp.where(is_new,
                              jnp.minimum(s["nb"] + new_excl, K - 1),
                              wslot_ex)
            idx_w = jnp.where(row_live, wslot, K)  # K = dropped
            # gather current values BEFORE any scatter (targets distinct)
            c_old = s["c"][wslot]
            d_old = s["d"][wslot]
            r_old = s["r"][wslot]
            vis = s["vis"].at[idx_w].set(w, mode="drop")
            # parent: first visit unconditionally; revisit by the running
            # (c, d) tie-break
            upd = is_new | (found & ((cv + 1 > c_old) |
                                     ((cv + 1 == c_old) & (dd > d_old))))
            par = s["par"].at[jnp.where(row_live & upd, wslot, K)].set(
                v, mode="drop")
            # c: NOT set on first visit (asg.c:383-389)
            cset = jnp.maximum(c_old, cv + 1)
            c = s["c"].at[jnp.where(row_live & found, wslot, K)].set(
                cset, mode="drop")
            d = s["d"].at[idx_w].set(
                jnp.where(is_new, dd, jnp.minimum(d_old, dd)), mode="drop")
            r_init = live_out[jnp.maximum(w, 0) ^ 1]
            r_val = jnp.where(is_new, r_init, r_old) - 1
            r = s["r"].at[idx_w].set(r_val, mode="drop")
            ready = row_live & (r_val == 0)
            is_tip = outdeg_raw[jnp.maximum(w, 0)] == 0
            push = ready & ~is_tip
            ntip = s["ntip"] + jnp.sum(ready & is_tip)
            npend = s["npend"] + jnp.sum(is_new) - jnp.sum(ready)
            push_excl = jnp.cumsum(push.astype(I32)) - push.astype(I32)
            sp0 = s["sp"] - 1
            stk = s["stk"].at[jnp.where(push, sp0 + push_excl, K + 1)].set(
                wslot, mode="drop")
            sp = sp0 + jnp.sum(push)
            fail = fail1 | fail2 | ovf_now
            ok = ~fail & (sp == 1) & (npend == 0)
            done = fail | (sp == 0) | ok
            sink = jnp.where(ok, vis[stk[0]], jnp.int32(-1))
            return dict(vis=vis, par=par, d=d, c=c, r=r, stk=stk, sp=sp,
                        nb=jnp.where(ovf_now, s["nb"], nb_new),
                        npend=npend, ntip=ntip, fail=fail,
                        ovf=s["ovf"] | ovf_now, done=done, ok=ok,
                        sink=sink)

        out = jax.lax.while_loop(cond, body, state)
        return (out["ok"], out["ovf"], out["nb"], out["ntip"],
                out["sink"], out["vis"], out["par"])

    return jax.vmap(one)(sources)


def _arc_cols(g: Graph):
    """Compacted per-arc columns, padded to a pow2 bucket with u = Vp
    (scatters out of bounds with mode='drop').  The graph's arcs are
    CSR-sorted by u (cleanup), which searchsorted relies on."""
    V = g.n_vtx
    Vp = _pow2(max(V, 2))
    D = max(int(g.idx_cnt.max()) if g.n_arc else 1, 1)
    Dp = _pow2(D)
    Ap = _pow2(max(g.n_arc, 1))
    au = np.full(Ap, Vp, np.int32)
    al = np.zeros(Ap, np.int32)
    av = np.zeros(Ap, np.int32)
    adel = np.ones(Ap, bool)
    au[:g.n_arc] = g.u
    al[:g.n_arc] = g.l
    av[:g.n_arc] = g.v
    adel[:g.n_arc] = g.adel
    return au, al, av, adel, Vp, Dp


def _dispatch(g: Graph, cands, max_dist: int, K: int):
    """Run the kernel over candidate sources, doubling K on overflow."""
    au, al, av, adel, Vp, Dp = _arc_cols(g)
    S = _pow2(max(len(cands), 1))
    src = np.full(S, -1, np.int32)
    src[:len(cands)] = cands
    while True:
        ok, ovf, nb, ntip, sink, vis, par = jax.device_get(_bub_kernel(
            jnp.asarray(au), jnp.asarray(al), jnp.asarray(av),
            jnp.asarray(adel), jnp.asarray(src),
            Vp=Vp, Dp=Dp, K=K, max_dist=int(max_dist)))
        if not ovf[:len(cands)].any():
            return ok, nb, ntip, sink, vis, par, K
        K *= 2


def _host_pop1(g: Graph, v0: int, max_dist: int):
    """Bounded Kahn BFS for ONE source against the LIVE graph — the
    host-sequential conflict path of SURVEY §7 ("non-overlapping bubbles
    commit in parallel; conflicting bubbles serialize").  Identical
    semantics to the device kernel (and asg_bub_pop1); used only for
    sources whose device verdict went stale behind an earlier commit.

    Returns (ok, vis_list, sink, parent_map, ntip)."""
    vis = [v0]
    parent = {}
    dd = {v0: 0}
    cc = {v0: 0}
    rr = {}
    stack = [v0]
    npend = 0
    ntip = 0
    while True:
        v = stack.pop()
        dv, cv = dd[v], cc[v]
        s = int(g.idx_start[v])
        nv = int(g.idx_cnt[v])
        for ai in range(s, s + nv):
            w = int(g.v[ai])
            if w == v0:  # back-arc aborts even when deleted (asg.c:379)
                return False, vis, -1, parent, 0
            if g.adel[ai]:
                continue
            l = int(g.l[ai])
            if dv + l > max_dist:
                return False, vis, -1, parent, 0
            if w not in dd:
                vis.append(w)
                parent[w] = v
                dd[w] = dv + l
                cc[w] = 0
                sw = int(g.idx_start[w ^ 1])
                cw = int(g.idx_cnt[w ^ 1])
                rr[w] = int(np.count_nonzero(~g.adel[sw:sw + cw]))
                npend += 1
            else:
                if cv + 1 > cc[w] or (cv + 1 == cc[w] and dv + l > dd[w]):
                    parent[w] = v
                if cv + 1 > cc[w]:
                    cc[w] = cv + 1
                if dv + l < dd[w]:
                    dd[w] = dv + l
            rr[w] -= 1
            if rr[w] == 0:
                if g.idx_cnt[w]:
                    stack.append(w)
                else:
                    ntip += 1
                npend -= 1
        if not stack:
            return False, vis, -1, parent, 0
        if len(stack) == 1 and npend == 0:
            return True, vis, stack[0], parent, ntip


def pop_bubbles_dev(g: Graph, cand_mask, max_dist: int) -> int:
    """Ordered commit of device-detected bubbles: ONE kernel dispatch
    computes every source's verdict against the pass-entry graph; the
    host walks sources in ascending order, applying device verdicts
    whose read sets are untouched by earlier commits and recomputing
    the (rare) conflicting sources with the sequential host BFS.
    Returns the reference's packed counter (n_popped | n_tips<<32,
    asg.c:405/431)."""
    cands = [int(v) for v in np.flatnonzero(cand_mask)]
    if not cands:
        return 0
    import time as _time

    from ..utils.timers import add_extra

    t0 = _time.time()
    n_pop = 0
    n_tip = 0
    ok, nb, ntip, sink, vis, par, _K = _dispatch(g, cands, max_dist, 64)
    add_extra("clean.bubble_s", _time.time() - t0)
    touched = np.zeros(g.n_vtx, bool)
    any_commit = False
    for j, v0 in enumerate(cands):
        # live re-validation like the reference scan (asg.c:420-424)
        if g.sdel[v0 >> 1] or g.idx_cnt[v0] < 2:
            continue
        s = g.idx_start[v0]
        if int(np.sum(~g.adel[s:s + g.idx_cnt[v0]])) < 2:
            continue
        nbj = int(nb[j])
        vset = vis[j, :nbj]
        stale = False
        if any_commit:
            rd = np.concatenate([vset, vset ^ 1, [v0, v0 ^ 1]])
            stale = bool(touched[rd].any())
        if stale:
            okj, vlist, snk, parent, ntj = _host_pop1(g, v0, max_dist)
            if not okj:
                continue
            vset = np.asarray(vlist, dtype=np.int64)
        else:
            if not bool(ok[j]):
                continue
            snk = int(sink[j])
            parent = dict(zip(vset.tolist(), par[j, :nbj].tolist()))
            ntj = int(ntip[j])
        _commit(g, v0, vset, snk, parent)
        n_pop += 1
        n_tip += ntj
        touched[np.asarray(vset)] = True
        touched[np.asarray(vset) ^ 1] = True
        touched[[v0, v0 ^ 1]] = True
        any_commit = True
    return n_pop | (n_tip << 32)


def _commit(g: Graph, v0: int, vset, sink: int, parent):
    """asg_bub_backtrack (asg.c:338-357): delete every visited read and
    every live out-arc of the processed vertices, then restore the
    max-count path sink -> v0."""
    for w in vset[1:]:
        g.sdel[w >> 1] = True
    for u in (int(x) for x in np.concatenate([[v0], vset[1:]])):
        if u == sink:
            continue
        s = g.idx_start[u]
        c = g.idx_cnt[u]
        for ai in range(s, s + c):
            if g.adel[ai]:
                continue
            g.adel[ai] = True
            g.arc_del(int(g.v[ai]) ^ 1, int(g.u[ai]) ^ 1, True)
    v = sink
    while v != v0:
        u = parent[v]
        g.sdel[v >> 1] = False
        g.arc_del(u, v, False)
        g.arc_del(v ^ 1, u ^ 1, False)
        v = u
