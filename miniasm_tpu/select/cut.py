"""Rewrite hit coordinates into trimmed read frames (reference ma_hit_cut,
hit.c:162-193).

The reference's arithmetic mixes int and uint32; clamp comparisons happen
in the unsigned domain (a negative intermediate compares as a huge unsigned
and loses the min / wins the max).  We reproduce this bit-exactly: exact
math in int32, clamp comparisons on the uint32 bit pattern, final span
check on the wrapped int32 difference (hit.c:185).
"""

from __future__ import annotations

import jax.numpy as jnp


def hit_cut(qid, tid, qs, qe, ts, te, rev,
            sub_s, sub_e, sub_del, min_span: int):
    """Returns (keep bool, new qs, qe, ts, te as uint32)."""
    i32, u32 = jnp.int32, jnp.uint32
    qid = jnp.asarray(qid).astype(i32)
    tid = jnp.asarray(tid).astype(i32)
    qs0 = jnp.asarray(qs).astype(i32)
    qe0 = jnp.asarray(qe).astype(i32)
    ts0 = jnp.asarray(ts).astype(i32)
    te0 = jnp.asarray(te).astype(i32)
    rev = jnp.asarray(rev).astype(jnp.bool_)
    sub_s = jnp.asarray(sub_s).astype(i32)
    sub_e = jnp.asarray(sub_e).astype(i32)
    sub_del = jnp.asarray(sub_del)

    rq_s, rq_e = sub_s[qid], sub_e[qid]
    rt_s, rt_e = sub_s[tid], sub_e[tid]
    alive = ~(sub_del[qid] | sub_del[tid])

    # strand-aware projection of the partner's trim onto this hit
    # (hit.c:170-180); all quantities fit int32
    qs1 = jnp.where(rev,
                    jnp.where(te0 < rt_e, qs0, qs0 + (te0 - rt_e)),
                    jnp.where(ts0 > rt_s, qs0, qs0 + (rt_s - ts0)))
    qe1 = jnp.where(rev,
                    jnp.where(ts0 > rt_s, qe0, qe0 - (rt_s - ts0)),
                    jnp.where(te0 < rt_e, qe0, qe0 - (te0 - rt_e)))
    ts1 = jnp.where(rev,
                    jnp.where(qe0 < rq_e, ts0, ts0 + (qe0 - rq_e)),
                    jnp.where(qs0 > rq_s, ts0, ts0 + (rq_s - qs0)))
    te1 = jnp.where(rev,
                    jnp.where(qs0 > rq_s, te0, te0 - (rq_s - qs0)),
                    jnp.where(qe0 < rq_e, te0, te0 - (qe0 - rq_e)))

    # unsigned clamp to the trim interval then rebase (hit.c:181-184)
    rqs_u, rqe_u = rq_s.astype(u32), rq_e.astype(u32)
    rts_u, rte_u = rt_s.astype(u32), rt_e.astype(u32)
    qs2 = jnp.where(qs1.astype(u32) > rqs_u, qs1.astype(u32), rqs_u) - rqs_u
    qe2 = jnp.where(qe1.astype(u32) < rqe_u, qe1.astype(u32), rqe_u) - rqs_u
    ts2 = jnp.where(ts1.astype(u32) > rts_u, ts1.astype(u32), rts_u) - rts_u
    te2 = jnp.where(te1.astype(u32) < rte_u, te1.astype(u32), rte_u) - rts_u

    qspan = (qe2 - qs2).astype(i32)
    tspan = (te2 - ts2).astype(i32)
    keep = alive & (qspan >= min_span) & (tspan >= min_span)
    return keep, qs2, qe2, ts2, te2
