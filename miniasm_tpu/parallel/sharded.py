"""Multi-device sharded pipeline steps (shard_map over a 1-D read mesh).

Design (new; the reference is single-process — SURVEY.md §2.4):

  - hits are sharded by *owner*: the shard whose read-id block contains the
    hit's query id.  Blocks are contiguous id ranges so the segment sweeps
    stay shard-local;
  - the bi-directional mirror (reference hit.c:92-98) creates records owned
    by the target's shard: `mirror_exchange` buckets them by destination and
    moves them with a single all_to_all over ICI;
  - trim tables are O(n_reads) and replicated via all_gather;
  - scalar statistics and convergence flags use psum.

Everything compiles under jit with static shapes; per-destination buckets
are fixed-capacity with overflow counted and reported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..core.hit2arc import hit2arc
from ..select.subregion import hit_sub
from ..select.cut import hit_cut

HIT_COLS = 9  # qid qs qe tid ts te ml bl rev


def _block_owner(read_id, block):
    return read_id // block


def mirror_exchange(cols, n_local, *, n_shards: int, block: int, cap: int,
                    axis: str = "r"):
    """Inside shard_map: build mirrored hits of the local records and route
    each to the shard owning its new query id.

    cols: (9, N) int32 local hit columns [qid qs qe tid ts te ml bl rev].
    Returns (recv_cols (9, n_shards*cap), recv_valid mask, n_dropped).
    """
    qid, qs, qe, tid, ts, te, ml, bl, rev = cols
    N = qid.shape[0]
    iota = jnp.arange(N, dtype=jnp.int32)
    valid = (iota < n_local) & (qid != tid)  # self matches are not mirrored
    # mirrored record: swap query and target
    m = jnp.stack([tid, ts, te, qid, qs, qe, ml, bl, rev])
    dest = jnp.where(valid, _block_owner(tid, block), n_shards)

    # bucket by destination: stable sort by dest, then slot within bucket
    order = jax.lax.sort((dest, iota), dimension=0, is_stable=True, num_keys=1)[1]
    sdest = dest[order]
    sm = m[:, order]
    pos = jnp.arange(N, dtype=jnp.int32)
    first = jnp.searchsorted(sdest, jnp.arange(n_shards + 1, dtype=jnp.int32),
                             side="left").astype(jnp.int32)
    slot = pos - first[sdest]
    fits = (slot < cap) & (sdest < n_shards)
    n_dropped = jnp.sum((slot >= cap) & (sdest < n_shards))

    send = jnp.zeros((HIT_COLS, n_shards * cap), dtype=jnp.int32)
    svalid = jnp.zeros((n_shards * cap,), dtype=jnp.bool_)
    # non-fitting rows scatter out of bounds and are dropped
    flat = jnp.where(fits, sdest * cap + slot, n_shards * cap)
    send = send.at[:, flat].set(sm)
    svalid = svalid.at[flat].set(fits)

    # all_to_all: split leading bucket axis across shards
    send = send.reshape(HIT_COLS, n_shards, cap)
    svalid = svalid.reshape(n_shards, cap)
    recv = jax.lax.all_to_all(send, axis, split_axis=1, concat_axis=1)
    rvalid = jax.lax.all_to_all(svalid, axis, split_axis=0, concat_axis=0)
    return recv.reshape(HIT_COLS, n_shards * cap), rvalid.reshape(-1), n_dropped


def _local_sort(cols, valid):
    """Stable sort local hits by (valid desc, qid, qs)."""
    from ..utils.arrays import argsort_multi

    qid = cols[0]
    qs = cols[1]
    inval = (~valid).astype(jnp.int32)
    order = argsort_multi([inval, qid, qs])
    return [c[order] for c in cols], valid[order]


def sharded_select_step(mesh, n_seq: int, opt, cap_mirror: int):
    """Build the jitted multi-device step: mirror exchange + local stable
    sort + coverage-sweep trim + coordinate cut + arc classification, with
    psum'd global counters.  This is the framework's 'training step'
    equivalent: one full device-parallel pass over the sharded hit store."""
    n_shards = mesh.devices.size
    axis = mesh.axis_names[0]
    block = -(-n_seq // n_shards)  # reads per shard (ceil)

    # shard_map over a stacked column matrix keeps the specs simple
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis),),
        out_specs=(P(None, axis), P(None), P()),
    )
    def run(colmat):
        # colmat: (10, Nl) local slice; row 9 = valid flag
        cols = [colmat[i] for i in range(HIT_COLS)]
        valid = colmat[HIT_COLS].astype(bool)
        n_local = jnp.sum(valid)

        # 1. mirror + all_to_all exchange
        recv, rvalid, n_drop = mirror_exchange(
            cols, n_local, n_shards=n_shards, block=block, cap=cap_mirror,
            axis=axis)
        # 2. merge local + received, stable sort by (qid, qs)
        merged = [jnp.concatenate([c, recv[i]]) for i, c in enumerate(cols)]
        mvalid = jnp.concatenate([valid, rvalid])
        merged, mvalid = _local_sort(merged, mvalid)
        qid, qs, qe, tid, ts, te, ml, bl, rev = merged

        # 3. local coverage sweep (qids are block-local => segments local);
        # invalid rows are neutralized (qid=n_seq lands in the dummy
        # segment, zero span kills their events)
        qid_m = jnp.where(mvalid, qid, n_seq)
        tid_m = jnp.where(mvalid, tid, n_seq + 1)
        qs_m = jnp.where(mvalid, qs, 0)
        qe_m = jnp.where(mvalid, qe, 0)
        sub_s, sub_e, sub_del = hit_sub(
            qid_m, tid_m, qs_m, qe_m, ml, bl, n_seq,
            opt.min_dp, opt.min_iden, 0)
        # each shard computed sub only for its own qid block; combine by max
        # (non-owners contributed zeros)
        sub_s = jax.lax.pmax(sub_s, axis)
        sub_e = jax.lax.pmax(sub_e, axis)
        sub_del = jax.lax.pmax(sub_del.astype(jnp.int32), axis).astype(bool)

        # 4. coordinate cut against the replicated trim table
        keep, cqs, cqe, cts, cte = hit_cut(
            qid, tid, qs, qe, ts, te, rev, sub_s, sub_e, sub_del,
            opt.min_span)
        keep = keep & mvalid

        # 5. arc classification (elementwise, no comm)
        slen = (sub_e.astype(jnp.int32) - sub_s.astype(jnp.int32))
        arcs = hit2arc(qid, cqs, cqe, tid, cts, cte, rev,
                       slen[qid], slen[tid], opt.max_hang, opt.int_frac,
                       opt.min_ovlp)
        n_arcs = jnp.sum(keep & (arcs["r"] >= 0))

        out = jnp.stack([qid, cqs.astype(jnp.int32), cqe.astype(jnp.int32),
                         tid, cts.astype(jnp.int32), cte.astype(jnp.int32),
                         ml, bl, rev, keep.astype(jnp.int32)])
        stats = jnp.stack([jax.lax.psum(jnp.sum(keep), axis),
                           jax.lax.psum(n_arcs, axis),
                           jax.lax.psum(n_drop, axis)])
        subtab = jnp.stack([sub_s.astype(jnp.int32), sub_e.astype(jnp.int32),
                            sub_del.astype(jnp.int32)])
        return out, subtab, stats

    return run
