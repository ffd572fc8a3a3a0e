"""Vectorized hit -> arc classification (the geometric core).

Re-implements the semantics of the reference's scalar ma_hit2arc
(miniasm.h:86-104; Algorithm 5 of the paper) as a single elementwise device
kernel over hit columns.  Return code per hit:

  l >= 0            : proper overlap; arc fields (u, v, l, ol) are valid
  MA_HT_INT   (-1)  : internal match
  MA_HT_QCONT (-2)  : query contained in target
  MA_HT_TCONT (-3)  : target contained in query
  MA_HT_SHORT_OVLP (-4): overlap too short

Float comparisons reproduce the reference's C arithmetic: the int_frac test
compares in float32 (uint32 operands are converted to float before the
multiply/compare, miniasm.h:94).
"""

from __future__ import annotations

import jax.numpy as jnp

MA_HT_INT = -1
MA_HT_QCONT = -2
MA_HT_TCONT = -3
MA_HT_SHORT_OVLP = -4


def hit2arc(qid, qs, qe, tid, ts, te, rev, ql, tl,
            max_hang, int_frac, min_ovlp):
    """Classify hits; everything int32/bool except the f32 frac test.

    Args are 1-D arrays (or scalars broadcastable); ql/tl are the (possibly
    trimmed) lengths of query/target per hit.  Returns a dict of columns:
      r   : int32  classification code / arc length
      u   : int32  source vertex (qid<<1 | dir)
      v   : int32  sink vertex (tid<<1 | dir')
      l   : int32  u-prefix length (low 32 bits of the reference's ul)
      ol  : int32  overlap length (ql - l)
    """
    i32 = jnp.int32
    qs = jnp.asarray(qs).astype(i32)
    qe = jnp.asarray(qe).astype(i32)
    ts = jnp.asarray(ts).astype(i32)
    te = jnp.asarray(te).astype(i32)
    ql = jnp.asarray(ql).astype(i32)
    tl = jnp.asarray(tl).astype(i32)
    rev = jnp.asarray(rev).astype(jnp.bool_)
    qid = jnp.asarray(qid).astype(i32)
    tid = jnp.asarray(tid).astype(i32)

    tl5 = jnp.where(rev, tl - te, ts)          # 5'-end target overhang on query strand
    tl3 = jnp.where(rev, ts, tl - te)          # 3'-end
    qh5 = qs                                   # query 5' hang
    qh3 = ql - qe                              # query 3' hang
    ext5 = jnp.minimum(qh5, tl5)
    ext3 = jnp.minimum(qh3, tl3)

    span = qe - qs
    f32 = jnp.float32
    internal = (
        (ext5 > max_hang) | (ext3 > max_hang)
        | (span.astype(f32) < (span + ext5 + ext3).astype(f32) * f32(int_frac))
    )
    qcont = (qh5 <= tl5) & (qh3 <= tl3)
    tcont = (qh5 >= tl5) & (qh3 >= tl3)

    from5 = qh5 > tl5                          # overlap leaves query's 3' end? no: q extends left
    u_dir = jnp.where(from5, 0, 1)
    v_dir = jnp.where(from5, rev.astype(i32), (~rev).astype(i32))
    l = jnp.where(from5, qh5 - tl5, qh3 - tl3)

    short = ((span + ext5 + ext3 < min_ovlp)
             | ((te - ts) + ext5 + ext3 < min_ovlp))

    r = l
    r = jnp.where(short, MA_HT_SHORT_OVLP, r)
    # containment tests precede the short test in the reference control flow
    r = jnp.where(tcont & ~qcont, MA_HT_TCONT, r)
    r = jnp.where(qcont, MA_HT_QCONT, r)
    r = jnp.where(internal, MA_HT_INT, r)

    u = (qid << 1) | u_dir
    v = (tid << 1) | v_dir
    ol = ql - l
    return {"r": r, "u": u, "v": v, "l": l, "ol": ol}
