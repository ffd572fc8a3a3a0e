"""ctypes wrapper for the native PAF loader (pafread.cpp)."""

from __future__ import annotations

import ctypes

import numpy as np

from ..seqdict import SeqDict


class _MaPafLoad(ctypes.Structure):
    _fields_ = [
        ("n_rec", ctypes.c_int64),
        ("n_seq", ctypes.c_int64),
        ("n_lines", ctypes.c_int64),
        ("names_bytes", ctypes.c_int64),
        ("qid", ctypes.POINTER(ctypes.c_int32)),
        ("qs", ctypes.POINTER(ctypes.c_uint32)),
        ("qe", ctypes.POINTER(ctypes.c_uint32)),
        ("tid", ctypes.POINTER(ctypes.c_int32)),
        ("ts", ctypes.POINTER(ctypes.c_uint32)),
        ("te", ctypes.POINTER(ctypes.c_uint32)),
        ("ml", ctypes.POINTER(ctypes.c_uint32)),
        ("bl", ctypes.POINTER(ctypes.c_uint32)),
        ("rev", ctypes.POINTER(ctypes.c_uint8)),
        ("seq_len", ctypes.POINTER(ctypes.c_uint32)),
        ("names", ctypes.POINTER(ctypes.c_char)),
    ]


def _arr(ptr, n, dtype):
    if n == 0:
        return np.zeros(0, dtype=dtype)
    return np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)


def load_paf_native(fn, min_span, min_match, excl=None, d=None):
    from ..paf import PafLoad
    from .build import get_lib

    lib = get_lib()
    lib.ma_paf_load.restype = ctypes.POINTER(_MaPafLoad)
    lib.ma_paf_load.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_char_p,
                                ctypes.c_int64]
    lib.ma_paf_free.argtypes = [ctypes.POINTER(_MaPafLoad)]

    if excl is not None and excl.n_seq:
        blob = b"\0".join(n.encode() for n in excl.names) + b"\0"
    else:
        blob = b""
    res = lib.ma_paf_load(fn.encode(), min_span, min_match, blob, len(blob))
    if not res:
        raise FileNotFoundError(2, "could not open PAF file", fn)
    r = res.contents
    n = int(r.n_rec)
    ns = int(r.n_seq)
    out_d = d if d is not None else SeqDict()
    names_blob = ctypes.string_at(r.names, int(r.names_bytes))
    names = names_blob.decode("latin-1").split("\0")[:ns]
    lens = _arr(r.seq_len, ns, np.uint32)
    assert out_d.n_seq == 0, "native loader requires a fresh dict"
    for nm, ln in zip(names, lens):
        out_d.index[nm] = len(out_d.names)
        out_d.names.append(nm)
        out_d.lens.append(int(ln))

    load = PafLoad(
        qid=_arr(r.qid, n, np.int32), qs=_arr(r.qs, n, np.uint32),
        qe=_arr(r.qe, n, np.uint32), tid=_arr(r.tid, n, np.int32),
        ts=_arr(r.ts, n, np.uint32), te=_arr(r.te, n, np.uint32),
        ml=_arr(r.ml, n, np.uint32), bl=_arr(r.bl, n, np.uint32),
        rev=_arr(r.rev, n, np.uint8), d=out_d, n_lines=int(r.n_lines))
    lib.ma_paf_free(res)
    return load


class _MaHits3(ctypes.Structure):
    _fields_ = [
        ("n_orig", ctypes.c_int64),
        ("n_mirror", ctypes.c_int64),
        ("n_seq", ctypes.c_int64),
        ("n_lines", ctypes.c_int64),
        ("cap", ctypes.c_int64),
        ("names_bytes", ctypes.c_int64),
        ("max_len", ctypes.c_int64),
        ("colmat", ctypes.POINTER(ctypes.c_int32)),
        ("rank", ctypes.POINTER(ctypes.c_int64)),
        ("seq_len", ctypes.POINTER(ctypes.c_uint32)),
        ("names", ctypes.POINTER(ctypes.c_char)),
        ("raw", ctypes.c_void_p),
        ("bi_dir", ctypes.c_int64),
    ]


class HitsV2:
    """Handle over the native v2 loader result: device colmat of the
    unmirrored originals + lazily-built host rank table (the exact ksort
    radix permutation of the implied mirrored array, hit.c:100/ksort.h)."""

    def __init__(self, lib, res):
        self._lib = lib
        self._res = res
        r = res.contents
        self.n_orig = int(r.n_orig)
        self.n_mirror = int(r.n_mirror)
        self.n_lines = int(r.n_lines)
        self.cap = int(r.cap)
        self.max_len = int(r.max_len)
        self._ranked = False

    def colmat(self):
        """(7, cap) int32 numpy view over the native buffer (no copy; the
        caller must device_put before free)."""
        r = self._res.contents
        return np.ctypeslib.as_array(r.colmat, shape=(7, self.cap))

    def build_rank(self):
        """CPU-bound; call while the device kernel runs."""
        if not self._ranked:
            self._lib.ma_hits3_rank(self._res)
            self._ranked = True

    def arc_ranks(self, idx):
        """Map kernel arc indices (j for q-side rows, cap+j for mirrors)
        to positions in the reference's sorted mirrored hit array."""
        self.build_rank()
        r = self._res.contents
        rank = np.ctypeslib.as_array(r.rank, shape=(2 * self.cap,))
        side = (idx >= self.cap).astype(np.int64)
        j = idx - side * self.cap
        return rank[(j << 1) | side]

    def seqdict(self):
        from ..seqdict import SeqDict

        r = self._res.contents
        ns = int(r.n_seq)
        names_blob = ctypes.string_at(r.names, int(r.names_bytes))
        names = names_blob.decode("latin-1").split("\0")[:ns]
        lens = (np.ctypeslib.as_array(r.seq_len, shape=(ns,)).copy()
                if ns else np.zeros(0, np.uint32))
        d = SeqDict()
        for nm, ln in zip(names, lens):
            d.index[nm] = len(d.names)
            d.names.append(nm)
            d.lens.append(int(ln))
        return d

    def free(self):
        if self._res:
            self._lib.ma_hits3_free(self._res)
            self._res = None

    def __del__(self):
        try:
            self.free()
        except Exception:
            pass


def load_hits_v2(fn, min_span, min_match, excl=None, bi_dir=True,
                 min_iden=0.05, upload=True):
    """v2 native loader: parse + filter + intern in C++ (reference
    hit.c:70-107 without the mirror/sort), upload the original columns,
    keep the exact mirrored-order rank table host-side.  Returns
    (colmat_dev, SeqDict, HitsV2 handle).  With upload=False the colmat is
    returned as a numpy view over the native buffer (the caller must copy
    what it needs before freeing the handle)."""
    import jax

    from .build import get_lib

    lib = get_lib()
    lib.ma_paf_load_hits3.restype = ctypes.POINTER(_MaHits3)
    lib.ma_paf_load_hits3.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_char_p,
                                      ctypes.c_int64, ctypes.c_int,
                                      ctypes.c_double]
    lib.ma_hits3_rank.argtypes = [ctypes.POINTER(_MaHits3)]
    lib.ma_hits3_free.argtypes = [ctypes.POINTER(_MaHits3)]

    if excl is not None and excl.n_seq:
        blob = b"\0".join(n.encode() for n in excl.names) + b"\0"
    else:
        blob = b""
    res = lib.ma_paf_load_hits3(fn.encode(), min_span, min_match, blob,
                                len(blob), 1 if bi_dir else 0,
                                float(min_iden))
    if not res:
        raise FileNotFoundError(2, "could not open PAF file", fn)
    h = HitsV2(lib, res)
    colmat = h.colmat()
    d = h.seqdict()
    if not upload:
        return colmat, d, h
    # Upload as int32.  A uint16 device array would halve the H2D bytes,
    # but this backend's sub-word transfer path is pathological (measured:
    # D2H of a 50 MB uint16 array takes 133 s vs 2.9 s for 99 MB of int32,
    # and jit lowering does one such fetch of the argument) — never put
    # sub-word arrays on the device.
    colmat_dev = jax.device_put(colmat)
    return colmat_dev, d, h


class _MaMtInfo(ctypes.Structure):
    _fields_ = [
        ("n_orig", ctypes.c_int64),
        ("n_mirror", ctypes.c_int64),
        ("n_seq", ctypes.c_int64),
        ("n_lines", ctypes.c_int64),
        ("max_len", ctypes.c_int64),
        ("names_bytes", ctypes.c_int64),
    ]


_MT_CHUNK = 1 << 19  # records per uploaded piece (a 64K multiple)


def _ladder_chunks(c: int) -> int:
    """Quantize a piece count to the {4,5,6,7}x2^k ladder (plus 1,2,3 at
    the bottom).  The select kernel's compiled shape is keyed by the total
    record capacity, so quantizing caps to this ladder means a NEW input
    size almost always reuses a previously-compiled (and persistently
    cached) kernel instead of paying a minutes-long tunnel compile; the
    cost is <= 14% padding rows, which the kernel treats as inert."""
    if c <= 4:
        return max(c, 1)
    k = 0
    while (7 << k) < c:
        k += 1
    for m in (4, 5, 6, 7):
        if (m << k) >= c:
            return m << k
    return 8 << k


def _concat_jit(*pieces):
    import jax

    if not hasattr(_concat_jit, "_fn"):
        import jax.numpy as jnp

        _concat_jit._fn = jax.jit(lambda *ps: jnp.concatenate(ps, axis=1))
    return _concat_jit._fn(*pieces)


def _decode3_jit(piece_dev):
    """Device-side decode of a flat FMT3 piece (13.5 B/record H2D layout:
    3 coordinate rows + flag nibbles + qid run-length sideband) into the
    standard 4-row packed layout [qid|flags<<28, tid, qs<<16|qe,
    ts<<16|te].  Dispatched per piece as it uploads, so the decode cost
    (one small scatter + a cumsum + a broadcast nibble unpack — no
    full-size gathers) hides under the H2D stream."""
    import jax

    fns = _decode3_jit.__dict__.setdefault("_fns", {})
    words = piece_dev.shape[0]
    fn = fns.get(words)
    if fn is None:
        fn = jax.jit(lambda flat: _decode3_body(flat, words * 8 // 27))
        fns[words] = fn
    return fn(piece_dev)


def _decode3_body(flat, n):
    """Traced FMT3 decode of one flat piece (words == 3*n + 3*(n//8))."""
    import jax.numpy as jnp

    rows = flat[:3 * n].reshape(3, n)
    fw = flat[3 * n:3 * n + n // 8].astype(jnp.uint32)
    # nibble unpack via broadcast shifts (a per-record gather of the
    # word array would price ~7 ns/index; this is elementwise)
    nib = ((fw[:, None]
            >> (4 * jnp.arange(8, dtype=jnp.uint32)[None, :]))
           & jnp.uint32(0xF)).reshape(n)
    bp = flat[3 * n + n // 8: 3 * n + 2 * (n // 8)]
    bq = flat[3 * n + 2 * (n // 8): 3 * n + 3 * (n // 8)]
    # qid = prefix-sum of boundary DELTAS scattered at run starts
    # (no searchsorted, no gather; padding bp rows are -1)
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), bq[:-1]])
    ok = bp >= 0
    delta = jnp.where(ok, bq - prev, 0)
    tgt = jnp.where(ok, bp, n)
    d = jnp.zeros(n + 1, jnp.int32).at[tgt].add(delta)
    qid = jnp.cumsum(d[:n])
    w0 = (qid.astype(jnp.uint32) | (nib << 28)).astype(jnp.int32)
    return jnp.stack([w0, rows[0], rows[1], rows[2]])


def _decode3_concat_jit(piece_devs):
    """Decode a pure-FMT3 piece stream and concatenate to the (4, cap)
    colmat in ONE dispatch (keyed by the tuple of piece lengths, which
    the ladder makes recur across inputs)."""
    import jax

    fns = _decode3_concat_jit.__dict__.setdefault("_fns", {})
    key = tuple(p.shape[0] for p in piece_devs)
    fn = fns.get(key)
    if fn is None:
        import jax.numpy as jnp

        def _f(*flats):
            return jnp.concatenate(
                [_decode3_body(f, f.shape[0] * 8 // 27) for f in flats],
                axis=1)

        fn = jax.jit(_f)
        fns[key] = fn
    return fn(*piece_devs)


def _fmt3_to_cols(buf, sz, n, rows):
    """Host-side conversion of a (possibly partial) flat FMT3 piece to a
    (rows, n) column piece — the rare mid-stream downgrade path when a
    record overflows the packed coordinate range (rows=7) or a piece
    overflows the RLE sideband (rows=4)."""
    r = buf[:3 * sz].reshape(3, sz)[:, :n]
    nw = buf[3 * sz:3 * sz + sz // 8].astype(np.uint32)
    idx = np.arange(n)
    nib = ((nw[idx >> 3] >> (4 * (idx & 7)).astype(np.uint32))
           & 0xF).astype(np.uint32)
    bp = buf[3 * sz + sz // 8: 3 * sz + 2 * (sz // 8)]
    bq = buf[3 * sz + 2 * (sz // 8): 3 * sz + 3 * (sz // 8)]
    k = bp[bp >= 0]
    v = bq[:len(k)]
    j = np.searchsorted(k, idx, side="right") - 1
    qid = v[j] if len(k) else np.zeros(n, np.int32)
    if rows == 4:
        w0 = qid.astype(np.uint32) | (nib << 28)
        return np.stack([w0.astype(np.int32), r[0], r[1], r[2]])
    qsqe = r[1].astype(np.uint32)
    tste = r[2].astype(np.uint32)
    return np.stack([qid.astype(np.int32),
                     (qsqe >> 16).astype(np.int32),
                     (qsqe & 0xFFFF).astype(np.int32),
                     r[0],
                     (tste >> 16).astype(np.int32),
                     (tste & 0xFFFF).astype(np.int32),
                     nib.astype(np.int32)])


def _unpack4_jit(piece):
    """Device-side unpack of a 4-row packed piece to the 7-row layout
    (rare fallback: only when a late record in the stream failed to pack,
    forcing the whole colmat to the 7-row format)."""
    import jax

    if not hasattr(_unpack4_jit, "_fn"):
        import jax.numpy as jnp

        def _f(p):
            w0 = p[0].astype(jnp.uint32)
            qsqe = p[2].astype(jnp.uint32)
            tste = p[3].astype(jnp.uint32)
            i32 = jnp.int32
            return jnp.stack([
                (w0 & jnp.uint32(0x0FFFFFFF)).astype(i32),
                (qsqe >> 16).astype(i32), (qsqe & 0xFFFF).astype(i32),
                p[1],
                (tste >> 16).astype(i32), (tste & 0xFFFF).astype(i32),
                (w0 >> 28).astype(i32)])

        _unpack4_jit._fn = jax.jit(_f)
    return _unpack4_jit._fn(piece)


class HitsMt:
    """Handle over the pipelined multi-threaded loader (pafmt.cpp).
    API-compatible with HitsV2 for the v2 select path."""

    def __init__(self, lib, res, cap):
        self._lib = lib
        self._res = res
        self.cap = cap
        self._ranked = False
        self._async = False
        info = _MaMtInfo()
        lib.ma_mt_info(res, ctypes.byref(info))
        self.n_orig = int(info.n_orig)
        self.n_mirror = int(info.n_mirror)
        self.n_lines = int(info.n_lines)
        self.max_len = int(info.max_len)
        self._n_seq = int(info.n_seq)
        self._names_bytes = int(info.names_bytes)

    def rank_async(self):
        """Start the exact-permutation build on a C++ side thread (the
        second core) so it overlaps the device dispatch + fetch."""
        if not self._ranked and not self._async:
            self._lib.ma_mt_rank_async(self._res)
            self._async = True

    def build_rank(self):
        """CPU-bound exact-permutation build (joins the async thread if
        one was started)."""
        if self._async:
            self._lib.ma_mt_rank_wait(self._res)
            self._async = False
            self._ranked = True
        if not self._ranked:
            self._lib.ma_mt_rank(self._res)
            self._ranked = True

    def arc_ranks(self, idx):
        self.build_rank()
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        out = np.empty(idx.shape[0], dtype=np.int64)
        self._lib.ma_mt_rank_fetch(
            self._res, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx.shape[0], self.cap,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out

    def print_paf(self, sub1, sub2, alive, min_span, max_hang_flt,
                  min_ovlp_flt, fd):
        """-p paf fast path: replay the cut/filter passes over the
        retained records in exact sorted order and stream print_hits
        (main.c:21-30) lines to fd.  sub1/sub2 are (s, e, del) per-read
        arrays from the kernel's paf_tables variant; requires the loader
        to have been opened with retain_full=True."""
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        s1, e1, d1 = sub1
        s2, e2, d2 = sub2
        # keep the contiguous copies alive across the call
        hold = [np.ascontiguousarray(x, np.int32) for x in (s1, e1, s2, e2)]
        holdb = [np.ascontiguousarray(x, np.uint8) for x in (d1, d2, alive)]
        return int(self._lib.ma_mt_print_paf(
            self._res,
            hold[0].ctypes.data_as(i32p), hold[1].ctypes.data_as(i32p),
            holdb[0].ctypes.data_as(u8p),
            hold[2].ctypes.data_as(i32p), hold[3].ctypes.data_as(i32p),
            holdb[1].ctypes.data_as(u8p), holdb[2].ctypes.data_as(u8p),
            int(min_span), int(max_hang_flt), int(min_ovlp_flt), int(fd)))

    def key_fetch(self, idx):
        """Mirrored-hit sort keys (qid<<32|qs per side) for kernel arc
        indices; no rank build needed."""
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        out = np.empty(idx.shape[0], dtype=np.uint64)
        self._lib.ma_mt_key_fetch(
            self._res, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx.shape[0], self.cap,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        return out

    def seqdict(self):
        from ..seqdict import SeqDict

        blob = ctypes.create_string_buffer(max(self._names_bytes, 1))
        self._lib.ma_mt_names(self._res, blob)
        names = blob.raw[:self._names_bytes].decode("latin-1").split("\0")[:self._n_seq]
        lens = np.empty(max(self._n_seq, 1), dtype=np.uint32)
        self._lib.ma_mt_seq_len(
            self._res, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        return SeqDict.from_arrays(names, lens[:self._n_seq].tolist())

    def free(self):
        if self._res:
            self._lib.ma_mt_free(self._res)
            self._res = None

    def __del__(self):
        try:
            self.free()
        except Exception:
            pass


def load_hits_mt(fn, min_span, min_match, excl=None, bi_dir=True,
                 min_iden=0.05, n_workers=2, upload=True, block_bytes=0,
                 carry_seed=None, retain_full=False):
    """Pipelined loader: reader + parser threads tokenize and chunk-intern
    while the consumer globalizes ids in order and device_puts fixed-size
    (7, 2^19) pieces, so parsing, H2D transfer, and (via the later
    build_rank overlap) the exact-permutation sort all overlap.  The
    device colmat is the concatenation of the pieces (one cheap jitted
    concat per piece-count, so kernel shapes recompile per piece-count
    granularity, not per 64K records).  Padding rows are zero-filled
    (flags=0), which the dual-sided kernel treats as inert.

    Returns (colmat_dev, SeqDict, HitsMt); with upload=False the colmat is
    a host numpy array (no jax import — sanitizer/CI runs use this)."""
    if upload:
        import jax

    from .build import get_lib

    lib = get_lib()
    lib.ma_mt_begin.restype = ctypes.c_void_p
    lib.ma_mt_begin.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_char_p,
                                ctypes.c_int64, ctypes.c_int,
                                ctypes.c_double, ctypes.c_int64,
                                ctypes.c_int, ctypes.c_int64]
    lib.ma_mt_next.restype = ctypes.c_int64
    lib.ma_mt_next.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_int32),
                               ctypes.c_int64]
    lib.ma_mt_next4.restype = ctypes.c_int64
    lib.ma_mt_next4.argtypes = lib.ma_mt_next.argtypes
    lib.ma_mt_next3.restype = ctypes.c_int64
    lib.ma_mt_next3.argtypes = lib.ma_mt_next.argtypes
    lib.ma_mt_pack_failed.restype = ctypes.c_int
    lib.ma_mt_pack_failed.argtypes = [ctypes.c_void_p]
    lib.ma_mt_rle_failed.restype = ctypes.c_int
    lib.ma_mt_rle_failed.argtypes = [ctypes.c_void_p]
    lib.ma_mt_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(_MaMtInfo)]
    lib.ma_mt_names.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ma_mt_seq_len.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_uint32)]
    lib.ma_mt_rank.argtypes = [ctypes.c_void_p]
    lib.ma_mt_rank_async.argtypes = [ctypes.c_void_p]
    lib.ma_mt_rank_wait.argtypes = [ctypes.c_void_p]
    lib.ma_mt_rank_fetch.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int64),
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.POINTER(ctypes.c_int64)]
    lib.ma_mt_key_fetch.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_uint64)]
    lib.ma_mt_free.argtypes = [ctypes.c_void_p]
    lib.ma_mt_seed_carry.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.ma_mt_retain_full.argtypes = [ctypes.c_void_p]
    lib.ma_mt_print_paf.restype = ctypes.c_int64
    lib.ma_mt_print_paf.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]

    if excl is not None and excl.n_seq:
        blob = b"\0".join(n.encode() for n in excl.names) + b"\0"
    else:
        blob = b""
    # Record-count estimate from the file size (PAF lines are ~70-90 B;
    # gz assumes 4x) -- a deliberate UNDERestimate so big pieces never
    # overshoot the stream.
    import os as _os

    try:
        fsz = _os.path.getsize(fn) if fn != "-" else 0
    except OSError:
        fsz = 0
    if fn.endswith(".gz"):
        fsz *= 4
    est = fsz // 100
    # piece quantum: small files ride 2^17-record pieces so the padded
    # capacity tracks the input (at E. coli scale the 2^19 quantum padded
    # the kernel 40%+, and kernel cost is proportional to capacity); the
    # {4,5,6,7}x2^k chunk-count ladder applies to either quantum, so both
    # shape families recur across inputs
    chunk = _MT_CHUNK if est == 0 or est >= (1 << 22) else (_MT_CHUNK >> 2)
    res = lib.ma_mt_begin(fn.encode(), min_span, min_match, blob, len(blob),
                          1 if bi_dir else 0, float(min_iden), chunk,
                          n_workers, block_bytes)
    if not res:
        raise FileNotFoundError(2, "could not open PAF file", fn)
    if carry_seed is not None:
        # multi-process range reads: seed the 10-field bl carry with the
        # nearest complete line before this range (paf.c:56-60 semantics
        # across the split); must precede the first ma_mt_next call
        lib.ma_mt_seed_carry(res, int(carry_seed))
    if retain_full:
        lib.ma_mt_retain_full(res)  # -p paf replay needs qe/te/ml/bl/rev
    # Piece schedule: device_put costs ~50 ms fixed on the tunnel, so the
    # bulk of a long stream rides 4*chunk pieces; the TAIL drops back to
    # single-chunk pieces so the zero-padding (kernel cost ∝ cap) stays
    # <= chunk.
    # uploader thread: device_put's synchronous staging copy overlaps the
    # C++ parse (ma_mt_next releases the GIL)
    import queue as _queue
    import threading as _threading

    pieces = []
    upq: "_queue.Queue" = _queue.Queue(maxsize=2)

    def _uploader():
        # flat FMT3 pieces stay flat here: interleaving decode dispatches
        # between device_puts breaks the tunnel's H2D pipelining (measured
        # +1s at 100 Mb); the whole stream decodes in ONE dispatch below
        while True:
            item = upq.get()
            if item is None:
                return
            pieces.append(jax.device_put(item) if upload else item)

    up_thread = _threading.Thread(target=_uploader)
    up_thread.start()
    cap = 0
    n_pieces = 0
    # H2D format ladder: FMT3 (13.5 B/record flat pieces, decoded to 4-row
    # on device) while the stream stays query-grouped with 16-bit
    # coordinates; a sideband overflow downgrades to the 4-row packed
    # format, a coordinate/id overflow to the 7-row format.  Already-
    # uploaded pieces stay valid (FMT3 decodes to 4-row; 4-row pieces get
    # unpacked on device if the stream ends 7-row).
    fmt = 3 if upload else 7
    if upload and _os.environ.get("MINIASM_TPU_FMT3") == "0":
        fmt = 4  # test hook: force the 4-row H2D format
    had4 = False
    try:
        while True:
            big = cap + 4 * chunk <= est
            sz = 4 * chunk if big else chunk
            if fmt == 3:
                buf = np.empty(3 * sz + 3 * (sz // 8), dtype=np.int32)
                n = lib.ma_mt_next3(
                    res, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    sz)
                pf = bool(lib.ma_mt_pack_failed(res))
                rf = bool(lib.ma_mt_rle_failed(res))
                if pf or rf:
                    # truncate the filled prefix to its real records (a
                    # zero-padded middle would shift later device columns
                    # off their C++ g_*/rank index) and convert it
                    # host-side to the downgrade target's layout
                    new_rows = 7 if pf else 4
                    if n:
                        upq.put(_fmt3_to_cols(buf, sz, n, new_rows))
                        n_pieces += 1
                        cap += n
                        had4 = had4 or new_rows == 4
                    fmt = 7 if pf else 4
                    continue
                if n == 0 and n_pieces:
                    break
                upq.put(buf)
                had4 = True  # decodes to a 4-row piece
                n_pieces += 1
                cap += sz
                if n < sz:
                    break
                continue
            rows = 4 if fmt == 4 else 7
            buf = np.empty((rows, sz), dtype=np.int32)
            fn_next = lib.ma_mt_next4 if fmt == 4 else lib.ma_mt_next
            n = fn_next(
                res, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), sz)
            switched = fmt == 4 and bool(lib.ma_mt_pack_failed(res))
            if switched:
                fmt = 7
                if n == 0:
                    continue  # stream not done; re-read this piece 7-row
                # truncate the partial packed piece to its real records
                buf = np.ascontiguousarray(buf[:, :n])
                sz = n
            elif n == 0 and n_pieces:
                break
            upq.put(buf)
            had4 = had4 or rows == 4
            n_pieces += 1
            cap += sz
            if n < sz and not switched:
                break
        # pad the total capacity to the shape-bucket ladder with zero
        # pieces (inert rows) so the kernel's compiled shape recurs
        # across different input sizes; pure-host consumers (upload=False)
        # slice the padding off anyway, so skip the inflation there
        want_chunks = (_ladder_chunks(-(-cap // chunk)) if upload
                       else -(-cap // chunk))
        pad = want_chunks * chunk - cap
        pad_rows = 7 if fmt == 7 else 4  # match the final piece format
        while pad > 0:
            sz = min(pad, 4 * chunk)
            if fmt == 3:
                # flat zero piece: nibbles 0 -> inert (bpos=0/bqid=0 rows
                # scatter zero deltas)
                upq.put(np.zeros(3 * sz + 3 * (sz // 8), dtype=np.int32))
            else:
                upq.put(np.zeros((pad_rows, sz), dtype=np.int32))
            n_pieces += 1
            cap += sz
            pad -= sz
    finally:
        upq.put(None)
        up_thread.join()
    mixed = fmt == 7 and had4
    if not upload:
        colmat_dev = (pieces[0] if len(pieces) == 1
                      else np.concatenate(pieces, axis=1))
    elif pieces and all(p.ndim == 1 for p in pieces):
        # pure-FMT3 stream: decode + concatenate in one fused dispatch
        colmat_dev = (_decode3_jit(pieces[0]) if len(pieces) == 1
                      else _decode3_concat_jit(pieces))
    else:
        pieces = [_decode3_jit(p) if p.ndim == 1 else p for p in pieces]
        if mixed:
            pieces = [_unpack4_jit(p) if p.shape[0] == 4 else p
                      for p in pieces]
        colmat_dev = pieces[0] if len(pieces) == 1 else _concat_jit(*pieces)
    h = HitsMt(lib, res, cap=cap)
    d = h.seqdict()
    return colmat_dev, d, h
