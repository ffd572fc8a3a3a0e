"""PAF loading into structure-of-array columns + interned read ids.

Replaces the reference's streaming scalar path (paf.c:34-67 parsing,
hit.c:70-107 filter+intern).  Semantics preserved exactly:

  - a line is parsed from its first 11 tab fields (qn ql qs qe strand tn tl
    ts te ml bl); lines with <10 separators are skipped (paf.c:55);
  - record filter: qe-qs < min_span or te-ts < min_span or ml < min_match
    drops the line BEFORE interning (hit.c:85) — so id order is the
    first-appearance order of names on *surviving* lines, qn before tn
    (hit.c:88-90).  This order is load-bearing for output parity.
  - optional exclusion set by name (hit.c:86, used by -R).

Two implementations produce identical results: a pure-Python streaming
reader (always available) and a native C++ tokenizer (io/native) used when
compiled, for multi-GB inputs.
"""

from __future__ import annotations

import dataclasses
import gzip
import io as _io
import sys

import numpy as np

from .seqdict import SeqDict
from ..utils.timers import log


def open_text(fn: str):
    """Open a possibly-gzipped text file ('-' = stdin), like gzopen/gzdopen
    in the reference (paf.c:14)."""
    if fn == "-" or fn is None:
        raw = sys.stdin.buffer
        head = raw.peek(2) if hasattr(raw, "peek") else b""
        if head[:2] == b"\x1f\x8b":
            return gzip.open(raw, "rt")
        return _io.TextIOWrapper(raw)
    with open(fn, "rb") as f:
        head = f.read(2)
    if head == b"\x1f\x8b":
        return gzip.open(fn, "rt")
    return open(fn, "rt")


@dataclasses.dataclass
class PafLoad:
    """Filtered PAF records with interned ids, plus the id dictionary."""

    qid: np.ndarray  # int32
    qs: np.ndarray   # uint32
    qe: np.ndarray   # uint32
    tid: np.ndarray  # int32
    ts: np.ndarray   # uint32
    te: np.ndarray   # uint32
    ml: np.ndarray   # uint32
    bl: np.ndarray   # uint32
    rev: np.ndarray  # uint8 (0/1)
    d: SeqDict
    n_lines: int     # total PAF lines seen

    @property
    def n(self) -> int:
        return len(self.qid)


def _parse_lines_python(fn, min_span, min_match, excl, collect,
                        bl_carry=None):
    """Stream lines, apply the record filter, call collect(fields) per kept
    record. Returns total line count."""
    tot = 0
    last_bl = bl_carry if bl_carry is not None else 0
    # paf_rec_t is reused in the reference; bl persists across
    # records when a line has exactly 10 fields (paf.c:34-56 quirk).
    # bl_carry seeds it for multi-process byte-range reads.
    with open_text(fn) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            if len(t) < 10:
                continue
            tot += 1
            ql = int(t[1]); qs = int(t[2]); qe = int(t[3])
            rev = 1 if t[4] == "-" else 0
            tl = int(t[6]); ts = int(t[7]); te = int(t[8])
            ml = int(t[9])
            bl = int(t[10]) if len(t) > 10 else last_bl
            last_bl = bl
            if qe - qs < min_span or te - ts < min_span or ml < min_match:
                continue
            if excl is not None and (excl.get(t[0]) >= 0 or excl.get(t[5]) >= 0):
                continue
            collect(t[0], ql, qs, qe, rev, t[5], tl, ts, te, ml, bl)
    return tot


def load_paf(fn: str, min_span: int, min_match: int,
             excl: SeqDict | None = None, d: SeqDict | None = None,
             bl_carry: int | None = None) -> PafLoad:
    """Load + filter + intern a PAF file (reference ma_hit_read's read loop,
    hit.c:82-99, minus the hit mirroring which happens on device)."""
    try:
        from . import native

        if bl_carry is None and native.HAS_PAF and native.available():
            return native.load_paf(fn, min_span, min_match, excl=excl, d=d)
    except ImportError:
        pass
    return load_paf_python(fn, min_span, min_match, excl=excl, d=d,
                           bl_carry=bl_carry)


def load_paf_python(fn: str, min_span: int, min_match: int,
                    excl: SeqDict | None = None, d: SeqDict | None = None,
                    bl_carry: int | None = None) -> PafLoad:
    if d is None:
        d = SeqDict()
    cols = {k: [] for k in ("qid", "qs", "qe", "tid", "ts", "te", "ml", "bl", "rev")}
    ap = {k: cols[k].append for k in cols}

    def collect(qn, ql, qs, qe, rev, tn, tl, ts, te, ml, bl):
        ap["qid"](d.put(qn, ql))
        ap["qs"](qs); ap["qe"](qe)
        ap["tid"](d.put(tn, tl))
        ap["ts"](ts); ap["te"](te)
        ap["ml"](ml); ap["bl"](bl); ap["rev"](rev)

    tot = _parse_lines_python(fn, min_span, min_match, excl, collect,
                              bl_carry=bl_carry)
    out = PafLoad(
        qid=np.asarray(cols["qid"], dtype=np.int32),
        qs=np.asarray(cols["qs"], dtype=np.uint32),
        qe=np.asarray(cols["qe"], dtype=np.uint32),
        tid=np.asarray(cols["tid"], dtype=np.int32),
        ts=np.asarray(cols["ts"], dtype=np.uint32),
        te=np.asarray(cols["te"], dtype=np.uint32),
        ml=np.asarray(cols["ml"], dtype=np.uint32),
        bl=np.asarray(cols["bl"], dtype=np.uint32),
        rev=np.asarray(cols["rev"], dtype=np.uint8),
        d=d, n_lines=tot,
    )
    return out


def no_cont_prefilter(fn: str, min_span: int, min_match: int,
                      max_hang: int, int_frac: float) -> SeqDict:
    """Step 0 (-R): one streaming pass recording clearly-contained reads in
    an exclusion dict (reference ma_hit_no_cont, hit.c:38-68).  Streams in
    C++ when the native library is available."""
    import os

    if not os.environ.get("MINIASM_TPU_NO_NATIVE"):
        d = _no_cont_native(fn, min_span, min_match, max_hang, int_frac)
        if d is not None:
            log("no_cont", "dropped %d contained reads", d.n_seq)
            return d
    d = SeqDict()

    def collect(qn, ql, qs, qe, rev, tn, tl, ts, te, ml, bl):
        l5 = tl - te if rev else ts
        l3 = ts if rev else tl - te
        if (ql >> 1) > tl:
            if l5 > (max_hang >> 2) or l3 > (max_hang >> 2) or te - ts < tl * np.float32(int_frac):
                return  # internal match
            if qs - l5 > (max_hang << 1) and (ql - qe) - l3 > (max_hang << 1):
                d.put(tn, tl)
        elif ql < (tl >> 1):
            if qs > (max_hang >> 2) or ql - qe > (max_hang >> 2) or qe - qs < ql * np.float32(int_frac):
                return  # internal
            if l5 - qs > (max_hang << 1) and l3 - (ql - qe) > (max_hang << 1):
                d.put(qn, ql)

    _parse_lines_python(fn, min_span, min_match, None, collect)
    log("no_cont", "dropped %d contained reads", d.n_seq)
    return d


def _no_cont_native(fn, min_span, min_match, max_hang, int_frac):
    """C++ -R pass (io/native/fastx.cpp ma_no_cont); None on any failure
    so the caller falls back to the Python stream."""
    import ctypes

    try:
        from .native import available
        from .native.build import get_lib
    except ImportError:
        return None
    if not available():
        return None
    lib = get_lib()

    class _MaNoCont(ctypes.Structure):
        _fields_ = [("n", ctypes.c_int64), ("names_bytes", ctypes.c_int64),
                    ("names", ctypes.POINTER(ctypes.c_char)),
                    ("lens", ctypes.POINTER(ctypes.c_uint32))]

    lib.ma_no_cont.restype = ctypes.POINTER(_MaNoCont)
    lib.ma_no_cont.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                               ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_double]
    lib.ma_no_cont_free.argtypes = [ctypes.POINTER(_MaNoCont)]
    res = lib.ma_no_cont(fn.encode(), min_span, min_match, max_hang,
                         float(int_frac))
    if not res:
        raise FileNotFoundError(2, "could not open PAF file", fn)
    r = res.contents
    n = int(r.n)
    d = SeqDict()
    if n:
        blob = ctypes.string_at(r.names, int(r.names_bytes))
        names = blob.decode("latin-1").split("\0")[:n]
        lens = np.ctypeslib.as_array(r.lens, shape=(n,)).copy()
        for nm, ln in zip(names, lens):
            d.put(nm, int(ln))
    lib.ma_no_cont_free(res)
    return d
