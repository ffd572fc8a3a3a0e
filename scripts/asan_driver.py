"""Sanitizer driver: exercises every native C++ entry point WITHOUT
importing jax (XLA's own runtime aborts under ASan interceptors, so the
sanitized process must stay off the device path).

Covers: the streaming PAF loader (plain + gz + excl + bl-carry edge
lines), the pipelined multi-threaded loader incl. cross-chunk interning
and rank build/fetch, the exact ksort radix argsort, the sequential
finalize oracle (graph cleaning + unitig walk), and the FASTA/Q splicer.
"""

import gzip
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miniasm_tpu.config import Opt
from miniasm_tpu.eval.simulate import simulate, write_paf, write_fasta
from miniasm_tpu.io.native import available
from miniasm_tpu.io.native.pafload import (load_paf_native, load_hits_mt,
                                           load_hits_v2)
from miniasm_tpu.io.seqdict import SeqDict

assert available(), "native library failed to load under the sanitizer"

tmp = tempfile.mkdtemp(prefix="asan_")
paf = os.path.join(tmp, "r.paf")
fa = os.path.join(tmp, "r.fa")
sim = simulate(genome_len=120_000, coverage=14.0, seed=9)
write_paf(sim, paf)
write_fasta(sim, fa)

# --- streaming loader: plain, gz, exclusion set ---
load = load_paf_native(paf, 2000, 100)
gz = os.path.join(tmp, "r.paf.gz")
with open(paf, "rb") as fi, gzip.open(gz, "wb") as fo:
    shutil.copyfileobj(fi, fo)
load_gz = load_paf_native(gz, 2000, 100)
assert np.array_equal(load.qid, load_gz.qid)
excl = SeqDict()
excl.put(load.d.names[0], 1)
load_paf_native(paf, 2000, 100, excl=excl)

# --- bl-carry / short-line edge cases ---
edge = os.path.join(tmp, "edge.paf")
with open(edge, "w") as f:
    f.write("a\t9000\t0\t5000\t+\tb\t9000\t4000\t9000\t5000\t5000\tx\n"
            "bad\tline\n"
            "c\t9000\t0\t4000\t-\td\t9000\t0\t4000\t4000\n")
load_paf_native(edge, 2000, 100)

# --- v2 + MT loaders (host-only), rank build + fetch ---
c1, d1, h1 = load_hits_v2(paf, 2000, 100, upload=False)
c2, d2, h2 = load_hits_mt(paf, 2000, 100, upload=False)
n = h1.n_orig
assert np.array_equal(np.asarray(c1)[:, :n], np.asarray(c2)[:, :n])
idx = np.concatenate([np.arange(n), h2.cap + np.arange(n)])
r2 = h2.arc_ranks(idx)
h2.rank_async()  # idempotent double-start guard
r1 = h1.arc_ranks(np.concatenate([np.arange(n), h1.cap + np.arange(n)]))
assert np.array_equal(r1, r2)
h1.free()
h2.free()
# free with threads mid-flight (abort path)
c3, d3, h3 = load_hits_mt(paf, 2000, 100, upload=False)
h3.rank_async()
h3.free()

# --- packed 4-row piece stream (ma_mt_next4) + hit-key fetch ---
import ctypes

from miniasm_tpu.io.native.build import get_lib

lib = get_lib()
res = lib.ma_mt_begin(paf.encode(), 2000, 100, b"", 0, 1, 0.05, 4096, 2, 0)
assert res
pieces = []
while True:
    buf = np.empty((4, 4096), dtype=np.int32)
    got = lib.ma_mt_next4(
        res, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), 4096)
    assert not lib.ma_mt_pack_failed(res)  # sim coords all fit 16 bits
    if got == 0 and pieces:
        break
    pieces.append(buf[:, :got])
    if got < 4096:
        break
packed = np.concatenate(pieces, axis=1)
c4, d4, h4 = load_hits_mt(paf, 2000, 100, upload=False)
n4 = h4.n_orig
a7 = np.asarray(c4)
w0 = packed[0].astype(np.uint32)
assert np.array_equal((w0 & 0x0FFFFFFF).astype(np.int32), a7[0, :n4])
assert np.array_equal((w0 >> 28).astype(np.int32), a7[6, :n4])
qsqe = packed[2].astype(np.uint32)
assert np.array_equal((qsqe >> 16).astype(np.int32), a7[1, :n4])
# key_fetch matches the columns directly
ki = np.concatenate([np.arange(n4), h4.cap + np.arange(n4)])
hk = h4.key_fetch(ki)
want_q = (a7[0, :n4].astype(np.uint64) << 32) | a7[1, :n4].astype(np.uint64)
want_m = (a7[3, :n4].astype(np.uint64) << 32) | a7[4, :n4].astype(np.uint64)
assert np.array_equal(hk[:n4], want_q) and np.array_equal(hk[n4:], want_m)
h4.free()
st = ctypes.c_void_p(res)
lib.ma_mt_free(st)

# --- FMT3 flat piece stream (ma_mt_next3) + carry seed ---
res = lib.ma_mt_begin(paf.encode(), 2000, 100, b"", 0, 1, 0.05, 4096, 2, 0)
assert res
lib.ma_mt_seed_carry(ctypes.c_void_p(res), 777)
sz = 4096
reads3 = 0
while True:
    buf = np.empty(3 * sz + 3 * (sz // 8), dtype=np.int32)
    got = lib.ma_mt_next3(
        res, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), sz)
    assert not lib.ma_mt_pack_failed(res)
    assert not lib.ma_mt_rle_failed(res)  # sim streams are query-grouped
    reads3 += got
    if got < sz:
        break
assert reads3 == n4
lib.ma_mt_free(ctypes.c_void_p(res))

# --- -p paf replay printer (retain_full + sorted-order cut/filter) ---
c5, d5, h5 = load_hits_mt(paf, 2000, 100, upload=False, retain_full=True,
                          carry_seed=0)
ns5 = d5.n_seq
s0 = np.zeros(ns5, np.int32)
e0 = np.asarray(d5.lens, np.int32)
dz = np.zeros(ns5, np.uint8)
alive = np.ones(ns5, np.uint8)
out_fn = os.path.join(tmp, "replay.paf")
with open(out_fn, "wb") as outf:
    printed = h5.print_paf((s0, e0, dz), (s0, e0, dz), alive,
                           Opt().min_span, int(Opt().max_hang * 1.5),
                           int(Opt().min_ovlp * 0.5), outf.fileno())
assert printed > 0 and os.path.getsize(out_fn) > 0
h5.free()

# --- exact radix argsort ---
from miniasm_tpu.utils.exact_sort import radix_argsort

rng = np.random.default_rng(0)
keys = rng.integers(0, 2**63, 100_000, dtype=np.uint64)
perm = radix_argsort(keys.copy())
assert np.all(np.diff(keys[perm].astype(np.uint64)) >= 0)
# >= 1<<20 elements takes the multi-threaded bucket path; tie-heavy keys
# (hit-shaped: ~60 records per qid) exercise the insertion-sort leaves
qid = np.repeat(np.arange(25_000, dtype=np.uint64), 60)
qs = rng.integers(0, 32768, qid.shape[0], dtype=np.uint64)
keys = (qid << np.uint64(32)) | qs
rng.shuffle(keys)
perm = radix_argsort(keys.copy())
assert np.all(np.diff(keys[perm].astype(np.uint64)) >= 0)

# --- finalize oracle (cleaning passes + unitig walk) on pure-numpy
# graphs: a ground-truth chain built from the simulator's read layout
# (so the splicer has real sequences to pull) plus a noisy braid ---
from miniasm_tpu.graph import finalize_native as fnat
from miniasm_tpu.graph.asg import Graph, cleanup

opt = Opt()
gs, ge = sim["gs"], sim["ge"]
sim["ori"][:] = 0  # all-forward layout keeps the chain arithmetic linear
write_fasta(sim, fa)
order = np.argsort(gs, kind="stable")
us, ls, vs, ols = [], [], [], []
prev = int(order[0])
for oi in order[1:]:
    i = int(oi)
    if ge[i] <= ge[prev]:
        continue  # contained read: not a dovetail
    ov = int(ge[prev]) - int(gs[i])
    if ov >= opt.min_ovlp:
        us += [prev << 1, (i << 1) | 1]
        ls += [int(gs[i]) - int(gs[prev]), int(ge[i]) - int(ge[prev])]
        vs += [i << 1, (prev << 1) | 1]
        ols += [ov, ov]
    prev = i
n_seq = len(sim["names"])
g = Graph(u=np.asarray(us, np.int32), l=np.asarray(ls, np.int32),
          v=np.asarray(vs, np.int32), ol=np.asarray(ols, np.int32),
          adel=np.zeros(len(us), bool),
          slen=np.asarray(sim["lens"], np.uint32),
          sdel=np.zeros(n_seq, bool),
          idx_start=np.zeros(2 * n_seq, np.int64),
          idx_cnt=np.zeros(2 * n_seq, np.int32))
g = cleanup(g)
assert fnat.available()
g2, ug = fnat.finalize_native(g, opt, 100, do_ug=True)
assert ug is not None and len(ug.u) >= 1

# --- a braid graph drives the oracle's bubble/short-overlap machinery ---
rng2 = np.random.default_rng(4)
n_back = 40
lens2 = [10_000] * n_back
bu, bl, bv, bo = [], [], [], []


def _arc(a, b, l, ol):
    bu.extend([a, b ^ 1])
    bl.extend([l, l])
    bv.extend([b, a ^ 1])
    bo.extend([ol, ol])


for i in range(n_back - 1):
    _arc(i << 1, (i + 1) << 1, 4000, 6000)
for _ in range(14):
    i = int(rng2.integers(0, n_back - 2))
    alt = len(lens2)
    lens2.append(10_000)
    _arc(i << 1, alt << 1, int(rng2.integers(2000, 6000)), 5000)
    _arc(alt << 1, (i + 2) << 1, int(rng2.integers(2000, 6000)), 5000)
nb2 = len(lens2)
gb = Graph(u=np.asarray(bu, np.int32), l=np.asarray(bl, np.int32),
           v=np.asarray(bv, np.int32), ol=np.asarray(bo, np.int32),
           adel=np.zeros(len(bu), bool),
           slen=np.asarray(lens2, np.uint32), sdel=np.zeros(nb2, bool),
           idx_start=np.zeros(2 * nb2, np.int64),
           idx_cnt=np.zeros(2 * nb2, np.int32))
gb = cleanup(gb)
_, ugb = fnat.finalize_native(gb, opt, 100, do_ug=True)
assert ugb is not None

# --- FASTA/Q splicer (sub tables = whole reads) ---
from miniasm_tpu.io.seqdict import SeqDict as SD
from miniasm_tpu.unitig.seq import _ug_seq_native

d = SD.from_arrays(sim["names"], sim["lens"])
sub_s = np.zeros(n_seq, np.uint32)
sub_e = np.asarray(sim["lens"], np.uint32)
ok = _ug_seq_native(ug, d, sub_s, sub_e, fa)
assert ok and any(u.s for u in ug.u)

shutil.rmtree(tmp)
print("asan driver: all native entry points exercised")
