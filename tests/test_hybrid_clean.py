"""Property test: the hybrid cleaner (device detection + ordered host
commit) must match the Python sequential passes on arbitrary small graphs,
including shapes the PAF fixtures cannot produce — e.g. asymmetric arcs
with zero transitive reductions (the reference then leaves the graph
unsymmetrized through cut_tip until pop_bubble symms it, asg.c:187-192 +
asg.c:417; devclean models this with its do_symm mode)."""

import copy

import numpy as np
import pytest

from miniasm_tpu.config import Opt
from miniasm_tpu.graph.asg import Graph, cleanup
from miniasm_tpu.graph.clean import del_trans, del_short
from miniasm_tpu.graph.hybrid import clean_graph
from miniasm_tpu.graph.seqclean import (cut_tip, cut_internal, cut_biloop,
                                        pop_bubble)


def py_clean(g, opt, stage=100):
    """The reference pass sequence (main.c:156-188) over the Python spec
    implementations — the oracle for clean_graph."""
    if stage >= 6:
        g = del_trans(g, opt.gap_fuzz)
    if stage >= 7:
        g, _ = cut_tip(g, opt.max_ext)
        g, _ = pop_bubble(g, opt.bub_dist)
    if stage >= 9:
        fmin = np.float32(opt.min_ovlp_drop_ratio)
        fmax = np.float32(opt.max_ovlp_drop_ratio)
        for i in range(opt.n_rounds + 1):
            r = fmin + (fmax - fmin) / np.float32(opt.n_rounds) * np.float32(i)
            g, n_short = del_short(g, r)
            if n_short:
                g, _ = cut_tip(g, opt.max_ext)
                g, _ = pop_bubble(g, opt.bub_dist)
    if stage >= 10:
        g, _ = cut_internal(g, 1)
        g, _ = cut_biloop(g, opt.max_ext)
        g, _ = cut_tip(g, opt.max_ext)
        g, _ = pop_bubble(g, opt.bub_dist)
    if stage >= 11:
        g, n_short = del_short(g, opt.final_ovlp_drop_ratio)
        if n_short:
            g, _ = cut_tip(g, opt.max_ext)
            g, _ = pop_bubble(g, opt.bub_dist)
    return g


def random_graph(rng, n_seq=40, n_pairs=60, asym_frac=0.2):
    """Random string graph: mostly symmetric arc pairs with a fraction of
    deliberately asymmetric singletons."""
    lens = rng.integers(3000, 20000, n_seq).astype(np.uint32)
    us, ls, vs, ols = [], [], [], []
    for _ in range(n_pairs):
        a = int(rng.integers(0, 2 * n_seq))
        b = int(rng.integers(0, 2 * n_seq))
        if a >> 1 == b >> 1:
            continue
        la = int(lens[a >> 1])
        lb = int(lens[b >> 1])
        ol = int(rng.integers(500, min(la, lb)))
        us.append(a)
        ls.append(la - ol)
        vs.append(b)
        ols.append(ol)
        if rng.random() > asym_frac:
            us.append(b ^ 1)
            ls.append(lb - ol)
            vs.append(a ^ 1)
            ols.append(ol)
    g = Graph(u=np.asarray(us, np.int32), l=np.asarray(ls, np.int32),
              v=np.asarray(vs, np.int32), ol=np.asarray(ols, np.int32),
              adel=np.zeros(len(us), bool), slen=lens,
              sdel=np.zeros(n_seq, bool),
              idx_start=np.zeros(2 * n_seq, np.int64),
              idx_cnt=np.zeros(2 * n_seq, np.int32))
    return cleanup(g)


def _state(g):
    live = ~g.adel & ~g.sdel[g.u >> 1] & ~g.sdel[g.v >> 1]
    arcs = sorted(zip(g.u[live].tolist(), g.l[live].tolist(),
                      g.v[live].tolist(), g.ol[live].tolist()))
    return arcs, g.sdel.tolist()


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("stage", [6, 7, 100])
def test_hybrid_matches_python_on_random_graphs(seed, stage):
    rng = np.random.default_rng(seed)
    g = random_graph(rng, n_seq=30 + seed * 5, n_pairs=50 + seed * 10,
                     asym_frac=0.15 + 0.05 * (seed % 3))
    opt = Opt()
    g_h = clean_graph(copy.deepcopy(g), opt, stage)
    g_p = py_clean(copy.deepcopy(g), opt, stage)
    assert _state(g_h) == _state(g_p), "seed=%d stage=%d" % (seed, stage)


@pytest.mark.parametrize("seed", range(24))
def test_hybrid_cut_internal_isolated(seed):
    """cut_internal in isolation: the reference hard-codes max_ext=1
    (main.c:177), NOT opt.max_ext — the hybrid commit must re-validate
    with 1 even though the device candidate mask uses opt.max_ext (a
    valid superset: extend(v,1)==MULTI_NEI implies extend(v,4) walked
    through the same first hop)."""
    from miniasm_tpu.graph.hybrid import _Cleaner
    rng = np.random.default_rng(1000 + seed)
    g = random_graph(rng, n_seq=30 + seed * 3, n_pairs=50 + seed * 6,
                     asym_frac=0.0)
    opt = Opt()
    cl = _Cleaner(copy.deepcopy(g), opt, do_trans=False)
    cl.cut_internal()
    g_p, _ = cut_internal(copy.deepcopy(g), 1)
    assert _state(cl.g) == _state(g_p), "seed=%d" % seed


def test_hybrid_trans_zero_with_asymm():
    """Force the trans==0 + asymm>0 window: a pure chain with one dangling
    asymmetric arc reduces nothing transitively, so the reference's
    cut_tip runs on the UNsymmetrized graph."""
    rng = np.random.default_rng(99)
    n_seq = 12
    lens = np.full(n_seq, 10_000, np.uint32)
    us, ls, vs, ols = [], [], [], []
    for i in range(n_seq - 1):  # chain 0->1->...->11, symmetric
        a, b = i << 1, (i + 1) << 1
        us += [a, b ^ 1]
        ls += [4000, 4000]
        vs += [b, a ^ 1]
        ols += [6000, 6000]
    # dangling asymmetric arc into the middle of the chain
    us.append(5 << 1)
    ls.append(9000)
    vs.append(8 << 1)
    ols.append(1000)
    g = Graph(u=np.asarray(us, np.int32), l=np.asarray(ls, np.int32),
              v=np.asarray(vs, np.int32), ol=np.asarray(ols, np.int32),
              adel=np.zeros(len(us), bool), slen=lens,
              sdel=np.zeros(n_seq, bool),
              idx_start=np.zeros(2 * n_seq, np.int64),
              idx_cnt=np.zeros(2 * n_seq, np.int32))
    g = cleanup(g)
    opt = Opt()
    g_h = clean_graph(copy.deepcopy(g), opt, 100)
    g_p = py_clean(copy.deepcopy(g), opt, 100)
    assert _state(g_h) == _state(g_p)


def braid_graph(rng, n_back=30, n_alt=12, read_len=10_000):
    """Backbone chain with parallel bypass vertices: a dense-bubble shape
    (many >=2-out sources, overlapping bubbles, shared sinks)."""
    lens = [read_len] * n_back
    us, ls, vs, ols = [], [], [], []

    def arc(a, b, l, ol):
        us.extend([a, b ^ 1])
        ls.extend([l, l])
        vs.extend([b, a ^ 1])
        ols.extend([ol, ol])

    for i in range(n_back - 1):
        arc(i << 1, (i + 1) << 1, 4000, 6000)
    for _ in range(n_alt):
        i = int(rng.integers(0, n_back - 2))
        span = int(rng.integers(1, 3))
        j = min(i + 1 + span, n_back - 1)
        alt = len(lens)
        lens.append(read_len)
        arc(i << 1, alt << 1, int(rng.integers(2000, 6000)), 5000)
        arc(alt << 1, j << 1, int(rng.integers(2000, 6000)), 5000)
    la = np.asarray(lens, np.uint32)
    n_seq = len(lens)
    g = Graph(u=np.asarray(us, np.int32), l=np.asarray(ls, np.int32),
              v=np.asarray(vs, np.int32), ol=np.asarray(ols, np.int32),
              adel=np.zeros(len(us), bool), slen=la,
              sdel=np.zeros(n_seq, bool),
              idx_start=np.zeros(2 * n_seq, np.int64),
              idx_cnt=np.zeros(2 * n_seq, np.int32))
    return cleanup(g)


@pytest.mark.parametrize("seed", range(12))
def test_device_bubble_pop_dense(seed):
    """Dense-bubble shapes: the one-dispatch device Kahn BFS + ordered
    commit (graph/devbub.py) must equal the sequential Python spec's
    pop_bubble exactly, including overlapping-bubble re-dispatches."""
    from miniasm_tpu.graph.hybrid import _Cleaner

    rng = np.random.default_rng(7000 + seed)
    g = braid_graph(rng, n_back=20 + 2 * seed, n_alt=8 + seed)
    opt = Opt()
    cl = _Cleaner(copy.deepcopy(g), opt, do_trans=False)
    cl.pop_bubble(opt.bub_dist)
    g_p, _ = pop_bubble(copy.deepcopy(g), opt.bub_dist)
    assert _state(cl.g) == _state(g_p), "seed=%d" % seed


@pytest.mark.parametrize("seed", range(8))
def test_device_bubble_pop_random(seed):
    """Random symmetric graphs through pop_bubble in isolation."""
    from miniasm_tpu.graph.hybrid import _Cleaner

    rng = np.random.default_rng(8000 + seed)
    g = random_graph(rng, n_seq=25 + 4 * seed, n_pairs=60 + 12 * seed,
                     asym_frac=0.0)
    from miniasm_tpu.graph.clean import symm
    g = symm(g)
    opt = Opt()
    cl = _Cleaner(copy.deepcopy(g), opt, do_trans=False)
    cl.pop_bubble(opt.bub_dist)
    g_p, _ = pop_bubble(copy.deepcopy(g), opt.bub_dist)
    assert _state(cl.g) == _state(g_p), "seed=%d" % seed
