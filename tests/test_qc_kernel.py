"""Pallas QC min-sum kernel (interpret mode on CPU) vs the bit-exact edge
path: identical message math, VMEM-resident state and incremental posterior —
decisions agree except on numerical ties (same class as the mxu tests)."""

import numpy as np
import pytest

from qldpcsim_tpu.codes import get_code
from qldpcsim_tpu.decoders import DecoderConfig, TannerGraph, build_layers
from qldpcsim_tpu.decoders.ms import make_ms_decoder
from qldpcsim_tpu.ops.qc import detect_qc, layers_align_blocks
from qldpcsim_tpu.ops.ms_qc_pallas import make_ms_qc_decoder


def _syn(rng, H, n_shots, p):
    n = H.shape[1]
    errs = (rng.random((n_shots, n)) < p).astype(np.int8)
    return ((errs.astype(np.int64) @ H.T.astype(np.int64)) % 2).astype(np.int8)


def test_detect_qc_library_codes():
    assert detect_qc(np.asarray(get_code("lp118_0").Hx)).L == 16
    assert detect_qc(np.asarray(get_code("lp04_0").Hx)).L == 7
    assert detect_qc(np.asarray(get_code("tanner").Hx)).L == 31
    # bicycle is circulant but not permutation-lifted; shor is not QC
    assert detect_qc(np.asarray(get_code("bicycle").Hx)) is None
    assert detect_qc(np.asarray(get_code("shor").Hx)) is None


def test_layers_align():
    H = np.asarray(get_code("lp118_0").Hz)
    st = detect_qc(H)
    layers = build_layers(H, "L")
    assert layers_align_blocks(layers, st)


@pytest.mark.parametrize("codename,schedule", [
    ("lp04_0", "F"), ("lp04_0", "L"), ("lp118_0", "L"),
])
def test_qc_kernel_agrees_with_edge(codename, schedule):
    rng = np.random.default_rng(21)
    H = np.asarray(get_code(codename).Hz)
    st = detect_qc(H)
    assert st is not None
    graph = TannerGraph.build(H)
    layers = build_layers(H, schedule)
    cfg = DecoderConfig(dec_type="MS", max_iter=8, schedule=schedule)
    edge = make_ms_decoder(graph, cfg, layers=layers)
    qc = make_ms_qc_decoder(st, cfg, layers=layers, B_blk=32, interpret=True)
    syn = _syn(rng, H, 32, 0.03)
    re, rq = edge(syn, 0.015), qc(syn, 0.015)
    conv_e, conv_q = np.asarray(re.converged), np.asarray(rq.converged)
    same = conv_e == conv_q
    assert same.mean() >= 0.95, f"convergence agreement {same.mean():.2%}"
    both = conv_e & conv_q
    if both.any():
        agree = (np.asarray(re.e_hat)[both] == np.asarray(rq.e_hat)[both]).all(axis=1)
        assert agree.mean() >= 0.95
        it_same = np.asarray(re.n_iter)[both] == np.asarray(rq.n_iter)[both]
        assert it_same.mean() >= 0.9


def test_qc_kernel_zero_syndrome():
    H = np.asarray(get_code("lp118_0").Hz)
    st = detect_qc(H)
    cfg = DecoderConfig(dec_type="MS", max_iter=5, schedule="L")
    qc = make_ms_qc_decoder(st, cfg, layers=build_layers(H, "L"),
                            B_blk=32, interpret=True)
    r = qc(np.zeros((8, H.shape[0]), np.int8), 0.01)
    assert np.asarray(r.converged).all()
    assert (np.asarray(r.n_iter) == 1).all()
    assert (np.asarray(r.e_hat) == 0).all()


def test_bp_qc_kernel_agrees_with_edge():
    from qldpcsim_tpu.decoders.bp import make_bp_decoder
    from qldpcsim_tpu.ops.ms_qc_pallas import make_bp_qc_decoder

    rng = np.random.default_rng(23)
    H = np.asarray(get_code("lp04_0").Hz)
    st = detect_qc(H)
    graph = TannerGraph.build(H)
    layers = build_layers(H, "F")
    cfg = DecoderConfig(dec_type="BP", max_iter=8, schedule="F")
    edge = make_bp_decoder(graph, cfg, layers=layers)
    qc = make_bp_qc_decoder(st, cfg, layers=layers, B_blk=32, interpret=True)
    syn = _syn(rng, H, 32, 0.03)
    re, rq = edge(syn, 0.015), qc(syn, 0.015)
    conv_e, conv_q = np.asarray(re.converged), np.asarray(rq.converged)
    same = conv_e == conv_q
    assert same.mean() >= 0.95
    both = conv_e & conv_q
    if both.any():
        agree = (np.asarray(re.e_hat)[both] == np.asarray(rq.e_hat)[both]).all(axis=1)
        assert agree.mean() >= 0.95


def test_qc_kernel_syndrome_consistency():
    rng = np.random.default_rng(22)
    H = np.asarray(get_code("lp04_0").Hz)
    st = detect_qc(H)
    cfg = DecoderConfig(dec_type="MS", max_iter=12, schedule="L")
    qc = make_ms_qc_decoder(st, cfg, layers=build_layers(H, "L"),
                            B_blk=32, interpret=True)
    syn = _syn(rng, H, 16, 0.02)
    r = qc(syn, 0.01)
    conv = np.asarray(r.converged)
    assert conv.any()
    e = np.asarray(r.e_hat).astype(np.int64)
    assert ((e @ H.T.astype(np.int64)) % 2 == np.asarray(syn))[conv].all()


def test_qc_kernel_check_granularity():
    """iter-granularity convergence checks (default) vs the reference's
    per-layer granularity: both syndrome-consistent; iteration counts agree
    except for the rare shot whose mid-iteration match breaks later in the
    same iteration."""
    import dataclasses

    rng = np.random.default_rng(23)
    H = np.asarray(get_code("lp04_0").Hz)
    st = detect_qc(H)
    layers = build_layers(H, "L")
    base = DecoderConfig(dec_type="MS", max_iter=10, schedule="L")
    syn = _syn(rng, H, 32, 0.03)
    res = {}
    for chk in ("layer", "iter"):
        cfg = dataclasses.replace(base, qc_check_every=chk)
        dec = make_ms_qc_decoder(st, cfg, layers=layers, B_blk=32,
                                 interpret=True)
        r = dec(syn, 0.015)
        conv = np.asarray(r.converged)
        e = np.asarray(r.e_hat).astype(np.int64)
        assert ((e @ H.T.astype(np.int64)) % 2 == np.asarray(syn))[conv].all()
        res[chk] = (conv, np.asarray(r.n_iter))
    conv_l, it_l = res["layer"]
    conv_i, it_i = res["iter"]
    assert (conv_l == conv_i).mean() >= 0.95
    both = conv_l & conv_i
    assert (it_l[both] == it_i[both]).mean() >= 0.9


def test_gf2_elim_pallas_matches_xla():
    """Pallas bit-packed elimination (interpret mode) vs the XLA sweep in
    decoders/osd.py: identical tags, pivots and basis-column selection."""
    import jax.numpy as jnp
    from qldpcsim_tpu.decoders import osd as osd_mod
    from qldpcsim_tpu.ops.gf2_elim_pallas import make_eliminate_pallas

    rng = np.random.default_rng(31)
    H = np.asarray(get_code("lp04_0").Hz)
    st = osd_mod.OSDStatic.build(H)
    n, r, mW, rW = st.n, st.r, st.mW, st.rW
    B = 8
    perms = np.stack([rng.permutation(n) for _ in range(B)]).astype(np.int32)
    colsP = jnp.asarray(st.cols_packed)[perms]          # (B, n, mW)

    # XLA reference sweep (reach inside make_osd's private _eliminate by
    # rebuilding the same closure through a tiny decode call is heavier than
    # needed — replicate via the public osd on a crafted posterior instead).
    elim = make_eliminate_pallas(n, r, mW, rW, B_blk=8, interpret=True)
    tags_p, piv_p, sel_p = elim(colsP)

    # Independent NumPy reference: greedy rank-increase basis columns.
    from qldpcsim_tpu import gf2
    for b in range(B):
        Hp = (H % 2)[:, perms[b]]
        cis = []
        for j in range(n):
            if gf2.rank(Hp[:, cis + [j]]) > len(cis):
                cis.append(j)
                if len(cis) == r:
                    break
        sel_ref = np.zeros(n, bool)
        sel_ref[cis] = True
        assert (np.asarray(sel_p[b]) == sel_ref).all()
    assert (np.asarray(piv_p) >= 0).all()


def test_gf2_elim_pallas_tags_solve():
    """The (tags, pivots) factorization must solve H_sel x = s for any s in
    the column space — same property the OSD candidate stage relies on."""
    import jax.numpy as jnp
    from qldpcsim_tpu.decoders import osd as osd_mod
    from qldpcsim_tpu.ops.gf2_elim_pallas import make_eliminate_pallas

    rng = np.random.default_rng(33)
    H = np.asarray(get_code("lp04_0").Hz) % 2
    st = osd_mod.OSDStatic.build(H)
    n, r, mW, rW = st.n, st.r, st.mW, st.rW
    B = 4
    perms = np.stack([rng.permutation(n) for _ in range(B)]).astype(np.int32)
    colsP = jnp.asarray(st.cols_packed)[perms]
    elim = make_eliminate_pallas(n, r, mW, rW, B_blk=8, interpret=True)
    tags, pivots, sel = (np.asarray(a) for a in elim(colsP))

    for b in range(B):
        Hp = H[:, perms[b]]
        cis = np.nonzero(sel[b])[0]
        x_true = rng.integers(0, 2, size=r)
        s = (Hp[:, cis] @ x_true) % 2
        # pack s over checks, extract bits at pivots, xor-fold tags
        sP = np.zeros(mW, np.uint32)
        for i in np.nonzero(s)[0]:
            sP[i >> 5] |= np.uint32(1) << np.uint32(i & 31)
        x = np.zeros(rW, np.uint32)
        for k in range(r):
            pv = pivots[b, k]
            if pv >= 0 and (sP[pv >> 5] >> np.uint32(pv & 31)) & 1:
                x ^= tags[b, k]
        x_bits = np.array([(x[k >> 5] >> np.uint32(k & 31)) & 1
                           for k in range(r)])
        assert (x_bits == x_true).all()


def test_gf2_elim_pallas_multi_superblock():
    """B > G*B_blk exercises the (nb, nw) grid path and the regroup() lane
    interleave, and a non-default window (32) makes nw > 2 so the
    per-window early exit runs over several windows (round-4 ADVICE #1:
    these paths previously had no regression test). Every lane — including
    the padded tail of the last superblock — must reproduce the greedy
    rank-increase basis selection and a solvable factorization."""
    import jax.numpy as jnp
    from qldpcsim_tpu.decoders import osd as osd_mod
    from qldpcsim_tpu.ops.gf2_elim_pallas import make_eliminate_pallas

    rng = np.random.default_rng(41)
    H = np.asarray(get_code("lp04_0").Hz) % 2
    st = osd_mod.OSDStatic.build(H)
    n, r, mW, rW = st.n, st.r, st.mW, st.rW
    B = 24  # with B_blk=8 and ilp G=2: nb=2 superblocks, 8 pad lanes
    perms = np.stack([rng.permutation(n) for _ in range(B)]).astype(np.int32)
    colsP = jnp.asarray(st.cols_packed)[perms]
    elim = make_eliminate_pallas(n, r, mW, rW, B_blk=8, interpret=True,
                                 window=32)
    tags, pivots, sel = (np.asarray(a) for a in elim(colsP))
    assert sel.shape == (B, n) and pivots.shape == (B, r)

    from qldpcsim_tpu import gf2
    for b in range(B):
        Hp = H[:, perms[b]]
        cis = []
        for j in range(n):
            if gf2.rank(Hp[:, cis + [j]]) > len(cis):
                cis.append(j)
                if len(cis) == r:
                    break
        sel_ref = np.zeros(n, bool)
        sel_ref[cis] = True
        assert (sel[b] == sel_ref).all(), b
        # factorization solves H_sel x = s (the OSD candidate-stage
        # contract) on this lane
        x_true = rng.integers(0, 2, size=r)
        s = (Hp[:, cis] @ x_true) % 2
        sP = np.zeros(mW, np.uint32)
        for i in np.nonzero(s)[0]:
            sP[i >> 5] |= np.uint32(1) << np.uint32(i & 31)
        x = np.zeros(rW, np.uint32)
        for k in range(r):
            pv = pivots[b, k]
            if pv >= 0 and (sP[pv >> 5] >> np.uint32(pv & 31)) & 1:
                x ^= tags[b, k]
        x_bits = np.array([(x[k >> 5] >> np.uint32(k & 31)) & 1
                           for k in range(r)])
        assert (x_bits == x_true).all(), b


def test_seq_qc_kernel_agrees_with_seq():
    """Serial-schedule QC kernel vs the XLA row-sequential path: identical
    update math and per-row exit granularity (both incremental-posterior,
    so they agree with each other up to numerical ties)."""
    from qldpcsim_tpu.decoders.sequential import make_ms_seq_decoder
    from qldpcsim_tpu.ops.seq_qc_pallas import (
        make_ms_seq_qc_decoder, serial_order_is_natural)

    rng = np.random.default_rng(29)
    H = np.asarray(get_code("lp04_0").Hz)
    st = detect_qc(H)
    graph = TannerGraph.build(H)
    layers = build_layers(H, "S")
    assert serial_order_is_natural(layers, H.shape[0])
    cfg = DecoderConfig(dec_type="MS", max_iter=6, schedule="S")
    seq = make_ms_seq_decoder(graph, cfg, layers=layers)
    qc = make_ms_seq_qc_decoder(st, cfg, layers=layers, B_blk=32,
                                interpret=True)
    syn = _syn(rng, H, 32, 0.02)
    r1, r2 = seq(syn, 0.05 / 3), qc(syn, 0.05 / 3)
    c1, c2 = np.asarray(r1.converged), np.asarray(r2.converged)
    assert (c1 == c2).mean() >= 0.95
    both = c1 & c2
    assert (np.asarray(r1.e_hat)[both] ==
            np.asarray(r2.e_hat)[both]).all(axis=1).mean() >= 0.95
    assert (np.asarray(r1.n_iter)[both] ==
            np.asarray(r2.n_iter)[both]).mean() >= 0.9


def test_seq_qc_kernel_zero_syndrome():
    from qldpcsim_tpu.ops.seq_qc_pallas import make_ms_seq_qc_decoder

    H = np.asarray(get_code("lp04_0").Hz)
    st = detect_qc(H)
    cfg = DecoderConfig(dec_type="MS", max_iter=5, schedule="S")
    qc = make_ms_seq_qc_decoder(st, cfg, layers=build_layers(H, "S"),
                                B_blk=32, interpret=True)
    r = qc(np.zeros((8, H.shape[0]), np.int8), 0.01)
    assert np.asarray(r.converged).all()
    assert (np.asarray(r.n_iter) == 1).all()
    assert (np.asarray(r.e_hat) == 0).all()


def test_seq_qc_kernel_bp_variant():
    from qldpcsim_tpu.decoders.sequential import make_bp_seq_decoder
    from qldpcsim_tpu.ops.seq_qc_pallas import make_bp_seq_qc_decoder

    rng = np.random.default_rng(31)
    H = np.asarray(get_code("lp04_0").Hz)
    st = detect_qc(H)
    graph = TannerGraph.build(H)
    layers = build_layers(H, "S")
    cfg = DecoderConfig(dec_type="BP", max_iter=6, schedule="S")
    seq = make_bp_seq_decoder(graph, cfg, layers=layers)
    qc = make_bp_seq_qc_decoder(st, cfg, layers=layers, B_blk=16,
                                interpret=True)
    syn = _syn(rng, H, 16, 0.02)
    r1, r2 = seq(syn, 0.05 / 3), qc(syn, 0.05 / 3)
    c1, c2 = np.asarray(r1.converged), np.asarray(r2.converged)
    assert (c1 == c2).mean() >= 0.9
    both = c1 & c2
    if both.any():
        assert (np.asarray(r1.e_hat)[both] ==
                np.asarray(r2.e_hat)[both]).all(axis=1).mean() >= 0.9
