"""General-H VMEM-resident Pallas kernel (ops/general_h_pallas.py):
interpret-mode agreement with the XLA incidence-matmul path on random
NON-QC LDPC codes (the reference's primary input mode — arbitrary .npy
matrices, simulator.py:20-35), plus factory selection rules."""

import numpy as np
import pytest

from qldpcsim_tpu.decoders.common import (DecoderConfig, TannerGraph,
                                          build_layers)
from qldpcsim_tpu.ops.general_h_pallas import (make_gh_decoder, supports,
                                               _contiguous_layer_runs)


def _random_ldpc(seed=42, m=60, n=136, rw=8):
    rng = np.random.default_rng(seed)
    H = np.zeros((m, n), np.int8)
    for i in range(m):
        H[i, rng.choice(n, rw, replace=False)] = 1
    from qldpcsim_tpu.ops.qc import detect_qc

    assert detect_qc(H) is None
    return H, rng


@pytest.mark.parametrize("sched", ["F", "L"])
@pytest.mark.parametrize("kind", ["MS", "BP"])
def test_gh_kernel_matches_mxu(sched, kind):
    from qldpcsim_tpu.decoders.bp_mxu import make_bp_mxu_decoder
    from qldpcsim_tpu.decoders.ms_mxu import make_ms_mxu_decoder

    H, rng = _random_ldpc()
    layers = build_layers(H, sched)
    assert supports(H, layers)
    g = TannerGraph.build(H)
    cfg = DecoderConfig(dec_type=kind, max_iter=12, schedule=sched)
    mxu = (make_ms_mxu_decoder if kind == "MS"
           else make_bp_mxu_decoder)(g, cfg, layers=layers)
    gh = make_gh_decoder(H, cfg, layers=layers, B_blk=32, interpret=True,
                         kind=kind)
    u = rng.random((32, H.shape[1]))
    err = (u < 0.02)
    syn = ((err @ H.T) % 2).astype(np.float32)
    r1, r2 = mxu(syn, 0.01), gh(syn, 0.01)
    c1, c2 = np.asarray(r1.converged), np.asarray(r2.converged)
    assert (c1 == c2).all()
    assert c2.any()
    both = c1 & c2
    assert (np.asarray(r1.e_hat)[both]
            == np.asarray(r2.e_hat)[both]).all()
    assert (np.asarray(r1.n_iter)[both]
            == np.asarray(r2.n_iter)[both]).all()
    # syndrome consistency of converged shots
    e = np.asarray(r2.e_hat).astype(np.int64)
    assert (((e @ H.T) % 2 == syn)[c2]).all()


def test_gh_kernel_multi_block_and_partial_batch():
    """B > B_blk (grid path) and a non-multiple batch (padding lanes)."""
    H, rng = _random_ldpc(seed=3)
    layers = build_layers(H, "L")
    cfg = DecoderConfig(dec_type="MS", max_iter=10, schedule="L")
    gh = make_gh_decoder(H, cfg, layers=layers, B_blk=16, interpret=True)
    u = rng.random((40, H.shape[1]))
    err = (u < 0.03)
    syn = ((err @ H.T) % 2).astype(np.float32)
    r = gh(syn, 0.015)
    conv = np.asarray(r.converged)
    assert conv.shape == (40,)
    e = np.asarray(r.e_hat).astype(np.int64)
    assert (((e @ H.T) % 2 == syn)[conv]).all()


def test_gh_factory_selection():
    """make_decoder auto-picks: QC kernel for QC codes, gh for non-QC
    (TPU platform), mxu on CPU; impl='gh' forces/raises."""
    from qldpcsim_tpu.decoders import make_decoder

    H, _ = _random_ldpc(seed=5)
    g = TannerGraph.build(H)
    # forcing gh off-platform still builds (compiled use would need TPU);
    # the factory must ACCEPT impl='gh' for a supported shape
    cfg = DecoderConfig(dec_type="MS", max_iter=8, schedule="F", impl="gh",
                        platform="tpu", round1_iters=-1)
    dec = make_decoder(g, cfg)
    assert dec is not None
    # serial schedule is not a gh shape
    with pytest.raises(ValueError):
        make_decoder(g, DecoderConfig(dec_type="MS", max_iter=8,
                                      schedule="S", impl="gh",
                                      platform="tpu", round1_iters=-1))


def test_gh_layer_runs_helper():
    H, _ = _random_ldpc(seed=7)
    layers = build_layers(H, "L")
    runs = _contiguous_layer_runs(layers, H.shape[0])
    assert runs is not None
    assert runs[0][0] == 0 and runs[-1][1] == H.shape[0]
    assert all(a < b for a, b in runs)
