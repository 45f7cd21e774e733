"""Compiled-kernel checks that need REAL TPU hardware.

The pytest suite runs on a virtual CPU mesh (conftest pins the cpu
platform), so every Pallas kernel is exercised there in interpret mode
only. These tests compile and run the round-5 kernels on the actual
backend; they skip unless the session backend is a TPU. Run manually:

    JAX_PLATFORMS='' python -m pytest tests/test_tpu_hardware.py -q

(or any invocation where jax.default_backend() is tpu/axon). The channel
kernel's hardware tests live in tests/test_channel.py.
"""

import numpy as np
import pytest

try:  # conftest may have pinned cpu; this probes the live backend
    import jax

    _BACKEND = jax.default_backend().lower()
except Exception:  # pragma: no cover
    _BACKEND = "none"

tpu_only = pytest.mark.skipif(_BACKEND not in ("tpu", "axon"),
                              reason="needs a real TPU backend")


@tpu_only
def test_panel_elimination_matches_r4_kernel_compiled():
    """Panel-ILP elimination vs the r4 kernel, COMPILED on hardware:
    bit-identical tags/pivots/selection (the interpret-mode pin is in
    test_qc_kernel.py; this covers the Mosaic lowering)."""
    import jax.numpy as jnp

    from qldpcsim_tpu.codes import get_code
    from qldpcsim_tpu.decoders import osd as osd_mod
    from qldpcsim_tpu.ops.gf2_elim_pallas import make_eliminate_pallas
    from qldpcsim_tpu.ops.gf2_elim_panel_pallas import make_eliminate_panel

    H = np.asarray(get_code("lp118_0").Hz) % 2
    st = osd_mod.OSDStatic.build(H)
    rng = np.random.default_rng(3)
    B = 256
    perms = np.stack([rng.permutation(st.n)
                      for _ in range(B)]).astype(np.int32)
    colsP = jnp.asarray(st.cols_packed)[jnp.asarray(perms)]
    old = make_eliminate_pallas(st.n, st.r, st.mW, st.rW)
    new = make_eliminate_panel(st.n, st.r, st.mW, st.rW, panel=8)
    t1, p1, s1 = (np.asarray(a) for a in old(colsP))
    t2, p2, s2 = (np.asarray(a) for a in new(colsP))
    assert (t1 == t2).all() and (p1 == p2).all() and (s1 == s2).all()


@tpu_only
def test_general_h_kernel_compiled_syndrome_consistent():
    """General-H MS-layered kernel compiled on hardware: converged shots
    are syndrome-consistent and agree with the mxu path."""
    from qldpcsim_tpu.decoders.common import (DecoderConfig, TannerGraph,
                                              build_layers)
    from qldpcsim_tpu.decoders.ms_mxu import make_ms_mxu_decoder
    from qldpcsim_tpu.ops.general_h_pallas import make_gh_decoder

    rng = np.random.default_rng(11)
    m, n, rw = 240, 544, 8
    H = np.zeros((m, n), np.int8)
    for i in range(m):
        H[i, rng.choice(n, rw, replace=False)] = 1
    layers = build_layers(H, "L")
    cfg = DecoderConfig(dec_type="MS", max_iter=20, schedule="L")
    gh = make_gh_decoder(H, cfg, layers=layers, kind="MS")
    mxu = make_ms_mxu_decoder(TannerGraph.build(H), cfg, layers=layers)
    u = rng.random((512, n))
    err = (u < 0.02)
    syn = ((err @ H.T) % 2).astype(np.float32)
    r1, r2 = gh(syn, 0.01), mxu(syn, 0.01)
    c1, c2 = np.asarray(r1.converged), np.asarray(r2.converged)
    assert c1.any()
    e = np.asarray(r1.e_hat).astype(np.int64)
    assert (((e @ H.T) % 2 == syn)[c1]).all()
    both = c1 & c2
    assert (c1 == c2).mean() > 0.98   # statistical parity class
    assert (np.asarray(r1.e_hat)[both]
            == np.asarray(r2.e_hat)[both]).all(axis=1).mean() > 0.98


@tpu_only
def test_small_code_tpu_engine_matches_cpu():
    """Steane MS on the TPU path (round-5 routing) produces counters
    bit-exact with the CPU backend (RNG tile contract)."""
    from qldpcsim_tpu.codes import get_code
    from qldpcsim_tpu.engine.montecarlo import SimConfig, simulate_p

    code = get_code("steane")
    base = dict(shots=8192, dec_type="MS", dec_iterations=20,
                dec_schedule="L", rng_seed=5, batch_size=4096)
    r_tpu = simulate_p(code.Hx, code.Hz, 0.03,
                       SimConfig(device="default", **base))
    r_cpu = simulate_p(code.Hx, code.Hz, 0.03,
                       SimConfig(device="cpu", **base))
    # The TPU path uses the hw-PRNG channel => different stream, so pin
    # statistically, not bit-exactly: same shots, rates within 5 sigma.
    n = base["shots"]
    for k in ("decSuccessExact", "successStabilizer"):
        p1, p2 = r_tpu.counters[k] / n, r_cpu.counters[k] / n
        se = (2 * max(p1 * (1 - p1), 1e-6) / n) ** 0.5
        assert abs(p1 - p2) < 5 * se, (k, p1, p2)
