"""Channel tests: depolarizing statistics, syndrome correctness, encoder
frame invariance (the property that justifies replacing Stim — SURVEY.md §7
step 2), and RNG determinism."""

import jax
import numpy as np

from qldpcsim_tpu import gf2
from qldpcsim_tpu.channel import CSSEncoder, sample_depolarizing, syndromes_of
from qldpcsim_tpu.codes import get_code


def test_depolarizing_marginals():
    key = jax.random.PRNGKey(0)
    p = 0.3
    ex, ez = sample_depolarizing(key, p, (20000, 16))
    ex = np.asarray(ex)
    ez = np.asarray(ez)
    # X-component marginal 2p/3; Z-component 2p/3; Y overlap p/3.
    assert abs(ex.mean() - 2 * p / 3) < 0.01
    assert abs(ez.mean() - 2 * p / 3) < 0.01
    assert abs((ex & ez).mean() - p / 3) < 0.01
    # any error: p
    assert abs((ex | ez).mean() - p) < 0.01


def test_depolarizing_deterministic():
    key = jax.random.PRNGKey(42)
    a = sample_depolarizing(key, 0.1, (64, 8))
    b = sample_depolarizing(key, 0.1, (64, 8))
    assert (np.asarray(a[0]) == np.asarray(b[0])).all()
    assert (np.asarray(a[1]) == np.asarray(b[1])).all()


def test_syndromes_match_gf2():
    code = get_code("steane")
    Hx = np.asarray(code.Hx, np.float32)
    Hz = np.asarray(code.Hz, np.float32)
    key = jax.random.PRNGKey(1)
    ex, ez = sample_depolarizing(key, 0.2, (128, code.n))
    sy_z, sy_x = syndromes_of(ex, ez, Hx.T, Hz.T)
    ref_z = (np.asarray(ex).astype(np.int64) @ np.asarray(code.Hz).T.astype(np.int64)) % 2
    ref_x = (np.asarray(ez).astype(np.int64) @ np.asarray(code.Hx).T.astype(np.int64)) % 2
    assert (np.asarray(sy_z) == ref_z).all()
    assert (np.asarray(sy_x) == ref_x).all()


def test_encoder_frames_in_codespace():
    """Frames are annihilated by the checks and uniformly cover cosets."""
    for name in ("shor", "steane", "lp04_0"):
        code = get_code(name)
        enc = CSSEncoder.build(code.Hx, code.Hz)
        fx, fz = enc.encode(jax.random.PRNGKey(3), 64)
        fx, fz = np.asarray(fx), np.asarray(fz)
        assert not gf2.mat_mul(np.asarray(code.Hz), fx.T).any()
        assert not gf2.mat_mul(np.asarray(code.Hx), fz.T).any()
        if enc.k:
            assert fx.any()  # non-trivial frames get sampled


def test_frame_invariance_of_syndromes():
    """The measured syndrome of (frame XOR error) equals that of the error
    alone — the encoder never affects decode inputs, so the channel can skip
    it (replaces Stim's circuit pipeline, reference simulator.py:43-160)."""
    code = get_code("steane")
    enc = CSSEncoder.build(code.Hx, code.Hz)
    key = jax.random.PRNGKey(9)
    fx, _ = enc.encode(key, 32)
    ex, _ = sample_depolarizing(jax.random.PRNGKey(10), 0.2, (32, code.n))
    Hz = np.asarray(code.Hz).astype(np.int64)
    corrupted = np.asarray(fx).astype(np.int64) ^ np.asarray(ex).astype(np.int64)
    assert ((Hz @ corrupted.T) % 2 == (Hz @ np.asarray(ex).astype(np.int64).T) % 2).all()


def test_hw_sampler_dithered_thresholds_unbiased():
    """ops/channel_pallas: per-tile 16-bit thresholds are dithered so that
    E[threshold] = q * 2^16 EXACTLY (no quantization bias), drawn purely
    from the global tile key (deterministic + layout-invariant). t3 is
    dithered as t1 + width so the err_z interval width — the err_z
    marginal — is itself exactly dithered and t3 >= t1 always holds."""
    from qldpcsim_tpu.ops.channel_pallas import (_dithered_thresholds16,
                                                 _thresholds32)
    from qldpcsim_tpu.parallel.mesh import chunk_keys

    keys = chunk_keys(jax.random.PRNGKey(7), 0, 4096)
    p = 0.0371
    thr = np.asarray(_dithered_thresholds16(keys, p))       # (4096, 3)
    T32 = np.asarray(_thresholds32(p)).astype(np.float64)
    base = np.floor(T32 / 65536.0)
    # t1/t2 are floor or floor+1; t3 = t1 + w lands within floor3 -1..+1
    assert ((thr[:, :2] == base[:2]) | (thr[:, :2] == base[:2] + 1)).all()
    assert (np.abs(thr[:, 2] - base[2]) <= 1).all()
    assert (thr[:, 2] >= thr[:, 0]).all()
    # mean converges to the exact 16-bit-scaled threshold: frac has
    # sd 0.5/sqrt(4096) ~ 0.008
    exact = T32 / 65536.0
    assert np.abs(thr.mean(axis=0) - exact).max() < 0.05
    # deterministic + tile-local (layout invariance)
    thr2 = np.asarray(_dithered_thresholds16(keys, p))
    assert (thr == thr2).all()
    sub = np.asarray(_dithered_thresholds16(keys[1024:], p))
    assert (sub == thr[1024:]).all()


def _hw16_joint_probs(p):
    """EXACT per-draw joint Pauli probabilities (pI, pX, pY, pZ) of the
    16-bit dithered scheme, plus the per-dither-outcome distribution, by
    enumerating the 8 dither outcomes of (t1, t2, w).

    A draw d ~ U{0..2^16-1} maps to: err_x = d < t2,
    err_z = t1 <= d < t3 with t3 = t1 + w. Categories:
    Y = |[t1, min(t2, t3))|, X = t2 - Y, Z = w - Y, I = rest."""
    from qldpcsim_tpu.ops.channel_pallas import _thresholds32

    T32 = np.asarray(_thresholds32(p)).astype(np.int64)
    quant = np.array([T32[0], T32[1], T32[2] - T32[0]], np.int64)
    base, frac = quant >> 16, (quant & 0xFFFF) / 65536.0
    probs = np.zeros(4)                       # I, X, Y, Z
    outcomes = []                             # (weight, pI, pX, pY, pZ)
    for b in range(8):
        bits = [(b >> k) & 1 for k in range(3)]
        w_dither = np.prod([f if bit else 1.0 - f
                            for f, bit in zip(frac, bits)])
        t1, t2, w = (int(base[k] + bits[k]) for k in range(3))
        t3 = t1 + w
        pY = max(0, min(t2, t3) - t1) / 65536.0
        pX = t2 / 65536.0 - pY
        pZ = w / 65536.0 - pY
        row = np.array([1.0 - pX - pY - pZ, pX, pY, pZ])
        probs += w_dither * row
        outcomes.append((w_dither, row))
    return probs, outcomes


def test_hw_sampler_joint_split_analytic():
    """Pins the DIVERGENCES.md channel-sampling envelope analytically:
    marginals P(err_x) and P(err_z) are exact at EVERY p (16-bit dithering
    of t2 and of the interval width), the X:Y:Z joint split is exact for
    p >= 3*2^-16 (distinct threshold bases), and below that boundary the
    joint split is distorted but the distortion is bounded (< 2^-16 per
    category in absolute terms)."""
    from qldpcsim_tpu.ops.channel_pallas import _thresholds32

    for p in (1e-5, 1e-3, 0.05):
        probs, _ = _hw16_joint_probs(p)
        T32 = np.asarray(_thresholds32(p)).astype(np.float64)
        px_exact = T32[1] / 2.0 ** 32                 # u32-rounded 2p/3
        pz_exact = (T32[2] - T32[0]) / 2.0 ** 32
        # marginals exact at all p (to float64 roundoff)
        assert abs((probs[1] + probs[2]) - px_exact) < 1e-12, p
        assert abs((probs[3] + probs[2]) - pz_exact) < 1e-12, p
        assert abs(probs.sum() - 1.0) < 1e-12

    # above the boundary: the joint split equals the quantized exact split
    # (each category within the f32 threshold rounding, relative ~2^-24,
    # of p/3)
    for p in (1e-3, 0.05):
        probs, _ = _hw16_joint_probs(p)
        assert np.abs(probs[1:] - p / 3.0).max() < p * 2.0 ** -22, p

    # below the boundary (p < 3*2^-16): joint split measurably distorted,
    # but by less than 2^-16 absolute per category
    p = 1e-5
    probs, _ = _hw16_joint_probs(p)
    dev = np.abs(probs[1:] - p / 3.0)
    assert dev.max() > 1e-8, dev      # the documented distortion is real
    assert dev.max() < 2.0 ** -16, dev


def test_hw_sampler_joint_split_chisquare_on_tpu():
    """Statistical acceptance of the hardware-PRNG channel's joint Pauli
    split on real TPU hardware (round-4 verdict ask #8): chi-square over
    the joint (I, X, Y, Z) counts at p in {1e-5, 1e-3, 0.05} against the
    scheme's analytic probabilities, with the per-tile threshold-dither
    overdispersion folded into the acceptance bound. TPU only — the
    compiled Mosaic kernel is the unit under test."""
    import pytest

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("hardware-PRNG sampler requires a TPU backend")
    from qldpcsim_tpu.ops.channel_pallas import sample_tiles_hw
    from qldpcsim_tpu.parallel.mesh import chunk_keys

    n, tile, n_tiles = 544, 64, 256
    keys = chunk_keys(jax.random.PRNGKey(5), 0, n_tiles)
    M = tile * n                                  # draws per tile
    for p in (1e-5, 1e-3, 0.05):
        ex, ez = sample_tiles_hw(keys, p, n, tile, bits=16)
        ex = np.asarray(ex).astype(bool).reshape(n_tiles, M)
        ez = np.asarray(ez).astype(bool).reshape(n_tiles, M)
        counts = np.array([
            (~ex & ~ez).sum(), (ex & ~ez).sum(),
            (ex & ez).sum(), (~ex & ez).sum()], np.float64)
        probs, outcomes = _hw16_joint_probs(p)
        N = counts.sum()
        exp = N * probs
        # Overdispersion from per-tile threshold sharing: draws within a
        # tile share one dither outcome, so Var(count_c) = N p_c (1 - p_c)
        # + M * N * Var_dither(p_c).  (At p >= 3*2^-16 the dither variance
        # of the CATEGORY probabilities is ~(2^-16)^2 and the factor is
        # ~1; at 1e-5 it dominates.)
        var_d = np.zeros(4)
        for w_dither, row in outcomes:
            var_d += w_dither * (row - probs) ** 2
        var = N * probs * (1 - probs) + M * N * var_d
        # per-category z-tests at 6 sigma
        nz = var > 0
        z = np.abs(counts - exp)[nz] / np.sqrt(var[nz])
        assert (z < 6.0).all(), (p, counts, exp, z)
        # chi-square with the overdispersion factor: sum of per-category
        # (obs-exp)^2 / var ~ chi2(3)-ish; 26.1 = 1e-5 tail of chi2(3)
        chi2 = float((((counts - exp) ** 2)[nz] / var[nz]).sum())
        assert chi2 < 26.1, (p, chi2, counts, exp)


def test_hw_sampler_kernel_on_tpu():
    """Statistical + determinism checks of the Pallas hardware-PRNG channel
    kernel (TPU only — compiled Mosaic kernel)."""
    import pytest

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("hardware-PRNG sampler requires a TPU backend")
    from qldpcsim_tpu.ops.channel_pallas import sample_tiles_hw
    from qldpcsim_tpu.parallel.mesh import chunk_keys

    keys = chunk_keys(jax.random.PRNGKey(0), 0, 256)
    p, n, tile = 0.05, 544, 64
    ex, ez = sample_tiles_hw(keys, p, n, tile, bits=16)
    ex, ez = np.asarray(ex), np.asarray(ez)
    N = ex.size
    se = np.sqrt(2 * p / 3 * (1 - 2 * p / 3) / N)
    assert abs(ex.mean() - 2 * p / 3) < 5 * se
    assert abs(ez.mean() - 2 * p / 3) < 5 * se
    ex2, _ = sample_tiles_hw(keys, p, n, tile, bits=16)
    assert np.array_equal(ex, np.asarray(ex2))
    ex3, _ = sample_tiles_hw(keys[128:], p, n, tile, bits=16)
    assert np.array_equal(np.asarray(ex3), ex[128 * 64:])
