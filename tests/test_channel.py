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
    from the global tile key (deterministic + layout-invariant)."""
    from qldpcsim_tpu.ops.channel_pallas import (_dithered_thresholds16,
                                                 _thresholds32)
    from qldpcsim_tpu.parallel.mesh import chunk_keys

    keys = chunk_keys(jax.random.PRNGKey(7), 0, 4096)
    p = 0.0371
    thr = np.asarray(_dithered_thresholds16(keys, p))       # (4096, 3)
    T32 = np.asarray(_thresholds32(p)).astype(np.float64)
    base = np.floor(T32 / 65536.0)
    # every tile's threshold is floor or floor+1
    assert ((thr == base) | (thr == base + 1)).all()
    # mean converges to the exact 16-bit-scaled threshold: frac has
    # sd 0.5/sqrt(4096) ~ 0.008
    exact = T32 / 65536.0
    assert np.abs(thr.mean(axis=0) - exact).max() < 0.05
    # deterministic + tile-local (layout invariance)
    thr2 = np.asarray(_dithered_thresholds16(keys, p))
    assert (thr == thr2).all()
    sub = np.asarray(_dithered_thresholds16(keys[1024:], p))
    assert (sub == thr[1024:]).all()


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
