"""Pallas TPU kernel: depolarizing-channel sampling via the hardware PRNG.

The XLA channel path (channel/depolarizing.py) draws one threefry u32 per
qubit per shot; measured ~10% of the whole flagship pipeline (threefry VPU
arithmetic + the per-tile key schedule). Two levers cut it down:

  * the TPU's native hardware PRNG (`pltpu.prng_seed` /
    `pltpu.prng_random_bits`), seeded per global shot tile from the same
    (2,) uint32 tile key as the threefry path — deterministic for a given
    seed and independent of device layout (SURVEY.md §5.8), with no
    per-tile key-schedule arithmetic;
  * 16-bit draws: the category split I|X|Y|Z needs only threshold
    resolution, not 32-bit entropy, so each generated u32 word serves TWO
    qubits (low/high halves mapped to static column ranges — iid bits make
    any fixed bijection valid). Quantizing thresholds to 2^-16 would bias
    the effective p by up to 2^-16/ (p/3) relative; instead each tile draws
    DITHERED thresholds t = floor(q*2^16) + Bernoulli(frac(q*2^16)) from
    its own tile key — t1 (p/3), t2 (2p/3 = the err_x marginal) and the
    err_z interval WIDTH (t3 := t1 + w), making BOTH marginals
    E[t2] and E[w] exact at every p — the quantization bias becomes a
    per-tile variance contribution of relative size ~2^-16/q, negligible
    against shot noise. For p < 3*2^-16 the sub-thresholds' 16-bit bases
    collide and dithering slightly distorts the X:Y:Z JOINT split (the
    marginals stay exact by construction); the analytic envelope and a
    chi-square acceptance test live in tests/test_channel.py
    (test_hw_sampler_joint_split_*). At such p errors are ~absent
    altogether.

Semantics otherwise match sample_depolarizing (channel/depolarizing.py):
one draw per qubit, err_x = draw < t(2p/3), err_z = t(p/3) <= draw < t(p).
The random STREAM differs from the threefry path, so per-shot errors (and
exact counter values) differ between samplers — a statistical-parity-class
divergence like every fast path (DIVERGENCES.md). Both samplers are
individually deterministic and layout-invariant.

Set QLDPC_HW_RNG_BITS=32 to use full-width draws (exact joint split at all
p, ~2x the PRNG cost); default is 16.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _u32_threshold(q):
    """round(q * 2^32) as uint32 (clamped) — matches
    channel/depolarizing._u32_threshold."""
    t = jnp.round(jnp.asarray(q, jnp.float32) * 4294967296.0)
    return jnp.clip(t, 0.0, 4294967040.0).astype(jnp.uint32)


def _thresholds32(p):
    p = jnp.asarray(p, jnp.float32)
    return jnp.stack([_u32_threshold(p / 3.0),
                      _u32_threshold(2.0 * p / 3.0),
                      _u32_threshold(p)])


def _dithered_thresholds16(keys, p):
    """Per-tile dithered u16 thresholds (t1, t2, t3), (n_tiles, 3) int32.

    Each quantity q is dithered as floor(q*2^16) + Bernoulli(frac(q*2^16))
    from the tile's threefry key, so E[q_tile] = q * 2^16 EXACTLY, and the
    draw is a pure function of the GLOBAL tile key (layout-invariant).

    The three dithered quantities are t1 (the p/3 threshold), t2 (the 2p/3
    threshold — the err_x marginal), and the WIDTH w of the err_z interval
    (t3 := t1 + w with E[w] = (T32_z - T32_1)/2^16): dithering the width
    instead of the t3 endpoint guarantees t3 >= t1 for every dither
    outcome, so the err_z marginal E[t3 - t1] = E[w] is exact at ALL p.
    (Dithering both endpoints independently could invert them whenever
    their 16-bit bases collide — p < ~1.5 * 2^-16 — which would bias the
    err_z marginal by up to ~P(t1 > t3) * 2^-16; the joint X:Y:Z split in
    that regime remains slightly distorted either way, see the module
    docstring and DIVERGENCES.md.)"""
    T32 = _thresholds32(p)
    quant = jnp.stack([T32[0], T32[1], T32[2] - T32[0]])      # t1, t2, w
    base = (quant >> 16).astype(jnp.int32)                    # (3,)
    frac = (quant & jnp.uint32(0xFFFF)).astype(jnp.uint32)    # (3,)

    def per_tile(k):
        d = jax.random.bits(jax.random.wrap_key_data(k), (3,), jnp.uint32)
        t = base + ((d & jnp.uint32(0xFFFF)) < frac).astype(jnp.int32)
        return jnp.stack([t[0], t[1], t[0] + t[2]])

    return jax.vmap(per_tile)(keys)


@functools.partial(jax.jit, static_argnames=("n", "tile", "bits"))
def sample_tiles_hw(keys, p, n: int, tile: int, bits: int = 16):
    """Sample (err_x, err_z) f32 0/1 arrays of shape (n_tiles*tile, n).

    keys: (n_tiles, 2) uint32 — one PRNG seed per GLOBAL shot tile (the
    sharding-invariant unit of randomness, same contract as
    sample_shot_tiles). p: scalar depolarization probability.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = keys.shape[0]
    f32 = jnp.float32
    keys_i32 = jax.lax.bitcast_convert_type(keys, jnp.int32)

    if bits == 16:
        # Half-width draws: one u32 word -> two qubit columns (low half ->
        # cols [0, n_half), high half -> cols [n_half, 2*n_half)). Keys and
        # per-tile thresholds share ONE SMEM table: SMEM windows pad each
        # row to 512 B, so two (n_tiles, k) tables would blow the 1 MB SMEM.
        n_half = -(-n // 256) * 128
        n_pad = 2 * n_half
        thr = _dithered_thresholds16(keys, p)                 # (n_tiles, 3)
        tab = jnp.concatenate([keys_i32, thr], axis=1)        # (n_tiles, 5)

        def kernel(tab_ref, ex_ref, ez_ref):
            i = pl.program_id(0)
            pltpu.prng_seed(tab_ref[i, 0], tab_ref[i, 1])
            raw = pltpu.bitcast(pltpu.prng_random_bits((tile, n_half)),
                                jnp.int32)
            lo = raw & 0xFFFF
            hi = (raw >> 16) & 0xFFFF
            t1, t2, t3 = tab_ref[i, 2], tab_ref[i, 3], tab_ref[i, 4]
            ex = jnp.concatenate([lo < t2, hi < t2], axis=1)
            ez = jnp.concatenate([(lo >= t1) & (lo < t3),
                                  (hi >= t1) & (hi < t3)], axis=1)
            col_ok = jax.lax.broadcasted_iota(jnp.int32, (tile, n_pad), 1) < n
            ex_ref[...] = (ex & col_ok).astype(f32)
            ez_ref[...] = (ez & col_ok).astype(f32)

        inputs = (tab,)
    else:
        # Full-width draws; unsigned compares as signed after sign-bit flip.
        n_pad = -(-n // 128) * 128
        sign = jnp.int32(-2147483648)
        thr = (jax.lax.bitcast_convert_type(_thresholds32(p), jnp.int32)
               ^ sign)

        tab = jnp.concatenate(
            [keys_i32, jnp.tile(thr[None, :], (n_tiles, 1))], axis=1)

        def kernel(tab_ref, ex_ref, ez_ref):
            i = pl.program_id(0)
            pltpu.prng_seed(tab_ref[i, 0], tab_ref[i, 1])
            raw = pltpu.bitcast(pltpu.prng_random_bits((tile, n_pad)),
                                jnp.int32)
            s = raw ^ (-2147483648)
            t1, t2, t3 = tab_ref[i, 2], tab_ref[i, 3], tab_ref[i, 4]
            col_ok = jax.lax.broadcasted_iota(jnp.int32, (tile, n_pad), 1) < n
            ex_ref[...] = ((s < t2) & col_ok).astype(f32)
            ez_ref[...] = ((s >= t1) & (s < t3) & col_ok).astype(f32)

        inputs = (tab,)

    ex, ez = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, n_pad), lambda i: (i, 0)),
            pl.BlockSpec((tile, n_pad), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * tile, n_pad), f32),
            jax.ShapeDtypeStruct((n_tiles * tile, n_pad), f32),
        ],
    )(*inputs)
    return ex[:, :n], ez[:, :n]


def default_bits() -> int:
    return 32 if os.environ.get("QLDPC_HW_RNG_BITS") == "32" else 16
