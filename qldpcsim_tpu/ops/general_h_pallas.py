"""Pallas TPU kernel: VMEM-resident MS/BP decode for ARBITRARY (non-QC) H.

The QC kernels (ops/ms_qc_pallas.py) require circulant-lifted structure —
but the reference's primary input mode is an arbitrary user-supplied `.npy`
parity-check matrix (simulator.py:20-35), which previously fell back to the
XLA incidence-matmul path (decoders/ms_mxu.py), measured ~12x slower than
the QC kernel on like-sized codes. That path's cost is NOT the matmuls: at
B=4096 it re-materializes the (B, m, dmax) message state through HBM on
every layer (~25 MB r/w per layer ~= 0.4 ms/iteration of pure HBM time).

This kernel runs the SAME incidence-matmul formulation with the entire
iteration loop inside one kernel launch, so the state never leaves VMEM:

    per layer l (a contiguous run of checks, edges [e0, e1)):
      V2C   = P @ G[:, e0:e1] - C_l          (f32 MXU matmul = exact
                                              static gather: one-hot cols)
      CN    = min/min2/sign (MS) or tanh-product (BP) over the dmax axis
      P    += DELTA @ Gt[e0:e1, :]           (f32 MXU matmul scatter-add)
      C_l   = NEW
    per iteration: e = (P < 0); syn_est = e @ H^T (bf16 exact: 0/1 rows,
      sums < 256); per-shot freeze + iteration latch as in the QC kernel.

All indices are trace-time constants (the VERDICT-r4 ask #4: static
gathers in place of static rolls); the incidence matrices ride in VMEM as
kernel operands (constant index maps -> resident across the shot-block
grid). Edge layout: check-major, checks in natural row order (the greedy
layerizer's layers are contiguous row runs — decoders/common.py), each
check padded to the global dmax; pad edges have zero gather/scatter
columns and are masked out of the CN reduction (BIG magnitude for MS,
neutral 1.0 tanh for BP).

Semantics class: identical to the mxu path's (lazy v2c, incremental
posterior, per-iteration convergence checks) — statistical parity like
every fast path (DIVERGENCES.md); oracle-parity tested in
tests/test_general_h.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qldpcsim_tpu.decoders.common import (
    DecodeResult,
    DecoderConfig,
    LayerSchedule,
)

_PRIOR_EPS = 1e-9
_BIG = 1e30


def _contiguous_layer_runs(layers: Optional[LayerSchedule], m: int):
    """[(row0, row1), ...) per layer, or None if any layer is not a
    contiguous ascending run covering 0..m-1 in order."""
    if layers is None:
        return [(0, m)]
    runs = []
    nxt = 0
    for li in range(layers.n_layers):
        size = int(layers.sizes[li])
        if size == 0:
            continue
        rows = layers.rows[li, :size]
        a, b = int(rows[0]), int(rows[-1]) + 1
        if a != nxt or size != b - a or not (rows == np.arange(a, b)).all():
            return None
        runs.append((a, b))
        nxt = b
    return runs if nxt == m else None


def supports(H: np.ndarray, layers: Optional[LayerSchedule],
             vmem_budget: int = 48 * 2 ** 20) -> bool:
    """Shape/schedule gate for this kernel."""
    H = np.asarray(H) % 2
    m, n = H.shape
    if _contiguous_layer_runs(layers, m) is None:
        return False
    dmax = int(H.sum(axis=1).max()) if m else 0
    if dmax == 0:
        return False
    E = m * dmax
    state = 2 * n * E * 4 + E * 4 * 130 + n * 4 * 130
    return state <= vmem_budget


def make_gh_decoder(H: np.ndarray, cfg: DecoderConfig,
                    layers: Optional[LayerSchedule] = None,
                    B_blk: int = 512, interpret: bool = False,
                    kind: str = "MS"):
    """Build decode(syndromes (B, m), p) -> DecodeResult."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = (np.asarray(H) % 2).astype(np.int8)
    m, n = H.shape
    runs = _contiguous_layer_runs(
        layers, m) if cfg.schedule.upper() != "F" else [(0, m)]
    assert runs is not None, "general-H kernel needs contiguous layers"
    deg = H.sum(axis=1)
    dmax = int(deg.max())
    E = m * dmax
    kind = kind.upper()
    beta = float(cfg.beta)
    eps = float(cfg.eps)
    max_iter = int(cfg.max_iter)

    # Edge layout: check-major, padded to dmax. Gather/scatter incidence.
    var_of = np.full((m, dmax), -1, np.int64)
    for i in range(m):
        vs = np.nonzero(H[i])[0]
        var_of[i, :len(vs)] = vs
    G = np.zeros((n, E), np.float32)      # gather: V2C_e <- P[var_of[e]]
    for i in range(m):
        for k in range(dmax):
            v = var_of[i, k]
            if v >= 0:
                G[v, i * dmax + k] = 1.0
    Gt = np.ascontiguousarray(G.T)        # gather: pos = Gt @ P
    pad_edge = (var_of < 0).reshape(m, dmax)   # (m, dmax) bool
    H_f32 = H.astype(np.float32)          # (m, n) convergence matmul

    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def kernel(syn_ref, lch_ref, gt_ref, g_ref, ht_ref, pad_ref, e_ref,
               it_ref, conv_ref, post_ref):
        """State orientation: shots on LANES, edges/vars on sublanes —
        (E, B) messages and (n, B) posterior, so the per-check (m, dmax, B)
        view is a tile-aligned second-minor split (a (B, cl, dmax) lane
        split fails Mosaic layout inference: 'unsupported shape cast')."""
        L_ch = lch_ref[0, 0]
        syn = syn_ref[...]                                   # (m, B)
        syn_sign = 1.0 - 2.0 * syn

        def check_all(P, done, it_lat, it):
            e = (P < 0.0).astype(bf16)                       # (n, B)
            est = jnp.dot(ht_ref[...].astype(bf16), e,
                          preferred_element_type=f32)        # (m, B)
            est = est - 2.0 * jnp.floor(est * 0.5)
            bad = jnp.sum(jnp.abs(est - syn), axis=0, keepdims=True)
            ok = (bad == 0.0).astype(f32)                    # (1, B)
            newly = ok * (1.0 - done)
            it_lat = it_lat + newly * ((it + 1).astype(f32) - it_lat)
            return jnp.maximum(done, ok), it_lat

        def one_layer(li, C, P, active):
            a, b = runs[li]
            e0, e1 = a * dmax, b * dmax
            cl = b - a
            Cl = C[li]                                        # (El, B)
            pos = jnp.dot(gt_ref[e0:e1, :], P,
                          preferred_element_type=f32)         # (El, B)
            V = (pos - Cl).reshape(cl, dmax, -1)
            padm = pad_ref[a:b][:, :, None] > 0.5             # (cl, dmax, 1)
            ss = syn_sign[a:b]                                # (cl, B)
            if kind == "MS":
                A = jnp.where(padm, _BIG, jnp.abs(V))
                neg = jnp.where(padm, 0.0, (V < 0.0).astype(f32))
                npar = jnp.sum(neg, axis=1)                   # (cl, B)
                # running (min1, min2) with the reference value-equality
                # tie rule: two equal minima must yield (v, v) so the
                # extrinsic select sees the other equal minimum.
                m1 = A[:, 0, :]
                m2 = jnp.full_like(m1, _BIG)
                for k in range(1, dmax):
                    ak = A[:, k, :]
                    is_new = ak < m1
                    m2 = jnp.where(is_new, m1, jnp.minimum(m2, ak))
                    m1 = jnp.minimum(m1, ak)
                m1c = jnp.where(m1 >= _BIG, 0.0, m1)
                m2c = jnp.where(m2 >= _BIG, 0.0, m2)
                par = npar - 2.0 * jnp.floor(npar * 0.5)
                coef = beta * ss * (1.0 - 2.0 * par)          # (cl, B)
                mag = jnp.where(A == m1c[:, None, :],
                                m2c[:, None, :], m1c[:, None, :])
                NEW = coef[:, None, :] * (1.0 - 2.0 * neg) * mag
            else:
                t = jnp.tanh(V * 0.5)
                t = jnp.where(t < 0.0, -1.0, 1.0) * jnp.maximum(
                    jnp.abs(t), 1e-12)
                t = jnp.where(padm, 1.0, t)
                prod = t[:, 0, :]
                for k in range(1, dmax):
                    prod = prod * t[:, k, :]
                    prod = jnp.where(prod < 0.0, -1.0, 1.0) * jnp.maximum(
                        jnp.abs(prod), 1e-30)
                clamp = 1.0 - eps
                th2 = jnp.clip(prod[:, None, :] / t, -clamp, clamp)
                NEW = ss[:, None, :] * jnp.log((1.0 + th2) / (1.0 - th2))
            NEW = jnp.where(padm, 0.0, NEW).reshape(e1 - e0, -1)
            NEW = jnp.where(active > 0.5, NEW, Cl)
            delta = NEW - Cl
            P = P + jnp.dot(g_ref[:, e0:e1], delta,
                            preferred_element_type=f32)
            return C[:li] + (NEW,) + C[li + 1:], P

        def body(carry):
            it, C, P, done, it_lat = carry
            active = 1.0 - done                               # (1, B)
            for li in range(len(runs)):
                C, P = one_layer(li, C, P, active)
            done, it_lat = check_all(P, done, it_lat, it)
            return it + 1, C, P, done, it_lat

        def cond(carry):
            return (carry[0] < max_iter) & (jnp.min(carry[3]) < 0.5)

        B = syn.shape[1]
        carry = (
            jnp.int32(0),
            tuple(jnp.zeros(((b - a) * dmax, B), f32) for a, b in runs),
            jnp.full((n, B), L_ch, f32),
            jnp.zeros((1, B), f32),
            jnp.full((1, B), float(max_iter), f32),
        )
        _, _, P, done, it_lat = jax.lax.while_loop(cond, body, carry)
        e_ref[...] = (P < 0.0).astype(f32)
        it_ref[...] = it_lat.astype(jnp.int32)
        conv_ref[...] = (done > 0.5).astype(jnp.int32)
        post_ref[...] = P

    state_bytes = 2 * n * E * 4 + (E + 2 * n + 2 * m) * B_blk * 4
    vmem_limit = int(min(100 * 2 ** 20,
                         max(32 * 2 ** 20, 2 * state_bytes + 16 * 2 ** 20)))

    @functools.partial(jax.jit)
    def _run(syn_T, lch):
        B = syn_T.shape[1]
        grid = (B // B_blk,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((m, B_blk), lambda b: (0, b)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((E, n), lambda b: (0, 0)),
                pl.BlockSpec((n, E), lambda b: (0, 0)),
                pl.BlockSpec((m, n), lambda b: (0, 0)),
                pl.BlockSpec((m, dmax), lambda b: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((n, B_blk), lambda b: (0, b)),
                pl.BlockSpec((1, B_blk), lambda b: (0, b)),
                pl.BlockSpec((1, B_blk), lambda b: (0, b)),
                pl.BlockSpec((n, B_blk), lambda b: (0, b)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, B), f32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
                jax.ShapeDtypeStruct((n, B), f32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit),
            interpret=interpret,
        )(syn_T, lch, jnp.asarray(Gt), jnp.asarray(G),
          jnp.asarray(H_f32), jnp.asarray(pad_edge.astype(np.float32)))

    def decode(syndromes, p):
        B = syndromes.shape[0]
        pad = (-B) % B_blk
        syn_T = jnp.asarray(syndromes).astype(f32).T          # (m, B)
        if pad:
            syn_T = jnp.pad(syn_T, ((0, 0), (0, pad)))
        p = jnp.asarray(p, f32)
        lch = jnp.log((1.0 - p) / jnp.maximum(p, _PRIOR_EPS)).reshape(1, 1)
        e, it, conv, post = _run(syn_T, lch)
        sl = slice(0, B)
        return DecodeResult(
            e_hat=e.T[sl].astype(jnp.int8),
            n_iter=it[0, sl],
            converged=conv[0, sl] > 0,
            posterior=post.T[sl],
        )

    return decode
