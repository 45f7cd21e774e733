"""Pallas TPU kernel: row-sequential (serial-schedule) MS/BP over QC codes.

The reference's serial schedule updates ONE check row per layer with a
convergence test after every row (simulator.py:218 + decoders.py:154-176) —
465 sequential steps per iteration on the Tanner code. The XLA
row-sequential path (decoders/sequential.py) already reduces per-row work to
O(dmax), but each of the ~14k sequential steps of a decode round-trips its
state through HBM. Here the entire decode state lives in VMEM scratch and
the full iteration loop runs inside one kernel launch:

    per row r of block-row i (vars of slot (j, s) sit at (r+s) mod L):
      v2c_d      = posterior[j, (r+s)%L] - c2v[i,d,r]     (pl.ds row loads)
      CN update  = min/min2/sign (MS) or tanh-product (BP)
      posterior += delta; c2v row <- new                  (pl.ds row stores)
      syn_est   ^= column flips (incremental H.e mod 2 maintenance);
                   mismatch weight W updated in place
      converged shots freeze (deltas masked), it latched at row granularity

Mosaic constraints shape the implementation (see docs/PERFORMANCE.md):
refs are only read/written inside fori_loop bodies (never while_loop), all
dynamic row addressing is ref-level pl.ds, loop carries hold no sub-tile
int/bool vectors. Early exit runs at iteration granularity via pl.when on
the all-done flag (skipped iterations cost ~nothing), while per-shot
convergence latching keeps the reference's per-row n_iter accounting.

Same statistical-parity class as every fast path (incremental posterior —
DIVERGENCES.md); decoders/sequential.py stays the bit-exact-oracle path.
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
from qldpcsim_tpu.ops.qc import QCStructure

_PRIOR_EPS = 1e-9
_BIG = 1e30
_TANH_FLOOR = 1e-12


def serial_order_is_natural(layers: Optional[LayerSchedule], m: int) -> bool:
    """True when the schedule is one-row layers in natural order 0..m-1
    (what the greedy layerizer emits for serial on contiguous codes)."""
    if layers is None:
        return False
    rows = []
    for l in range(layers.n_layers):
        if int(layers.sizes[l]) == 0:
            continue
        if int(layers.sizes[l]) != 1:
            return False
        rows.append(int(layers.rows[l, 0]))
    return rows == list(range(m))


def _make_kernel(st: QCStructure, beta: float, max_iter: int, B_blk: int,
                 kind: str, eps: float):
    L, n, m = st.L, st.n, st.m
    blocks = [st.blocks_of_row(i) for i in range(st.m_b)]
    # col_blocks[j]: [(block-row i2, shift s2), ...] — check rows touching
    # variable block j; variable (j, v) sits in check row (v - s2) mod L of
    # block-row i2.
    col_blocks = [[] for _ in range(st.n_b)]
    for i in range(st.m_b):
        for (j, s) in blocks[i]:
            col_blocks[j].append((i, s))
    offs = []
    off = 0
    for i in range(st.m_b):
        offs.append(off)
        off += len(blocks[i]) * L
    E_rows = off
    # Row weight is constant within a block-row (one var per slot).
    row_par = [float(len(blocks[i]) % 2) for i in range(st.m_b)]

    f32 = jnp.float32

    def kernel(syn_ref, lch_ref, e_ref, it_ref, conv_ref, post_out_ref,
               c2v_ref, post_ref, se_ref, acc_ref):
        import jax.experimental.pallas as pl

        L_ch = lch_ref[0, 0]
        c2v_ref[...] = jnp.zeros((E_rows, B_blk), f32)
        post_ref[...] = jnp.full((n, B_blk), L_ch, f32)
        syn = syn_ref[...].astype(f32)                              # (m, B)
        e0 = (L_ch < 0.0).astype(f32)
        se0 = jnp.concatenate(
            [jnp.full((L, B_blk), row_par[i], f32) * e0
             for i in range(st.m_b)])                               # (m, B)
        se_ref[...] = se0
        w0 = jnp.sum(jnp.abs(se0 - syn), axis=0, keepdims=True)     # (1, B)
        # acc rows: 0=done (0/1), 1=it_lat, 2=mismatch weight W
        acc_ref[...] = jnp.concatenate([
            jnp.zeros((1, B_blk), f32),
            jnp.full((1, B_blk), float(max_iter), f32),
            w0,
            jnp.zeros((5, B_blk), f32),
        ])

        def one_block_row(i, r, it_f):
            bl = blocks[i]
            done = acc_ref[0:1]
            active = 1.0 - done
            syn_row = syn_ref[pl.ds(i * L + r, 1)].astype(f32)      # (1, B)
            ss = 1.0 - 2.0 * syn_row

            # pass 1: load v2c per slot, running min/min2/sign (MS) or
            # tanh product (BP)
            loaded = []
            if kind == "MS":
                m1 = jnp.full((1, B_blk), _BIG, f32)
                m2 = jnp.full((1, B_blk), _BIG, f32)
                neg_par = jnp.zeros((1, B_blk), f32)
            else:
                prod = jnp.ones((1, B_blk), f32)
            for d, (j, s) in enumerate(bl):
                v_idx = jax.lax.rem(r + s, L)
                pos = post_ref[pl.ds(j * L + v_idx, 1)]             # (1, B)
                old = c2v_ref[pl.ds(offs[i] + d * L + r, 1)]
                v = pos - old
                if kind == "MS":
                    a = jnp.abs(v)
                    neg_par = neg_par + (v < 0.0).astype(f32)
                    is_new = a < m1
                    m2 = jnp.where(is_new, m1, jnp.minimum(m2, a))
                    m1 = jnp.where(is_new, a, m1)
                    loaded.append((pos, old, v, j, v_idx))
                else:
                    t = jnp.tanh(v * 0.5)
                    t_sgn = jnp.where(t < 0.0, -1.0, 1.0)
                    t = t_sgn * jnp.maximum(jnp.abs(t), _TANH_FLOOR)
                    # keep |prod| out of f32 denormals (Mosaic does not
                    # flush them; denormal microtraps dominate the kernel)
                    prod = prod * t
                    prod = jnp.where(prod < 0.0, -1.0, 1.0) * jnp.maximum(
                        jnp.abs(prod), 1e-30)
                    loaded.append((pos, old, t, j, v_idx))
            if kind == "MS":
                m1 = jnp.where(m1 >= _BIG, 0.0, m1)
                m2 = jnp.where(m2 >= _BIG, 0.0, m2)
                par = neg_par - 2.0 * jnp.floor(neg_par * 0.5)
                coef = beta * ss * (1.0 - 2.0 * par)
            else:
                clamp = 1.0 - eps

            # pass 2: extrinsic message, state writeback, flip propagation
            dW = jnp.zeros((1, B_blk), f32)
            for d, (pos, old, v, j, v_idx) in enumerate(loaded):
                if kind == "MS":
                    sign = 1.0 - 2.0 * (v < 0.0).astype(f32)
                    a = jnp.abs(v)
                    mag = jnp.where(a == m1, m2, m1)
                    new = coef * sign * mag
                else:
                    th2 = jnp.clip(prod / v, -clamp, clamp)
                    new = ss * jnp.log((1.0 + th2) / (1.0 - th2))
                delta = (new - old) * active
                c2v_ref[pl.ds(offs[i] + d * L + r, 1)] = old + delta
                new_pos = pos + delta
                post_ref[pl.ds(j * L + v_idx, 1)] = new_pos
                flip = ((pos < 0.0) != (new_pos < 0.0)).astype(f32)
                for (i2, s2) in col_blocks[j]:
                    chk = i2 * L + jax.lax.rem(v_idx - s2 + L, L)
                    se_old = se_ref[pl.ds(chk, 1)]
                    se_new = jnp.abs(se_old - flip)                 # XOR
                    se_ref[pl.ds(chk, 1)] = se_new
                    sy = syn_ref[pl.ds(chk, 1)].astype(f32)
                    dW = dW + jnp.abs(se_new - sy) - jnp.abs(se_old - sy)

            w = acc_ref[2:3] + dW
            acc_ref[2:3] = w
            ok = (w == 0.0).astype(f32)
            newly = ok * active
            it_lat = acc_ref[1:2]
            acc_ref[1:2] = it_lat + newly * ((it_f + 1.0) - it_lat)
            acc_ref[0:1] = jnp.maximum(done, ok)

        def one_iter(it, carry):
            not_all_done = jnp.min(acc_ref[0:1]) < 0.5

            @pl.when(not_all_done)
            def _():
                it_f = it.astype(f32)
                for i in range(st.m_b):
                    jax.lax.fori_loop(
                        0, L, lambda r, c, i=i: (one_block_row(i, r, it_f), 0)[1],
                        0)
            return carry

        jax.lax.fori_loop(0, max_iter, one_iter, 0)

        post = post_ref[...]
        e_ref[...] = (post < 0.0).astype(jnp.float32)
        it_ref[...] = acc_ref[1:2].astype(jnp.int32)
        conv_ref[...] = (acc_ref[0:1] > 0.5).astype(jnp.int32)
        post_out_ref[...] = post

    return kernel, E_rows


def make_seq_qc_decoder(st: QCStructure, cfg: DecoderConfig,
                        layers: Optional[LayerSchedule] = None,
                        B_blk: int = 128, interpret: bool = False,
                        kind: str = "MS"):
    """Build decode(syndromes, p) -> DecodeResult running the Pallas
    row-sequential QC kernel (reference serial schedule semantics)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, m = st.n, st.m
    if layers is not None:
        assert serial_order_is_natural(layers, m), \
            "seq QC kernel requires one-row layers in natural order"
    kernel, E_rows = _make_kernel(st, float(cfg.beta), int(cfg.max_iter),
                                  B_blk, kind.upper(), float(cfg.eps))

    @jax.jit
    def _run(syn_T, lch):
        B = syn_T.shape[1]
        grid = (B // B_blk,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((m, B_blk), lambda b: (0, b)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((n, B_blk), lambda b: (0, b)),
                pl.BlockSpec((1, B_blk), lambda b: (0, b)),
                pl.BlockSpec((1, B_blk), lambda b: (0, b)),
                pl.BlockSpec((n, B_blk), lambda b: (0, b)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
                jax.ShapeDtypeStruct((n, B), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((E_rows, B_blk), jnp.float32),
                pltpu.VMEM((n, B_blk), jnp.float32),
                pltpu.VMEM((m, B_blk), jnp.float32),
                pltpu.VMEM((8, B_blk), jnp.float32),
            ],
            interpret=interpret,
        )(syn_T, lch)

    def decode(syndromes, p):
        B = syndromes.shape[0]
        pad = (-B) % B_blk
        syn_T = jnp.asarray(syndromes).astype(jnp.float32).T        # (m, B)
        if pad:
            syn_T = jnp.pad(syn_T, ((0, 0), (0, pad)))
        p = jnp.asarray(p, jnp.float32)
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


def make_ms_seq_qc_decoder(st, cfg, layers=None, B_blk=128, interpret=False):
    return make_seq_qc_decoder(st, cfg, layers, B_blk, interpret, kind="MS")


def make_bp_seq_qc_decoder(st, cfg, layers=None, B_blk=128, interpret=False):
    return make_seq_qc_decoder(st, cfg, layers, B_blk, interpret, kind="BP")
