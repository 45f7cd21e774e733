"""Pallas TPU kernel: batched bit-packed GF(2) elimination (OSD stage 2).

The OSD post-decoder's hot sequential step (reference: the greedy
rank-increase basis search + per-pattern REF, decoders.py:330-355; here one
factorization reused across patterns, decoders/osd.py). Per shot, columns of
the permuted H are folded into an RREF basis of uint32 words; each kernel
lane owns one shot, so the whole batch eliminates in lock-step with state
(basis, tags, pivots) resident in VMEM for all n column steps — the XLA
formulation round-trips the (B, r, mW) state through HBM on every
`fori_loop` step instead.

Layout: lanes = shots (B_blk), sublanes = packed words; all bit arithmetic
is uint32 shift/and/xor on the VPU. Early exit once every lane has found its
r pivots. Outputs feed the (cheap, batched) candidate-solve stage of
decoders/osd.py unchanged.

Like the QC decode kernel this is opt-in on this environment
(QLDPC_ENABLE_QC_KERNEL=1) — see DIVERGENCES.md "Execution environment";
interpret-mode parity with the XLA path is tested in tests/test_qc_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

u32 = jnp.uint32


def make_eliminate_pallas(n: int, r: int, mW: int, rW: int,
                          B_blk: int = 128, interpret: bool = False):
    """Build eliminate(colsP (B, n, mW) u32) ->
    (tags (B, r, rW) u32, pivots (B, r) i32, sel (B, n) bool)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(cols_ref, tags_ref, piv_ref, sel_ref):
        # Mosaic lowering constraints shape this kernel: no value-level
        # dynamic_(update_)slice (load the current column from the VMEM ref
        # with pl.ds instead; store `sel` rows back the same way), no
        # sub-tile (1, B) int/bool loop carries (cnt is carried as f32).
        sel_ref[...] = jnp.zeros((n, B_blk), jnp.int32)
        f32 = jnp.float32

        def step(j, state):
            basis, tags, pivots, cnt = state
            v = cols_ref[pl.ds(j, 1)][0]                       # (mW, B)
            valid = pivots >= 0                                # (r, B)
            pw = jnp.maximum(pivots, 0) >> 5                   # (r, B)
            ps = (jnp.maximum(pivots, 0) & 31).astype(u32)
            # word of v at each pivot's word index (select over mW words)
            h = jnp.zeros((r, B_blk), u32)
            for w in range(mW):
                h = jnp.where(pw == w,
                              jnp.broadcast_to(v[w][None, :], (r, B_blk)), h)
            h = (h >> ps) & u32(1)
            h = jnp.where(valid, h, u32(0))
            hm = (u32(0) - h)                                  # (r, B)

            # v ^= xor-fold of basis rows where h==1; t likewise from tags.
            # Static log-depth halving tree: a fori over rows would index
            # basis[k] with a traced k (value-level dynamic_slice — no
            # Mosaic lowering).
            def xor_reduce0(x):
                rp = x.shape[0]
                pot = 1 << (rp - 1).bit_length()
                if pot != rp:
                    x = jnp.concatenate(
                        [x, jnp.zeros((pot - rp,) + x.shape[1:], u32)])
                while pot > 1:
                    pot //= 2
                    x = x[:pot] ^ x[pot:]
                return x[0]

            vx = xor_reduce0(basis & hm[:, None, :])
            tx = xor_reduce0(tags & hm[:, None, :])
            v = v ^ vx

            nonzero = jnp.zeros((1, B_blk), bool)
            for w in range(mW):
                nonzero = nonzero | (v[w][None, :] != 0)
            cnt_i = cnt.astype(jnp.int32)                      # (1, B)
            # lowest set bit position of v
            piv_new = jnp.full((1, B_blk), 0, jnp.int32)
            found = jnp.zeros((1, B_blk), bool)
            for w in range(mW):
                word = v[w][None, :]
                low = word & (u32(0) - word)
                bitpos = jnp.sum(
                    jnp.stack([((low >> b) & 1).astype(jnp.int32) * b
                               for b in range(32)]), axis=0)
                here = (word != 0) & (~found)
                piv_new = jnp.where(here, w * 32 + bitpos, piv_new)
                found = found | (word != 0)

            cnt_c = jnp.minimum(cnt_i, r - 1)                  # (1, B)
            upd = nonzero & (cnt_i < r)
            # self-tag bit e_cnt
            selfbit_w = cnt_c >> 5                             # (1, B)
            selfbit = (u32(1) << (cnt_c.astype(u32) & u32(31)))
            t_new = jnp.stack([
                tx[w] ^ jnp.where((selfbit_w[0] == w) & upd[0],
                                  selfbit[0], u32(0))
                for w in range(rW)])

            # back-eliminate new pivot bit from existing basis rows
            pvw = jnp.maximum(piv_new, 0) >> 5                 # (1, B)
            pvs = (jnp.maximum(piv_new, 0) & 31).astype(u32)
            hb = jnp.zeros((r, B_blk), u32)
            for w in range(mW):
                hb = jnp.where(pvw == w, basis[:, w, :], hb)
            hb = (hb >> pvs) & u32(1)
            hb = jnp.where(valid & upd, hb, u32(0))
            hbm = (u32(0) - hb)                                # (r, B)
            basis = basis ^ (hbm[:, None, :] & v[None, :, :])
            tags = tags ^ (hbm[:, None, :] & t_new[None, :, :])

            # insert new basis vector at slot cnt
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (r, B_blk), 0)
            slot = (iota_r == cnt_c) & upd                     # (r, B)
            sm = (u32(0) - slot.astype(u32))
            basis = (basis & ~sm[:, None, :]) | (sm[:, None, :] & v[None])
            tags = (tags & ~sm[:, None, :]) | (sm[:, None, :] & t_new[None])
            pivots = jnp.where(slot, piv_new, pivots)

            sel_ref[pl.ds(j, 1)] = upd.astype(jnp.int32)
            cnt = cnt + upd.astype(f32)
            return basis, tags, pivots, cnt

        # fori (not while): refs may be read/written inside fori bodies on
        # Mosaic, while-loop bodies get discharged into unsupported
        # dynamic_slice ops. All updates are `upd`-masked, so the post-rank
        # tail columns are no-ops (only `sel` bookkeeping happens there).
        state = (
            jnp.zeros((r, mW, B_blk), u32),
            jnp.zeros((r, rW, B_blk), u32),
            jnp.full((r, B_blk), -1, jnp.int32),
            jnp.zeros((1, B_blk), f32),
        )
        _, tags, pivots, _ = jax.lax.fori_loop(0, n, step, state)
        tags_ref[...] = tags
        piv_ref[...] = pivots

    @functools.partial(jax.jit)
    def eliminate(colsP):
        B = colsP.shape[0]
        pad = (-B) % B_blk
        x = jnp.transpose(colsP, (1, 2, 0))                    # (n, mW, B)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        Bp = B + pad
        grid = (Bp // B_blk,)
        tags, piv, sel = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((n, mW, B_blk), lambda b: (0, 0, b))],
            out_specs=[
                pl.BlockSpec((r, rW, B_blk), lambda b: (0, 0, b)),
                pl.BlockSpec((r, B_blk), lambda b: (0, b)),
                pl.BlockSpec((n, B_blk), lambda b: (0, b)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((r, rW, Bp), u32),
                jax.ShapeDtypeStruct((r, Bp), jnp.int32),
                jax.ShapeDtypeStruct((n, Bp), jnp.int32),
            ],
            interpret=interpret,
        )(x)
        sl = slice(0, B)
        return (jnp.transpose(tags, (2, 0, 1))[sl],
                jnp.transpose(piv, (1, 0))[sl],
                jnp.transpose(sel, (1, 0))[sl].astype(bool))

    return eliminate
