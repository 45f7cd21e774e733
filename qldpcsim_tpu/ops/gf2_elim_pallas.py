"""Pallas TPU kernel: batched bit-packed GF(2) elimination (OSD stage 2).

The OSD post-decoder's hot sequential step (reference: the greedy
rank-increase basis search + per-pattern REF, decoders.py:330-355; here one
factorization reused across patterns, decoders/osd.py). Per shot, columns of
the permuted H are folded into an RREF basis of uint32 words; each kernel
lane owns one shot, so the whole batch eliminates in lock-step with state
(basis, tags, pivots) resident in VMEM — the XLA formulation round-trips the
(B, r, mW) state through HBM on every `fori_loop` step instead.

Design (r3 rewrite):
  * COLUMN WINDOWS with carried state: the kernel processes W=128 columns
    per launch and returns its state; a host-level lax.while_loop keeps
    launching windows until every lane has found its r pivots. The
    least-reliable-first column order completes rank after ~r + small slack
    columns, so the loop usually stops after ceil((r+slack)/W) windows
    instead of sweeping all n columns — with exact full-sweep semantics as
    the fallback (a window pass past rank completion selects nothing, like
    the full sweep).
  * FUSED basis+tags: one (r_pad, mW+rW, B) array, so the per-column
    mask-and-XOR-fold (the dominant vector work) runs once, not twice.
  * popcount bit indexing: lowest-set-bit position = popcount(low - 1),
    replacing a 32-term unrolled shift/multiply chain per word.
  * r padded to a power of two at state creation: the XOR-fold halving tree
    needs no per-step concat.

Layout: lanes = shots (B_blk), sublanes = packed words; all bit arithmetic
is uint32 shift/and/xor on the VPU. Outputs feed the (cheap, batched)
candidate-solve stage of decoders/osd.py unchanged. Mosaic constraints
shape the kernel: no value-level dynamic_(update_)slice (column loads use
pl.ds on the VMEM ref), sub-tile (1, B) integer loop carries avoided (cnt
is carried as f32).

Default on TPU backends (QLDPC_DISABLE_QC_KERNEL=1 opts out) — see
DIVERGENCES.md "Execution environment"; interpret-mode parity with the XLA
path is tested in tests/test_qc_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

u32 = jnp.uint32


def make_eliminate_pallas(n: int, r: int, mW: int, rW: int,
                          B_blk: int = 128, interpret: bool = False,
                          window: int = 128):
    """Build eliminate(colsP (B, n, mW) u32) ->
    (tags (B, r, rW) u32, pivots (B, r) i32, sel (B, n) bool)."""
    from jax.experimental import pallas as pl

    W = min(window, n)
    n_pad = -(-n // W) * W
    r_pad = 1 << max(3, (r - 1).bit_length())   # >= 8 sublanes, power of two
    bw = mW + rW                                # fused basis|tags word width

    def kernel(cols_ref, bt_in, piv_in, cnt_in,
               sel_ref, bt_out, piv_out, cnt_out):
        f32 = jnp.float32

        def step(j, state):
            bt, pivots, cnt = state                    # (r_pad, bw, B), (r_pad, B), (1, B)
            v = cols_ref[pl.ds(j, 1)][0]               # (mW, B)
            valid = pivots >= 0                        # (r_pad, B)
            pw = jnp.maximum(pivots, 0) >> 5
            ps = (jnp.maximum(pivots, 0) & 31).astype(u32)
            # word of v at each pivot's word index (select over mW words)
            h = jnp.zeros((r_pad, B_blk), u32)
            for w in range(mW):
                h = jnp.where(pw == w,
                              jnp.broadcast_to(v[w][None, :], (r_pad, B_blk)), h)
            h = (h >> ps) & u32(1)
            h = jnp.where(valid, h, u32(0))
            hm = (u32(0) - h)                          # (r_pad, B)

            # ONE masked XOR-fold over the fused basis|tags array.
            x = bt & hm[:, None, :]                    # (r_pad, bw, B)
            pot = r_pad
            while pot > 1:
                pot //= 2
                x = x[:pot] ^ x[pot:2 * pot]
            fold = x[0]                                # (bw, B)
            v = v ^ fold[:mW]
            tx = fold[mW:]                             # (rW, B)

            nonzero = jnp.zeros((1, B_blk), bool)
            for w in range(mW):
                nonzero = nonzero | (v[w][None, :] != 0)
            cnt_i = cnt.astype(jnp.int32)              # (1, B)
            # lowest set bit position: popcount(low - 1)
            piv_new = jnp.zeros((1, B_blk), jnp.int32)
            found = jnp.zeros((1, B_blk), bool)
            for w in range(mW):
                word = v[w][None, :]
                low = word & (u32(0) - word)
                bitpos = jax.lax.population_count(low - u32(1)).astype(jnp.int32)
                here = (word != 0) & (~found)
                piv_new = jnp.where(here, w * 32 + bitpos, piv_new)
                found = found | (word != 0)

            cnt_c = jnp.minimum(cnt_i, r - 1)          # (1, B)
            upd = nonzero & (cnt_i < r)
            # self-tag bit e_cnt appended to the new fused row
            selfbit_w = cnt_c >> 5
            selfbit = (u32(1) << (cnt_c.astype(u32) & u32(31)))
            vt_new = jnp.concatenate([
                v,
                jnp.stack([tx[w] ^ jnp.where((selfbit_w[0] == w) & upd[0],
                                             selfbit[0], u32(0))
                           for w in range(rW)]),
            ])                                         # (bw, B)

            # back-eliminate the new pivot bit from existing fused rows
            pvw = jnp.maximum(piv_new, 0) >> 5
            pvs = (jnp.maximum(piv_new, 0) & 31).astype(u32)
            hb = jnp.zeros((r_pad, B_blk), u32)
            for w in range(mW):
                hb = jnp.where(pvw == w, bt[:, w, :], hb)
            hb = (hb >> pvs) & u32(1)
            hb = jnp.where(valid & upd, hb, u32(0))
            hbm = (u32(0) - hb)                        # (r_pad, B)
            bt = bt ^ (hbm[:, None, :] & vt_new[None, :, :])

            # insert the new fused row at slot cnt
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (r_pad, B_blk), 0)
            slot = (iota_r == cnt_c) & upd             # (r_pad, B)
            sm = (u32(0) - slot.astype(u32))
            bt = (bt & ~sm[:, None, :]) | (sm[:, None, :] & vt_new[None])
            pivots = jnp.where(slot, piv_new, pivots)

            sel_ref[pl.ds(j, 1)] = upd.astype(jnp.int32)
            cnt = cnt + upd.astype(f32)
            return bt, pivots, cnt

        state = (bt_in[...], piv_in[...], cnt_in[...])
        bt, pivots, cnt = jax.lax.fori_loop(0, W, step, state)
        bt_out[...] = bt
        piv_out[...] = pivots
        cnt_out[...] = cnt

    grid_spec = lambda Bp: dict(  # noqa: E731
        grid=(Bp // B_blk,),
        in_specs=[
            pl.BlockSpec((W, mW, B_blk), lambda b: (0, 0, b)),
            pl.BlockSpec((r_pad, bw, B_blk), lambda b: (0, 0, b)),
            pl.BlockSpec((r_pad, B_blk), lambda b: (0, b)),
            pl.BlockSpec((1, B_blk), lambda b: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((W, B_blk), lambda b: (0, b)),
            pl.BlockSpec((r_pad, bw, B_blk), lambda b: (0, 0, b)),
            pl.BlockSpec((r_pad, B_blk), lambda b: (0, b)),
            pl.BlockSpec((1, B_blk), lambda b: (0, b)),
        ],
    )

    @functools.partial(jax.jit)
    def eliminate(colsP):
        B = colsP.shape[0]
        pad = (-B) % B_blk
        x = jnp.transpose(colsP, (1, 2, 0))            # (n, mW, B)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        if n_pad != n:
            # zero columns are no-ops in the elimination sweep
            x = jnp.pad(x, ((0, n_pad - n), (0, 0), (0, 0)))
        Bp = B + pad
        gs = grid_spec(Bp)

        call = pl.pallas_call(
            kernel,
            grid=gs["grid"],
            in_specs=gs["in_specs"],
            out_specs=gs["out_specs"],
            out_shape=[
                jax.ShapeDtypeStruct((W, Bp), jnp.int32),
                jax.ShapeDtypeStruct((r_pad, bw, Bp), u32),
                jax.ShapeDtypeStruct((r_pad, Bp), jnp.int32),
                jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            ],
            interpret=interpret,
        )

        def cond(c):
            lo, bt, piv, cnt, sel = c
            return (lo < n_pad) & jnp.any(cnt < r)

        def body(c):
            lo, bt, piv, cnt, sel = c
            win = jax.lax.dynamic_slice(x, (lo, 0, 0), (W, mW, Bp))
            selw, bt, piv, cnt = call(win, bt, piv, cnt)
            sel = jax.lax.dynamic_update_slice(sel, selw, (lo, 0))
            return lo + W, bt, piv, cnt, sel

        # Lane-pad slots start at cnt=r (not 0): they never gain pivots, and
        # a 0 would hold `any(cnt < r)` true forever, silently defeating the
        # early exit whenever B % B_blk != 0.
        cnt0 = jnp.full((1, Bp), float(r), jnp.float32)
        cnt0 = jax.lax.dynamic_update_slice(
            cnt0, jnp.zeros((1, B), jnp.float32), (0, 0))
        init = (
            jnp.int32(0),
            jnp.zeros((r_pad, bw, Bp), u32),
            jnp.full((r_pad, Bp), -1, jnp.int32),
            cnt0,
            jnp.zeros((n_pad, Bp), jnp.int32),
        )
        _, bt, piv, cnt, sel = jax.lax.while_loop(cond, body, init)

        sl = slice(0, B)
        tags = jnp.transpose(bt[:r, mW:, :], (2, 0, 1))[sl]
        pivots = jnp.transpose(piv[:r], (1, 0))[sl]
        selb = jnp.transpose(sel[:n], (1, 0))[sl].astype(bool)
        return tags, pivots, selb

    return eliminate
