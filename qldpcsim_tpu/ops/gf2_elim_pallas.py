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

    def make_kernel(rp):
        """Kernel over an rp-row state. rp < r_pad is only used for the
        FIRST column window: one window of W columns can insert at most W
        pivots, so a W-row state is provably sufficient there and halves
        the dominant (rows x bw) mask/fold/eliminate work while the basis
        is still small; the host pads the state up to r_pad afterwards
        (zero rows with pivot=-1 contribute nothing — bit-identical)."""
        return _make_kernel_impl(rp)

    def _make_kernel_impl(rp):
      def kernel(cols_ref, bt_in, piv_in, cnt_in,
                 sel_ref, bt_out, piv_out, cnt_out):
        f32 = jnp.float32

        def step(j, state):
            bt, pivots, cnt = state                    # (rp, bw, B), (rp, B), (1, B)
            v = cols_ref[pl.ds(j, 1)][0]               # (mW, B)
            valid = pivots >= 0                        # (rp, B)
            pw = jnp.maximum(pivots, 0) >> 5
            ps = (jnp.maximum(pivots, 0) & 31).astype(u32)
            # word of v at each pivot's word index (select over mW words)
            h = jnp.zeros((rp, B_blk), u32)
            for w in range(mW):
                h = jnp.where(pw == w,
                              jnp.broadcast_to(v[w][None, :], (rp, B_blk)), h)
            h = (h >> ps) & u32(1)
            h = jnp.where(valid, h, u32(0))
            hm = (u32(0) - h)                          # (rp, B)

            # ONE masked XOR-fold over the fused basis|tags array.
            x = bt & hm[:, None, :]                    # (rp, bw, B)
            pot = rp
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
            hb = jnp.zeros((rp, B_blk), u32)
            for w in range(mW):
                hb = jnp.where(pvw == w, bt[:, w, :], hb)
            hb = (hb >> pvs) & u32(1)
            hb = jnp.where(valid & upd, hb, u32(0))
            hbm = (u32(0) - hb)                        # (rp, B)
            bt = bt ^ (hbm[:, None, :] & vt_new[None, :, :])

            # insert the new fused row at slot cnt
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (rp, B_blk), 0)
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

      return kernel

    grid_spec = lambda Bp, rp: dict(  # noqa: E731
        grid=(Bp // B_blk,),
        in_specs=[
            pl.BlockSpec((W, mW, B_blk), lambda b: (0, 0, b)),
            pl.BlockSpec((rp, bw, B_blk), lambda b: (0, 0, b)),
            pl.BlockSpec((rp, B_blk), lambda b: (0, b)),
            pl.BlockSpec((1, B_blk), lambda b: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((W, B_blk), lambda b: (0, b)),
            pl.BlockSpec((rp, bw, B_blk), lambda b: (0, 0, b)),
            pl.BlockSpec((rp, B_blk), lambda b: (0, b)),
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

        def make_call(rp):
            gs = grid_spec(Bp, rp)
            return pl.pallas_call(
                make_kernel(rp),
                grid=gs["grid"],
                in_specs=gs["in_specs"],
                out_specs=gs["out_specs"],
                out_shape=[
                    jax.ShapeDtypeStruct((W, Bp), jnp.int32),
                    jax.ShapeDtypeStruct((rp, bw, Bp), u32),
                    jax.ShapeDtypeStruct((rp, Bp), jnp.int32),
                    jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                ],
                interpret=interpret,
            )

        call = make_call(r_pad)

        # Lane-pad slots start at cnt=r (not 0): they never gain pivots, and
        # a 0 would hold `any(cnt < r)` true forever, silently defeating the
        # early exit whenever B % B_blk != 0.
        cnt0 = jnp.full((1, Bp), float(r), jnp.float32)
        cnt0 = jax.lax.dynamic_update_slice(
            cnt0, jnp.zeros((1, B), jnp.float32), (0, 0))

        sel0 = jnp.zeros((n_pad, Bp), jnp.int32)
        # First window on a half-height (W-row) state when the full state
        # is taller: W columns insert at most W pivots, so the small state
        # is sufficient there and the dominant per-column (rows x bw) work
        # halves while the basis is still filling. Bit-identical: the
        # padded-away rows hold pivot=-1 and zero words, which contribute
        # nothing to any fold.
        rp1 = W if (r_pad > W and W >= 8 and (W & (W - 1)) == 0) else r_pad
        if rp1 < r_pad:
            selw, bt_s, piv_s, cnt = make_call(rp1)(
                x[:W], jnp.zeros((rp1, bw, Bp), u32),
                jnp.full((rp1, Bp), -1, jnp.int32), cnt0)
            bt0 = jnp.pad(bt_s, ((0, r_pad - rp1), (0, 0), (0, 0)))
            piv0 = jnp.pad(piv_s, ((0, r_pad - rp1), (0, 0)),
                           constant_values=-1)
            sel0 = jax.lax.dynamic_update_slice(sel0, selw, (0, 0))
            lo0 = W
        else:
            bt0 = jnp.zeros((r_pad, bw, Bp), u32)
            piv0 = jnp.full((r_pad, Bp), -1, jnp.int32)
            cnt = cnt0
            lo0 = 0

        def cond(c):
            lo, bt, piv, cnt, sel = c
            return (lo < n_pad) & jnp.any(cnt < r)

        def body(c):
            lo, bt, piv, cnt, sel = c
            win = jax.lax.dynamic_slice(x, (lo, 0, 0), (W, mW, Bp))
            selw, bt, piv, cnt = call(win, bt, piv, cnt)
            sel = jax.lax.dynamic_update_slice(sel, selw, (lo, 0))
            return lo + W, bt, piv, cnt, sel

        init = (jnp.int32(lo0), bt0, piv0, cnt, sel0)
        _, bt, piv, cnt, sel = jax.lax.while_loop(cond, body, init)

        sl = slice(0, B)
        tags = jnp.transpose(bt[:r, mW:, :], (2, 0, 1))[sl]
        pivots = jnp.transpose(piv[:r], (1, 0))[sl]
        selb = jnp.transpose(sel[:n], (1, 0))[sl].astype(bool)
        return tags, pivots, selb

    return eliminate
