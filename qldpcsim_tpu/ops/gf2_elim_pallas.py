"""Pallas TPU kernel: batched bit-packed GF(2) elimination (OSD stage 2).

The OSD post-decoder's hot sequential step (reference: the greedy
rank-increase basis search + per-pattern REF, decoders.py:330-355; here one
factorization reused across patterns, decoders/osd.py). Per shot, columns of
the permuted H are folded into an RREF basis of uint32 words; each kernel
lane owns one shot, so the whole batch eliminates in lock-step with state
(basis, tags, pivots) resident in VMEM — the XLA formulation round-trips the
(B, r, mW) state through HBM on every `fori_loop` step instead.

Design (r4 rewrite — single launch, windows as a grid dimension, ILP pairs):
  * COLUMN WINDOWS as the inner grid axis: grid = (lane superblocks,
    n/W column windows), both sequential on TPU. The elimination state
    (fused basis|tags, pivots, count) lives in the OUTPUT block buffers,
    whose index maps revisit the same block across the window axis — so the
    state persists in VMEM for the whole sweep and is flushed to HBM once.
    The r3 design carried the state through a host-level `lax.while_loop`
    around one pallas_call per window; each carried 4 MB buffer cost
    ~0.3-1 ms per window boundary in copies (a null kernel measured 7.7 of
    11.7 ms at B=256).
  * ILP PAIRS: the per-column step is a long chain of small dependent
    vector ops, so one problem leaves the VPU latency-bound (measured
    ~13 us/column regardless of state size — lp04's 16x smaller state ran
    at the same per-column cost as lp118). The kernel therefore steps
    `ilp` independent 128-lane shot groups inside ONE fori_loop body; the
    scheduler interleaves their chains (measured 12.3 -> 9.2 ms/batch at
    B=256 for ilp=2). VMEM bounds ilp at 2 for lp118-sized states.
  * EARLY EXIT per window: a window whose lane groups have all found their
    r pivots is skipped via `pl.when` — it costs the skipped-window cols
    DMA plus one (W, B) zero store per group. The least-reliable-first
    column order completes rank after ~r + small slack columns, so
    typically only ceil((r+slack)/W) windows do real work.
  * FUSED basis+tags: one (r_pad, mW+rW, B) array, so the per-column
    mask-and-XOR-fold (the dominant vector work) runs once, not twice.
  * FUSED back-eliminate + insert: rows >= cnt are zero by construction,
    so inserting the new row is a XOR, and it shares one masked-XOR pass
    over the state with the back-elimination of the new pivot (the two row
    masks are disjoint: the slot row has pivot=-1, so its back-elimination
    bit is masked out). 2 full-state vector ops instead of 5.
  * popcount bit indexing + per-word chains vectorized over the sublane
    (word) axis with cross-sublane any/min reductions; loop-invariant
    iotas hoisted out of the column step.
  * r padded to a power of two at state creation: the XOR-fold halving tree
    needs no per-step concat.

Layout: lanes = shots (B_blk per group), sublanes = packed words; all bit
arithmetic is uint32 shift/and/xor on the VPU. Outputs feed the (cheap,
batched) candidate-solve stage of decoders/osd.py unchanged. Mosaic
constraints shape the kernel: no value-level dynamic_(update_)slice (column
loads use pl.ds on the VMEM ref), sub-tile (1, B) integer loop carries
avoided (cnt is carried as f32).

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
                          window: int = 128, ilp: int = 2):
    """Build eliminate(colsP (B, n, mW) u32) ->
    (tags (B, r, rW) u32, pivots (B, r) i32, sel (B, n) bool)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = min(window, n)
    n_pad = -(-n // W) * W
    nw = n_pad // W
    rp = 1 << max(3, (r - 1).bit_length())   # >= 8 sublanes, power of two
    bw = mW + rW                             # fused basis|tags word width
    # VMEM budget: each group holds its (rp, bw, B_blk) state + fold
    # intermediates (~2x state) + a (W, mW, B_blk) cols block. Cap the ILP
    # width so interpret-mode tests and big codes stay safe.
    state_mb = rp * bw * B_blk * 4 / 2 ** 20
    G = max(1, min(int(ilp), int(13 // (2.5 * state_mb + 1.0))))

    def _one_step(j, bt, pivots, cnt, cols_ref, sel_ref, iota_r,
                  iota_w32, iota_t):
        """Fold permuted column j into one group's (bt, pivots, cnt).

        State is carried as fori_loop values within a window (per-column
        in-place VMEM-ref updates measured 16.8 vs 12.3 ms/batch) and
        parked in scratch refs across windows."""
        f32 = jnp.float32
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

        # Per-word chains vectorized over the sublane (word) axis.
        nz_w = v != 0                              # (mW, B)
        nonzero = jnp.any(nz_w, axis=0, keepdims=True)        # (1, B)
        cnt_i = cnt.astype(jnp.int32)              # (1, B)
        # lowest set bit position: popcount(low - 1), min over words
        low = v & (u32(0) - v)                     # (mW, B)
        bitpos = jax.lax.population_count(low - u32(1)).astype(jnp.int32)
        cand = jnp.where(nz_w, iota_w32 + bitpos, jnp.int32(1 << 30))
        piv_new = jnp.min(cand, axis=0, keepdims=True)        # (1, B)
        piv_new = jnp.where(nonzero, piv_new, 0)

        cnt_c = jnp.minimum(cnt_i, r - 1)          # (1, B)
        upd = nonzero & (cnt_i < r)
        # self-tag bit e_cnt appended to the new fused row, built as a
        # (rW, B) one-hot via the hoisted word iota (no stack relayout)
        selfbit = (u32(1) << (cnt_c.astype(u32) & u32(31)))   # (1, B)
        onehot = jnp.where((iota_t == (cnt_c >> 5)) & upd,
                           jnp.broadcast_to(selfbit, (rW, B_blk)), u32(0))
        vt_new = jnp.concatenate([v, tx ^ onehot])            # (bw, B)

        # Back-eliminate the new pivot bit from existing fused rows AND
        # insert the new fused row at slot cnt in ONE masked-XOR pass.
        # Rows >= cnt are zero by construction (only this insert ever
        # writes them), so insertion is a XOR, and the two row masks are
        # disjoint (the slot row has pivot=-1, so hb is zero there).
        pvw = jnp.maximum(piv_new, 0) >> 5
        pvs = (jnp.maximum(piv_new, 0) & 31).astype(u32)
        hb = jnp.zeros((rp, B_blk), u32)
        for w in range(mW):
            hb = jnp.where(pvw == w, bt[:, w, :], hb)
        hb = (hb >> pvs) & u32(1)
        hb = jnp.where(valid & upd, hb, u32(0))
        slot = (iota_r == cnt_c) & upd             # (rp, B)
        cm = (u32(0) - hb) | (u32(0) - slot.astype(u32))
        bt = bt ^ (cm[:, None, :] & vt_new[None, :, :])
        pivots = jnp.where(slot, piv_new, pivots)

        sel_ref[pl.ds(j, 1)] = upd.astype(jnp.int32)
        cnt = cnt + upd.astype(f32)
        return bt, pivots, cnt

    def make_kernel(wdim):
      def kernel(*refs):
        # refs: cols x G, cnt0 x G | sel x G, tags x G, piv x G, cnt x G |
        #       bt scratch x G
        cols = refs[0:G]
        cnt0 = refs[G:2 * G]
        sel = refs[2 * G:3 * G]
        tag_o = refs[3 * G:4 * G]
        piv_o = refs[4 * G:5 * G]
        cnt_o = refs[5 * G:6 * G]
        bt_s = refs[6 * G:7 * G]
        w_id = pl.program_id(wdim)

        @pl.when(w_id == 0)
        def _init():
            for g in range(G):
                bt_s[g][...] = jnp.zeros((rp, bw, B_blk), u32)
                piv_o[g][...] = jnp.full((rp, B_blk), -1, jnp.int32)
                cnt_o[g][...] = cnt0[g][...]

        # Skipped-window default; the active path overwrites row by row.
        for g in range(G):
            sel[g][...] = jnp.zeros((W, B_blk), jnp.int32)

        # Loop-invariant constants, hoisted out of the per-column step.
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (rp, B_blk), 0)
        iota_w32 = jax.lax.broadcasted_iota(jnp.int32, (mW, B_blk), 0) * 32
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (rW, B_blk), 0)

        def step(j, state):
            return tuple(
                _one_step(j, *state[g], cols[g], sel[g], iota_r,
                          iota_w32, iota_t)
                for g in range(G))

        live = jnp.any(cnt_o[0][...] < r)
        for g in range(1, G):
            live = live | jnp.any(cnt_o[g][...] < r)

        @pl.when(live)
        def _run():
            state = tuple(
                (bt_s[g][...], piv_o[g][...], cnt_o[g][...])
                for g in range(G))
            state = jax.lax.fori_loop(0, W, step, state)
            for g in range(G):
                bt_s[g][...], piv_o[g][...], cnt_o[g][...] = state[g]

        # Only the tags half of the fused state leaves the kernel (the
        # candidate-solve stage consumes tags/pivots/sel; the basis half
        # is internal).
        @pl.when(w_id == nw - 1)
        def _flush():
            for g in range(G):
                tag_o[g][...] = bt_s[g][:, mW:, :]

      return kernel

    @functools.partial(jax.jit)
    def eliminate(colsP):
        B = colsP.shape[0]
        BG = G * B_blk
        pad = (-B) % BG
        x = jnp.transpose(colsP, (1, 2, 0))            # (n, mW, B)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        if n_pad != n:
            # zero columns are no-ops in the elimination sweep
            x = jnp.pad(x, ((0, n_pad - n), (0, 0), (0, 0)))
        Bp = B + pad

        # Lane-pad slots start at cnt=r (not 0): they never gain pivots, and
        # a 0 would hold the per-window `any(cnt < r)` early exit open
        # forever whenever B % (G * B_blk) != 0.
        cnt0 = jnp.full((1, Bp), float(r), jnp.float32)
        cnt0 = jax.lax.dynamic_update_slice(
            cnt0, jnp.zeros((1, B), jnp.float32), (0, 0))

        # Each ILP group writes its own output arrays (a kernel instance
        # cannot address G lane-blocks of one array through a single
        # BlockSpec); group g of superblock b covers original lanes
        # [b*G*B_blk + g*B_blk, ...). Inputs may be passed G times with
        # per-group index maps (read-only).
        nb = Bp // BG
        nbB = nb * B_blk

        # The engine's hot path has a single lane superblock (window cap =
        # G * B_blk); a 1-D window-only grid measured faster than the same
        # kernel under a (1, nw) grid, so specialize it.
        if nb == 1:
            grid = (nw,)
            wdim = 0
            in_maps = [lambda w, g=g: (w, 0, g) for g in range(G)]
            cn_maps = [lambda w, g=g: (0, g) for g in range(G)]
            sel_map = lambda w: (w, 0)           # noqa: E731
            tag_map = lambda w: (0, 0, 0)        # noqa: E731
            piv_map = lambda w: (0, 0)           # noqa: E731
            cnt_map = lambda w: (0, 0)           # noqa: E731
        else:
            grid = (nb, nw)
            wdim = 1
            in_maps = [lambda b, w, g=g: (w, 0, b * G + g) for g in range(G)]
            cn_maps = [lambda b, w, g=g: (0, b * G + g) for g in range(G)]
            sel_map = lambda b, w: (w, b)        # noqa: E731
            tag_map = lambda b, w: (0, 0, b)     # noqa: E731
            piv_map = lambda b, w: (0, b)        # noqa: E731
            cnt_map = lambda b, w: (0, b)        # noqa: E731

        outs = pl.pallas_call(
            make_kernel(wdim),
            grid=grid,
            in_specs=(
                [pl.BlockSpec((W, mW, B_blk), m) for m in in_maps]
                + [pl.BlockSpec((1, B_blk), m) for m in cn_maps]),
            out_specs=(
                [pl.BlockSpec((W, B_blk), sel_map)] * G
                + [pl.BlockSpec((rp, rW, B_blk), tag_map)] * G
                + [pl.BlockSpec((rp, B_blk), piv_map)] * G
                + [pl.BlockSpec((1, B_blk), cnt_map)] * G),
            out_shape=(
                [jax.ShapeDtypeStruct((n_pad, nbB), jnp.int32)] * G
                + [jax.ShapeDtypeStruct((rp, rW, nbB), u32)] * G
                + [jax.ShapeDtypeStruct((rp, nbB), jnp.int32)] * G
                + [jax.ShapeDtypeStruct((1, nbB), jnp.float32)] * G),
            scratch_shapes=[pltpu.VMEM((rp, bw, B_blk), u32)
                            for _ in range(G)],
            # Derive the scoped-vmem budget from the actual working set
            # (G group states + fold intermediates + cols blocks + margin)
            # instead of a hard-coded constant (r4 ADVICE #2): the default
            # 16 MB undercounts ~1 MB for ilp=2 on lp118-sized states.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(min(
                    100 * 2 ** 20,
                    max(16 * 2 ** 20,
                        G * (4 * rp * bw * B_blk * 4
                             + 2 * W * mW * B_blk * 4) + 8 * 2 ** 20)))),
            interpret=interpret,
        )(*([x] * G + [cnt0] * G))

        def regroup(parts):
            """G arrays (..., nb*B_blk) -> one (..., Bp) in lane order
            (superblock, group, lane)."""
            if G == 1:
                return parts[0]
            shaped = [p.reshape(p.shape[:-1] + (nb, B_blk)) for p in parts]
            return jnp.stack(shaped, axis=-2).reshape(
                parts[0].shape[:-1] + (Bp,))

        sel = regroup(outs[0:G])
        tagw = regroup(outs[G:2 * G])
        piv = regroup(outs[2 * G:3 * G])

        sl = slice(0, B)
        tags = jnp.transpose(tagw[:r], (2, 0, 1))[sl]
        pivots = jnp.transpose(piv[:r], (1, 0))[sl]
        selb = jnp.transpose(sel[:n], (1, 0))[sl].astype(bool)
        return tags, pivots, selb

    return eliminate
