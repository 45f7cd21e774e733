"""Pallas TPU kernel: PANEL-ILP batched bit-packed GF(2) elimination.

Drop-in alternative to ops/gf2_elim_pallas.py (same eliminate() contract —
the OSD basis sweep, reference decoders.py:330-355). The r4 kernel's cost
is a LATENCY-bound dependent chain: one column's fold -> pivot-find ->
back-eliminate sequence is ~40 small dependent vector ops, measured
~13-15 us/column regardless of state size (~25-58x off the u32-op floor).
Its ILP came from stepping 2 independent SHOT groups, which doubles VMEM
state.

This kernel gets its ILP from COLUMN PANELS instead, sharing one state:
process P columns per fori_loop step in three phases whose heavy ops are
data-independent across the panel —

  1. FOLD (independent x P): each panel column folds against the CURRENT
     basis. Correct without seeing the panel's earlier insertions because
     the basis is maintained in RREF: the fold masks are the RAW column's
     bits at the existing pivots (rows of an RREF basis are zero at each
     other's pivots), so all P masked XOR-fold trees are independent
     chains the scheduler interleaves.
  2. INTRA-PANEL RREF (sequential, small): column c eliminates the bits it
     holds at the panel's earlier new pivots (<= P-1 XORs of one (bw, B)
     row each), finds its lowest set bit, appends its self-tag, and
     back-eliminates its pivot from the EARLIER panel rows (mutual RREF).
     Equivalent to the sequential sweep: reduction modulo the same row
     space with zeros at all pivot coordinates is unique.
  3. STATE UPDATE (independent x P): because the panel rows are mutually
     RREF, each existing basis row's bits at the P new pivots are
     unchanged by the other panel insertions — all P back-eliminate/insert
     masks are computable up front, and the state update is ONE XOR of a
     P-term masked tree into the fused basis|tags array.

Outputs are BIT-IDENTICAL to the r4 kernel and the XLA sweep (insertion
order is column order, as sequential). Grid-window state persistence,
per-window early exit, popcount bit indexing, fused basis|tags all carry
over from the r4 design. vmem_limit derives from the actual state size
(r4 ADVICE #2) instead of a hard-coded constant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

u32 = jnp.uint32


def make_eliminate_panel(n: int, r: int, mW: int, rW: int,
                         B_blk: int = 128, interpret: bool = False,
                         window: int = 128, panel: int = 4,
                         _ablate: str = ""):
    # _ablate: benchmarking-only knob ("fold" = stop after phase 1,
    # "panel" = stop after phase 2) — outputs are WRONG when set; used by
    # benchmarks/micro_elim.py to attribute kernel time to phases.
    """Build eliminate(colsP (B, n, mW) u32) ->
    (tags (B, r, rW) u32, pivots (B, r) i32, sel (B, n) bool)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = max(1, int(panel))
    W = min(window, max(n, P))
    W = -(-W // P) * P                       # window multiple of the panel
    n_pad = -(-n // W) * W
    nw = n_pad // W
    rp = 1 << max(3, (r - 1).bit_length())   # >= 8 sublanes, power of two
    bw = mW + rW                             # fused basis|tags word width

    f32 = jnp.float32

    def _bit_at_rows(bt_like, piv, n_words):
        """Bit of each (rp, words, B) row at column position piv (rp, B)."""
        pw = jnp.maximum(piv, 0) >> 5
        ps = (jnp.maximum(piv, 0) & 31).astype(u32)
        h = jnp.zeros(bt_like.shape[:1] + bt_like.shape[2:], u32)
        for w in range(n_words):
            h = jnp.where(pw == w, bt_like[:, w, :], h)
        return (h >> ps) & u32(1)

    def _bit_at_row2(vt_words, piv):
        """Bit of ONE (words, B) row at column position piv (1, B) —
        plain static word selects (a [None, :mW, :] newaxis view here
        lowers to an unsupported Mosaic gather)."""
        pw = jnp.maximum(piv, 0) >> 5
        ps = (jnp.maximum(piv, 0) & 31).astype(u32)
        h = jnp.zeros((1, B_blk), u32)
        for w in range(vt_words.shape[0]):
            h = jnp.where(pw == w, vt_words[w][None, :], h)
        return (h >> ps) & u32(1)

    def make_kernel(wdim):
      def kernel(cols_ref, cnt0_ref, sel_ref, tag_ref, piv_ref, cnt_ref,
                 bt_ref):
        w_id = pl.program_id(wdim)

        @pl.when(w_id == 0)
        def _init():
            bt_ref[...] = jnp.zeros((rp, bw, B_blk), u32)
            piv_ref[...] = jnp.full((rp, B_blk), -1, jnp.int32)
            cnt_ref[...] = cnt0_ref[...]

        sel_ref[...] = jnp.zeros((W, B_blk), jnp.int32)

        iota_w32 = jax.lax.broadcasted_iota(jnp.int32, (mW, B_blk), 0) * 32
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (rW, B_blk), 0)

        def make_step(hh):
          iota_r = jax.lax.broadcasted_iota(jnp.int32, (hh, B_blk), 0)

          def step(t, state):
              bt, pivots, cnt = state
              j0 = t * P
              valid = pivots >= 0                              # (rp, B)
              pw = jnp.maximum(pivots, 0) >> 5
              ps = (jnp.maximum(pivots, 0) & 31).astype(u32)

              # ---- phase 1: P independent folds against the current basis.
              # MANUALLY interleaved (levels outer, columns inner): the VPU
              # is in-order and Mosaic emits ops in trace order, so tracing
              # one column's whole dependent chain before the next exposes
              # every op's latency — alternating the chains lets
              # back-to-back independent ops issue (measured: the
              # chain-at-a-time formulation bought only 1.3x at P=8).
              vs = [cols_ref[pl.ds(j0 + c, 1)][0] for c in range(P)]
              hs = [jnp.zeros((hh, B_blk), u32) for _ in range(P)]
              for w in range(mW):
                  for c in range(P):
                      hs[c] = jnp.where(
                          pw == w,
                          jnp.broadcast_to(vs[c][w][None, :], (hh, B_blk)),
                          hs[c])
              for c in range(P):
                  hs[c] = (hs[c] >> ps) & u32(1)
              for c in range(P):
                  hs[c] = jnp.where(valid, hs[c], u32(0))
              xs = [bt & (u32(0) - hs[c])[:, None, :] for c in range(P)]
              pot = hh
              while pot > 1:
                  pot //= 2
                  xs = [x[:pot] ^ x[pot:2 * pot] for x in xs]
              vts = [jnp.concatenate([vs[c] ^ xs[c][0][:mW], xs[c][0][mW:]])
                     for c in range(P)]

              # ---- phase 2: sequential intra-panel RREF + pivot finds
              cnt_i = cnt.astype(jnp.int32)                    # (1, B)
              if _ablate == "fold":
                  acc = vts[0]
                  for c in range(1, P):
                      acc = acc ^ vts[c]
                  bt = bt ^ (acc[None, :, :] & jnp.uint32(1))
                  return bt, pivots, (cnt_i + 1).astype(f32)
              newpiv, upds, slots = [], [], []
              for c in range(P):
                  vt = vts[c]
                  for c2 in range(c):
                      # eliminate earlier panel pivots from this column
                      b = _bit_at_row2(vt[:mW], newpiv[c2])    # (1, B)
                      m = (u32(0) - (b & upds[c2].astype(u32)))
                      vt = vt ^ (m & vts[c2])
                  vb = vt[:mW]
                  nz_w = vb != 0
                  nonzero = jnp.any(nz_w, axis=0, keepdims=True)   # (1, B)
                  low = vb & (u32(0) - vb)
                  bitpos = jax.lax.population_count(
                      low - u32(1)).astype(jnp.int32)
                  cand = jnp.where(nz_w, iota_w32 + bitpos,
                                   jnp.int32(1 << 30))
                  piv_c = jnp.where(nonzero,
                                    jnp.min(cand, axis=0, keepdims=True), 0)
                  upd = nonzero & (cnt_i < r)
                  cnt_c = jnp.minimum(cnt_i, r - 1)
                  selfbit = (u32(1) << (cnt_c.astype(u32) & u32(31)))
                  onehot = jnp.where((iota_t == (cnt_c >> 5)) & upd,
                                     jnp.broadcast_to(selfbit,
                                                      (rW, B_blk)), u32(0))
                  vt = vt ^ jnp.concatenate(
                      [jnp.zeros((mW, B_blk), u32), onehot])
                  # mutual RREF: strip this pivot from EARLIER panel rows
                  for c2 in range(c):
                      b2 = _bit_at_row2(vts[c2][:mW], piv_c)
                      m2 = (u32(0) - (b2 & upd.astype(u32)))
                      vts[c2] = vts[c2] ^ (m2 & vt)
                  vts[c] = vt
                  sel_ref[pl.ds(j0 + c, 1)] = upd.astype(jnp.int32)
                  newpiv.append(piv_c)
                  upds.append(upd)
                  slots.append(cnt_c)
                  cnt_i = cnt_i + upd.astype(jnp.int32)

              # ---- phase 3: one P-term masked-XOR tree into the state.
              # Masks from the PRE-panel bt are exact: mutually-RREF panel
              # rows are zero at each other's pivots, so no insertion
              # changes an existing row's bit at another new pivot.
              if _ablate == "panel":
                  return bt, pivots, cnt_i.astype(f32)
              # (interleaved like phase 1: masks for all P columns built
              # level-by-level so independent ops alternate in trace order)
              pvw = [jnp.maximum(newpiv[c], 0) >> 5 for c in range(P)]
              pvs = [(jnp.maximum(newpiv[c], 0) & 31).astype(u32)
                     for c in range(P)]
              hbs = [jnp.zeros((hh, B_blk), u32) for _ in range(P)]
              for w in range(mW):
                  for c in range(P):
                      hbs[c] = jnp.where(pvw[c] == w, bt[:, w, :], hbs[c])
              cms = []
              for c in range(P):
                  hb = (hbs[c] >> pvs[c]) & u32(1)
                  hb = jnp.where(valid & upds[c], hb, u32(0))
                  slot = (iota_r == slots[c]) & upds[c]        # (rp, B)
                  cms.append((u32(0) - hb) | (u32(0) - slot.astype(u32)))
                  pivots = jnp.where(slot, newpiv[c], pivots)
              terms = [cms[c][:, None, :] & vts[c][None, :, :]
                       for c in range(P)]
              while len(terms) > 1:
                  nxt = [a ^ b for a, b in zip(terms[0::2], terms[1::2])]
                  if len(terms) % 2:
                      nxt.append(terms[-1])
                  terms = nxt
              bt = bt ^ terms[0]
              return bt, pivots, cnt_i.astype(f32)

          return step

        live = jnp.any(cnt_ref[...] < r)

        # STATIC per-window state heights: window w can have inserted at
        # most (w+1)*W pivots by its end, so its elimination only ever
        # touches that many state rows — the fold/back-eliminate passes
        # run on a [0:h] slice of the state with h = pow2ceil((w+1)*W),
        # one traced variant per distinct height, selected by pl.when on
        # the (sequential) window id. Rows >= h are untouched zeros, so
        # results are bit-identical to the full-height sweep.
        classes = []  # (height, first window, last window + 1)
        for w in range(nw):
            h = min(rp, 1 << max(3, (min((w + 1) * W, rp) - 1).bit_length()))
            if classes and classes[-1][0] == h:
                classes[-1] = (h, classes[-1][1], w + 1)
            else:
                classes.append((h, w, w + 1))

        for hh, lo_w, hi_w in classes:
            @pl.when(live & (w_id >= lo_w) & (w_id < hi_w))
            def _run(hh=hh):
                state = (bt_ref[0:hh], piv_ref[0:hh], cnt_ref[...])
                state = jax.lax.fori_loop(0, W // P, make_step(hh), state)
                bt_ref[0:hh], piv_ref[0:hh], cnt_ref[...] = state

        @pl.when(w_id == nw - 1)
        def _flush():
            tag_ref[...] = bt_ref[...][:, mW:, :]

      return kernel

    @functools.partial(jax.jit)
    def eliminate(colsP):
        B = colsP.shape[0]
        pad = (-B) % B_blk
        x = jnp.transpose(colsP, (1, 2, 0))            # (n, mW, B)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        if n_pad != n:
            x = jnp.pad(x, ((0, n_pad - n), (0, 0), (0, 0)))
        Bp = B + pad

        # Lane-pad slots start at cnt=r: they never gain pivots, and a 0
        # would hold the per-window early exit open forever.
        cnt0 = jnp.full((1, Bp), float(r), f32)
        cnt0 = jax.lax.dynamic_update_slice(
            cnt0, jnp.zeros((1, B), f32), (0, 0))

        nb = Bp // B_blk
        outs = pl.pallas_call(
            make_kernel(0 if nb == 1 else 1),
            grid=grid_of(nb),
            in_specs=[
                pl.BlockSpec((W, mW, B_blk), in_map(nb)),
                pl.BlockSpec((1, B_blk), cn_map(nb)),
            ],
            out_specs=[
                pl.BlockSpec((W, B_blk), sel_map(nb)),
                pl.BlockSpec((rp, rW, B_blk), tag_map(nb)),
                pl.BlockSpec((rp, B_blk), piv_map(nb)),
                pl.BlockSpec((1, B_blk), cnt_map(nb)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, Bp), jnp.int32),
                jax.ShapeDtypeStruct((rp, rW, Bp), u32),
                jax.ShapeDtypeStruct((rp, Bp), jnp.int32),
                jax.ShapeDtypeStruct((1, Bp), f32),
            ],
            scratch_shapes=[pltpu.VMEM((rp, bw, B_blk), u32)],
            # VMEM budget from the actual working set (ADVICE #2): the
            # persistent state + P in-flight fold intermediates (~state-
            # sized each at the first tree level) + the (W, mW, B) cols
            # block + pipeline margin.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(min(
                    100 * 2 ** 20,
                    max(16 * 2 ** 20,
                        (3 + P) * rp * bw * B_blk * 4
                        + 2 * W * mW * B_blk * 4 + 4 * 2 ** 20)))),
            interpret=interpret,
        )(x, cnt0)

        sel, tagw, piv, _ = outs
        sl = slice(0, B)
        tags = jnp.transpose(tagw[:r], (2, 0, 1))[sl]
        pivots = jnp.transpose(piv[:r], (1, 0))[sl]
        selb = jnp.transpose(sel[:n], (1, 0))[sl].astype(bool)
        return tags, pivots, selb

    # grid/index-map plumbing (windows as the trailing sequential axis so
    # the state output blocks revisit and persist in VMEM, as in the r4
    # kernel; lane superblocks lead when B > B_blk)
    def grid_of(nb):
        return (nw,) if nb == 1 else (nb, nw)

    def in_map(nb):
        return (lambda w: (w, 0, 0)) if nb == 1 else (
            lambda b, w: (w, 0, b))

    def cn_map(nb):
        return (lambda w: (0, 0)) if nb == 1 else (lambda b, w: (0, b))

    def sel_map(nb):
        return (lambda w: (w, 0)) if nb == 1 else (lambda b, w: (w, b))

    def tag_map(nb):
        return (lambda w: (0, 0, 0)) if nb == 1 else (
            lambda b, w: (0, 0, b))

    def piv_map(nb):
        return (lambda w: (0, 0)) if nb == 1 else (lambda b, w: (0, b))

    def cnt_map(nb):
        return (lambda w: (0, 0)) if nb == 1 else (lambda b, w: (0, b))

    return eliminate
