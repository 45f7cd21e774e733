"""Pallas TPU kernel: normalized min-sum over circulant-lifted (QC) codes.

The flagship decode path (reference hot loop: decoders.py:153-177). Two TPU
facts drive the design:

  * every library LP/Tanner code is circulant-lifted (ops/qc.py), so the
    check<->variable edge maps of one block-row are STATIC CYCLIC ROLLS of
    the L-row variable blocks — message passing needs no gathers and no
    incidence matmuls, only VPU shifts and elementwise min/sign work;
  * one shot-block's full decoder state (c2v: (E_b*L, B), posterior: (n, B))
    fits in VMEM, so the entire iteration loop runs inside one kernel with
    ZERO HBM traffic between layers/iterations — the XLA formulation
    (decoders/ms_mxu.py) re-materializes ~25 MB of state through HBM per
    layer instead.

Semantics match the reference min-sum exactly at the same granularity as the
mxu path: beta normalization, value-equality min/min2 with first-argmin
extrinsics, sign(0)=+1, syndrome sign folding, per-layer early exit with
reference iteration accounting (layered schedule == block-rows; flooding ==
one snapshot pass over all block-rows). Converged shots freeze (their deltas
are masked), so the final posterior sign vector is each shot's
at-convergence estimate — like the reference's immediate return. The
incremental posterior means fp association differs from the reference's
full re-sum: statistical parity class, like every fast path
(DIVERGENCES.md); the edge layout stays the bit-exact oracle.
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
from qldpcsim_tpu.ops.qc import QCStructure, block_groups_of_layers

_PRIOR_EPS = 1e-9
_BIG = 1e30  # stand-in for +inf in min reductions (inf-inf arithmetic safe)


def _roll_up(x, s: int, L: int):
    """Cyclic roll of an (L, B) block: out[r] = x[(r + s) % L].

    Static-slice concatenate, deliberately: `pltpu.roll` measured ~1.4x
    SLOWER end-to-end on this kernel (v5e, LP118 flagship micro: 730k vs
    1046k shots/s) — Mosaic lowers the concat of two static sublane slices
    better than the generic rotate for these (L<=32, B=128) tiles."""
    if s % L == 0:
        return x
    s = s % L
    return jnp.concatenate([x[s:], x[:s]], axis=0)


def _min12_merge(a1, a2, b1, b2):
    """Merge two (min1, min2) pairs with the sequential loop's tie
    semantics: on a1 == b1 the result is (a1, min(a2, b1)) — both equal
    minima end up as (v, v), so the value-equality extrinsic rule
    (mag = m2 where a == m1) sees the same numbers as the running
    reduction."""
    take_a = a1 <= b1
    m1 = jnp.where(take_a, a1, b1)
    m2 = jnp.where(take_a, jnp.minimum(a2, b1), jnp.minimum(b2, a1))
    return m1, m2


def _min12_tree(A, big):
    """(min1, min2) over axis 0 of A ((d, L, B)) via a pairwise merge tree —
    O(log d) full-array ops instead of d sequential small ops."""
    d = A.shape[0]
    m1 = A
    m2 = jnp.full_like(A, big)
    while d > 1:
        half = d // 2
        a1, a2 = m1[:half], m2[:half]
        b1, b2 = m1[half:2 * half], m2[half:2 * half]
        n1, n2 = _min12_merge(a1, a2, b1, b2)
        if d % 2:
            n1 = jnp.concatenate([n1, m1[2 * half:]], axis=0)
            n2 = jnp.concatenate([n2, m2[2 * half:]], axis=0)
            half += 1
        m1, m2 = n1, n2
        d = half
    return m1[0], m2[0]


def _make_kernel(st: QCStructure, layer_groups, beta: float, max_iter: int,
                 B_blk: int, kind: str = "MS", eps: float = 1e-6,
                 check_every: str = "iter", dtype=jnp.float32,
                 vectorized: bool = False):
    L, n, m = st.L, st.n, st.m
    blocks = [st.blocks_of_row(i) for i in range(st.m_b)]
    n_b = st.n_b
    # column map: var block j -> [(block-row i2, shift s2), ...]
    col_map = [[] for _ in range(n_b)]
    for i2 in range(st.m_b):
        for (j2, s2) in blocks[i2]:
            col_map[j2].append((i2, s2))
    # Convergence-check granularity. The reference exits after EVERY layer
    # (decoders.py:174-176). check_every="layer" reproduces that granularity
    # by carrying the mismatch blocks mis_i = (H e XOR syn) and XORing into
    # them only the bits each layer flips (col-weight rolls per touched var
    # block) — still ~3x the message-update roll count. check_every="iter"
    # (default) checks once per iteration via a full recompute (+~50% rolls):
    # the REPORTED iteration count is identical for shots that converge and
    # stay converged within the iteration (the reference counts whole
    # iterations), and the rare shot whose mid-iteration match is broken by
    # a later layer of the same iteration lands in the statistical parity
    # class like every fast-path divergence (DIVERGENCES.md).
    track_mis = len(layer_groups) > 1 and check_every == "layer"

    # Message/posterior state dtype `ct`. f32 is the validated default; bf16
    # (QLDPC_QC_DTYPE=bf16) halves VMEM traffic for the carried state. All
    # integer-valued arithmetic (0/1 sums < 256, sign parities, mod-2 floor
    # tricks) is exact in bf16; message magnitudes round to 8 mantissa bits
    # and the incrementally-updated posterior accumulates rounding drift —
    # statistical parity class (validated by A/B qBLER, DIVERGENCES.md).
    # done/it_lat masks and iteration counters stay f32: sub-tile (1, B)
    # bf16 while-carries fail Mosaic layout legalization.
    ct = dtype
    f32 = jnp.float32

    # All state lives in PYTREES of per-block (L, B_blk) arrays: every block
    # index is a static Python int, so the whole loop lowers to Mosaic with
    # no dynamic_slice/dynamic_update_slice (unsupported in TC kernels).
    def _syn_est_rows(e_blocks, i):
        """H e (mod 2) restricted to block-row i. e_blocks: n_b x (L, B)."""
        acc = None
        for (j, s) in blocks[i]:
            v = _roll_up(e_blocks[j], s, L)
            acc = v if acc is None else acc + v
        if acc is None:
            return jnp.zeros((L, B_blk), ct)
        # sum of 0/1 over <= dmax blocks; mod 2 via floor trick on small ints
        return acc - 2.0 * jnp.floor(acc * 0.5)

    def kernel(syn_ref, lch_ref, e_ref, it_ref, conv_ref, post_ref):
        L_ch = lch_ref[0, 0]
        syn = syn_ref[...].astype(ct)                        # (m, B)
        syn_sign = 1.0 - 2.0 * syn

        def check_all(post_blocks, done, it_lat, it):
            e_blocks = tuple((pb < 0.0).astype(ct) for pb in post_blocks)
            bad = jnp.zeros((1, B_blk), ct)
            for i2 in range(st.m_b):
                est = _syn_est_rows(e_blocks, i2)
                diff = jnp.abs(est - syn[i2 * L:(i2 + 1) * L])
                bad = bad + jnp.sum(diff, axis=0, keepdims=True)
            # done/it_lat are carried as f32 (no i1/i32 in the while carry:
            # Mosaic fails to legalize replicated-layout mask yields)
            ok = (bad == 0.0).astype(f32)                    # (1, B) 0/1
            newly = ok * (1.0 - done)
            it_lat = it_lat + newly * ((it + 1).astype(f32) - it_lat)
            return jnp.maximum(done, ok), it_lat

        def one_block_row(i, c2v, post_blocks, snapshot, active_f, mis):
            """CN update of block-row i against `snapshot`, applying deltas
            to `post_blocks` (and flipped bits into `mis` when tracked).
            active_f: (1, B) 0/1 freeze mask."""
            bl = blocks[i]
            row = list(c2v[i])                               # slot -> (L, B)
            ss = syn_sign[i * L:(i + 1) * L]                 # (L, B)
            # pass 1: v2c per slot; running row reduction. For MS the slot
            # cache keeps (|v|, neg) instead of v — pass 2 needs only the
            # magnitude (for the value-equality min test) and the sign, so
            # caching them here saves an abs + compare + sign-build per slot
            # in pass 2 (measured on the r4 bookkeeping hunt).
            v2cs = []
            if kind == "MS":
                m1 = jnp.full((L, B_blk), _BIG, ct)
                m2 = jnp.full((L, B_blk), _BIG, ct)
                neg_par = jnp.zeros((L, B_blk), ct)
            else:
                prod = jnp.ones((L, B_blk), ct)
            for d, (j, s) in enumerate(bl):
                pos_r = _roll_up(snapshot[j], s, L)
                v = pos_r - row[d]
                if kind == "MS":
                    a = jnp.abs(v)
                    neg = (v < 0.0).astype(ct)
                    v2cs.append((a, neg))
                    neg_par = neg_par + neg
                    is_new_min = a < m1
                    m2 = jnp.where(is_new_min, m1, jnp.minimum(m2, a))
                    m1 = jnp.where(is_new_min, a, m1)
                else:
                    # tanh-product with sign-preserving magnitude floor
                    t = jnp.tanh(v * 0.5)
                    t_sgn = jnp.where(t < 0.0, -1.0, 1.0)
                    t = t_sgn * jnp.maximum(jnp.abs(t), 1e-12)
                    v2cs.append(t)
                    # keep |prod| >= 1e-30: a chain of <=dmax floors at
                    # 1e-12 can underflow into f32 denormals, which Mosaic
                    # does not flush — denormal arithmetic microtraps
                    # dominate the kernel. Clamped extrinsics are ~0 anyway.
                    prod = prod * t
                    prod = jnp.where(prod < 0.0, -1.0, 1.0) * jnp.maximum(
                        jnp.abs(prod), 1e-30)
            if kind == "MS":
                m1 = jnp.where(m1 >= _BIG, 0.0, m1)
                m2 = jnp.where(m2 >= _BIG, 0.0, m2)
                par = neg_par - 2.0 * jnp.floor(neg_par * 0.5)   # parity 0/1
                prod_sign = 1.0 - 2.0 * par
                coef = beta * ss * prod_sign                     # (L, B)
            else:
                clamp = 1.0 - eps
            # pass 2: extrinsic messages + state writeback. Frozen lanes keep
            # their row value via a broadcast select (cheaper than the
            # delta*mask formulation, and writes the extrinsic EXACTLY
            # instead of row + fl(new - row)).
            post_blocks = list(post_blocks)
            mis = list(mis)
            af_on = active_f > 0.5                           # (1, B) mask
            for d, (j, s) in enumerate(bl):
                if kind == "MS":
                    a, neg = v2cs[d]
                    mag = jnp.where(a == m1, m2, m1)
                    # signed magnitude from the cached 0/1 sign bit:
                    # mag - 2*neg*mag == +/-mag exactly (sign(0)=+1 kept)
                    new_c2v = coef * (mag - 2.0 * (neg * mag))
                else:
                    t = v2cs[d]
                    th2 = jnp.clip(prod / t, -clamp, clamp)
                    # arctanh via log ((1+x)/(1-x)) — no Mosaic atanh lowering
                    new_c2v = ss * jnp.log((1.0 + th2) / (1.0 - th2))
                new_row = jnp.where(af_on, new_c2v, row[d])
                delta = new_row - row[d]
                row[d] = new_row
                back = _roll_up(delta, (L - s) % L, L)
                if track_mis:
                    old_neg = (post_blocks[j] < 0.0).astype(ct)
                    post_blocks[j] = post_blocks[j] + back
                    new_neg = (post_blocks[j] < 0.0).astype(ct)
                    flip = old_neg + new_neg - 2.0 * old_neg * new_neg
                    for (i2, s2) in col_map[j]:
                        r = _roll_up(flip, s2, L)
                        mis[i2] = mis[i2] + r * (1.0 - 2.0 * mis[i2])
                else:
                    post_blocks[j] = post_blocks[j] + back
            c2v = c2v[:i] + (tuple(row),) + c2v[i + 1:]
            return c2v, tuple(post_blocks), tuple(mis)

        def one_block_row_vec(i, c2v, post_blocks, snapshot, active_f, mis):
            """MS check-node update of block-row i with the edge slots
            STACKED into (d, L, B) arrays: the running min/min2/sign
            reduction becomes a pairwise merge tree and every elementwise
            op covers all d slots at once — O(log d) full-size ops instead
            of O(d) small ones (the per-op Mosaic overhead on (L, B) tiles
            dominated the loop formulation). Bit-identical values: the
            merge tree reproduces the sequential value-equality tie
            semantics (_min12_merge), and the roll/writeback order is
            unchanged."""
            bl = blocks[i]
            af = active_f.astype(ct)
            ss = syn_sign[i * L:(i + 1) * L]                  # (L, B)
            R = jnp.stack(list(c2v[i]))                       # (d, L, B)
            pos = jnp.stack([_roll_up(snapshot[j], s, L) for (j, s) in bl])
            V = pos - R
            A = jnp.abs(V)
            NEG = (V < 0.0).astype(ct)
            neg_par = jnp.sum(NEG, axis=0)                    # (L, B)
            m1, m2 = _min12_tree(A, _BIG)                     # (L, B) each
            m1c = jnp.where(m1 >= _BIG, 0.0, m1)
            m2c = jnp.where(m2 >= _BIG, 0.0, m2)
            par = neg_par - 2.0 * jnp.floor(neg_par * 0.5)
            coef = beta * ss * (1.0 - 2.0 * par)              # (L, B)
            sign = 1.0 - 2.0 * NEG                            # (d, L, B)
            mag = jnp.where(A == m1c[None], m2c[None], m1c[None])
            new_c2v = coef[None] * sign * mag
            DELTA = (new_c2v - R) * af[None]
            R = R + DELTA
            c2v = c2v[:i] + (tuple(R[k] for k in range(len(bl))),) + c2v[i + 1:]
            post_blocks = list(post_blocks)
            for k, (j, s) in enumerate(bl):
                post_blocks[j] = post_blocks[j] + _roll_up(
                    DELTA[k], (L - s) % L, L)
            return c2v, tuple(post_blocks), mis

        def check_mis(mis, done, it_lat, it):
            bad = jnp.zeros((1, B_blk), ct)
            for i2 in range(st.m_b):
                bad = bad + jnp.sum(mis[i2], axis=0, keepdims=True)
            ok = (bad == 0.0).astype(f32)
            newly = ok * (1.0 - done)
            it_lat = it_lat + newly * ((it + 1).astype(f32) - it_lat)
            return jnp.maximum(done, ok), it_lat

        row_update = (one_block_row_vec
                      if (vectorized and kind == "MS" and not track_mis)
                      else one_block_row)

        def body(carry):
            it, c2v, post_blocks, done, it_lat, mis = carry
            per_layer = track_mis or len(layer_groups) == 1
            active_f = 1.0 - done
            for group in layer_groups:
                if per_layer:
                    active_f = 1.0 - done
                snapshot = post_blocks
                for i in group:
                    c2v, post_blocks, mis = row_update(
                        i, c2v, post_blocks, snapshot, active_f, mis)
                if track_mis:
                    done, it_lat = check_mis(mis, done, it_lat, it)
                elif per_layer:
                    done, it_lat = check_all(post_blocks, done, it_lat, it)
            if not per_layer:  # check_every="iter": one check per iteration
                done, it_lat = check_all(post_blocks, done, it_lat, it)
            return it + 1, c2v, post_blocks, done, it_lat, mis

        def cond(carry):
            return (carry[0] < max_iter) & (jnp.min(carry[3]) < 0.5)

        carry = (
            jnp.int32(0),
            tuple(tuple(jnp.zeros((L, B_blk), ct) for _ in blocks[i])
                  for i in range(st.m_b)),
            tuple(jnp.full((L, B_blk), L_ch, ct) for _ in range(n_b)),
            jnp.zeros((1, B_blk), f32),
            jnp.full((1, B_blk), float(max_iter), f32),
            # mismatch blocks: initial estimate is e=0 (L_ch>0) => mis = syn
            tuple(syn[i * L:(i + 1) * L] for i in range(st.m_b))
            if track_mis else (),
        )
        _, _, post_blocks, done, it_lat, _ = jax.lax.while_loop(
            cond, body, carry)

        posterior = jnp.concatenate(post_blocks, axis=0).astype(jnp.float32)
        e_ref[...] = (posterior < 0.0).astype(jnp.float32)
        it_ref[...] = it_lat.astype(jnp.int32)
        conv_ref[...] = (done > 0.5).astype(jnp.int32)
        post_ref[...] = posterior

    return kernel


def make_qc_decoder(st: QCStructure, cfg: DecoderConfig,
                    layers: Optional[LayerSchedule] = None,
                    B_blk: Optional[int] = None, interpret: bool = False,
                    kind: str = "MS"):
    """Build decode(syndromes, p) -> DecodeResult running the Pallas QC
    kernel (kind 'MS' = normalized min-sum, 'BP' = tanh-product sum-product).
    Schedule: 'F' (flooding: one snapshot pass over all block-rows per
    early-exit check) or block-row-aligned layered ('L')."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if B_blk is None:
        import os

        B_blk = int(os.environ.get("QLDPC_QC_BBLK", "128"))
    sched = cfg.schedule.upper()
    if sched == "F":
        layer_groups = [list(range(st.m_b))]
    elif sched == "L":
        if layers is None:
            layer_groups = [[i] for i in range(st.m_b)]
        else:
            layer_groups = block_groups_of_layers(layers, st)
            assert layer_groups is not None, \
                "QC kernel requires block-row-aligned layers"
    else:
        raise ValueError("QC kernel supports schedules F and L")

    n, m = st.n, st.m
    import os

    dtype = (jnp.bfloat16 if os.environ.get("QLDPC_QC_DTYPE") == "bf16"
             else jnp.float32)
    # Stacked (d, L, B) check-node update — measured NEGATIVE on v5e
    # (flagship 4.52M vs 4.85M shots/s: the stack/concat relayouts cost
    # more than the per-op overhead they save), kept opt-in for other
    # targets (QLDPC_QC_VEC=1; MS flooding/iter-check only).
    vectorized = os.environ.get("QLDPC_QC_VEC", "0") == "1"
    # Slot-stacked FLOODING kernel (ops/flood_qc_pallas.py): every
    # transcendental runs once over all S slots instead of per slot.
    # Measured NEGATIVE on v5e (config-5 micro, LP118 BP-F-30 p=0.03:
    # 3.38 vs 2.73 ms/chunk decode-only — the 4D reshape/relayouts and
    # slot concats cost more than the per-op overhead they save, the same
    # lesson as the r3 per-row stacking). OPT-IN via QLDPC_QC_STACKED=1
    # for targets with cheaper relayouts; values agree with the per-slot
    # kernel (MS bit-exact, BP same statistical class).
    use_stacked = (sched == "F"
                   and getattr(cfg, "qc_check_every", "iter") == "iter"
                   and os.environ.get("QLDPC_QC_STACKED") == "1")
    if use_stacked:
        from qldpcsim_tpu.ops.flood_qc_pallas import (
            make_flood_stacked_kernel, uniform_degree)

        use_stacked = uniform_degree(st) is not None
    if use_stacked:
        kernel = make_flood_stacked_kernel(
            st, float(cfg.beta), int(cfg.max_iter), B_blk,
            kind=kind.upper(), eps=float(cfg.eps), dtype=dtype)
    else:
        kernel = _make_kernel(st, layer_groups, float(cfg.beta),
                              int(cfg.max_iter), B_blk, kind=kind.upper(),
                              eps=float(cfg.eps),
                              check_every=getattr(cfg, "qc_check_every",
                                                  "iter"),
                              dtype=dtype, vectorized=vectorized)

    @functools.partial(jax.jit, static_argnames=())
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
            interpret=interpret,
        )(syn_T, lch)

    def decode(syndromes, p):
        B = syndromes.shape[0]
        pad = (-B) % B_blk
        syn_T = jnp.asarray(syndromes).astype(jnp.float32).T    # (m, B)
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


def make_ms_qc_decoder(st, cfg, layers=None, B_blk=128, interpret=False):
    return make_qc_decoder(st, cfg, layers=layers, B_blk=B_blk,
                           interpret=interpret, kind="MS")


def make_bp_qc_decoder(st, cfg, layers=None, B_blk=128, interpret=False):
    return make_qc_decoder(st, cfg, layers=layers, B_blk=B_blk,
                           interpret=interpret, kind="BP")
