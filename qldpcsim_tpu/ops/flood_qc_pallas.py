"""Pallas TPU kernel: slot-stacked flooding decode over QC codes.

The per-slot QC kernel (ops/ms_qc_pallas.py) issues its check-node
arithmetic one (L, B_blk) tile at a time — ~(16, 128) = 8 vector registers
per op. For MS that is fine (cheap elementwise work), but BP's tanh-product
CN update is TRANSCENDENTAL-bound and the per-op Mosaic overhead on such
small tiles dominates: the r4 verdict measured config 5's BP head at
168 ms of a 348 ms dispatch group.

FLOODING has no intra-iteration data dependence — every block-row updates
from the same posterior snapshot (reference decoders.py:153-177 with one
layer) — so this kernel stacks ALL slots (block-row x in-row-slot edges)
into ONE (S*L, B) array per iteration and runs each transcendental
(tanh, log) ONCE over ~S*L*B elements instead of S times over L*B:

    POS   = concat over slots of roll(post[j], s)       (S data moves)
    V     = POS - C2V                                   (1 op)
    T     = tanh(V/2), sign-floored                     (1 op)   <- was S
    PROD  = clamped product tree over the d slot axis   (log2 d ops)
    NEW   = ss * log((1+PROD/T)/(1-PROD/T))             (3 ops)  <- was 3S
    DELTA scatter-back per var block                    (S data moves)

Per-edge semantics are the per-slot BP kernel's (sign-preserving 1e-12
tanh floor, 1e-30 product clamp against Mosaic's non-flushed denormals,
(1-eps) extrinsic clip, log-form atanh); only the PRODUCT ASSOCIATION
differs (pairwise tree vs running left fold) — the same statistical parity
class as every fast path (DIVERGENCES.md). MS uses the _min12_tree merge,
which reproduces the running reduction's tie semantics exactly.

Requires uniform block-row degree (all library LP/Tanner codes are; the
factory falls back to the per-slot kernel otherwise). Iteration accounting,
freeze-at-convergence and the per-iteration early exit match
ops/ms_qc_pallas.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qldpcsim_tpu.ops.ms_qc_pallas import _BIG, _min12_tree, _roll_up
from qldpcsim_tpu.ops.qc import QCStructure

__all__ = ["make_flood_stacked_kernel", "uniform_degree"]


def uniform_degree(st: QCStructure):
    """The common block-row degree, or None if degrees differ."""
    degs = {len(st.blocks_of_row(i)) for i in range(st.m_b)}
    return degs.pop() if len(degs) == 1 else None


def make_flood_stacked_kernel(st: QCStructure, beta: float, max_iter: int,
                              B_blk: int, kind: str = "BP",
                              eps: float = 1e-6, dtype=jnp.float32):
    """Kernel body with the same ref signature as ms_qc_pallas._make_kernel
    (syn, lch | e_hat, n_iter, converged, posterior)."""
    L, n, m = st.L, st.n, st.m
    blocks = [st.blocks_of_row(i) for i in range(st.m_b)]
    d = uniform_degree(st)
    assert d is not None, "stacked flooding kernel needs uniform degree"
    slots = [bs for i in range(st.m_b) for bs in blocks[i]]   # (j, s) rows
    S = len(slots)
    n_b, m_b = st.n_b, st.m_b
    # column map: var block j -> slot indices touching it (with shifts)
    col_slots = [[] for _ in range(n_b)]
    for k, (j, s) in enumerate(slots):
        col_slots[j].append((k, s))
    ct = dtype
    f32 = jnp.float32

    def _syn_est_rows(e_blocks, i):
        acc = None
        for (j, s) in blocks[i]:
            v = _roll_up(e_blocks[j], s, L)
            acc = v if acc is None else acc + v
        if acc is None:
            return jnp.zeros((L, B_blk), ct)
        return acc - 2.0 * jnp.floor(acc * 0.5)

    def kernel(syn_ref, lch_ref, e_ref, it_ref, conv_ref, post_ref):
        L_ch = lch_ref[0, 0]
        syn = syn_ref[...].astype(ct)                         # (m, B)
        syn_sign = (1.0 - 2.0 * syn).reshape(m_b, 1, L, B_blk)

        def check_all(post_blocks, done, it_lat, it):
            e_blocks = tuple((pb < 0.0).astype(ct) for pb in post_blocks)
            bad = jnp.zeros((1, B_blk), ct)
            for i2 in range(m_b):
                est = _syn_est_rows(e_blocks, i2)
                diff = jnp.abs(est - syn[i2 * L:(i2 + 1) * L])
                bad = bad + jnp.sum(diff, axis=0, keepdims=True)
            ok = (bad == 0.0).astype(f32)
            newly = ok * (1.0 - done)
            it_lat = it_lat + newly * ((it + 1).astype(f32) - it_lat)
            return jnp.maximum(done, ok), it_lat

        def body(carry):
            it, c2v, post_blocks, done, it_lat = carry
            af = (1.0 - done).astype(ct)                      # (1, B)
            # POS: every slot's rolled snapshot, stacked (S, L, B).
            pos = jnp.concatenate(
                [_roll_up(post_blocks[j], s, L) for (j, s) in slots],
                axis=0).reshape(S, L, B_blk)
            V = pos - c2v                                      # (S, L, B)
            if kind == "MS":
                A = jnp.abs(V).reshape(m_b, d, L, B_blk)
                NEG = (V < 0.0).astype(ct).reshape(m_b, d, L, B_blk)
                neg_par = jnp.sum(NEG, axis=1, keepdims=True)
                m1, m2 = _min12_tree(
                    jnp.swapaxes(A, 0, 1), _BIG)               # (m_b, L, B)
                m1 = jnp.where(m1 >= _BIG, 0.0, m1)[:, None]
                m2 = jnp.where(m2 >= _BIG, 0.0, m2)[:, None]
                par = neg_par - 2.0 * jnp.floor(neg_par * 0.5)
                coef = beta * syn_sign * (1.0 - 2.0 * par)     # (m_b,1,L,B)
                mag = jnp.where(A == m1, m2, m1)
                NEW = (coef * (mag - 2.0 * (NEG * mag))).reshape(
                    S, L, B_blk)
            else:
                T = jnp.tanh(V * 0.5)
                T = jnp.where(T < 0.0, -1.0, 1.0) * jnp.maximum(
                    jnp.abs(T), 1e-12)
                P = T.reshape(m_b, d, L, B_blk)
                # clamped product tree (|prod| >= 1e-30: Mosaic does not
                # flush the denormals a chain of 1e-12 floors can reach)
                dd = d
                while dd > 1:
                    h = dd // 2
                    q = P[:, :h] * P[:, h:2 * h]
                    q = jnp.where(q < 0.0, -1.0, 1.0) * jnp.maximum(
                        jnp.abs(q), 1e-30)
                    P = (jnp.concatenate([q, P[:, 2 * h:]], axis=1)
                         if dd % 2 else q)
                    dd = h + (dd % 2)
                clamp = 1.0 - eps
                TH2 = jnp.clip(P / T.reshape(m_b, d, L, B_blk),
                               -clamp, clamp)
                NEW = (syn_sign * jnp.log((1.0 + TH2) / (1.0 - TH2))
                       ).reshape(S, L, B_blk)
            NEW = jnp.where(af > 0.5, NEW, c2v)
            DELTA = NEW - c2v
            c2v = NEW
            post_blocks = list(post_blocks)
            for j in range(n_b):
                acc = None
                for (k, s) in col_slots[j]:
                    r = _roll_up(DELTA[k], (L - s) % L, L)
                    acc = r if acc is None else acc + r
                if acc is not None:
                    post_blocks[j] = post_blocks[j] + acc
            post_blocks = tuple(post_blocks)
            done, it_lat = check_all(post_blocks, done, it_lat, it)
            return it + 1, c2v, post_blocks, done, it_lat

        def cond(carry):
            return (carry[0] < max_iter) & (jnp.min(carry[3]) < 0.5)

        carry = (
            jnp.int32(0),
            jnp.zeros((S, L, B_blk), ct),
            tuple(jnp.full((L, B_blk), L_ch, ct) for _ in range(n_b)),
            jnp.zeros((1, B_blk), f32),
            jnp.full((1, B_blk), float(max_iter), f32),
        )
        _, _, post_blocks, done, it_lat = jax.lax.while_loop(
            cond, body, carry)

        posterior = jnp.concatenate(post_blocks, axis=0).astype(jnp.float32)
        e_ref[...] = (posterior < 0.0).astype(jnp.float32)
        it_ref[...] = it_lat.astype(jnp.int32)
        conv_ref[...] = (done > 0.5).astype(jnp.int32)
        post_ref[...] = posterior

    return kernel
