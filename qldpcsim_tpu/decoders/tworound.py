"""Two-round straggler compaction for iterative decoders.

Problem: a batched lax.while_loop runs until ALL shots converge, so at
realistic p a handful of hard shots drag the whole batch through max_iter
iterations (the reference exits per shot, simulator.py:244 + decoders.py:175).

Solution (in-jit, shard_map-safe): round 1 decodes the full batch with a small
iteration cap; round 2 re-decodes only the unconverged shots — compacted into
a fixed-capacity prefix via a stable argsort — from scratch with the full cap.
MS/BP are deterministic functions of the syndrome, so a from-scratch re-decode
reproduces the continued trajectory exactly: results and iteration counts are
bit-identical to a single full-depth decode (tested in test_decoders.py).
A lax.cond falls back to the full-batch slow path when more than `cap` shots
fail round 1, so correctness never depends on the failure rate. No collectives
run inside either branch, so the cond is safe under shard_map.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from qldpcsim_tpu.decoders.common import DecodeResult


def make_tworound(decoder_factory, graph, cfg, layers, round1_iters: int,
                  cap_frac: float = 0.125):
    """Wrap decoder_factory(graph, cfg, layers) with two-round compaction."""
    if round1_iters >= cfg.max_iter:
        return decoder_factory(graph, cfg, layers=layers)

    cfg_fast = dataclasses.replace(cfg, max_iter=round1_iters)
    dec_fast = decoder_factory(graph, cfg_fast, layers=layers)
    dec_full = decoder_factory(graph, cfg, layers=layers)

    def decode(syndromes, p):
        B = syndromes.shape[0]
        cap = max(64, int(B * cap_frac))
        cap = min(cap, B)
        res1 = dec_fast(syndromes, p)
        n_failed = jnp.sum(~res1.converged)

        def fast_path(_):
            # Stable sort puts failed (False) shots first; converged padding
            # shots re-decode to identical results, so no masking needed.
            order = jnp.argsort(res1.converged, stable=True)[:cap]
            sub = dec_full(jnp.asarray(syndromes)[order], p)
            e = res1.e_hat.at[order].set(sub.e_hat)
            it = res1.n_iter.at[order].set(sub.n_iter)
            conv = res1.converged.at[order].set(sub.converged)
            post = (res1.posterior.at[order].set(sub.posterior)
                    if res1.posterior is not None else None)
            return e, it, conv, post

        def slow_path(_):
            res = dec_full(syndromes, p)
            return res.e_hat, res.n_iter, res.converged, res.posterior

        e, it, conv, post = jax.lax.cond(n_failed <= cap, fast_path, slow_path,
                                         None)
        return DecodeResult(e_hat=e, n_iter=it, converged=conv, posterior=post)

    return decode
