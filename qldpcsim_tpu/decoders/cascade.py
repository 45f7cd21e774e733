"""Cascaded straggler compaction for iterative decoders.

Problem: a batched lax.while_loop runs until ALL shots converge, so at
realistic p a handful of hard shots drag the whole batch through max_iter
iterations (the reference exits per shot, simulator.py:244 + decoders.py:175).

Solution (in-jit, shard_map-safe): decode the full batch with a shallow
iteration cap; the unconverged tail — typically a few percent — is compacted
into a fixed-capacity prefix via a stable argsort and re-decoded from scratch
at the next stage's deeper cap, recursively. MS/BP are deterministic functions
of the syndrome, so a from-scratch re-decode reproduces the continued
trajectory exactly: results, posteriors and iteration counts are bit-identical
to a single full-depth decode (tested in tests/test_tworound.py).

Each stage is guarded by a lax.cond: if more shots fail than the next stage's
capacity, the CURRENT active set is re-decoded at full depth instead — so
correctness never depends on the failure rate, only throughput does. No
collectives run inside the branches, so the conds are safe under shard_map.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from qldpcsim_tpu.decoders.common import DecodeResult

import os

# Difficulty-ordered refinement buffers (see the compaction key comment in
# make_cascade). Default on: the ordering rides the gather the cascade
# already pays. QLDPC_CASCADE_ORDER=0 restores pure lane-ascending
# compaction (counters are bit-exact either way).
_ORDER_BY_WEIGHT = os.environ.get("QLDPC_CASCADE_ORDER", "1") != "0"


def default_stages(max_iter: int, batch_hint: int = 4096) -> List[Tuple[int, float]]:
    """Stage plan (iters, capacity fraction of the original batch). Tuned on
    v5e for LP-code MS-layered workloads: a 4-iteration full-batch sweep
    converges the bulk of shots; shrinking refinement stages soak up the
    tail. Measured convergence CDF on the flagship (LP118_0, p=0.05):
    7.0% of shots unconverged after 4 iterations (fits the 1/8 stage),
    1.7% after 10 (fits the 1/32 stage) — stage-2 cap 12 -> 10 measured
    +2% full-pipeline; deeper caps only move work between stages. The
    per-stage lax.cond guard re-decodes at full depth whenever a tail
    overflows its stage, so these numbers only tune throughput, never
    correctness."""
    if max_iter <= 12:
        return [(max_iter, 1.0)]
    stages = [(4, 1.0)]
    if max_iter > 24:
        stages.append((10, 1.0 / 8.0))
        stages.append((max_iter, 1.0 / 32.0))
    else:
        stages.append((max_iter, 1.0 / 8.0))
    return stages


def make_cascade(decoder_factory, graph, cfg, layers,
                 stages: Optional[List[Tuple[int, float]]] = None):
    """Wrap decoder_factory(graph, cfg, layers) with cascaded compaction.

    stages: [(iters, cap_frac), ...]; the first stage runs on the full batch
    (its cap_frac is ignored), the last stage must use cfg.max_iter.
    """
    if stages is None:
        stages = default_stages(cfg.max_iter)
    assert stages[-1][0] == cfg.max_iter
    if len(stages) == 1:
        return decoder_factory(graph, cfg, layers=layers)

    decs = [decoder_factory(graph, dataclasses.replace(cfg, max_iter=it),
                            layers=layers) for it, _ in stages]
    dec_full = decs[-1]

    def decode(syndromes, p):
        B = syndromes.shape[0]
        syn = jnp.asarray(syndromes)

        def refine(level, syn_cur, res):
            """Refine the unconverged tail of `res` (results for syn_cur)
            using stages[level:]. Returns a result tuple."""
            if level == len(stages):
                return res
            iters_k, frac_k = stages[level]
            cap = min(syn_cur.shape[0], max(64, int(B * frac_k)))
            e, it, conv, post = res
            n_failed = jnp.sum(~conv)

            def fast(_):
                # Compaction key: failed lanes first; among them, order by
                # syndrome weight so the refinement buffer's 128-lane
                # blocks hold stragglers of similar depth (the buffer
                # gather/scatter is paid either way, so difficulty
                # ordering here is free — unlike whole-chunk sorting,
                # which measured an 18% permute tax,
                # docs/PERFORMANCE.md). Any order is counter-bit-exact:
                # per-shot decodes are lane-independent.
                if _ORDER_BY_WEIGHT:
                    key = jnp.where(conv, jnp.float32(1e9),
                                    jnp.sum(syn_cur, axis=1,
                                            dtype=jnp.float32))
                    order = jnp.argsort(key, stable=True)[:cap]
                else:
                    order = jnp.argsort(conv, stable=True)[:cap]
                sub_syn = syn_cur[order]
                r = decs[level](sub_syn, p)
                sub = refine(level + 1, sub_syn,
                             (r.e_hat, r.n_iter, r.converged, r.posterior))
                se, sit, sconv, spost = sub
                return (
                    e.at[order].set(se),
                    it.at[order].set(sit),
                    conv.at[order].set(sconv),
                    post.at[order].set(spost) if post is not None else None,
                )

            def slow(_):
                r = dec_full(syn_cur, p)
                return (r.e_hat, r.n_iter, r.converged, r.posterior)

            return jax.lax.cond(n_failed <= cap, fast, slow, None)

        r0 = decs[0](syn, p)
        e, it, conv, post = refine(1, syn,
                                   (r0.e_hat, r0.n_iter, r0.converged, r0.posterior))
        return DecodeResult(e_hat=e, n_iter=it, converged=conv, posterior=post)

    return decode


def make_tworound(decoder_factory, graph, cfg, layers, round1_iters: int,
                  cap_frac: float = 0.125):
    """Two-stage special case (kept for explicit round1_iters configs)."""
    if round1_iters >= cfg.max_iter:
        return decoder_factory(graph, cfg, layers=layers)
    return make_cascade(decoder_factory, graph, cfg, layers,
                        stages=[(round1_iters, 1.0), (cfg.max_iter, cap_frac)])
