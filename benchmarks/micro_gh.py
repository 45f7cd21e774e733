"""Micro-benchmark: general-H VMEM-resident Pallas kernel vs the XLA
incidence-matmul (mxu) path on a random NON-QC LDPC code (the r4 verdict
ask #4 target: ~240x544, row weight ~8 — the reference's arbitrary-.npy
input mode). Scanned-chunk methodology per docs/PERFORMANCE.md.

Usage: python benchmarks/micro_gh.py [--m 240] [--n 544] [--rw 8]
       [--batch 4096] [--iters 50] [--sched L] [--kind MS] [--p 0.05]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=240)
    ap.add_argument("--n", type=int, default=544)
    ap.add_argument("--rw", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--sched", default="L")
    ap.add_argument("--kind", default="MS")
    ap.add_argument("--p", type=float, default=0.05)
    ap.add_argument("--groups", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--paths", default="gh,mxu")
    ap.add_argument("--bblk", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qldpcsim_tpu.decoders.common import (DecoderConfig, TannerGraph,
                                              build_layers)
    from qldpcsim_tpu.decoders.bp_mxu import make_bp_mxu_decoder
    from qldpcsim_tpu.decoders.ms_mxu import make_ms_mxu_decoder
    from qldpcsim_tpu.ops.general_h_pallas import make_gh_decoder
    from qldpcsim_tpu.ops.qc import detect_qc

    rng = np.random.default_rng(0)
    H = np.zeros((args.m, args.n), np.int8)
    for i in range(args.m):
        H[i, rng.choice(args.n, args.rw, replace=False)] = 1
    assert detect_qc(H) is None, "this bench wants a NON-QC code"
    layers = build_layers(H, args.sched)
    g = TannerGraph.build(H)
    cfg = DecoderConfig(dec_type=args.kind, max_iter=args.iters,
                        schedule=args.sched)
    G = args.groups
    u = rng.random((G, args.batch, args.n))
    err = (u < 2 * args.p / 3).astype(np.int8)
    sy = jnp.asarray(((err @ H.T) % 2).astype(np.float32))
    pr = args.p / 3

    decs = {}
    if "gh" in args.paths:
        decs["gh"] = make_gh_decoder(H, cfg, layers=layers, kind=args.kind,
                                     B_blk=args.bblk)
    if "mxu" in args.paths:
        decs["mxu"] = (make_ms_mxu_decoder if args.kind == "MS"
                       else make_bp_mxu_decoder)(g, cfg, layers=layers)

    runs = {}
    for name, dec in decs.items():
        @jax.jit
        def step(s, dec=dec):
            def body(c, sz):
                r = dec(sz, pr)
                return c + jnp.sum(r.n_iter), None

            tot, _ = jax.lax.scan(body, jnp.int32(0), s)
            return tot

        jax.device_get(step(sy))
        runs[name] = step
    times = {k: [] for k in runs}
    for _ in range(args.reps):
        for name, step in runs.items():
            t0 = time.perf_counter()
            jax.device_get(step(sy))
            times[name].append(time.perf_counter() - t0)
    out = {"code": f"random {args.m}x{args.n} rw{args.rw}",
           "kind": args.kind, "sched": args.sched, "iters": args.iters,
           "p": args.p}
    for name, ts in times.items():
        out[f"{name}_sps"] = round(G * args.batch / min(ts))
    if len(times) == 2:
        out["speedup_gh_vs_mxu"] = round(out["gh_sps"] / out["mxu_sps"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
