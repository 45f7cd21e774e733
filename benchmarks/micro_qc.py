"""Decode-only microbenchmark of the Pallas QC kernel (flagship config).

Usage: python benchmarks/micro_qc.py [--code lp118_0] [--batch 4096]
       [--iters 50] [--sched L] [--kind MS] [--p 0.05] [--bblk 128]
Prints one JSON line with decode-only shots/s (X+Z decode counted as one
shot, like the engine).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qldpcsim_tpu.codes import get_code
from qldpcsim_tpu.decoders.common import DecoderConfig, build_layers
from qldpcsim_tpu.ops.ms_qc_pallas import make_qc_decoder
from qldpcsim_tpu.ops.qc import detect_qc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="lp118_0")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--sched", default="L")
    ap.add_argument("--kind", default="MS")
    ap.add_argument("--p", type=float, default=0.05)
    ap.add_argument("--bblk", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--groups", type=int, default=32,
                    help="chunks fused per dispatch (lax.scan)")
    args = ap.parse_args()

    code = get_code(args.code)
    Hx, Hz = np.asarray(code.Hx), np.asarray(code.Hz)
    cfg = DecoderConfig(max_iter=args.iters, schedule=args.sched)
    stz = detect_qc(Hz)
    stx = detect_qc(Hx)
    lz = build_layers(Hz, args.sched) if args.sched == "L" else None
    lx = build_layers(Hx, args.sched) if args.sched == "L" else None
    dec_z = make_qc_decoder(stz, cfg, layers=lz, B_blk=args.bblk,
                            kind=args.kind)
    dec_x = make_qc_decoder(stx, cfg, layers=lx, B_blk=args.bblk,
                            kind=args.kind)

    rng = np.random.default_rng(0)
    n = Hx.shape[1]
    G = args.groups
    u = rng.random((G, args.batch, n))
    err_x = (u < 2 * args.p / 3).astype(np.int8)
    err_z = ((u >= args.p / 3) & (u < args.p)).astype(np.int8)
    # G distinct syndrome chunks: scanning the SAME input would let XLA
    # hoist the whole decode out of the scan and measure one evaluation
    # (docs/PERFORMANCE.md measurement notes).
    sy_z = jnp.asarray((err_x @ Hz.T) % 2)            # (G, B, m)
    sy_x = jnp.asarray((err_z @ Hx.T) % 2)
    pr = args.p / 3

    @jax.jit
    def step(syz, syx):
        # G chunks fused in one dispatch (like the engine's dispatch
        # groups): a single-chunk call is ~3.3 ms dispatch-latency-bound
        # through the tunnel and cannot resolve kernel-level deltas.
        def body(c, xs):
            sz, sx = xs
            rz = dec_z(sz, pr)
            rx = dec_x(sx, pr)
            return c + jnp.sum(rz.n_iter) + jnp.sum(rx.n_iter), None

        tot, _ = jax.lax.scan(body, jnp.int32(0), (syz, syx))
        return tot

    # Force with device_get, not block_until_ready: the latter can return
    # before execution finishes on the axon remote backend.
    tot = jax.device_get(step(sy_z, sy_x))
    best = 0.0
    for _ in range(args.reps):
        t0 = time.perf_counter()
        tot = jax.device_get(step(sy_z, sy_x))
        dt = time.perf_counter() - t0
        best = max(best, G * args.batch / dt)
    avg_it = float(tot) / (2 * G * args.batch)
    print(json.dumps({
        "metric": f"qc_decode_only ({args.code} {args.kind} {args.sched} "
                  f"{args.iters}it p={args.p} B={args.batch} blk={args.bblk} "
                  f"G={G})",
        "value": round(best, 1),
        "unit": "shots/s",
        "avg_iters": round(avg_it, 3),
        "iter_checksum": int(tot),
    }))


if __name__ == "__main__":
    main()
