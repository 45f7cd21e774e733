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
    u = rng.random((args.batch, n))
    err_x = (u < 2 * args.p / 3).astype(np.int8)
    err_z = ((u >= args.p / 3) & (u < args.p)).astype(np.int8)
    sy_z = jnp.asarray((err_x @ Hz.T) % 2)
    sy_x = jnp.asarray((err_z @ Hx.T) % 2)
    pr = args.p / 3

    def step():
        rz = dec_z(sy_z, pr)
        rx = dec_x(sy_x, pr)
        return rz.e_hat, rx.e_hat, rz.n_iter, rx.n_iter

    out = step()
    jax.block_until_ready(out)
    best = 0.0
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = step()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = max(best, args.batch / dt)
    it_z, it_x = np.asarray(out[2]), np.asarray(out[3])
    print(json.dumps({
        "metric": f"qc_decode_only ({args.code} {args.kind} {args.sched} "
                  f"{args.iters}it p={args.p} B={args.batch} blk={args.bblk})",
        "value": round(best, 1),
        "unit": "shots/s",
        "avg_iters_z": round(float(it_z.mean()), 3),
        "avg_iters_x": round(float(it_x.mean()), 3),
    }))


if __name__ == "__main__":
    main()
