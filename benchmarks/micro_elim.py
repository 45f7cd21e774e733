"""Micro-benchmark: the bit-packed GF(2) elimination kernel (OSD stage 2,
ops/gf2_elim_pallas.py) on library-code parity matrices.

Methodology (docs/PERFORMANCE.md "Measurement trap"): this remote-tunnel
backend costs ~3.3 ms per dispatch and `block_until_ready` can return
early, so the bench runs G distinct-permutation batches inside ONE jit
dispatch and forces with `jax.device_get`; reported time is min over reps
divided by G.

Usage: python benchmarks/micro_elim.py [--code lp118_0] [--B 256] [--G 8]
       [--window 128] [--reps 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="lp118_0")
    ap.add_argument("--B", type=int, default=256,
                    help="shots per batch (the engine's OSD window cap)")
    ap.add_argument("--G", type=int, default=8,
                    help="distinct batches fused per dispatch")
    ap.add_argument("--window", type=int, default=128)
    ap.add_argument("--bblk", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--ablate", default="")
    ap.add_argument("--panel", type=int, default=0,
                    help="0 = r4 shot-group-ILP kernel; >0 = panel-ILP "
                         "kernel (ops/gf2_elim_panel_pallas.py) with this "
                         "panel width")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qldpcsim_tpu.codes.library import get_code
    from qldpcsim_tpu.decoders import osd as osd_mod
    from qldpcsim_tpu.ops.gf2_elim_pallas import make_eliminate_pallas
    from qldpcsim_tpu.ops.gf2_elim_panel_pallas import make_eliminate_panel

    H = np.asarray(get_code(args.code).Hz)
    st = osd_mod.OSDStatic.build(H)
    if args.panel:
        elim = make_eliminate_panel(st.n, st.r, st.mW, st.rW,
                                    window=args.window, B_blk=args.bblk,
                                    panel=args.panel, _ablate=args.ablate)
    else:
        elim = make_eliminate_pallas(st.n, st.r, st.mW, st.rW,
                                     window=args.window, B_blk=args.bblk)
    rng = np.random.default_rng(0)
    perms = np.stack([
        [rng.permutation(st.n) for _ in range(args.B)]
        for _ in range(args.G)
    ]).astype(np.int32)
    cols = jnp.asarray(st.cols_packed)[jnp.asarray(perms)]  # (G, B, n, mW)

    @jax.jit
    def run(cols):
        return [elim(cols[g])[1] for g in range(args.G)]    # pivots

    jax.device_get(run(cols))                               # compile + warm
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        jax.device_get(run(cols))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / args.G
    print(f"code={args.code} n={st.n} r={st.r} B={args.B} "
          f"window={args.window}: {per * 1e3:.2f} ms/batch "
          f"({per / args.B * 1e6:.2f} us/lane)")


if __name__ == "__main__":
    main()
