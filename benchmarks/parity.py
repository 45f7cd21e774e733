"""Statistical qBLER parity harness: this framework vs reference semantics.

The accuracy bar (BASELINE.md) is "qBLER curves match the reference within
Monte-Carlo confidence bounds". The reference itself is not runnable here (no
stim), so the comparison target is the per-shot NumPy oracle
(tests/oracle.py), which implements the reference's exact decoder semantics
(decoders.py:110-290) with an independently sampled channel at the reference's
marginals (DEPOLARIZE1(p): X/Y/Z each w.p. p/3 => errX marginal 2p/3,
errX&errZ jointly p/3; simulator.py:99-118) and the reference's event
classification (simulator.py:291-303).

For each config both sides estimate qBLER = 1 - (exact + degen)/shots; the
test is a two-proportion z-test: |q_new - q_ref| <= Z * sqrt(pv*(1/N + 1/M)),
pv = pooled variance, Z = 4 (false-alarm ~6e-5 per config).

Usage: python benchmarks/parity.py [--scale S] [--out FILE]
Emits one JSON line per config with both estimates and PASS/FAIL.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

if os.environ.get("QLDPC_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["QLDPC_PLATFORM"])

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

Z = 4.0


def oracle_qbler(code, p, shots, dec_type, iters, schedule, osd_order, seed):
    """Reference-semantics per-shot pipeline in NumPy."""
    import oracle
    from qldpcsim_tpu.decoders import layerize

    Hx = np.asarray(code.Hx) % 2
    Hz = np.asarray(code.Hz) % 2
    n = Hx.shape[1]
    rng = np.random.default_rng(seed + 7919)
    u = rng.random((shots, n))
    # depolarizing: X w.p. p/3 (u<p/3), Y p/3, Z p/3 — same marginals as the
    # channel module (channel/depolarizing.py).
    err_x = u < 2 * p / 3
    err_z = (u >= p / 3) & (u < p)
    sy_z = (err_x.astype(np.int64) @ Hz.T.astype(np.int64)) % 2
    sy_x = (err_z.astype(np.int64) @ Hx.T.astype(np.int64)) % 2

    serial = schedule == "S"
    if schedule == "F":
        layers_x = [np.arange(Hz.shape[0])]
        layers_z = [np.arange(Hx.shape[0])]
    else:
        layers_x = layerize(Hz, serial=serial)
        layers_z = layerize(Hx, serial=serial)

    def dec(H, syn, layers):
        if dec_type == "MS":
            e, it, post, conv = oracle.ms_decode(H, syn, p / 3, iters, layers)
            if osd_order >= 0 and not conv:
                e = oracle.osd_decode(H, e, syn, post, osd_order)
            return e
        if dec_type == "BP":
            e, it, post, conv = oracle.bp_decode(H, syn, p / 3, iters, layers)
            if osd_order >= 0 and not conv:
                e = oracle.osd_decode(H, e, syn, post, osd_order)
            return e
        if dec_type == "BF":
            return oracle.bf_decode(H, syn)[0]
        if dec_type == "NG":
            return oracle.ng_decode(H, syn)[0]
        raise ValueError(dec_type)

    good = 0
    for s in range(shots):
        ex = dec(Hz, sy_z[s], layers_x)
        ez = dec(Hx, sy_x[s], layers_z)
        exact = np.array_equal(ex % 2, err_x[s].astype(np.int64)) and \
            np.array_equal(ez % 2, err_z[s].astype(np.int64))
        if exact:
            good += 1
        else:
            # reference-compatible degenerate test (landmine L2): integer
            # matmul without mod 2 must be exactly zero on both components.
            rx = err_x[s].astype(np.int64) ^ (np.asarray(ex, np.int64) % 2)
            rz = err_z[s].astype(np.int64) ^ (np.asarray(ez, np.int64) % 2)
            if (Hz.astype(np.int64) @ rx == 0).all() and \
               (Hx.astype(np.int64) @ rz == 0).all():
                good += 1
    return 1.0 - good / shots


def engine_qbler(code, p, shots, dec_type, iters, schedule, osd_order, seed):
    from qldpcsim_tpu.engine.montecarlo import SimConfig, simulate_p

    cfg = SimConfig(shots=shots, dec_type=dec_type, dec_iterations=iters,
                    dec_schedule=schedule, osd_order=osd_order, rng_seed=seed)
    r = simulate_p(code.Hx, code.Hz, p, cfg)
    return r.qbler, r.shots_per_s


def run_one(name, code_name, p, n_new, n_ref, dec_type, iters, schedule,
            osd_order=-1, seed=0):
    from qldpcsim_tpu.codes import get_code

    code = get_code(code_name)
    q_new, sps = engine_qbler(code, p, n_new, dec_type, iters, schedule,
                              osd_order, seed)
    t0 = time.time()
    q_ref = oracle_qbler(code, p, n_ref, dec_type, iters, schedule,
                         osd_order, seed)
    ref_sps = n_ref / max(time.time() - t0, 1e-9)
    pool = (q_new * n_new + q_ref * n_ref) / (n_new + n_ref)
    var = max(pool * (1 - pool), 1.0 / (n_new + n_ref))
    bound = Z * math.sqrt(var * (1.0 / n_new + 1.0 / n_ref))
    return {
        "config": name, "code": code_name, "decoder": dec_type,
        "schedule": schedule, "osd": osd_order, "p": p,
        "qBLER_new": round(q_new, 5), "shots_new": n_new,
        "qBLER_ref": round(q_ref, 5), "shots_ref": n_ref,
        "bound": round(bound, 5),
        "pass": bool(abs(q_new - q_ref) <= bound),
        "engine_shots_per_s": round(sps, 1),
        "oracle_shots_per_s": round(ref_sps, 2),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0,
                    help="scale factor on oracle shot counts")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    s = args.scale

    rows = []
    # BASELINE.json configs 1-5 (oracle shot counts sized to CPU cost).
    rows.append(run_one("1_shor_bp_p01", "shor", 0.01, 20000, int(1000 * s), "BP", 99, "F"))
    rows.append(run_one("1_shor_bp_p05", "shor", 0.05, 20000, int(1000 * s), "BP", 99, "F"))
    rows.append(run_one("2_steane_nms_layered", "steane", 0.05, 20000, int(1000 * s), "MS", 50, "L"))
    rows.append(run_one("3_bicycle_bf", "bicycle", 0.02, 20000, int(600 * s), "BF", 50, "F"))
    rows.append(run_one("3_bicycle_ng", "bicycle", 0.01, 20000, int(600 * s), "NG", 0, "F"))
    rows.append(run_one("4_tanner_ms_serial", "tanner", 0.04, 4096, int(60 * s), "MS", 30, "S"))
    rows.append(run_one("5_lp04_bp_osd2", "lp04_0", 0.04, 8192, int(60 * s), "BP", 30, "F", osd_order=2))
    rows.append(run_one("5_lp118_bp_osd2", "lp118_0", 0.05, 8192, int(40 * s), "BP", 30, "F", osd_order=2))

    out = "\n".join(json.dumps(r) for r in rows)
    print(out)
    n_fail = sum(not r["pass"] for r in rows)
    print(f"# parity: {len(rows) - n_fail}/{len(rows)} within {Z}-sigma",
          file=sys.stderr)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
