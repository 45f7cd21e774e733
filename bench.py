"""Flagship benchmark: decoded shots/s/chip on the BASELINE.json headline
config — LP118 lifted-product code, normalized min-sum, layered schedule,
50 iterations (full pipeline: native channel sample + MS decode of X and Z
components + classification counters, all on device).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "shots/s", "vs_baseline": N}

vs_baseline: ratio against the reference CPU simulator's throughput. The
reference itself (qLDPCsim + stim) is not installable in this image, so the
baseline is a measured proxy: the per-shot NumPy oracle decoder
(tests/oracle.py) which implements the reference's exact MS semantics with
the same dense-NumPy inner loop structure; its measured shots/s on this
host's CPU is cached in BENCH_CPU_BASELINE.json (delete to re-measure).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

CODE = "lp118_0"
P_POINT = 0.05
MAX_ITER = 50
SCHEDULE = "L"
BATCH = 4096
# Chunks fused per device dispatch (lax.scan). Each dispatch over the remote
# tunnel costs ~3.3 ms regardless of payload (measured: a write-only Pallas
# kernel floors there), so large groups amortize it: 16 -> 4.24M, 32 -> 4.45M,
# 64 -> 4.66M, 128 -> 4.85M, 256 -> 4.89M, 512 -> 4.92M shots/s on the
# flagship (r5).
BENCH_CHUNKS = 512

_ap = argparse.ArgumentParser()
_ap.add_argument("--impl", default="auto",
                 help="decoder impl: auto|edge|mxu|seq|qc")
_ap.add_argument("--batch", type=int, default=BATCH)
_ap.add_argument("--chunks", type=int, default=BENCH_CHUNKS)
_ARGS = _ap.parse_args()
BATCH = _ARGS.batch
BENCH_CHUNKS = _ARGS.chunks
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_CPU_BASELINE.json")


# --- VPU roofline accounting (see docs/PERFORMANCE.md "Roofline") ---
# One v5e TensorCore VPU: (8, 128) lanes x 4 ALUs x ~0.94 GHz.
VPU_PEAK_OPS_S = 8 * 128 * 4 * 0.94e9  # ~3.85e12 elementwise op/s
# Minimum VPU work per Tanner-graph edge per MS iteration in the QC-kernel
# formulation (ops/ms_qc_pallas.py): v2c = roll(post) - c2v (2: roll copy +
# sub), CN min/min2/sign (abs + 2 min updates + sign parity + magnitude
# select + 2 multiplies = 7), posterior += roll(delta) (3), per-iteration
# rolled-XOR convergence re-check (2), message write-back (1).
OPS_PER_EDGE_ITER = 15


def roofline_stats(tot, n_shots, sps):
    """Effective VPU utilization: ops the decode PROBLEM required (per-shot
    converged iterations x edges x per-edge op floor) over peak. Executed
    utilization is higher — cascade stages run whole lane-blocks to the
    slowest lane — so this is a lower bound on hardware-busy fraction."""
    import numpy as np

    from qldpcsim_tpu.codes import get_code

    code = get_code(CODE)
    nnz_z = int((np.asarray(code.Hz) % 2).sum())  # X decode runs through Hz
    nnz_x = int((np.asarray(code.Hx) % 2).sum())
    it_x = float(tot["nIterAccX"]) / n_shots
    it_z = float(tot["nIterAccZ"]) / n_shots
    ops_per_shot = OPS_PER_EDGE_ITER * (nnz_z * it_x + nnz_x * it_z)
    ops_per_s = ops_per_shot * sps
    return {
        "vpu_ops_per_s": round(ops_per_s / 1e9, 1),  # Gop/s
        "vpu_peak_frac": round(ops_per_s / VPU_PEAK_OPS_S, 4),
        "avg_iters_x": round(it_x, 3),
        "avg_iters_z": round(it_z, 3),
        "edges": nnz_x + nnz_z,
    }


def measure_tpu_shots_per_s():
    import jax
    import jax.numpy as jnp

    from qldpcsim_tpu.codes import get_code
    from qldpcsim_tpu.engine.montecarlo import ShotPipeline, SimConfig
    from qldpcsim_tpu.parallel.mesh import chunk_keys

    code = get_code(CODE)
    cfg = SimConfig(shots=BATCH * BENCH_CHUNKS, dec_type="MS",
                    dec_iterations=MAX_ITER, dec_schedule=SCHEDULE,
                    batch_size=BATCH, rng_seed=0, impl=_ARGS.impl)
    pipe = ShotPipeline(code.Hx, code.Hz, cfg)
    # Fused dispatch: one lax.scan over BENCH_CHUNKS chunks per host round
    # trip (counters summed on device) — measures device throughput, not
    # tunnel dispatch latency.
    step = pipe._multi_counts
    p = jnp.float32(P_POINT)
    tpc = pipe.tiles_per_chunk
    nv = jnp.full((BENCH_CHUNKS,), BATCH, jnp.int32)
    key = jax.random.PRNGKey(0)

    def group_keys(i):
        return chunk_keys(key, i * BENCH_CHUNKS * tpc,
                          BENCH_CHUNKS * tpc).reshape(BENCH_CHUNKS, tpc, -1)

    # Warmup/compile: device_get forces full host materialization (on the
    # remote-tunnel backend, block_until_ready alone has been observed to
    # return before compilation finishes).
    for i in range(2):
        jax.device_get(step(group_keys(i), p, nv))

    # Honest sustained throughput: REPS sequential dispatches, counters
    # accumulated on device, ONE transfer at the end inside the timed window.
    REPS = 16
    t0 = time.perf_counter()
    tot = None
    for r in range(REPS):
        out = step(group_keys(2 + r), p, nv)
        tot = out if tot is None else {k: tot[k] + out[k] for k in out}
    tot = jax.device_get(tot)
    dt = time.perf_counter() - t0
    n_shots = REPS * BATCH * BENCH_CHUNKS
    assert int(tot["decSuccessExact"]) > 0  # sanity: decode really ran
    return n_shots / dt, dt, tot, n_shots


def measure_cpu_baseline(n_shots=12):
    """Reference-equivalent per-shot CPU decode throughput (cached)."""
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["shots_per_s"]

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import oracle
    from qldpcsim_tpu.codes import get_code
    from qldpcsim_tpu.decoders import layerize

    code = get_code(CODE)
    Hx, Hz = np.asarray(code.Hx), np.asarray(code.Hz)
    rng = np.random.default_rng(0)
    n = Hx.shape[1]
    u = rng.random((n_shots, n))
    err_x = u < 2 * P_POINT / 3
    err_z = (u >= P_POINT / 3) & (u < P_POINT)
    sy_z = (err_x.astype(np.int64) @ Hz.T.astype(np.int64)) % 2
    sy_x = (err_z.astype(np.int64) @ Hx.T.astype(np.int64)) % 2
    layers_z = layerize(Hz)
    layers_x = layerize(Hx)

    t0 = time.perf_counter()
    for s in range(n_shots):
        oracle.ms_decode(Hz, sy_z[s], P_POINT / 3, MAX_ITER, layers_z)
        oracle.ms_decode(Hx, sy_x[s], P_POINT / 3, MAX_ITER, layers_x)
    dt = time.perf_counter() - t0
    sps = n_shots / dt
    with open(BASELINE_FILE, "w") as f:
        json.dump({"shots_per_s": sps, "n_shots": n_shots, "host": "bench-cpu",
                   "config": f"{CODE} MS {SCHEDULE} {MAX_ITER}it p={P_POINT}"}, f)
    return sps


def main():
    tpu_sps, dt, tot, n_shots = measure_tpu_shots_per_s()
    cpu_sps = measure_cpu_baseline()
    print(json.dumps({
        "metric": f"decoded_shots_per_s_chip ({CODE}, MS layered, {MAX_ITER} iters, p={P_POINT})",
        "value": round(tpu_sps, 1),
        "unit": "shots/s",
        "vs_baseline": round(tpu_sps / cpu_sps, 1),
        **roofline_stats(tot, n_shots, tpu_sps),
    }))


if __name__ == "__main__":
    main()
