"""On-demand probe: can the TPU backend compile decode graphs for SMALL codes?

Background (docs/PERFORMANCE.md, DIVERGENCES.md "Execution environment"):
this environment's remote TPU compiler has SIGSEGV'd / hung on decode graphs
over small parity-check matrices (observed from Shor's 2x9 up to lp04_0's
84x175), and a hung compile WEDGES the whole TPU service for ~5-30 min.
The engine routes codes with min dimension below a threshold to the CPU
backend (round 5: TINY_CODE_DIM=0 for MS/BF/NG, TINY_CODE_DIM_BP=64 —
set from this ladder's results; QLDPC_TINY_CODE_DIM overrides both).

That threshold rests on manual probes. This script re-probes it SAFELY:

  * each candidate code compiles + runs in a SUBPROCESS under a hard
    timeout, so a hung compile never blocks the parent;
  * a cheap health check (tiny matmul, itself subprocess-time-boxed) runs
    before each probe; if the service is already wedged the script stops
    instead of queueing more compiles behind the stuck one;
  * probes run LARGEST code first and the script STOPS at the first
    failure — each failure can wedge the service, so probing smaller codes
    after a failure is both pointless and harmful;
  * results land in benchmarks/tpu_small_probe.json as
    {code: pass|timeout|error, ...} with timestamps, so the routing
    threshold can drop the round the toolchain fixes it (set
    QLDPC_TINY_CODE_DIM accordingly — no code change needed).

NEVER run this in a default/CI path. Run it manually when prepared for a
possible ~30 min TPU service wedge:  python benchmarks/probe_tpu_small.py
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(_ROOT, "benchmarks", "tpu_small_probe.json")

# Largest (safest) first; stop at first failure.
CODES = ["lp04_3", "lp04_2", "lp04_1", "lp04_0", "bicycle", "steane", "shor"]

_CHILD = r"""
import sys
code_name = sys.argv[1]
import numpy as np
from qldpcsim_tpu.codes import get_code
from qldpcsim_tpu.engine.montecarlo import ShotPipeline, SimConfig
import jax, jax.numpy as jnp
from qldpcsim_tpu.parallel.mesh import chunk_keys
code = get_code(code_name)
# device="default": the whole point is to force the TPU compile the engine
# normally routes away from.
cfg = SimConfig(shots=256, dec_type="MS", dec_iterations=8, batch_size=256,
                device="default")
pipe = ShotPipeline(code.Hx, code.Hz, cfg)
keys = chunk_keys(jax.random.PRNGKey(0), 0, pipe.tiles_per_chunk)
out = jax.device_get(jax.jit(pipe._chunk_body)(keys, jnp.float32(0.03),
                                               jnp.int32(256)))
print("PROBE_OK", code_name, int(out["decSuccessExact"]))
"""

_HEALTH = r"""
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.float32)
print("HEALTH_OK", float(jax.device_get(x @ x)[0, 0]))
"""


def _run_child(py_src: str, args, timeout_s: int):
    """Run a code string in a fresh interpreter; returns (status, output)."""
    cmd = [sys.executable, "-c", py_src] + list(args)
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_s, cwd=_ROOT)
    except subprocess.TimeoutExpired as e:
        return "timeout", (e.stdout or "") + (e.stderr or "")
    if r.returncode != 0:
        return "error", r.stdout + r.stderr
    return "pass", r.stdout


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=300,
                    help="per-probe compile+run budget (s)")
    ap.add_argument("--codes", nargs="*", default=CODES)
    args = ap.parse_args(argv)

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    for code in args.codes:
        st, out = _run_child(_HEALTH, [], 90)
        if st != "pass":
            print(f"TPU health check {st} — service may be wedged; "
                  "stopping (wait for it to clear before re-running)",
                  file=sys.stderr)
            break
        print(f"probing {code} (timeout {args.timeout}s)...", flush=True)
        t0 = time.time()
        st, out = _run_child(_CHILD, [code], args.timeout)
        results[code] = {"status": st, "elapsed_s": round(time.time() - t0, 1),
                         "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
        print(f"  {code}: {st} ({results[code]['elapsed_s']}s)", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        if st != "pass":
            print("stopping at first failure (a hung compile wedges the "
                  "service; probing smaller codes now would queue behind "
                  "it)", file=sys.stderr)
            break

    if results:
        passing = [c for c, r in results.items() if r["status"] == "pass"]
        print(f"\nresults -> {OUT}\npassing: {passing}")
        if passing:
            from qldpcsim_tpu.codes import get_code

            dims = [min(get_code(c).Hx.shape[0], get_code(c).Hz.shape[0],
                        get_code(c).Hx.shape[1]) for c in passing]
            print(f"smallest passing min-dim: {min(dims)} — set "
                  f"QLDPC_TINY_CODE_DIM={min(dims)} to route codes >= this "
                  "to the TPU")
    return 0


if __name__ == "__main__":
    sys.exit(main())
