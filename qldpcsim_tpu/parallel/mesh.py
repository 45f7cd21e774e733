"""Mesh construction and shot-sharded execution.

Parallel axes (SURVEY.md §2, "parallelism strategies"): shots are
embarrassingly parallel Monte Carlo — the batch axis shards over a 1-D
('shots',) mesh (ICI collectives); p-points are an outer loop (optionally a
second mesh axis — see dryrun in __graft_entry__.py). The entire cross-device
reduction payload is the per-chunk integer counter vector (simulator.py:308-315
in the reference), reduced with psum inside shard_map.

RNG discipline: per-chunk keys are derived from global chunk indices
(seed -> p-index -> global chunk), so counters are bit-exact regardless of
device count — integer sums are order-independent. Tested in
tests/test_parallel.py on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from qldpcsim_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()


def cpu_fallback_device():
    """Return a CPU device, enabling the cpu platform alongside the session's
    default if needed (this environment pins JAX_PLATFORMS to the TPU plugin).

    Used for codes too small for the TPU compiler: Mosaic/XLA has been
    observed to SIGSEGV compiling decode graphs over tiny parity-check
    matrices (Shor's 2x9 Hx), and a wedged remote compiler takes the whole
    TPU service down. Returns None if no CPU platform can be initialized.
    """
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        pass
    try:
        plats = jax.config.jax_platforms or ""
        if "cpu" not in plats.split(","):
            jax.config.update("jax_platforms", (plats + ",cpu").strip(","))
        return jax.devices("cpu")[0]
    except Exception:
        return None


def multihost_init(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running under a multi-host launcher.

    MUST run before any backend query: jax.devices()/jax.process_count()
    initialize the local backend, after which jax.distributed.initialize()
    raises. Launch context comes from the explicit arguments or, when absent,
    the standard env vars JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID (a cloud-TPU pod slice also auto-detects once a
    coordinator address is known). With no context at all this is a no-op —
    plain single-host runs never touch the distributed service. Returns
    True iff the distributed runtime is initialized on exit.

    The reference has no distributed path at all (simulator.py is a single
    process); tested with two real processes in tests/test_multihost.py.
    """
    import os

    if jax.distributed.is_initialized():
        return True
    coordinator_address = (coordinator_address
                          or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and process_id is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_mesh(devices=None, axis: str = "shots") -> Mesh:
    """1-D device mesh over all (or given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis,))


def chunk_keys(key_p, chunk_start: int, n_parallel: int):
    """Deterministic per-slot keys for global chunk indices
    chunk_start .. chunk_start + n_parallel - 1."""
    idx = jnp.arange(chunk_start, chunk_start + n_parallel, dtype=jnp.uint32)
    return jax.vmap(lambda i: jax.random.fold_in(key_p, i))(idx)


def shard_chunk_fn(mesh: Mesh, chunk_fn: Callable, axis: str = "shots"):
    """Wrap a single-device chunk body for shot-sharded execution.

    chunk_fn(key, p, n_valid) -> dict of scalar counters. The wrapped function
    takes per-device keys (ndev, ...) and per-device valid counts (ndev,),
    runs one chunk per device, and psums the counter dict over the mesh so
    every process sees the global counts.
    """
    from jax import shard_map

    def per_device(keys, p, n_valids):
        counts = chunk_fn(keys[0], p, n_valids[0])
        return {k: jax.lax.psum(v, axis) for k, v in counts.items()}

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def per_device_multi_chunk_fn(mesh: Mesh, multi_fn: Callable):
    """Per-device-dispatch fallback for shot-sharded execution.

    Same call signature as shard_multi_chunk_fn's wrapper — keys
    (ndev, G, tiles, 2), p scalar, n_valids (ndev, G) — but instead of one
    shard_map program it dispatches the SINGLE-DEVICE multi-chunk jit once
    per mesh device (dispatches are async, so devices run concurrently) and
    reduces the integer counters on the host. The global RNG tile contract
    (keys derive from global tile indices, not device ids) makes the totals
    bit-exact vs the shard_map path by construction.

    Why this exists: shard_map graphs have never compiled on this
    environment's remote TPU backend (the axon compiler hangs and wedges
    the service — DIVERGENCES.md "Execution environment"), while plain
    single-device jits compile and run fine there. This mode keeps
    multi-chip execution available on backends where the partitioner is
    broken. Single-process only (remote devices are not addressable for
    host-side reduction); multi-process meshes need exec_mode='shardmap'.
    """
    devices = list(np.asarray(mesh.devices).reshape(-1))
    if jax.process_count() > 1:
        raise ValueError("perdevice execution mode is single-process; "
                         "multi-process meshes need exec_mode='shardmap'")
    fn = jax.jit(multi_fn)

    def run(keys, p, n_valids):
        keys = np.asarray(jax.device_get(keys))
        n_valids = np.asarray(jax.device_get(n_valids))
        p32 = jnp.float32(p)
        outs = [fn(jax.device_put(keys[i], d), jax.device_put(p32, d),
                   jax.device_put(n_valids[i], d))
                for i, d in enumerate(devices)]
        outs = jax.device_get(outs)
        return {k: sum(int(o[k]) for o in outs) for k in outs[0]}

    return run


def with_perdevice_fallback(primary: Callable, build_fallback: Callable):
    """Run `primary` until it raises, then permanently switch to the
    fallback built by `build_fallback()` (used to recover from shard_map
    partitioner/compiler failures at first dispatch)."""
    import warnings

    state: dict = {}

    def run(*args):
        if "fb" in state:
            return state["fb"](*args)
        try:
            return primary(*args)
        except Exception as e:  # noqa: BLE001 — any compile/dispatch failure
            warnings.warn("shard_map execution failed "
                          f"({type(e).__name__}: {e}); falling back to "
                          "per-device dispatch", RuntimeWarning)
            state["fb"] = build_fallback()
            return state["fb"](*args)

    return run


def shard_multi_chunk_fn(mesh: Mesh, multi_fn: Callable, axis: str = "shots"):
    """Shot-sharded wrapper for the fused multi-chunk body.

    multi_fn(keys, p, n_valids) scans G chunks on one device and returns
    summed counters. The wrapped function takes keys (ndev, G, tiles, 2) and
    n_valids (ndev, G); each device runs its G-chunk scan, then the counter
    dict is psum-reduced over the mesh — one collective per G chunks instead
    of one per chunk."""
    from jax import shard_map

    def per_device(keys, p, n_valids):
        counts = multi_fn(keys[0], p, n_valids[0])
        return {k: jax.lax.psum(v, axis) for k, v in counts.items()}

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)
