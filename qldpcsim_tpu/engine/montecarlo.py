"""Monte-Carlo qBLER engine.

Reference parity (simulator.py:167-347): per-p pipeline sample -> decode ->
classify -> counters, an outer p-sweep, and the results table. Differences by
design (all documented in DIVERGENCES.md):

  * the whole shot pipeline is batched and jit-compiled on device — the
    reference's serial per-shot Python loop (simulator.py:244) becomes a
    chunked batch axis, optionally sharded over a device mesh;
  * channel sampling is native GF(2) (channel/), not Stim;
  * X-error decoding uses matrix Hz with prior p/3 exactly like the reference
    (simulator.py:278-279, landmine L3), and schedules derive from the decode
    matrix by default (landmine L1; `layer_compat=True` reproduces the
    reference's cross-wiring);
  * OSD runs only on decoder-failed shots, compacted ON DEVICE to the front
    of the batch (cumsum-scatter, lane-ascending) and deferred across the
    whole multi-chunk dispatch group; one windowed while_loop OSD pass per
    group finishes them inside the same jit, with an in-chunk overflow
    fallback (SURVEY.md §7 "divergent OSD path");
  * deterministic key hierarchy seed -> p-index -> global chunk (landmine
    L10), making counters bit-exact across sharding layouts.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import math
import os
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qldpcsim_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from qldpcsim_tpu.channel.depolarizing import (
    hw_sampler_available,
    sample_shot_tiles,
    sample_shot_tiles_hw,
)
from qldpcsim_tpu.decoders import (
    DecoderConfig,
    TannerGraph,
    build_layers,
    make_decoder,
    make_osd,
)
from qldpcsim_tpu.engine.classify import ClassifierStatic, classify_batch
from qldpcsim_tpu.engine.results import PPointResult, format_results_table
from qldpcsim_tpu.utils.checkpoint import CheckpointStore

_COUNTER_KEYS = (
    "decSuccessExact",
    "decSuccessDegen",
    "DecFailures_X",
    "DecFailures_Z",
    "successStabilizer",
    "logicalErrors_X",
    "logicalErrors_Z",
    "nIterAccX",
    "nIterAccZ",
)


@dataclasses.dataclass
class SimConfig:
    """Simulation configuration (reference flag surface simulator.py:319-327
    plus TPU-native execution knobs)."""

    shots: int = 1000
    dec_type: str = "MS"
    dec_iterations: int = 99
    dec_schedule: str = "F"
    osd_order: int = -1
    rng_seed: Optional[int] = None
    batch_size: int = 0           # 0 = auto
    layer_compat: bool = False    # reproduce reference cross-wired layers (L1)
    bf_residual: str = "mod2"     # BF residual: "mod2" | "bool" (reference
                                  # compat — see DIVERGENCES.md "BF residual")
    validate_encoding: bool = False  # full encode->corrupt->extract mode:
                                  # sample a random codeword frame with the
                                  # tableau-free GF(2) CSSEncoder (reference
                                  # encode pipeline simulator.py:78-160),
                                  # XOR the channel error into it, extract
                                  # syndromes FROM THE CORRUPTED CODEWORD,
                                  # decode, and classify against word XOR
                                  # frame. Counters are bit-exact with the
                                  # frame-free channel (frame invariance) —
                                  # this mode exists to PROVE that end to
                                  # end (tests/test_engine.py)
    mesh: object = None           # jax.sharding.Mesh over a 'shots' axis
    mesh_p: int = 0               # >0: p-points become a SECOND mesh axis —
                                  # simulate_sweep shards a ('p','shots')
                                  # 2-D mesh over all devices (mesh_p rows)
                                  # and ONE dispatch decodes mesh_p p-values
                                  # with per-p counter rows (the reference
                                  # p-loop, simulator.py:335-339, as a
                                  # parallel axis). Counters are bit-exact
                                  # vs the serial p-loop (same per-p key
                                  # hierarchy and tile stream).
    checkpoint_dir: Optional[str] = None
    progress: bool = False
    exec_mode: str = "auto"       # sharded execution strategy when mesh is
                                  # set: "shardmap" (one partitioned program,
                                  # psum counter reduction — the standard
                                  # JAX path) | "perdevice" (single-device
                                  # jits dispatched per LOCAL mesh device;
                                  # counters reduced host-side and, under
                                  # multi-process, across processes via
                                  # the coordination-service KV store —
                                  # bit-exact by the RNG tile contract, no
                                  # partitioned compile anywhere) | "auto"
                                  # (= shardmap since r5: the partitioned
                                  # compile works on this backend now and
                                  # measured faster; perdevice remains
                                  # the no-partitioner fallback —
                                  # DIVERGENCES.md). Env override:
                                  # QLDPC_EXEC_MODE.
    device: str = "auto"          # "auto" | "default" | "cpu": "auto" routes
                                  # only BP-on-tiny codes (min dim <
                                  # TINY_CODE_DIM_BP) to the CPU backend —
                                  # the one graph family this environment's
                                  # TPU compiler still rejects (r5 probes)
    impl: str = "auto"            # decoder implementation override
                                  # (DecoderConfig.impl):
                                  # auto|edge|mxu|seq|qc|gh
    dispatch_chunks: int = 0      # chunks fused per device dispatch via
                                  # lax.scan (0 = auto). Amortizes host->device
                                  # dispatch latency (large over the remote
                                  # TPU tunnel); counters are summed on device
                                  # so a G-chunk group costs ONE round trip.
    sort_window: int = -1         # difficulty-ordered shot blocking: sort
                                  # each `sort_window`-lane window of a
                                  # chunk by total syndrome weight before
                                  # decoding, so 128-lane kernel blocks hold
                                  # shots of similar iteration count (a
                                  # block runs to its slowest lane). 0 =
                                  # off; -1 = auto (= off: measured
                                  # negative, docs/PERFORMANCE.md r5);
                                  # counters are bit-exact either way
                                  # (_sort_records). Env override:
                                  # QLDPC_SORT_WINDOW.

    def decoder_config(self) -> DecoderConfig:
        return DecoderConfig(
            dec_type=self.dec_type,
            max_iter=self.dec_iterations,
            schedule=self.dec_schedule,
            osd_order=self.osd_order,
            layer_compat=self.layer_compat,
            bf_residual=self.bf_residual,
            impl=self.impl,
        )


# Codes whose parity-check matrices have any dimension smaller than this run
# on the CPU backend under device="auto" when the session default is a TPU.
# History: through round 4 the remote TPU compiler SIGSEGV'd on small-matrix
# decode graphs AND a crash wedged the whole service, so everything below
# 128 was routed away. The round-5 probe ladder (benchmarks/
# probe_tpu_small.py + real-workload probes, benchmarks/tpu_small_probe
# .json) measured the toolchain FIXED for MS/BF/NG down to Shor's 2x9
# (Steane MS-layered: 1.98M warm shots/s on TPU vs 154k CPU), while BP
# still crashes the compile helper on tiny graphs (SIGSEGV at min dim <= 3;
# passes at 84 = LP04_0, which now runs the TPU path at 2.36M warm). The
# crash is also now CONTAINED to the AOT helper subprocess (fast error, no
# service wedge), so simulate_p additionally carries a first-dispatch CPU
# fallback. Thresholds (env QLDPC_TINY_CODE_DIM overrides both):
TINY_CODE_DIM_BP = 64     # SIGSEGV evidence at <= 3, pass at 84
TINY_CODE_DIM = 0         # MS/BF/NG: probe-passed down to 2x9
_env_tiny = os.environ.get("QLDPC_TINY_CODE_DIM")
if _env_tiny is not None:
    TINY_CODE_DIM = TINY_CODE_DIM_BP = int(_env_tiny)


def _resolve_exec_mode(cfg: SimConfig, platform: str) -> str:
    """Sharded execution strategy (see SimConfig.exec_mode). Works for both
    single- and multi-process meshes: under multi-process, 'perdevice'
    dispatches per LOCAL device and reduces the counter vector across
    processes through the coordination-service KV store — never a
    partitioned compile (parallel/mesh.py::allreduce_counters_host).

    Auto = 'shardmap' everywhere since round 5: the partitioned compile
    that hung this environment's TPU backend through r4 now works
    (benchmarks/tpu_shardmap_probe.json), and on a meshed flagship run
    shardmap measured 3.55M vs perdevice's 2.44M warm shots/s (one
    program vs a host dispatch loop per device), counters bit-exact.
    Single-process shardmap runs keep the automatic perdevice fallback
    for residual compile failures; QLDPC_EXEC_MODE overrides."""
    mode = cfg.exec_mode
    if mode == "auto":
        mode = os.environ.get("QLDPC_EXEC_MODE", "auto")
    if mode == "auto":
        mode = "shardmap"
    if mode not in ("shardmap", "perdevice"):
        raise ValueError(f"exec_mode must be auto|shardmap|perdevice, "
                         f"got {cfg.exec_mode!r}")
    return mode


def _resolve_exec_device(cfg: SimConfig, min_dim: int):
    """Execution device override for the pipeline, or None for the default.

    min_dim: smallest of (n, Hx rows, Hz rows) for the code being decoded.
    """
    if cfg.mesh is not None or cfg.device == "default":
        return None
    want_cpu = cfg.device == "cpu"
    thresh = (TINY_CODE_DIM_BP if cfg.dec_type.upper() == "BP"
              else TINY_CODE_DIM)
    if cfg.device == "auto" and min_dim < thresh:
        plats = (jax.config.jax_platforms or "").lower()
        want_cpu = ("tpu" in plats or "axon" in plats)
    if not want_cpu:
        return None
    from qldpcsim_tpu.parallel.mesh import cpu_fallback_device

    return cpu_fallback_device()


def _auto_batch(n: int, shots: int, n_dev: int) -> int:
    """Pick a chunk size: large enough to feed the MXU, small enough to keep
    message state comfortably in HBM; a multiple of 64 * n_dev so the RNG
    tile stream (and therefore every counter) is device-layout invariant."""
    quantum = 64 * n_dev
    target = 4096 if n <= 1536 else 2048
    b = min(max(target, quantum), max(quantum, shots))
    return max(quantum, (b // quantum) * quantum)


def _compact_indices(mask, cap: int, fill: int, pos=None):
    """Indices of True lanes in ascending order, compacted to the front of a
    fixed (cap,)-slot buffer; slots beyond the count hold `fill`. Same
    result as `argsort(~mask, stable=True)[:cap]` on the True prefix, at a
    fraction of a sort's cost (one cumsum + one scatter). `pos` may pass a
    precomputed `cumsum(mask) - 1` rank to avoid recomputing it."""
    B = mask.shape[0]
    if pos is None:
        pos = jnp.cumsum(mask) - 1              # rank among True lanes
    tgt = jnp.where(mask, pos, cap)             # cap = out of bounds: dropped
    return jnp.full(cap, fill, jnp.int32).at[tgt].set(
        jnp.arange(B, dtype=jnp.int32), mode="drop")


def _tile_size(batch: int, per_dev: int) -> int:
    """RNG tile size: 64 when the layout allows (=> layout-invariant
    counters), else the largest divisor of both."""
    t = math.gcd(batch, 64)
    if per_dev % t:
        t = math.gcd(per_dev, t)
    return max(1, t)


class ShotPipeline:
    """Compiled per-(code, decoder-config) shot pipeline, reusable across p."""

    def __init__(self, Hx: np.ndarray, Hz: np.ndarray, cfg: SimConfig):
        self.Hx = (np.asarray(Hx) % 2).astype(np.int8)
        self.Hz = (np.asarray(Hz) % 2).astype(np.int8)
        self.cfg = cfg
        self.n = self.Hx.shape[1]
        self.exec_device = _resolve_exec_device(
            cfg, min(self.n, self.Hx.shape[0], self.Hz.shape[0]))
        dcfg = cfg.decoder_config()
        # Resolve the EXECUTION platform from the devices this pipeline will
        # actually run on (mesh devices / CPU-fallback device), not from the
        # session's default backend: a CPU-device mesh under a TPU default
        # backend must not compile Mosaic kernels, and vice versa. Gates all
        # Pallas paths (QC decode kernels, GF(2) elimination, hw-PRNG
        # channel) through dcfg.platform.
        if dcfg.platform == "auto":
            plat = None
            if cfg.mesh is not None:
                plats = {d.platform.lower()
                         for d in np.asarray(cfg.mesh.devices).ravel()}
                if plats <= {"tpu", "axon"}:
                    plat = "tpu"
                elif plats == {"cpu"}:
                    plat = "cpu"
            elif self.exec_device is not None:
                plat = ("cpu" if self.exec_device.platform == "cpu"
                        else "tpu")
            if plat is not None:
                dcfg = dataclasses.replace(dcfg, platform=plat)
        self.dcfg = dcfg  # fully resolved decoder config (checkpoint ids)

        # X errors are decoded through Hz, Z errors through Hx
        # (reference simulator.py:272-282).
        graph_x = TannerGraph.build(self.Hz)
        graph_z = TannerGraph.build(self.Hx)
        needs_layers = dcfg.dec_type.upper() in ("MS", "BP")
        layers_x = layers_z = None
        if needs_layers:
            layers_x = build_layers(self.Hz, dcfg.schedule,
                                    H_layerize=self.Hx if cfg.layer_compat else None)
            layers_z = build_layers(self.Hx, dcfg.schedule,
                                    H_layerize=self.Hz if cfg.layer_compat else None)
        self.dec_x = make_decoder(graph_x, dcfg, layers=layers_x)
        self.dec_z = make_decoder(graph_z, dcfg, layers=layers_z)
        # Channel bit source: TPU hardware PRNG (Pallas) when available —
        # replaces threefry's VPU arithmetic + per-tile key schedule, ~10%
        # of the flagship pipeline (ops/channel_pallas.py). Same per-tile
        # key contract.
        self._sample = (sample_shot_tiles_hw
                        if hw_sampler_available(dcfg.platform)
                        else sample_shot_tiles)
        self.classifier = ClassifierStatic.build(self.Hx, self.Hz)
        self.encoder = None
        if cfg.validate_encoding:
            from qldpcsim_tpu.channel.encoder import CSSEncoder

            self.encoder = CSSEncoder.build(self.Hx, self.Hz)
        # Host-side NumPy (embedded as trace-time constants; keeps pipeline
        # construction device-free and backend-agnostic).
        self.Hx_T = np.ascontiguousarray(self.Hx.T).astype(np.float32)
        self.Hz_T = np.ascontiguousarray(self.Hz.T).astype(np.float32)

        self.use_osd = cfg.osd_order >= 0 and dcfg.dec_type.upper() in ("MS", "BP")
        if self.use_osd:
            self.osd_x = make_osd(self.Hz, cfg.osd_order,
                                  platform=dcfg.platform)
            self.osd_z = make_osd(self.Hx, cfg.osd_order,
                                  platform=dcfg.platform)

        n_dev = cfg.mesh.devices.size if cfg.mesh is not None else 1
        self.batch = cfg.batch_size or _auto_batch(self.n, cfg.shots, n_dev)
        if self.batch % n_dev:
            raise ValueError(f"batch_size {self.batch} not divisible by "
                             f"device count {n_dev}")
        self.n_dev = n_dev
        self.per_dev = self.batch // n_dev
        self.tile = _tile_size(self.batch, self.per_dev)
        self.tiles_per_dev = self.per_dev // self.tile
        self.tiles_per_chunk = self.batch // self.tile
        # Difficulty-ordered shot blocking (see _sort_records); opt-in.
        sw = cfg.sort_window
        env_sw = os.environ.get("QLDPC_SORT_WINDOW")
        if env_sw is not None:
            sw = int(env_sw)
        if sw < 0:
            # Auto = OFF: measured NEGATIVE on the flagship (v5e, r5) —
            # the windowed one-hot permute costs ~18% while an IDEAL free
            # sort bought 0% (iteration dispersion at p=0.05 is too small
            # for stage-1 block savings; docs/PERFORMANCE.md "Negative
            # results"). Kept as tested opt-in machinery; the free
            # variant — difficulty-ordered CASCADE buffers — is on by
            # default instead (decoders/cascade.py).
            sw = 0
        if sw and (self.per_dev % sw or sw % 128):
            sw = 0  # window must tile the chunk in whole 128-lane blocks
        self.sort_window = sw
        if self.use_osd:
            # Per-chunk deferral capacity: decoder-failed shots are NOT
            # OSD-processed in their own chunk — their records are compacted
            # into a fixed (F,)-slot buffer per chunk and OSD runs ONCE per
            # G-chunk dispatch group over the concatenated buffers
            # (_osd_group_finish). At realistic p the failure rate is <1%,
            # so group-level batching fills OSD windows ~G times denser than
            # per-chunk windows (the elimination kernel's cost is per
            # window, not per failed shot). Chunks whose failures overflow F
            # (very high p) fall back to in-chunk windowed OSD for the
            # overflow — correctness never depends on the failure rate.
            self._defer_cap = min(self.per_dev, 256)

        # Group-deferred cascade (OPT-IN: QLDPC_GROUP_CASCADE=1) — measured
        # negative on this hardware, quarantined with its full rationale in
        # engine/group_cascade.py.
        from qldpcsim_tpu.engine import group_cascade as _gc

        self.use_group_cascade = _gc.enabled(dcfg)
        if self.use_group_cascade:
            self._group_cascade = _gc.GroupCascade(
                self, dcfg, graph_x, graph_z, layers_x, layers_z)

        if cfg.mesh is not None:
            from qldpcsim_tpu.parallel.mesh import (
                per_device_multi_chunk_fn, shard_chunk_fn,
                shard_multi_chunk_fn, with_perdevice_fallback)

            self.exec_mode = _resolve_exec_mode(cfg, dcfg.platform)
            if self.exec_mode == "perdevice":
                self._chunk_counts = None

                def _wrap(body):
                    return per_device_multi_chunk_fn(cfg.mesh, body)
            else:
                self._chunk_counts = shard_chunk_fn(cfg.mesh, self._chunk_body)

                def _wrap(body):
                    sharded = shard_multi_chunk_fn(cfg.mesh, body)
                    if jax.process_count() == 1:
                        # A shard_map compile/dispatch failure permanently
                        # degrades to per-device dispatch (bit-exact
                        # counters by the RNG tile contract) instead of
                        # killing the run.
                        return with_perdevice_fallback(
                            sharded,
                            lambda: per_device_multi_chunk_fn(cfg.mesh,
                                                              body))
                    return sharded
        else:
            self.exec_mode = "local"
            self._chunk_counts = jax.jit(self._chunk_body)
            _wrap = jax.jit
        self._multi_counts = _wrap(self._multi_chunk_body)
        # Overflow fallback (compiled only if ever called).
        self._multi_counts_nogc = (_wrap(self._multi_chunk_body_nogc)
                                   if self.use_group_cascade
                                   else self._multi_counts)
        # 128 chunks/group: 256 measures ~+1% on the flagship (bench.py
        # passes it explicitly) but makes runs whose chunk count is not a
        # multiple of 256 compile an extra final-group shape inside the
        # warm window — not worth it as the default.
        self.dispatch_chunks = cfg.dispatch_chunks or max(
            1, min(128, 524288 // max(1, self.batch)))

    @staticmethod
    def _platform_is_tpu(dcfg) -> bool:
        if dcfg.platform in ("tpu", "axon"):
            return True
        if dcfg.platform != "auto":
            return False
        try:
            return jax.default_backend().lower() in ("tpu", "axon")
        except Exception:
            return False

    def device_ctx(self):
        """Context manager pinning execution to this pipeline's device
        (no-op when running on the session default)."""
        if self.exec_device is None:
            import contextlib

            return contextlib.nullcontext()
        return jax.default_device(self.exec_device)

    # ---------------- fused chunk body (fast path + in-body OSD) ----------------

    def _sample_chunk(self, tile_keys, p):
        """Channel sampling for one chunk; with cfg.validate_encoding the
        FULL pipeline runs: encode a random codeword frame (tableau-free
        GF(2) CSSEncoder — the reference's encode stage,
        simulator.py:78-160), corrupt it with the channel error, extract
        syndromes from the CORRUPTED codeword, and recover the effective
        error as word XOR frame. Frames are stabilizer/logical-coset
        vectors, annihilated by both check matrices, so the syndromes and
        effective errors — and therefore every counter — are bit-exact
        with the frame-free channel (the frame-invariance theorem this
        mode exists to prove end-to-end; see channel/depolarizing.py)."""
        err_x, err_z, sy_z, sy_x = self._sample(
            tile_keys, p, self.n, self.tile, self.Hx_T, self.Hz_T)
        if self.encoder is None:
            return err_x, err_z, sy_z, sy_x
        from qldpcsim_tpu.channel.depolarizing import syndromes_of

        fkey = jax.random.fold_in(tile_keys[0], 0x454E43)  # 'ENC'
        fx, fz = self.encoder.encode(fkey, err_x.shape[0])
        word_x = jnp.logical_xor(err_x, fx.astype(bool))
        word_z = jnp.logical_xor(err_z, fz.astype(bool))
        sy_z, sy_x = syndromes_of(word_x, word_z, self.Hx_T, self.Hz_T)
        eff_x = jnp.logical_xor(word_x, fx.astype(bool))
        eff_z = jnp.logical_xor(word_z, fz.astype(bool))
        return eff_x, eff_z, sy_z, sy_x

    def _sort_records(self, err_x, err_z, sy_z, sy_x, valid):
        """Difficulty-ordered shot blocking: permute the chunk's records so
        shots of similar decode difficulty share 128-lane kernel blocks.

        A batched while_loop block runs to its SLOWEST lane's iteration
        count, so at p=0.05 virtually every block drags its 127 easy lanes
        to the cap (P[block has a straggler] ~ 1). Sorting each
        `sort_window`-lane window by total syndrome weight — the difficulty
        proxy — lets easy blocks exit early. ONE shared descending key
        covers both decode sides, and records stay PERMUTED through decode,
        OSD and classification (counters are order-invariant integer sums,
        and each shot's decode is lane-independent, so every counter is
        bit-exact vs the unsorted pipeline — test_sort_window_bit_exact).

        The permutation is applied as a block-diagonal one-hot bf16 matmul
        over the concatenated 0/1 records (exact; row gathers measure
        ~2 GB/s on this backend while the windowed one-hot rides the MXU).
        The validity mask rides along as an extra column (padding lanes
        carry key -1 and sink to their window's tail)."""
        B = err_x.shape[0]
        W = min(self.sort_window, B)
        nw = B // W
        bf16, f32 = jnp.bfloat16, jnp.float32
        w_tot = jnp.sum(sy_z, axis=1) + jnp.sum(sy_x, axis=1)
        key = jnp.where(valid, w_tot.astype(jnp.int32), -1)
        order = jnp.argsort(-key.reshape(nw, W), axis=1)        # (nw, W)
        iota = jnp.arange(W, dtype=jnp.int32)
        onehot = (order[:, :, None] == iota[None, None, :]).astype(bf16)
        data = jnp.concatenate(
            [err_x.astype(bf16), err_z.astype(bf16),
             sy_z.astype(bf16), sy_x.astype(bf16),
             valid[:, None].astype(bf16)], axis=1)
        F = data.shape[1]
        out = jnp.matmul(onehot, data.reshape(nw, W, F),
                         preferred_element_type=f32).reshape(B, F)
        n, mz = self.n, sy_z.shape[1]
        return (out[:, :n].astype(err_x.dtype),
                out[:, n:2 * n].astype(err_z.dtype),
                out[:, 2 * n:2 * n + mz],
                out[:, 2 * n + mz:F - 1],
                out[:, F - 1] > 0.5)

    def _chunk_body(self, tile_keys, p, n_valid):
        """One per-device chunk: sample + decode [+ OSD] + classify -> int32
        counters. Self-contained (OSD failures are fully resolved in-chunk);
        the engine's dispatch groups use _chunk_body_defer instead, which
        defers failed shots to one group-level OSD pass.

        tile_keys: (tiles_per_dev, 2) uint32, one key per global RNG tile.
        """
        err_x, err_z, sy_z, sy_x = self._sample_chunk(tile_keys, p)
        valid = jnp.arange(err_x.shape[0]) < n_valid
        if self.sort_window:
            err_x, err_z, sy_z, sy_x, valid = self._sort_records(
                err_x, err_z, sy_z, sy_x, valid)
        prior = p / 3.0  # reference prior (landmine L3, simulator.py:278-279)
        res_x = self.dec_x(sy_z, prior)
        res_z = self.dec_z(sy_x, prior)
        ex_hat, ez_hat = res_x.e_hat, res_z.e_hat
        if self.use_osd:
            ex_hat = self._apply_osd(self.osd_x, ex_hat, res_x.posterior,
                                     sy_z, (~res_x.converged) & valid)
            ez_hat = self._apply_osd(self.osd_z, ez_hat, res_z.posterior,
                                     sy_x, (~res_z.converged) & valid)
        return self._count(err_x, err_z, ex_hat, ez_hat,
                           sy_z, sy_x, res_x.n_iter, res_z.n_iter, valid)

    def _apply_osd(self, osd, e_hat, post, syn, failed):
        """Windowed OSD over the `failed` shots of a batch, fully on device.

        The reference reaches OSD only when the iterative decoder exits
        without converging (decoders.py:179-180); here the failed shots are
        compacted to the front of the batch by a stable argsort (same trick
        as the cascade, decoders/cascade.py:88) and OSD runs over fixed-size
        windows of that prefix inside a lax.while_loop: zero failures costs
        zero OSD trips, a failure spike just runs more trips of the ONE
        compiled window shape. No host round trip, no host-side compaction.
        """
        B = e_hat.shape[0]
        # Window size: 256 (or the whole batch when smaller) — the r4 cap
        # sweep measured 256 optimal on v5e (1024-lane windows were ~20%
        # SLOWER on config 5: the elimination kernel's grid iterates
        # 128-lane blocks sequentially, so wider windows amortize nothing
        # and pay more padding). The compacted index buffer is padded up
        # to a multiple of the window so the dynamic_slice below never
        # clamps — previously cap = gcd(B, 256) silently degenerated to
        # 1-shot windows for odd batch sizes (ADVICE #3).
        cap = min(B, 256)
        B_pad = -(-B // cap) * cap
        # Compaction by cumsum-scatter (same stable lane-ascending order as
        # a stable argsort of ~failed, at a fraction of a sort's cost):
        # order[p] = lane of the p-th failed shot; empty slots hold B, so
        # their window writes fall out of bounds and are dropped.
        order = _compact_indices(failed, B_pad, fill=B)
        n_failed = jnp.sum(failed)

        def cond(c):
            lo, _ = c
            return lo < n_failed

        def body(c):
            lo, e_cur = c
            idx = jax.lax.dynamic_slice(order, (lo,), (cap,))
            win_valid = (lo + jnp.arange(cap)) < n_failed
            e_new = osd(e_cur[idx], syn[idx], post[idx])
            e_new = jnp.where(win_valid[:, None], e_new, e_cur[idx])
            return lo + cap, e_cur.at[idx].set(e_new, mode="drop")

        _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), e_hat))
        return out

    def _chunk_body_defer(self, tile_keys, p, n_valid):
        """Chunk body for dispatch groups with OSD: decode, count the shots
        that need no OSD, and emit the (compacted, fixed-capacity) records
        of decoder-failed shots for the ONE group-level OSD pass
        (_osd_group_finish). Failures beyond the deferral capacity — only
        possible at very high p — are OSD-processed in-chunk, so counters
        never depend on the failure rate."""
        err_x, err_z, sy_z, sy_x = self._sample_chunk(tile_keys, p)
        B = err_x.shape[0]
        valid = jnp.arange(B) < n_valid
        if self.sort_window:
            err_x, err_z, sy_z, sy_x, valid = self._sort_records(
                err_x, err_z, sy_z, sy_x, valid)
        prior = p / 3.0
        res_x = self.dec_x(sy_z, prior)
        res_z = self.dec_z(sy_x, prior)
        failed_u = (~(res_x.converged & res_z.converged)) & valid
        F = self._defer_cap
        # cumsum-scatter compaction (lane-ascending, same set a stable
        # argsort prefix would pick); lanes whose failure rank exceeds F
        # overflow to the in-chunk OSD below.
        pos = jnp.cumsum(failed_u) - 1
        deferred = failed_u & (pos < F)
        didx = _compact_indices(failed_u, F, fill=0, pos=pos)
        n_defer = jnp.minimum(jnp.sum(failed_u), F)
        dvalid = jnp.arange(F) < n_defer

        ex_hat = self._apply_osd(self.osd_x, res_x.e_hat, res_x.posterior,
                                 sy_z, (~res_x.converged) & valid & ~deferred)
        ez_hat = self._apply_osd(self.osd_z, res_z.e_hat, res_z.posterior,
                                 sy_x, (~res_z.converged) & valid & ~deferred)
        counts = classify_batch(self.classifier, err_x, err_z, ex_hat, ez_hat,
                                sy_z, sy_x, valid=valid & ~deferred)
        # Iteration counters are OSD-independent (reference: OSD never
        # touches n_iter) — count them here for ALL valid shots.
        counts["nIterAccX"] = jnp.sum(jnp.where(valid, res_x.n_iter, 0),
                                      dtype=jnp.int32)
        counts["nIterAccZ"] = jnp.sum(jnp.where(valid, res_z.n_iter, 0),
                                      dtype=jnp.int32)
        # Deferred-record extraction as one-hot MXU matmuls instead of row
        # gathers: TPU row gathers measure ~2 GB/s on this backend while a
        # (F, B) @ (B, cols) one-hot matmul is effectively free (the r4
        # group-cascade lesson, docs/PERFORMANCE.md). 0/1 payloads ride
        # ONE bf16 matmul (exact); the two f32 posteriors ride an f32
        # one-hot matmul (also exact: a one-hot row picks a single term).
        i8 = jnp.int8
        bf16, f32 = jnp.bfloat16, jnp.float32
        onehot = (didx[:, None] == jnp.arange(B, dtype=jnp.int32)[None, :])
        data01 = jnp.concatenate(
            [err_x.astype(bf16), err_z.astype(bf16),
             sy_z.astype(bf16), sy_x.astype(bf16),
             res_x.e_hat.astype(bf16), res_z.e_hat.astype(bf16),
             res_x.converged[:, None].astype(bf16),
             res_z.converged[:, None].astype(bf16)], axis=1)
        picked = jnp.dot(onehot.astype(bf16), data01,
                         preferred_element_type=f32)
        post2 = jnp.dot(onehot.astype(f32),
                        jnp.concatenate([res_x.posterior, res_z.posterior],
                                        axis=1),
                        preferred_element_type=f32)
        n = err_x.shape[1]
        mz, mx = sy_z.shape[1], sy_x.shape[1]
        cols = {}
        o = 0
        for name, width in (("err_x", n), ("err_z", n), ("sy_z", mz),
                            ("sy_x", mx), ("ex", n), ("ez", n),
                            ("cx", 1), ("cz", 1)):
            cols[name] = picked[:, o:o + width]
            o += width
        defer = dict(
            err_x=cols["err_x"].astype(err_x.dtype),
            err_z=cols["err_z"].astype(err_z.dtype),
            sy_z=cols["sy_z"].astype(i8), sy_x=cols["sy_x"].astype(i8),
            ex=cols["ex"].astype(i8), ez=cols["ez"].astype(i8),
            px=post2[:, :n], pz=post2[:, n:],
            cx=cols["cx"][:, 0] > 0.5, cz=cols["cz"][:, 0] > 0.5,
            dv=dvalid,
        )
        return counts, defer

    def _osd_group_finish(self, defer):
        """One OSD pass over a whole dispatch group's deferred failed shots.

        defer: dict of (G, F, ...) record arrays stacked by the chunk scan.
        Flattening G x F and compacting fills the fixed OSD windows ~G times
        denser than per-chunk processing — the window count (and with it the
        elimination-kernel cost, which is per window) drops by the same
        factor. Returns the event counters of the deferred shots."""
        flat = {k: v.reshape((-1,) + v.shape[2:]) for k, v in defer.items()}
        dv = flat["dv"]
        sy_z = flat["sy_z"].astype(jnp.float32)
        sy_x = flat["sy_x"].astype(jnp.float32)
        ex = self._apply_osd(self.osd_x, flat["ex"], flat["px"], sy_z,
                             (~flat["cx"]) & dv)
        ez = self._apply_osd(self.osd_z, flat["ez"], flat["pz"], sy_x,
                             (~flat["cz"]) & dv)
        counts = classify_batch(self.classifier, flat["err_x"],
                                flat["err_z"], ex, ez, sy_z, sy_x, valid=dv)
        counts["nIterAccX"] = jnp.int32(0)  # already counted in-chunk
        counts["nIterAccZ"] = jnp.int32(0)
        return counts

    def _multi_chunk_body(self, keys, p, n_valids):
        """G fused chunks in one dispatch: lax.scan over per-chunk tile keys,
        counters summed on device. keys: (G, tiles, 2); n_valids: (G,).
        Padding chunks carry n_valid=0 and contribute nothing (every counter
        is masked by the valid lane mask in _count). With OSD enabled, the
        scan defers failed shots and ONE group-level OSD pass finishes them
        (still inside this jit — one dispatch per group either way)."""

        if self.use_group_cascade:
            return self._group_cascade.multi_chunk_body(keys, p, n_valids)
        return self._multi_chunk_body_nogc(keys, p, n_valids)

    def _multi_chunk_body_nogc(self, keys, p, n_valids):
        """The non-group-cascade multi-chunk body (full in-chunk cascade
        [+ OSD deferral]); also the bit-exact fallback simulate_p re-runs a
        dispatch group through when a chunk's stragglers overflow the
        cascade-deferral capacity."""
        if not self.use_osd:
            def step(_, xs):
                k, nv = xs
                return None, self._chunk_body(k, p, nv)

            _, per_chunk = jax.lax.scan(step, None, (keys, n_valids))
            return {k: jnp.sum(v, axis=0) for k, v in per_chunk.items()}

        def step(_, xs):
            k, nv = xs
            return None, self._chunk_body_defer(k, p, nv)

        _, (per_chunk, defer) = jax.lax.scan(step, None, (keys, n_valids))
        counts = {k: jnp.sum(v, axis=0) for k, v in per_chunk.items()}
        extra = self._osd_group_finish(defer)
        return {k: counts[k] + extra[k] for k in counts}

    def _count(self, err_x, err_z, ex_hat, ez_hat, sy_z, sy_x,
               it_x, it_z, valid):
        counts = classify_batch(self.classifier, err_x, err_z, ex_hat, ez_hat,
                                sy_z, sy_x, valid=valid)
        counts["nIterAccX"] = jnp.sum(jnp.where(valid, it_x, 0), dtype=jnp.int32)
        counts["nIterAccZ"] = jnp.sum(jnp.where(valid, it_z, 0), dtype=jnp.int32)
        return counts

def _ckpt_id(kind: str, pipe: "ShotPipeline", cfg: SimConfig, seed: int,
             extra: dict) -> str:
    """Checkpoint identity digest.

    Pins EVERYTHING that determines the counter stream and its chunk
    layout: the code itself (Hx/Hz bytes), the fully resolved decoder
    config (dec type/schedule/iterations/OSD order, beta/eps, BF residual,
    layer_compat, impl, platform, cascade knobs), the chunk layout
    (batch size, RNG tile size, device count — `chunks_done` is only
    meaningful under the layout that wrote it), shots, seed, and the
    caller's extras (p value(s), p-index, sweep geometry). Resuming after
    changing ANY of these misses the old checkpoint instead of silently
    reusing stale counts; two codes sharing a checkpoint_dir can no longer
    collide (round-3 verdict items: weak #1, ADVICE #1)."""
    payload = {
        "kind": kind,
        "Hx_shape": list(pipe.Hx.shape), "Hz_shape": list(pipe.Hz.shape),
        "Hx": hashlib.sha256(pipe.Hx.tobytes()).hexdigest(),
        "Hz": hashlib.sha256(pipe.Hz.tobytes()).hexdigest(),
        "dcfg": dataclasses.asdict(pipe.dcfg),
        "batch": pipe.batch, "tile": pipe.tile, "n_dev": pipe.n_dev,
        "shots": cfg.shots, "seed": int(seed),
        "validate_encoding": bool(cfg.validate_encoding),
        **extra,
    }
    blob = json.dumps(payload, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:20]


def simulate_p(Hx: np.ndarray, Hz: np.ndarray, p: float,
               cfg: Optional[SimConfig] = None,
               pipeline: Optional[ShotPipeline] = None,
               p_index: int = 0) -> PPointResult:
    """Monte-Carlo qBLER estimate at one depolarization probability
    (reference: simulator.simulate_p, simulator.py:167-315)."""
    cfg = cfg or SimConfig()
    pipe = pipeline or ShotPipeline(Hx, Hz, cfg)
    shots = cfg.shots
    batch = pipe.batch
    n_chunks = -(-shots // batch)

    seed = cfg.rng_seed if cfg.rng_seed is not None else 0
    with pipe.device_ctx():
        # Key derivation must also honor the pipeline's execution device —
        # otherwise the CPU-fallback path would still touch the default
        # (TPU) backend just to fold the seed.
        key = jax.random.fold_in(jax.random.PRNGKey(seed), p_index)

    store = CheckpointStore(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
    # Readable prefix + full-identity digest (_ckpt_id): a resume with ANY
    # changed parameter — including the code matrices, batch/tile layout,
    # or any decoder knob — misses the checkpoint instead of silently
    # returning stale counts.
    ckpt_id = (f"p{p_index}_{cfg.dec_type}{cfg.dec_schedule}_" +
               _ckpt_id("p", pipe, cfg, seed,
                        {"p": f"{p:.17e}", "p_index": int(p_index)}))
    totals = {k: 0 for k in _COUNTER_KEYS}
    start_chunk = 0
    if store is not None:
        saved = store.load(ckpt_id)
        if saved is not None:
            totals, start_chunk = saved

    t0 = time.perf_counter()
    t_first = None  # set after the first chunk (jit compile lands there)
    warm_shots = 0
    from qldpcsim_tpu.parallel.mesh import chunk_keys

    # The fused chunk body (decode + in-body OSD when enabled) scans G chunks
    # per dispatch, counters summed on device — one host round trip per G
    # chunks. The FINAL group shrinks to the remaining chunk count (at most
    # one extra compiled shape) instead of padding to G with dead compute.
    G = max(1, min(pipe.dispatch_chunks, n_chunks - start_chunk))
    tpc = pipe.tiles_per_chunk
    c = start_chunk
    while c < n_chunks:
        g = min(G, n_chunks - c)
        group_valid = min(g * batch, shots - c * batch)
        try:
            with pipe.device_ctx():
                # Global tile stream: chunk c owns tiles
                # [c * tpc, (c+1) * tpc).
                keys = chunk_keys(key, c * tpc, g * tpc)
                if cfg.mesh is not None:
                    ndev, per_dev = pipe.n_dev, pipe.per_dev
                    # keys[d, i] = tiles of chunk c+i owned by device d
                    keys = keys.reshape(g, ndev, pipe.tiles_per_dev, -1)
                    keys = jnp.swapaxes(keys, 0, 1)
                    base = (c + np.arange(g)[None, :]) * batch  # (1, g)
                    nv = np.clip(
                        shots - base - np.arange(ndev)[:, None] * per_dev,
                        0, per_dev)
                    counts = pipe._multi_counts(keys, jnp.float32(p),
                                                jnp.asarray(nv, jnp.int32))
                else:
                    keys = keys.reshape(g, tpc, -1)
                    nv = np.clip(shots - (c + np.arange(g)) * batch,
                                 0, batch)
                    counts = pipe._multi_counts(keys, jnp.float32(p),
                                                jnp.asarray(nv, jnp.int32))
            counts = jax.device_get(counts)
        except Exception as e:  # noqa: BLE001 — compile/dispatch failure
            # First-dispatch CPU fallback: the remote TPU compiler still
            # SIGSEGVs on SOME small decode graphs (r5 evidence: BP at
            # min dim <= 3; the crash is contained to the AOT helper
            # subprocess and surfaces here as a fast exception). Before
            # any counters have accumulated, rebuild the pipeline on the
            # CPU backend and restart — counters stay bit-exact by the
            # RNG tile contract. Mid-run failures re-raise (partial
            # totals must not silently mix layouts).
            if not (c == start_chunk and cfg.mesh is None
                    and cfg.device == "auto"
                    and pipe.exec_device is None):
                raise
            import warnings

            warnings.warn(
                f"decode graph failed to compile on the default backend "
                f"({type(e).__name__}); falling back to CPU for this "
                "pipeline", RuntimeWarning)
            cfg = dataclasses.replace(cfg, device="cpu")
            pipe = ShotPipeline(Hx, Hz, cfg)
            with pipe.device_ctx():
                key = jax.random.fold_in(jax.random.PRNGKey(seed), p_index)
            continue
        if int(np.asarray(counts.get("gcOverflow", 0)).sum()):
            # A chunk's stragglers overflowed the cascade-deferral capacity
            # (very high p): they were not counted, so re-run the whole
            # group through the non-deferring path (bit-exact by the RNG
            # tile contract; compiled on first use). The deferring scan
            # body carries no lax.cond fallback because a conditional with
            # a heavy branch measured 0.66 ms/chunk of overhead on v5e.
            with pipe.device_ctx():
                counts = jax.device_get(pipe._multi_counts_nogc(
                    keys, jnp.float32(p), jnp.asarray(nv, jnp.int32)))
        if t_first is None:
            t_first = time.perf_counter()
        else:
            warm_shots += group_valid
        for k in _COUNTER_KEYS:
            totals[k] += int(counts[k])
        c += g
        if store is not None:
            store.save(ckpt_id, totals, c)
        if cfg.progress:
            done_shots = min(c * batch, shots)
            print(f"\r(p={p:5.2e}) decoded {done_shots}/{shots} shots",
                  end="", flush=True)
    t_end = time.perf_counter()
    elapsed = t_end - t0
    warm_elapsed = (t_end - t_first) if (t_first is not None
                                         and warm_shots) else float("nan")
    if cfg.progress:
        print()

    return PPointResult(
        p=float(p),
        shots=shots,
        counters={k: totals[k] for k in _COUNTER_KEYS if not k.startswith("nIter")},
        avg_iterations_x=totals["nIterAccX"] / float(shots),
        avg_iterations_z=totals["nIterAccZ"] / float(shots),
        wall_time_s=elapsed,
        warm_time_s=warm_elapsed,
        warm_shots=warm_shots,
    )


def simulate_sweep(Hx: np.ndarray, Hz: np.ndarray, ps: Sequence[float],
                   cfg: SimConfig) -> List[PPointResult]:
    """p-sweep with p-points as a mesh axis (cfg.mesh_p rows).

    The reference's outer p-loop (simulator.py:335-339) is the second
    shardable axis (SURVEY.md §2): a ('p','shots') 2-D mesh over all
    devices decodes cfg.mesh_p p-values per dispatch, each p-row sharding
    its shot chunks over the devices of that row, with per-p counter rows
    psum-reduced over the 'shots' axis only. The per-p RNG key hierarchy
    (seed -> p-index -> global tile) and per-row chunk layout are identical
    to the serial p-loop, so per-p counters are BIT-EXACT vs simulate_p
    (tested in tests/test_psweep.py). cfg.checkpoint_dir checkpoints per
    (p-block, dispatch group) — a preempted sweep resumes at the last
    completed group of the current block, like the serial path.
    """
    from jax.sharding import Mesh, PartitionSpec as P

    from qldpcsim_tpu.parallel.mesh import chunk_keys

    n_p = int(cfg.mesh_p)
    assert n_p >= 1
    devices = (np.asarray(cfg.mesh.devices).reshape(-1) if cfg.mesh is not None
               else np.asarray(jax.devices()))
    if devices.size % n_p:
        raise ValueError(f"mesh_p={n_p} must divide device count {devices.size}")
    if n_p == 1 and devices.size == 1:
        # A (1, 1) mesh adds nothing over the serial loop (same chunking,
        # same keys, bit-identical counters) but forces a shard_map
        # partitioned compile — observed to hang this environment's remote
        # TPU compiler. Degrade to the serial path.
        scfg = dataclasses.replace(cfg, mesh=None, mesh_p=0)
        pipe = ShotPipeline(Hx, Hz, scfg)
        return [simulate_p(Hx, Hz, pT, scfg, pipeline=pipe, p_index=i)
                for i, pT in enumerate(np.asarray(ps, dtype=np.float64))]
    ndev_s = devices.size // n_p
    grid = devices.reshape(n_p, ndev_s)
    mesh2 = Mesh(grid, ("p", "shots"))
    # Pipeline sized for ONE p-row's shots submesh (its shard wrappers are
    # built but unused — simulate_sweep shard_maps the chunk body itself).
    row_mesh = Mesh(grid[0], ("shots",))
    pipe = ShotPipeline(Hx, Hz, dataclasses.replace(cfg, mesh=row_mesh,
                                                    mesh_p=0))
    shots, batch = cfg.shots, pipe.batch
    n_chunks = -(-shots // batch)
    G = max(1, min(pipe.dispatch_chunks, n_chunks))
    tpc, tpd = pipe.tiles_per_chunk, pipe.tiles_per_dev
    per_dev = pipe.per_dev
    seed = cfg.rng_seed if cfg.rng_seed is not None else 0
    base_key = jax.random.PRNGKey(seed)

    def make_step(body):
        def per_device(p_blk, keys_blk, nv_blk):
            counts = body(keys_blk[0, 0], p_blk[0], nv_blk[0, 0])
            counts = {k: jax.lax.psum(v, "shots") for k, v in counts.items()}
            # all-gather the per-p rows so the result is fully replicated —
            # under a multi-PROCESS mesh every process must be able to
            # fetch the whole (n_p,) counter vector (p-sharded output rows
            # would not be addressable off-process).
            return {k: jax.lax.all_gather(v, "p") for k, v in counts.items()}

        body_jit = jax.jit(body)

        _pd_seq = iter(range(1 << 62))

        def step_perdevice(p_vec, keys, nv):
            """Per-device-dispatch sweep step (exec_mode='perdevice'): one
            single-device jit per LOCAL (p-row, device) cell of the grid,
            counters host-reduced per p-row and (multi-process) summed
            across processes via the coordination-service KV store —
            bit-exact vs the shard_map step by the RNG tile contract. See
            parallel.mesh.per_device_multi_chunk_fn."""
            from qldpcsim_tpu.parallel.mesh import allreduce_counters_host

            keys_h = np.asarray(jax.device_get(keys))
            nv_h = np.asarray(jax.device_get(nv))
            p_h = np.asarray(jax.device_get(p_vec))
            me = jax.process_index()
            cells = [(ip, d) for ip in range(n_p) for d in range(ndev_s)
                     if grid[ip, d].process_index == me]
            futs = [body_jit(jax.device_put(keys_h[ip, d], grid[ip, d]),
                             jax.device_put(jnp.float32(p_h[ip]),
                                            grid[ip, d]),
                             jax.device_put(nv_h[ip, d], grid[ip, d]))
                    for ip, d in cells]
            res = jax.device_get(futs)
            loc = {k: np.zeros(n_p, np.int64) for k in res[0]}
            for (ip, _), r in zip(cells, res):
                for k in loc:
                    loc[k][ip] += int(r[k])
            return allreduce_counters_host(loc, "pdsweep", next(_pd_seq))

        if pipe.exec_mode == "perdevice":
            return step_perdevice
        stp = jax.jit(jax.shard_map(
            per_device, mesh=mesh2,
            in_specs=(P("p"), P("p", "shots"), P("p", "shots")),
            out_specs=P(), check_vma=False))
        if jax.process_count() == 1:
            from qldpcsim_tpu.parallel.mesh import with_perdevice_fallback

            stp = with_perdevice_fallback(stp, lambda: step_perdevice)
        return stp

    step = make_step(pipe._multi_chunk_body)
    step_nogc = (make_step(pipe._multi_chunk_body_nogc)
                 if pipe.use_group_cascade else step)

    ps = np.asarray(ps, dtype=np.float64)
    store = CheckpointStore(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
    results: List[PPointResult] = []
    for blk0 in range(0, ps.size, n_p):
        blk = ps[blk0: blk0 + n_p]
        pad = n_p - blk.size
        p_vec = jnp.asarray(np.concatenate([blk, np.repeat(blk[-1:], pad)]),
                            jnp.float32)
        keys_p = [jax.random.fold_in(base_key, blk0 + i)
                  for i in range(blk.size)]
        keys_p += [keys_p[-1]] * pad  # dummy rows (nv=0 -> no contribution)
        totals = {k: np.zeros(n_p, np.int64) for k in _COUNTER_KEYS}
        ckpt_id = (f"sweepblk{blk0}_{cfg.dec_type}{cfg.dec_schedule}_" +
                   _ckpt_id("sweep", pipe, cfg, seed,
                            {"blk0": int(blk0), "n_p": n_p,
                             "ps": [f"{v:.17e}" for v in blk]}))
        start_chunk = 0
        if store is not None:
            saved = store.load(ckpt_id)
            if saved is not None:
                saved_tot, start_chunk = saved
                totals = {k: np.asarray(v, np.int64)
                          for k, v in saved_tot.items()}
        t0 = time.perf_counter()
        t_first = None  # first dispatch includes the jit compile
        warm_shots = 0
        c = start_chunk
        while c < n_chunks:
            g = min(G, n_chunks - c)
            group_valid = min(g * batch, shots - c * batch)
            # per-p keys, laid out exactly like the 1-D mesh path:
            # keys[ip, d, i] = tiles of chunk c+i owned by device d of row ip
            keys = jnp.stack([
                jnp.swapaxes(chunk_keys(kp, c * tpc, g * tpc)
                             .reshape(g, ndev_s, tpd, -1), 0, 1)
                for kp in keys_p])                      # (n_p, ndev_s, g, tpd, 2)
            base = (c + np.arange(g)[None, :]) * batch  # (1, g)
            nv = np.clip(shots - base - np.arange(ndev_s)[:, None] * per_dev,
                         0, per_dev)                    # (ndev_s, g)
            nv = np.broadcast_to(nv, (n_p, ndev_s, g)).copy()
            if pad:
                nv[blk.size:] = 0
            counts = jax.device_get(step(p_vec, keys,
                                         jnp.asarray(nv, jnp.int32)))
            if int(np.asarray(counts.get("gcOverflow", 0)).sum()):
                # cascade-deferral overflow: re-run the group through the
                # non-deferring path (see simulate_p)
                counts = jax.device_get(step_nogc(
                    p_vec, keys, jnp.asarray(nv, jnp.int32)))
            if t_first is None:
                t_first = time.perf_counter()
            else:
                warm_shots += group_valid
            for k in _COUNTER_KEYS:
                totals[k] += np.asarray(counts[k], np.int64)
            c += g
            if store is not None:
                store.save(ckpt_id,
                           {k: [int(x) for x in v] for k, v in totals.items()},
                           c)
            if cfg.progress:
                print(f"\r(p-block {blk0 // n_p}) decoded "
                      f"{min(c * batch, shots)}/{shots} shots x {blk.size} p",
                      end="", flush=True)
        t_end = time.perf_counter()
        elapsed = t_end - t0
        warm_elapsed = (t_end - t_first) if (t_first is not None
                                            and warm_shots) else float("nan")
        if cfg.progress:
            print()
        # All p-points of a block decode CONCURRENTLY in the same dispatches
        # (each p-row is a mesh row), so (round-3 verdict weak #4/ADVICE #2):
        #   * wall_time_s is the block total divided across its points —
        #     summing wall_time_s over all rows reproduces total runtime;
        #   * warm_time_s is the UNdivided post-compile block time, so
        #     shots_per_s_warm = warm_shots/warm_time_s is the real rate at
        #     which this p-point's own shots were decoded on its 1/n_p
        #     device share — directly comparable with a serial run.
        for i, pT in enumerate(blk):
            results.append(PPointResult(
                p=float(pT), shots=shots,
                counters={k: int(totals[k][i]) for k in _COUNTER_KEYS
                          if not k.startswith("nIter")},
                avg_iterations_x=int(totals["nIterAccX"][i]) / float(shots),
                avg_iterations_z=int(totals["nIterAccZ"][i]) / float(shots),
                wall_time_s=elapsed / blk.size,
                warm_time_s=warm_elapsed,
                warm_shots=warm_shots,
            ))
    return results


def simulate(HxFile: str, HzFile: str, p: Sequence[float],
             shots: int = 1000, decType: str = "MS", decIterations: int = 99,
             decSchedule: str = "F", OSDorder: int = -1,
             rngSeed: Optional[int] = None, **kwargs) -> List[PPointResult]:
    """p-sweep driver with the reference's signature and results table
    (reference: simulator.simulate, simulator.py:319-347)."""
    from qldpcsim_tpu.codes.loader import load_matrix

    Hx = load_matrix(HxFile)
    Hz = load_matrix(HzFile)
    p = np.asarray(p, dtype=np.float64)
    assert p.max() <= 1.0 and p.min() >= 0.0

    cfg = SimConfig(shots=shots, dec_type=decType, dec_iterations=decIterations,
                    dec_schedule=decSchedule, osd_order=OSDorder,
                    rng_seed=rngSeed, **kwargs)
    if cfg.mesh_p:
        results = simulate_sweep(Hx, Hz, p, cfg)
    else:
        pipe = ShotPipeline(Hx, Hz, cfg)
        results = [simulate_p(Hx, Hz, pT, cfg, pipeline=pipe, p_index=i)
                   for i, pT in enumerate(p)]
    print(format_results_table(results))
    return results
