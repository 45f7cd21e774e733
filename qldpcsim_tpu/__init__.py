"""qldpcsim_tpu — TPU-native quantum-LDPC Monte Carlo engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
simulator qLDPCsim (see /root/reference): Monte-Carlo estimation of the quantum
block error rate (qBLER) of CSS codes under depolarizing noise, with

  * a native on-device GF(2) encoder + depolarizing channel + syndrome extractor
    (replacing the reference's Stim circuit simulation),
  * batched BP / normalized-min-sum / bit-flipping / naive-greedy decoders with
    flooding / layered / serial schedules and GF(2) OSD post-processing,
  * shot- and p-point-sharding over a `jax.sharding.Mesh` with psum-reduced
    counters, and
  * Pallas TPU kernels for the hot message-passing updates.

Public surface mirrors the reference package layout (reference:
qLDPCsim/__init__.py:1-2) while fixing its `PMClibrary` typo.
"""

from qldpcsim_tpu.version import __version__

__all__ = [
    "__version__",
    "codes",
    "gf2",
    "channel",
    "decoders",
    "engine",
    "parallel",
    "ops",
    "utils",
    "simulate",
    "simulate_p",
]


def __getattr__(name):
    # Lazy imports keep `import qldpcsim_tpu` cheap (no jax import on startup).
    import importlib

    if name in ("codes", "gf2", "channel", "decoders", "engine", "parallel", "ops", "utils"):
        return importlib.import_module(f"qldpcsim_tpu.{name}")
    if name in ("simulate", "simulate_p"):
        mod = importlib.import_module("qldpcsim_tpu.engine.montecarlo")
        return getattr(mod, name)
    raise AttributeError(f"module 'qldpcsim_tpu' has no attribute {name!r}")
