"""Auxiliary subsystems: checkpoint/resume, profiling, config helpers
(SURVEY.md §5 — all absent in the reference; built TPU/cluster-native here)."""

from qldpcsim_tpu.utils.checkpoint import CheckpointStore
from qldpcsim_tpu.utils.profiling import Timer, ThroughputMeter, trace_context

__all__ = ["CheckpointStore", "Timer", "ThroughputMeter", "trace_context"]
