"""TPU kernels (Pallas) and the static structure they exploit."""

from qldpcsim_tpu.ops.qc import QCStructure, detect_qc

__all__ = ["QCStructure", "detect_qc"]
