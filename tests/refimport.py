"""Path-import the LITERAL reference decoders as a parity oracle.

The reference package (/root/reference/qLDPCsim) cannot be imported normally:
`simulator.py` needs stim and py3.13 syntax. But `gf2math.py` and
`decoders.py` are numpy-only and run fine under numpy 2.0 / py3.12, so this
module loads exactly those two files by path under a stub `qLDPCsim` package
and exposes them. Every parity claim made against these functions is a claim
against the reference's own code, not a re-implementation of its semantics.

Used by tests/test_reference_parity.py and benchmarks/parity.py
(--oracle reference).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REF_DIR = "/root/reference/qLDPCsim"

_cache = {}


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REF_DIR, "decoders.py")) and \
        os.path.isfile(os.path.join(REF_DIR, "gf2math.py"))


def _load_by_path(fullname: str, path: str):
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Return the literal reference (gf2math, decoders) modules.

    Installs a stub `qLDPCsim` package (so `from qLDPCsim import gf2math`
    inside the reference's decoders.py resolves) and loads the two
    numpy-only reference modules from /root/reference by file path.
    """
    if "modules" in _cache:
        return _cache["modules"]
    if not reference_available():
        raise RuntimeError(f"reference tree not found at {REF_DIR}")
    if "qLDPCsim" not in sys.modules:
        pkg = types.ModuleType("qLDPCsim")
        pkg.__path__ = []  # mark as package
        sys.modules["qLDPCsim"] = pkg
    pkg = sys.modules["qLDPCsim"]
    gf2math = _load_by_path("qLDPCsim.gf2math",
                            os.path.join(REF_DIR, "gf2math.py"))
    pkg.gf2math = gf2math
    decoders = _load_by_path("qLDPCsim.decoders",
                             os.path.join(REF_DIR, "decoders.py"))
    pkg.decoders = decoders
    _cache["modules"] = (gf2math, decoders)
    return _cache["modules"]
