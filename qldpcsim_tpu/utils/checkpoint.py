"""Per-p-point counter checkpointing for preemptible sweeps
(SURVEY.md §5.3/§5.4 — the reference loses everything on a kill; results are
only printed, never persisted, simulator.py:342-347).

Counters are integers and chunk keys are derived deterministically from the
global chunk index, so resume is idempotent: a rerun of a completed chunk
would produce identical counts, and completed chunks are simply skipped.
Only process 0 writes in multi-host runs.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Dict, Optional, Tuple


class CheckpointStore:
    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, run_id: str) -> str:
        return os.path.join(self.dir, f"{run_id}.json")

    def save(self, run_id: str, counters: Dict[str, int], chunks_done: int):
        try:
            import jax

            if jax.process_index() != 0:
                return
        except Exception:
            pass
        payload = {"counters": counters, "chunks_done": chunks_done}
        # Atomic write: temp file + rename, so a preemption mid-write never
        # corrupts the checkpoint.
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self._path(run_id))

    def load(self, run_id: str) -> Optional[Tuple[Dict[str, int], int]]:
        path = self._path(run_id)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            payload = json.load(f)
        return payload["counters"], payload["chunks_done"]
