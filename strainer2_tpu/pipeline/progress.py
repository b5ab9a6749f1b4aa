"""Checkpoint/resume for panel counting (real, not just observability).

The reference's -p progress file only records which panel files were
started (reference src/kmer_scrub_count.c:78-85, src/genome_compare.c:
133-136) — a crash loses all counts.  Here each completed panel file
persists the merged slot-indexed count buffer plus a manifest, so a
restarted run skips finished files and continues from the exact counts.
Counts are integers, so resume is bit-identical to an uninterrupted run.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

__all__ = ["ScrubCheckpoint"]


class ScrubCheckpoint:
    """Directory-backed checkpoint: counts_<col>.npy + manifest.json."""

    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self._manifest_path = os.path.join(directory, "manifest.json")
        self._manifest = {"done": {}}
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self._manifest = json.load(f)

    def done_files(self, column: int) -> list[str]:
        return list(self._manifest["done"].get(str(column), []))

    def counts(self, column: int) -> np.ndarray | None:
        path = os.path.join(self.dir, f"counts_{column}.npy")
        if os.path.exists(path) and self.done_files(column):
            return np.load(path)
        return None

    def record(self, column: int, path: str, counts: np.ndarray) -> None:
        """Persist counts after completing one panel file (atomic)."""
        tmp_fd, tmp_path = tempfile.mkstemp(dir=self.dir, suffix=".npy")
        os.close(tmp_fd)
        np.save(tmp_path, counts, allow_pickle=False)
        os.replace(tmp_path, os.path.join(self.dir, f"counts_{column}.npy"))
        self._manifest["done"].setdefault(str(column), []).append(path)
        tmp_fd, tmp_manifest = tempfile.mkstemp(dir=self.dir, suffix=".json.tmp")
        with os.fdopen(tmp_fd, "w") as f:
            json.dump(self._manifest, f)
        os.replace(tmp_manifest, self._manifest_path)
