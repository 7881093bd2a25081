"""Replay-harness helper: deterministic landing-file processing order.

The availableNow/maxFilesPerTrigger file source orders files by
modification time, and back-to-back writes can share an mtime on
coarse-granularity filesystems (ADVICE r9) — so a replay harness that
needs "batch i processed before batch i+1" must stamp strictly
increasing mtimes rather than rely on a filesystem accident. This is
DRIVER-LOCAL by design: it orders the synthetic landing files the
replay harnesses write to a local tempdir; a real deployment's landing
zone is populated by an upstream producer whose arrival times are the
order (nothing to stamp).
"""

from __future__ import annotations

import os


def dedup_cuts(cuts: list) -> list:
    """approxQuantile can return DUPLICATE cut values on small or
    skewed key distributions, which would make some replay batch
    ranges empty — a silent degenerate replay where the effective
    batch count is smaller than requested (ADVICE r10). Collapse to a
    strictly increasing list; callers derive the effective batch count
    from len(cuts) + 1 so every written batch is a non-degenerate
    range."""
    out: list = []
    for c in cuts:
        if not out or c > out[-1]:
            out.append(c)
    return out


def stamp_landing_mtimes(batch_dir: str, seq: int) -> None:
    """Stamp every file in `batch_dir` with mtime 1_000_000 + seq so
    the file source processes batch dirs in `seq` order."""
    for fname in os.listdir(batch_dir):
        os.utime(
            os.path.join(batch_dir, fname),
            (1_000_000 + seq, 1_000_000 + seq),
        )
