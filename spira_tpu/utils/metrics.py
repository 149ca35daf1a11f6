"""Progress, throughput metrics, and logging.

Keeps the reference's UX mechanisms (SURVEY.md §5): wall-clock elapsed +
pixels/second prints (`/root/reference/src/spira-metal-optimized.jl:1482-1483`),
per-sample ETA (`/root/reference/examples/julia-raytracer-optimized-metal.jl:1414-1420`),
row/sample progress counters — but as a structured reporter with log levels
and machine-readable counters instead of bare `println`s, and with the
hot loop untouched (reporting happens host-side between device dispatches,
never inside jit).
"""

from __future__ import annotations

import logging
import sys
import time

logger = logging.getLogger("spira_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("[%(levelname)s spira] %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


class RenderMeter:
    """Throughput/ETA tracker for chunked renders.

    rays/sec counts traced path segments: W·H·spp·max_depth — the unit of
    BASELINE.md's primary metric.
    """

    def __init__(self, width, height, spp_total, max_depth, enabled=True):
        self.width = width
        self.height = height
        self.spp_total = spp_total
        self.max_depth = max_depth
        self.enabled = enabled
        self.start = time.perf_counter()
        self.samples_done = 0

    def update(self, samples_done: int) -> dict:
        self.samples_done = samples_done
        elapsed = time.perf_counter() - self.start
        rays = self.width * self.height * samples_done * self.max_depth
        pixels = self.width * self.height * samples_done
        rate = rays / elapsed if elapsed > 0 else 0.0
        eta = (
            elapsed / samples_done * (self.spp_total - samples_done)
            if samples_done
            else float("inf")
        )
        stats = {
            "samples_done": samples_done,
            "spp_total": self.spp_total,
            "elapsed_s": elapsed,
            "rays_per_sec": rate,
            "pixels_per_sec": pixels / elapsed if elapsed > 0 else 0.0,
            "eta_s": eta,
        }
        if self.enabled:
            logger.info(
                "sample %d/%d  %.1f Mrays/s  %.2e pixels/s  ETA %.1fs",
                samples_done,
                self.spp_total,
                rate / 1e6,
                stats["pixels_per_sec"],
                eta,
            )
        return stats


class Timer:
    """`start_time = time(); ... elapsed` as a context manager
    (the reference's only profiling tool, SURVEY.md §5)."""

    def __init__(self, label: str = "", enabled: bool = True):
        self.label = label
        self.enabled = enabled
        self.elapsed = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        if self.enabled and self.label:
            logger.info("%s: %.3fs", self.label, self.elapsed)
        return False
