"""Structured logging + simple wall-clock scopes.

The reference's observability is bare printf progress lines (SURVEY.md 5.5);
here every pass logs through the standard logging module with per-scope
timings that the benchmark harness also consumes.
"""

from __future__ import annotations

import contextlib
import logging
import time

_FORMAT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"
_configured = False


def get_logger(name: str) -> logging.Logger:
    global _configured
    if not _configured:
        logging.basicConfig(level=logging.INFO, format=_FORMAT)
        _configured = True
    return logging.getLogger(name)


class Timings:
    """Accumulates named wall-clock durations (seconds)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def scope(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        return ", ".join(
            f"{k}={v:.3f}s/{self.counts[k]}" for k, v in sorted(self.totals.items())
        )


@contextlib.contextmanager
def timed(logger: logging.Logger, label: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.info("%s took %.3fs", label, time.perf_counter() - t0)
