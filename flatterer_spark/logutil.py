"""C4 logging hook mirroring the reference's ``FLATTERER_LOG`` env control
(`docs/development.md:46-48`; ``setup_logging`` calls in
`flatterer/__init__.py:105,311`): library default ``warning``, CLI default
``info``, env var overrides both.  ``trace`` maps to DEBUG (Python has no
finer level)."""

from __future__ import annotations

import logging
import os

_LEVELS = {
    "trace": logging.DEBUG,
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warning": logging.WARNING,
    "warn": logging.WARNING,
    "error": logging.ERROR,
    "off": logging.CRITICAL,
}


import contextlib
import time

#: Per-run phase walls collected when ``FLATTERER_PROFILE`` is set; the
#: bench harness reads this to decompose a flatten() wall into phases
#: (read/plan/ordinals/writes/guards) without touching the hot path when
#: profiling is off.  Cleared by the caller between runs.
PHASES: list[tuple[str, float]] = []


@contextlib.contextmanager
def prof(name: str):
    """Opt-in phase timer (C4): no-op unless ``FLATTERER_PROFILE`` is set;
    appends ``(name, seconds)`` to :data:`PHASES` and logs at INFO."""
    if not os.environ.get("FLATTERER_PROFILE"):
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        PHASES.append((name, dt))
        logging.getLogger("flatterer_spark.profile").info(
            "phase %-28s %7.3fs", name, dt
        )


def setup_logging(default_level: str = "warning") -> logging.Logger:
    """Configure the ``flatterer_spark`` logger once; later calls only
    adjust the level if ``FLATTERER_LOG`` is set."""
    level = _LEVELS.get(
        os.environ.get("FLATTERER_LOG", default_level).lower(), logging.WARNING
    )
    log = logging.getLogger("flatterer_spark")
    if not log.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s [%(name)s] %(message)s")
        )
        log.addHandler(h)
        log.propagate = False
    log.setLevel(level)
    return log
