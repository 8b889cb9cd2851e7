"""Pipeline logging — the engine counterpart of the reference's
logger wiring (`/root/reference/src/main/utility/logging_config.py:1-4`,
imported by every transform module).

Library discipline: ``get_logger`` hands out namespaced children of
one package logger carrying a NullHandler, so importing the engine
never configures global logging or duplicates Spark's own log4j
output. A pipeline RUN opts in with :func:`configure_pipeline_logging`
(console and/or file), which the reference did unconditionally at
import time — the anti-pattern where importing a module starts writing
log files.
"""

from __future__ import annotations

import logging

_ROOT_NAME = "sales_data_pipeline_spark"

logging.getLogger(_ROOT_NAME).addHandler(logging.NullHandler())

_FORMAT = "%(asctime)s %(levelname)s [%(name)s] %(message)s"


def get_logger(name: str) -> logging.Logger:
    """Namespaced logger under the package root; pass __name__."""
    if name.startswith(_ROOT_NAME):
        return logging.getLogger(name)
    return logging.getLogger(f"{_ROOT_NAME}.{name}")


def configure_pipeline_logging(
    level: int | str = logging.INFO,
    log_file: str | None = None,
    fmt: str = _FORMAT,
) -> logging.Logger:
    """Opt-in run configuration: attach a console handler (and
    optionally a file handler) to the package logger. Idempotent —
    calling twice replaces the handlers instead of duplicating every
    line (the classic re-run symptom of configure-at-import).

    Once run handlers are attached, ``propagate`` is switched off so an
    application that also configured the Python root logger (e.g.
    ``logging.basicConfig`` in a driver script) doesn't emit every
    pipeline line twice — our handlers become the single output path.
    Before configuration (NullHandler only) propagation stays on, the
    normal library posture."""
    root = logging.getLogger(_ROOT_NAME)
    for h in list(root.handlers):
        if not isinstance(h, logging.NullHandler):
            root.removeHandler(h)
            h.close()
    formatter = logging.Formatter(fmt)
    console = logging.StreamHandler()
    console.setFormatter(formatter)
    root.addHandler(console)
    if log_file:
        fileh = logging.FileHandler(log_file)
        fileh.setFormatter(formatter)
        root.addHandler(fileh)
    root.setLevel(level)
    root.propagate = False
    return root
