"""Logging setup for the CLI binaries.

Analog of the reference's syslog-backed TUI logging (``ui/src/lib.rs:79-91``):
because stderr hosts the progress bar, logs go to syslog when available
(same rationale), falling back to stderr. Log level mirrors the reference's
debug/release split via the GRAYSCOTT_LOG env var (default INFO).
"""

from __future__ import annotations

import logging
import logging.handlers
import os
import sys


def init_logging(prefer_syslog: bool = True) -> logging.Logger:
    logger = logging.getLogger("grayscott_tpu")
    if logger.handlers:
        return logger
    level = os.environ.get("GRAYSCOTT_LOG", "INFO").upper()
    logger.setLevel(level)
    handler: logging.Handler
    if prefer_syslog and os.path.exists("/dev/log"):
        try:
            handler = logging.handlers.SysLogHandler(address="/dev/log")
            print(
                "Since stderr is not usable inside of a TUI, logs will be "
                "emitted on syslog...",
                file=sys.stderr,
            )
        except OSError:
            handler = logging.StreamHandler(sys.stderr)
    else:
        handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    )
    logger.addHandler(handler)
    return logger
