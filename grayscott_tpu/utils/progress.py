"""Terminal progress reporting with ETA.

Analog of the reference's indicatif progress bar
(``ui/src/lib.rs:95-111``: template ``"{msg} {pos}/{len} {wide_bar}
{elapsed}/~{duration}"``, steady 100 ms tick, clear on finish).
Dependency-free; writes to stderr so stdout stays clean for data.
"""

from __future__ import annotations

import shutil
import sys
import threading
import time


def _fmt_duration(seconds: float) -> str:
    seconds = int(seconds)
    m, s = divmod(seconds, 60)
    h, m = divmod(m, 60)
    if h:
        return f"{h}h{m:02d}m{s:02d}s"
    if m:
        return f"{m}m{s:02d}s"
    return f"{s}s"


class ProgressBar:
    """``{msg} {pos}/{len} [####    ] {elapsed}/~{eta}`` on stderr."""

    def __init__(self, message: str, num_steps: int, stream=None, enabled=None):
        self.message = message
        self.num_steps = max(num_steps, 1)
        self.pos = 0
        self._t0 = time.monotonic()
        self._stream = stream or sys.stderr
        self._lock = threading.Lock()
        self._last_draw = 0.0
        if enabled is None:
            enabled = self._stream.isatty()
        self._enabled = enabled

    def inc(self, n: int = 1) -> None:
        with self._lock:
            self.pos += n
            now = time.monotonic()
            if self._enabled and (now - self._last_draw > 0.1 or self.pos >= self.num_steps):
                self._draw(now)
                self._last_draw = now

    def _draw(self, now: float) -> None:
        elapsed = now - self._t0
        frac = self.pos / self.num_steps
        total = elapsed / frac if frac > 0 else 0.0
        head = f"{self.message} {self.pos}/{self.num_steps} "
        tail = f" {_fmt_duration(elapsed)}/~{_fmt_duration(total)}"
        width = shutil.get_terminal_size().columns
        bar_w = max(width - len(head) - len(tail) - 2, 4)
        filled = int(bar_w * frac)
        bar = "#" * filled + "-" * (bar_w - filled)
        self._stream.write(f"\r{head}[{bar}]{tail}")
        self._stream.flush()

    def finish(self) -> None:
        """Clear the bar (ProgressFinish::AndClear analog)."""
        if self._enabled:
            width = shutil.get_terminal_size().columns
            self._stream.write("\r" + " " * width + "\r")
            self._stream.flush()

    def __enter__(self) -> "ProgressBar":
        return self

    def __exit__(self, *exc) -> None:
        self.finish()
