"""Runtime environment knobs shared by the CLI binaries.

Analogs of the reference's runtime configuration tier (SURVEY.md section 5):

- ``GRAYSCOTT_PLATFORM`` — force the JAX platform (``cpu``/``tpu``), the
  spiritual analog of ``GRAYSCOTT_PREFER_DEVICE``
  (compute/shared/src/gpu/context/config/defaults.rs:119-148). Set through
  ``jax.config`` because a sitecustomize may have imported jax already.
- ``GRAYSCOTT_DEBUG=1`` — enable debug-mode invariant checking: NaN checks
  on every jitted computation, the analog of the reference's pervasive
  ``debug_assert!`` culture and debug-build GPU validation layers
  (SURVEY.md section 4.2). Costly; off by default, exactly like the
  reference's release builds.
"""

from __future__ import annotations

import os


def env_flag(name: str) -> bool:
    """Boolean GRAYSCOTT_* env var: '', '0', 'false', 'no', 'off' are
    off (case-insensitive); anything else is on. Plain truthiness would
    read GRAYSCOTT_AUTOTUNE=0 as enabled."""
    return os.environ.get(name, "").strip().lower() not in (
        "", "0", "false", "no", "off"
    )


def force_virtual_devices(n_devices: int,
                          platform: str | None = "cpu") -> None:
    """Arrange for ``n_devices`` virtual host devices — the fake-backend
    trick for testing multi-chip sharding without hardware (SURVEY.md
    section 4). Must run BEFORE any JAX backend initializes: a
    sitecustomize may pin JAX_PLATFORMS to a hardware plugin, and
    neither the platform nor the device count can change once a backend
    exists (the config updates then raise and are swallowed — callers
    that require the count check ``len(jax.devices())`` themselves).

    Replaces any existing ``--xla_force_host_platform_device_count``
    flag instead of skipping when the substring is present: a pre-set
    smaller count would otherwise silently win over the requested one.
    One shared implementation for tests/conftest.py,
    __graft_entry__.dryrun_multichip and scripts/bench_scaling.py.
    """
    import re

    flag = f"--xla_force_host_platform_device_count={n_devices}"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" in flags:
        flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+", flag, flags
        )
    else:
        flags = f"{flags} {flag}"
    os.environ["XLA_FLAGS"] = flags.strip()
    import jax

    try:
        jax.config.update("jax_num_cpu_devices", n_devices)
        if platform:
            jax.config.update("jax_platforms", platform)
    except (ValueError, RuntimeError):
        pass


def apply_env_config() -> None:
    import jax

    platform = os.environ.get("GRAYSCOTT_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    if env_flag("GRAYSCOTT_DEBUG"):
        jax.config.update("jax_debug_nans", True)
        jax.config.update("jax_debug_infs", True)


def wait_for_device(
    require_tpu: bool = False,
    max_wait_s: float = 1800,
    retry_s: float = 60,
    probe_timeout_s: float = 180,
) -> bool:
    """Best-effort wait for a usable JAX backend; True when one appears.

    The tunneled TPU has multi-hour outages during which every backend
    init raises UNAVAILABLE after a long in-process backoff (observed:
    ~20 min per failed init, burning one sweep config each). Probing in
    a throwaway subprocess keeps the caller's jax state clean and turns
    a lost measurement into a bounded pause. Shared by the headline
    bench (any platform: it falls back to the pure-XLA backend) and the
    hardware sweep harness (require_tpu=True)."""
    import subprocess
    import sys
    import time

    probe = "import jax; jax.devices()"
    if require_tpu:
        probe = "import jax; assert jax.devices()[0].platform == 'tpu'"
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            if subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True, timeout=probe_timeout_s,
            ).returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            return False
        print(f"device unavailable; retrying in {retry_s}s", flush=True)
        time.sleep(retry_s)
