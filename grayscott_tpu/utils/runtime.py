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


def apply_env_config() -> None:
    import jax

    platform = os.environ.get("GRAYSCOTT_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    if env_flag("GRAYSCOTT_DEBUG"):
        jax.config.update("jax_debug_nans", True)
        jax.config.update("jax_debug_infs", True)
