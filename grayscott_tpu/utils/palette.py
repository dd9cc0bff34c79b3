"""Color palette for visualization.

Analog of the reference's colorous INFERNO gradient with amplitude scaling
(``ui/src/lib.rs:115-123``: ``GRADIENT = INFERNO``, ``MAX_AMPLITUDE = 0.5``,
``AMPLITUDE_SCALE = 1/MAX_AMPLITUDE = 2.0``) and the per-pixel
``eval_continuous(2.0 * v)`` colorization of ``data-to-pics``
(data-to-pics/src/main.rs:139-142). Both colorous and matplotlib derive
"inferno" from the same matplotlib colormap data, so a 256-entry LUT sampled
from matplotlib with linear interpolation reproduces eval_continuous.
"""

from __future__ import annotations

import numpy as np

#: Reference: ui/src/lib.rs:119-123
MAX_AMPLITUDE = 0.5
AMPLITUDE_SCALE = 1.0 / MAX_AMPLITUDE

_LUTS: dict[int, np.ndarray] = {}


def inferno_lut(resolution: int = 256) -> np.ndarray:
    """(resolution, 3) uint8 INFERNO lookup table (the livesim
    --color-palette-resolution analog, livesim/src/palette.rs:42-121)."""
    if resolution not in _LUTS:
        from matplotlib import colormaps

        cmap = colormaps["inferno"]
        _LUTS[resolution] = (
            np.asarray(cmap(np.linspace(0.0, 1.0, resolution)))[:, :3] * 255.0
        ).round().astype(np.uint8)
    return _LUTS[resolution]


def colorize(values: np.ndarray, scale: float = AMPLITUDE_SCALE,
             out: np.ndarray | None = None) -> np.ndarray:
    """Map float concentrations to RGB8 via the INFERNO gradient.

    Equivalent to colorous ``Gradient::eval_continuous(scale * v)``: the
    input is clamped to [0, 1] and linearly interpolated in the 256-color
    table. Returns an (..., 3) uint8 array. Uses the multithreaded native
    C++ kernel (grayscott_tpu/native) when available, NumPy otherwise.
    ``out``: optional recycled (..., 3) uint8 destination buffer.
    """
    from .. import native

    res = native.colorize(np.asarray(values), inferno_lut(), scale, out=out)
    if res is not None:
        return res
    lut = inferno_lut().astype(np.float32)
    n = len(lut)
    t = np.clip(values * np.float32(scale), 0.0, 1.0).astype(np.float32)
    # np.clip propagates NaN, and floor(NaN).astype(int32) below would be
    # an arbitrary (possibly out-of-range) LUT index: map a diverged
    # field's NaNs to 0, like the native kernel does
    t = np.nan_to_num(t, nan=0.0, copy=False)
    x = t * np.float32(n - 1)
    lo = np.floor(x).astype(np.int32)
    hi = np.minimum(lo + 1, n - 1)
    frac = (x - lo)[..., None]
    rgb = lut[lo] * (1.0 - frac) + lut[hi] * frac
    rgb += 0.5
    if out is not None and out.shape == rgb.shape \
            and out.dtype == np.uint8:
        np.copyto(out, rgb, casting="unsafe")
        return out
    return rgb.astype(np.uint8)
