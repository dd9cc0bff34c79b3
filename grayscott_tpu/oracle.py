"""NumPy reference oracle for the Gray-Scott step.

This module is the framework's single source of numerical truth. It is a
from-scratch NumPy implementation of the update rule defined by the
reference's naive backend (``compute/naive/src/lib.rs:43-82``), used by the
test suite to validate every optimized backend (the cross-backend parity
testing the reference itself lacks, see SURVEY.md section 4).

Two boundary semantics exist in the reference and both are implemented here:

``naive``
    The CPU backends' semantics (``compute/naive/src/lib.rs:56-60``): the
    3x3 stencil window is clamped to the domain and out-of-window neighbors
    contribute nothing. Crucially, the weight matrix is indexed by position
    *within the clamped window*, so for cells on the top or left edge the
    weights stay anchored at the window's top-left corner instead of being
    re-centered (the documented quirk, ``compute/regular/src/lib.rs:174-179``,
    inherited from the C++ course original).

    Formally, for cell (r, c), the stencil reads rows
    ``r' = max(r-1, 0) + i`` for ``i in 0..3`` subject to
    ``r' <= min(r+1, R-1)`` with weight row index ``i`` (same for columns):

        full = sum_ij w[i][j] * (X[r', c'] - X[r, c])

``zero``
    The GPU backends' semantics (``compute/gpu/naive/src/main.comp:29-58``
    via ClampToBorder sampling, ``compute/gpu/naive/src/pipeline.rs:105-113``):
    out-of-domain neighbors read as 0.0 and the weights are always centered:

        full = sum_ij w[i][j] * (Xpad[r+i-1, c+j-1] - X[r, c])

    (equivalently: corrected weights applied to the zero-padded array).

After the diffusion gradient, both apply the same reaction + Euler update
(``compute/naive/src/lib.rs:71-79``):

    uv2 = u * v * v
    du  = Du * full_u - uv2 + f * (1 - u)
    dv  = Dv * full_v + uv2 - (f + k) * v
    u' = u + du * dt ;  v' = v + dv * dt

All arithmetic is float32 with the same expression trees as the reference,
term order included, so that results are bit-comparable on IEEE hardware.
"""

from __future__ import annotations

import numpy as np

from .params import Parameters, Precision

BOUNDARIES = ("naive", "zero")


def _index_maps(n: int):
    """Row (or column) gather indices and validity for the `naive` semantics.

    For output index r, stencil tap i reads ``max(r-1, 0) + i`` and is valid
    iff that index is ``<= min(r+1, n-1)``.
    """
    r = np.arange(n)
    start = np.maximum(r - 1, 0)
    end = np.minimum(r + 1, n - 1)
    idx = []
    valid = []
    for i in range(3):
        src = start + i
        ok = src <= end
        idx.append(np.where(ok, src, 0))  # clamp to a safe index; masked anyway
        valid.append(ok)
    return idx, valid


def laplacian(x: np.ndarray, params: Parameters, boundary: str) -> np.ndarray:
    """The weighted diffusion gradient ``full`` for one species."""
    x = np.asarray(x, dtype=Precision)
    w = params.weights_array()
    r, c = x.shape
    full = np.zeros_like(x)
    if boundary == "naive":
        ridx, rok = _index_maps(r)
        cidx, cok = _index_maps(c)
        for i in range(3):
            for j in range(3):
                if w[i, j] == 0.0 and (i, j) != (1, 1):
                    # Zero weights contribute exactly 0 in f32; skip them the
                    # same way constant folding would.
                    continue
                tap = x[np.ix_(ridx[i], cidx[j])]
                mask = np.logical_and.outer(rok[i], cok[j])
                term = (w[i, j] * (tap - x)).astype(Precision)
                full = (full + np.where(mask, term, Precision(0.0))).astype(Precision)
    elif boundary == "zero":
        xp = np.zeros((r + 2, c + 2), dtype=Precision)
        xp[1:-1, 1:-1] = x
        for i in range(3):
            for j in range(3):
                if w[i, j] == 0.0:
                    continue
                tap = xp[i : i + r, j : j + c]
                full = (full + (w[i, j] * (tap - x)).astype(Precision)).astype(
                    Precision
                )
    else:
        raise ValueError(f"unknown boundary {boundary!r}; expected {BOUNDARIES}")
    return full


def step(
    u: np.ndarray, v: np.ndarray, params: Parameters, boundary: str = "naive"
):
    """One Gray-Scott step. Returns (u', v')."""
    u = np.asarray(u, dtype=Precision)
    v = np.asarray(v, dtype=Precision)
    full_u = laplacian(u, params, boundary)
    full_v = laplacian(v, params, boundary)

    du_rate = Precision(params.diffusion_rate_u)
    dv_rate = Precision(params.diffusion_rate_v)
    f = Precision(params.feed_rate)
    k = Precision(params.kill_rate)
    dt = Precision(params.time_step)

    # Left-associated like the reference: (u * v) * v
    uv_square = ((u * v).astype(Precision) * v).astype(Precision)
    du = (du_rate * full_u - uv_square + f * (Precision(1.0) - u)).astype(Precision)
    dv = (dv_rate * full_v + uv_square - (f + k) * v).astype(Precision)
    return (u + du * dt).astype(Precision), (v + dv * dt).astype(Precision)


def run(u, v, params: Parameters, steps: int, boundary: str = "naive"):
    for _ in range(steps):
        u, v = step(u, v, params, boundary)
    return u, v
