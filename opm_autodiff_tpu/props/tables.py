"""Differentiable 1D table interpolation with linear extrapolation.

The workhorse under every PVT and saturation function. Unlike
``jnp.interp`` (which clamps), deck table semantics require linear
extrapolation beyond both ends for pressure-dependent quantities
(opm-material extrapolates its inverse-FVF tables the same way).
Pure jnp; differentiates cleanly under jvp/vjp and vmaps over points.
"""

from __future__ import annotations

import jax.numpy as jnp


def interp1d(x, xp, fp, extrapolate: bool = True):
    """Piecewise-linear y(x) on nodes (xp, fp); xp strictly increasing.

    Works for scalar or batched ``x`` (any shape). With
    ``extrapolate=False`` clamps to the end values instead.
    """
    xp = jnp.asarray(xp)
    fp = jnp.asarray(fp)
    n = xp.shape[0]
    # segment index: i such that xp[i] <= x < xp[i+1], clipped to valid range
    idx = jnp.clip(jnp.searchsorted(xp, x, side="right") - 1, 0, n - 2)
    x0 = xp[idx]
    x1 = xp[idx + 1]
    f0 = fp[idx]
    f1 = fp[idx + 1]
    slope = (f1 - f0) / (x1 - x0)
    y = f0 + slope * (x - x0)
    if not extrapolate:
        y = jnp.clip(y, jnp.minimum(f0, f1), jnp.maximum(f0, f1))
    return y


def monotone_check(xp) -> bool:
    """Host-side validation helper for table nodes."""
    import numpy as np

    return bool(np.all(np.diff(np.asarray(xp)) > 0))
