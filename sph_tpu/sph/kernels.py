"""SPH smoothing kernels (Müller et al. 2003 poly6/spiky/viscosity family),
with correct 2D and 3D normalizations.

These are the classical-SPH force-model counterparts the north star asks for
(BASELINE.json: "poly6/spiky kernel density + pressure + viscosity force
sums"); the reference repo itself ships only the contact model, so there is
no reference file to cite here.
"""

from __future__ import annotations

import jax.numpy as jnp


def poly6_coeff(h: float, ndim: int) -> float:
    if ndim == 3:
        return 315.0 / (64.0 * jnp.pi * h ** 9)
    return 4.0 / (jnp.pi * h ** 8)


def spiky_grad_coeff(h: float, ndim: int) -> float:
    if ndim == 3:
        return -45.0 / (jnp.pi * h ** 6)
    return -30.0 / (jnp.pi * h ** 5)


def viscosity_lap_coeff(h: float, ndim: int) -> float:
    if ndim == 3:
        return 45.0 / (jnp.pi * h ** 6)
    return 40.0 / (jnp.pi * h ** 5)


def w_poly6(r2: jnp.ndarray, h: float, ndim: int) -> jnp.ndarray:
    """W(r) = C·(h² − r²)³ for r < h (takes r² to skip the sqrt)."""
    h2 = h * h
    d = jnp.maximum(h2 - r2, 0.0)
    return poly6_coeff(h, ndim) * d * d * d


def grad_w_spiky(r_vec: jnp.ndarray, r: jnp.ndarray, h: float,
                 ndim: int) -> jnp.ndarray:
    """∇W_spiky = C·(h − r)²·r̂ for 0 < r < h (C < 0: points inward)."""
    d = jnp.maximum(h - r, 0.0)
    safe_r = jnp.maximum(r, 1e-12)
    coeff = spiky_grad_coeff(h, ndim) * d * d / safe_r
    return r_vec * coeff[..., None]


def lap_w_viscosity(r: jnp.ndarray, h: float, ndim: int) -> jnp.ndarray:
    """∇²W_visc = C·(h − r) for r < h."""
    return viscosity_lap_coeff(h, ndim) * jnp.maximum(h - r, 0.0)
