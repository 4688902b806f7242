"""Ionospheric Faraday rotation measure along rays (device-side).

Beyond-reference capability: the reference predicts TEC/dTEC only
(SURVEY.md §2 "Forward equation"); a low-frequency array's other
first-order ionospheric calibration term is Faraday rotation,

    RM [rad m^-2] = K_RM ∫ n_e [m^-3] · B_par [T] · ds [m],
    K_RM = e^3 / (2π m_e^2 c^4) ≈ 2.631e-13,

so the polarization angle rotates by RM·λ². Reuses the TEC machinery:
the same tricubic gather serves n_e at the ray samples; B comes from any
jittable field (models.geomagnetic.dipole_b_enu_fn), evaluated at the
same samples; the quadrature is the shared Simpson rule. Differential RM
(reference-antenna subtraction) mirrors dTEC.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import constants
from ..core.grids import Grid3D
from ..geometry.rays import RayBundle, simpson_weights
from .tec import _interp_fast, _ref_row

#: e^3 / (2 pi m_e^2 c^4)  [rad m^-2 per (m^-3 · T · m)]
K_RM = 2.631e-13


def _tangents(points: jnp.ndarray) -> jnp.ndarray:
    """Unit tangent per ray sample from central differences, (R, N, 3).
    Exact for straight rays; 2nd-order along bent paths."""
    fwd = points[:, 1:] - points[:, :-1]
    t = jnp.concatenate([fwd[:, :1],
                         0.5 * (fwd[:, 1:] + fwd[:, :-1]),
                         fwd[:, -1:]], axis=1)
    return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True),
                           1e-12)


def rotation_measure(field_m: jnp.ndarray, grid: Grid3D, rays: RayBundle,
                     b_enu_fn) -> jnp.ndarray:
    """RM per ray, (R,), in rad/m².

    ``b_enu_fn``: jittable (N, 3) ENU km → (N, 3) Tesla (e.g.
    models.geomagnetic.dipole_b_enu_fn(array.enu_frame)).
    """
    r, n = rays.points.shape[:2]
    pts = rays.points.reshape(-1, 3)
    m = _interp_fast(field_m, grid, pts)
    ne = constants.K_NE * jnp.exp(m).reshape(r, n)
    b = b_enu_fn(pts).reshape(r, n, 3)
    # astronomical sign convention: B_par along the *propagation*
    # direction (source -> observer), i.e. minus the antenna->sky ray
    # tangent; positive RM = field toward the observer (B points
    # downward at northern latitudes -> ionospheric RM > 0 there)
    b_par = -jnp.sum(b * _tangents(rays.points), axis=-1)  # (R, N) [T]
    w = simpson_weights(n, ne.dtype)
    integral = jnp.einsum("rn,n->r", ne * b_par, w) * rays.ds \
        * constants.KM_TO_M
    return K_RM * integral


def drm(field_m: jnp.ndarray, grid: Grid3D, rays: RayBundle, b_enu_fn,
        num_directions: int, i0: int = 0) -> jnp.ndarray:
    """Differential RM w.r.t. reference antenna ``i0``, (Na, Nd) —
    the Faraday analogue of forward.tec.dtec (row-major ray batch)."""
    rm = rotation_measure(field_m, grid, rays, b_enu_fn)
    rm = rm.reshape(-1, num_directions)
    return rm - _ref_row(rm, i0)[None, :]
