"""f64 numpy oracle for straight-ray TEC integrals.

Independent implementation: scipy Simpson quadrature over oracle tricubic
samples, looped per ray.
"""
from __future__ import annotations

import numpy as np
from scipy.integrate import simpson

from .tricubic_ref import interp_ref

K_NE = 1e11
KM_TO_M = 1e3
TEC_SCALE = 1e13


def tec_ref(field_m, origin, spacing, ray_points, ds_km):
    """TEC per ray in TEC_SCALE working units.

    field_m: (nx,ny,nz) log-density; ray_points: (R, N, 3) km;
    ds_km: scalar or (R,) sample spacing.
    """
    ray_points = np.asarray(ray_points, np.float64)
    r, n = ray_points.shape[:2]
    ds = np.broadcast_to(np.asarray(ds_km, np.float64), (r,))
    out = np.empty(r, np.float64)
    for i in range(r):
        m = interp_ref(field_m, origin, spacing, ray_points[i])
        ne = K_NE * np.exp(m)
        s = np.arange(n) * ds[i]
        out[i] = simpson(ne, x=s) * KM_TO_M / TEC_SCALE
    return out


def dtec_ref(field_m, origin, spacing, ray_points, ds_km, num_directions,
             i0=0):
    t = tec_ref(field_m, origin, spacing, ray_points, ds_km)
    t = t.reshape(-1, num_directions)
    return t - t[i0][None, :]


def chapman_tec_analytic(n_peak, h_peak_km, scale_km, alt_rad):
    """Closed-form vertical TEC of a full Chapman layer, slant-scaled by
    1/sin(alt) (flat-slab approximation — valid for moderate zenith angles).

    ∫ exp(0.5(1 - z - e^-z)) dz over z∈(-inf, inf) = sqrt(2πe) (exact), so
    VTEC = N_peak * H * sqrt(2πe). Used as an order-of-magnitude invariant.
    """
    vtec = n_peak * (scale_km * KM_TO_M) * np.sqrt(2 * np.pi * np.e)
    return vtec / np.sin(alt_rad) / TEC_SCALE
