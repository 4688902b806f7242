"""Centered-dipole geomagnetic field model (device-side, jnp).

Beyond-reference capability (IonoTomo predicts TEC/dTEC only): ionospheric
**Faraday rotation** is the other first-order calibration observable of a
low-frequency array, RM = 2.631e-13 ∫ n_e B_par ds (forward/rm.py). This
module supplies B: the standard centered, tilted dipole (IGRF-2025-like
pole at 80.7° N, 287.4° E, moment 7.94e22 A m²) — accurate to ~10–20% at
LOFAR latitudes, which matches the fidelity of a tomographic n_e anyway.

Host side builds a small constants pytree from the array's ENU frame
(geometry.frames.ENUFrame); the returned closure evaluates B in the local
ENU basis (Tesla) for any (N, 3) points in km and is jit/vmap/scan-safe.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# dipole moment magnitude [A m^2] and geomagnetic north pole (geocentric)
DIPOLE_MOMENT = 7.94e22
POLE_LAT_DEG = 80.7
POLE_LON_DEG = 287.4
MU0_OVER_4PI = 1e-7           # T m / A


def dipole_moment_ecef(moment=DIPOLE_MOMENT, pole_lat_deg=POLE_LAT_DEG,
                       pole_lon_deg=POLE_LON_DEG):
    """Dipole moment vector in ECEF [A m^2] (points toward the *south*
    geomagnetic pole, as Earth's does)."""
    lat = np.deg2rad(pole_lat_deg)
    lon = np.deg2rad(pole_lon_deg)
    n_pole = np.array([np.cos(lat) * np.cos(lon),
                       np.cos(lat) * np.sin(lon),
                       np.sin(lat)])
    return -moment * n_pole


def dipole_b_ecef(points_ecef_km, m_ecef=None):
    """Dipole B at ECEF points (km) → B in ECEF basis [Tesla] (jnp).

    B(r) = μ0/4π · (3 r̂ (m·r̂) − m) / r³, r in meters.
    """
    if m_ecef is None:
        m_ecef = dipole_moment_ecef()
    m = jnp.asarray(m_ecef, jnp.float32)
    p = jnp.asarray(points_ecef_km) * 1e3          # m
    r = jnp.linalg.norm(p, axis=-1, keepdims=True)
    rhat = p / r
    mdr = jnp.sum(m * rhat, axis=-1, keepdims=True)
    return MU0_OVER_4PI * (3.0 * rhat * mdr - m) / r ** 3


def dipole_b_enu_fn(enu_frame, moment=DIPOLE_MOMENT,
                    pole_lat_deg=POLE_LAT_DEG, pole_lon_deg=POLE_LON_DEG):
    """Closure: ENU points (N, 3) km (relative to ``enu_frame``) → B in the
    ENU basis [Tesla]. Constants (rotation, frame origin, moment vector)
    are baked in host-side; the closure is pure jnp."""
    rot = jnp.asarray(np.asarray(enu_frame.rot, np.float64),
                      jnp.float32)                  # (3,3): ECEF→ENU
    ref = jnp.asarray(np.asarray(enu_frame.ref, np.float64), jnp.float32)
    m_ecef = jnp.asarray(dipole_moment_ecef(moment, pole_lat_deg,
                                            pole_lon_deg), jnp.float32)

    def b_enu(points_enu_km):
        p_ecef = points_enu_km @ rot + ref          # rotᵀ·enu, batched
        b_ecef = dipole_b_ecef(p_ecef, m_ecef)
        return b_ecef @ rot.T                       # rot·B
    return b_enu
