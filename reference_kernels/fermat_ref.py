"""f64 adaptive-step oracle for the Fermat bent-ray ODEs.

Independent implementation: scipy.integrate.solve_ivp (RK45, tight
tolerances) per ray, using the oracle tricubic for n_e and its gradient.
The device tracer's fixed-step RK4 is validated against this.
"""
from __future__ import annotations

import numpy as np
from scipy.integrate import solve_ivp

from .tricubic_ref import interp_grad_ref

K_NE = 1e11
KAPPA = 8.98 * 8.98
KM_TO_M = 1e3
TEC_SCALE = 1e13


def trace_ray_ref(field_m, origin, spacing, x0, d0, frequency_hz,
                  max_length_km, rtol=1e-10, atol=1e-12):
    """Trace one ray through the log-density tricubic field model;
    returns (endpoint (3,), tec_working_units)."""

    def ne_and_grad(x):
        m, gm = interp_grad_ref(field_m, origin, spacing, x[None, :])
        ne = K_NE * np.exp(m[0])
        return ne, ne * gm[0]

    return trace_ray_callable_ref(ne_and_grad, x0, d0, frequency_hz,
                                  max_length_km, rtol, atol)


def trace_ray_split_ref(pert_field, origin, spacing, bg_ne_and_grad, x0,
                        d0, frequency_hz, max_length_km, rtol=1e-10,
                        atol=1e-12):
    """Oracle for the split field model: n_e = analytic background +
    tricubic perturbation (oracle twin of fermat.trace_rays_split).
    ``bg_ne_and_grad(x (3,)) -> (ne, grad (3,))`` in f64 numpy."""

    def ne_and_grad(x):
        d, gd = interp_grad_ref(pert_field, origin, spacing, x[None, :])
        nb, gb = bg_ne_and_grad(x)
        return nb + d[0], gb + gd[0]

    return trace_ray_callable_ref(ne_and_grad, x0, d0, frequency_hz,
                                  max_length_km, rtol, atol)


def trace_ray_callable_ref(ne_and_grad, x0, d0, frequency_hz,
                           max_length_km, rtol=1e-10, atol=1e-12):
    """Adaptive f64 trace over an arbitrary ne/grad field evaluator."""
    inv_f2 = 1.0 / (frequency_hz * frequency_hz)

    def rhs(_s, y):
        x, p = y[:3], y[3:6]
        ne, gne = ne_and_grad(x)
        n = np.sqrt(max(1.0 - KAPPA * inv_f2 * ne, 1e-6))
        dx = p / np.linalg.norm(p)
        dp = -0.5 * KAPPA * inv_f2 / n * gne
        dtau = ne * KM_TO_M / TEC_SCALE
        return np.concatenate([dx, dp, [dtau]])

    ne0, _ = ne_and_grad(np.asarray(x0, np.float64))
    n0 = np.sqrt(max(1.0 - KAPPA * inv_f2 * ne0, 1e-6))
    y0 = np.concatenate([np.asarray(x0, np.float64),
                         n0 * np.asarray(d0, np.float64), [0.0]])
    sol = solve_ivp(rhs, (0.0, max_length_km), y0, method="RK45",
                    rtol=rtol, atol=atol, dense_output=False)
    assert sol.success, sol.message
    return sol.y[:3, -1], sol.y[6, -1]
