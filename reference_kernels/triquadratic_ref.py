"""f64 numpy oracle for prefiltered triquadratic B-spline interpolation.

Written independently from the device kernel: the prefilter solves the
exact tridiagonal interpolation system with a dense ``np.linalg.solve``
per axis, and the interpolation loops over points evaluating the 1D
quadratic B-spline pieces by direct polynomial evaluation. Deliberately
slow and obvious.

Scheme contract (shared with ``ionotomo_tpu.core.triquadratic``):

- coefficients c satisfy (c_{j-1} + 6 c_j + c_{j+1})/8 = f_j on interior
  rows, with the *linear-extrapolation closure* c_{-1} := 2c_0 − c_1 at
  each end, which reduces the boundary rows to c_0 = f_0 and
  c_{n-1} = f_{n-1} (reproduces linear fields globally; quadratic
  reproduction holds on interior cells — grids are padded by design);
- the interpolant at fractional index t uses the nearest sample
  base = round(t) clamped to [1, n−2], u = t − base, with weights
  w_{−1} = (1/2)(1/2 − u)², w_0 = 3/4 − u², w_{+1} = (1/2)(1/2 + u)².
"""
from __future__ import annotations

import numpy as np


def prefilter_1d_ref(f):
    """Solve the quadratic B-spline interpolation system along axis 0."""
    f = np.asarray(f, np.float64)
    n = f.shape[0]
    if n < 3:
        return f.copy()
    B = np.zeros((n, n), np.float64)
    B[0, 0] = 1.0
    B[n - 1, n - 1] = 1.0
    for j in range(1, n - 1):
        B[j, j - 1] = 1.0 / 8.0
        B[j, j] = 6.0 / 8.0
        B[j, j + 1] = 1.0 / 8.0
    return np.linalg.solve(B, f.reshape(n, -1)).reshape(f.shape)


def prefilter_ref(field):
    """Separable 3-axis prefilter: field samples → B-spline coefficients."""
    c = np.asarray(field, np.float64)
    c = prefilter_1d_ref(c)
    c = np.moveaxis(prefilter_1d_ref(np.moveaxis(c, 1, 0)), 0, 1)
    c = np.moveaxis(prefilter_1d_ref(np.moveaxis(c, 2, 0)), 0, 2)
    return c


def _qb_1d(c, u):
    """Quadratic B-spline through coefficients c[-1], c[0], c[1] at u."""
    cm, c0, cp = c
    return (0.5 * (0.5 - u) ** 2 * cm
            + (0.75 - u * u) * c0
            + 0.5 * (0.5 + u) ** 2 * cp)


def _qb_1d_deriv(c, u):
    cm, c0, cp = c
    return (u - 0.5) * cm - 2.0 * u * c0 + (u + 0.5) * cp


def _stencil(n, t):
    t = min(max(t, 0.0), n - 1.0)
    base = int(np.rint(t))
    base = min(max(base, 1), n - 2)
    u = t - base
    idx = np.arange(base - 1, base + 2)
    return idx, u


def interp_ref(coef, origin, spacing, points):
    """Triquadratic B-spline evaluation of *coefficients*, f64, per-point.

    Note: ``coef`` is the prefiltered coefficient grid (``prefilter_ref``
    of the sample field), not the samples themselves.
    """
    coef = np.asarray(coef, np.float64)
    origin = np.asarray(origin, np.float64)
    spacing = np.asarray(spacing, np.float64)
    points = np.atleast_2d(np.asarray(points, np.float64))
    out = np.empty(points.shape[0], np.float64)
    nx, ny, nz = coef.shape
    for k, pt in enumerate(points):
        t = (pt - origin) / spacing
        ixs, ux = _stencil(nx, t[0])
        iys, uy = _stencil(ny, t[1])
        izs, uz = _stencil(nz, t[2])
        block = coef[np.ix_(ixs, iys, izs)]
        zc = np.array([[_qb_1d(block[i, j, :], uz) for j in range(3)]
                       for i in range(3)])
        yc = np.array([_qb_1d(zc[i, :], uy) for i in range(3)])
        out[k] = _qb_1d(yc, ux)
    return out


def interp_grad_ref(coef, origin, spacing, points):
    """Value + physical-space gradient from coefficients, f64, per-point."""
    coef = np.asarray(coef, np.float64)
    origin = np.asarray(origin, np.float64)
    spacing = np.asarray(spacing, np.float64)
    points = np.atleast_2d(np.asarray(points, np.float64))
    vals = np.empty(points.shape[0], np.float64)
    grads = np.empty((points.shape[0], 3), np.float64)
    nx, ny, nz = coef.shape
    for k, pt in enumerate(points):
        t = (pt - origin) / spacing
        ixs, ux = _stencil(nx, t[0])
        iys, uy = _stencil(ny, t[1])
        izs, uz = _stencil(nz, t[2])
        block = coef[np.ix_(ixs, iys, izs)]
        zc = np.array([[_qb_1d(block[i, j, :], uz) for j in range(3)]
                       for i in range(3)])
        zd = np.array([[_qb_1d_deriv(block[i, j, :], uz) for j in range(3)]
                       for i in range(3)])
        yc = np.array([_qb_1d(zc[i, :], uy) for i in range(3)])
        yd_y = np.array([_qb_1d_deriv(zc[i, :], uy) for i in range(3)])
        yd_z = np.array([_qb_1d(zd[i, :], uy) for i in range(3)])
        vals[k] = _qb_1d(yc, ux)
        grads[k, 0] = _qb_1d_deriv(yc, ux) / spacing[0]
        grads[k, 1] = _qb_1d(yd_y, ux) / spacing[1]
        grads[k, 2] = _qb_1d(yd_z, ux) / spacing[2]
    return vals, grads
