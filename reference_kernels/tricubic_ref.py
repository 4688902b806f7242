"""f64 numpy oracle for tricubic (cubic-convolution) interpolation.

Written independently from the device kernel: loops over points, evaluates
the 1D Catmull-Rom interpolant per axis by direct polynomial evaluation in
Horner form. Deliberately slow and obvious.
"""
from __future__ import annotations

import numpy as np


def _cr_1d(p, u):
    """Catmull-Rom through 4 samples p[-1],p[0],p[1],p[2] at fraction u."""
    # value = p1 + 0.5*u*(p2-p0 + u*(2p0-5p1+4p2-p3 + u*(3(p1-p2)+p3-p0)))
    p0, p1, p2, p3 = p
    return p1 + 0.5 * u * (
        (p2 - p0)
        + u * ((2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3)
               + u * (3.0 * (p1 - p2) + p3 - p0))
    )


def _cr_1d_deriv(p, u):
    p0, p1, p2, p3 = p
    return 0.5 * (
        (p2 - p0)
        + 2.0 * u * (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3)
        + 3.0 * u * u * (3.0 * (p1 - p2) + p3 - p0)
    )


def _stencil(n, t):
    t = min(max(t, 0.0), n - 1.0)
    base = int(np.floor(t))
    base = min(max(base, 0), n - 2)
    u = t - base
    idx = np.clip(np.arange(base - 1, base + 3), 0, n - 1)
    return idx, u


def interp_ref(field, origin, spacing, points):
    """Tricubic interpolation, f64, loop-per-point."""
    field = np.asarray(field, np.float64)
    origin = np.asarray(origin, np.float64)
    spacing = np.asarray(spacing, np.float64)
    points = np.atleast_2d(np.asarray(points, np.float64))
    out = np.empty(points.shape[0], np.float64)
    nx, ny, nz = field.shape
    for k, pt in enumerate(points):
        t = (pt - origin) / spacing
        ixs, ux = _stencil(nx, t[0])
        iys, uy = _stencil(ny, t[1])
        izs, uz = _stencil(nz, t[2])
        block = field[np.ix_(ixs, iys, izs)]
        # contract z, then y, then x
        zc = np.array([[_cr_1d(block[i, j, :], uz) for j in range(4)]
                       for i in range(4)])
        yc = np.array([_cr_1d(zc[i, :], uy) for i in range(4)])
        out[k] = _cr_1d(yc, ux)
    return out


def interp_grad_ref(field, origin, spacing, points):
    """Value + physical-space gradient, f64, loop-per-point."""
    field = np.asarray(field, np.float64)
    origin = np.asarray(origin, np.float64)
    spacing = np.asarray(spacing, np.float64)
    points = np.atleast_2d(np.asarray(points, np.float64))
    vals = np.empty(points.shape[0], np.float64)
    grads = np.empty((points.shape[0], 3), np.float64)
    nx, ny, nz = field.shape
    for k, pt in enumerate(points):
        t = (pt - origin) / spacing
        ixs, ux = _stencil(nx, t[0])
        iys, uy = _stencil(ny, t[1])
        izs, uz = _stencil(nz, t[2])
        block = field[np.ix_(ixs, iys, izs)]
        zc = np.array([[_cr_1d(block[i, j, :], uz) for j in range(4)]
                       for i in range(4)])
        zd = np.array([[_cr_1d_deriv(block[i, j, :], uz) for j in range(4)]
                       for i in range(4)])
        yc = np.array([_cr_1d(zc[i, :], uy) for i in range(4)])
        yd_y = np.array([_cr_1d_deriv(zc[i, :], uy) for i in range(4)])
        yd_z = np.array([_cr_1d(zd[i, :], uy) for i in range(4)])
        vals[k] = _cr_1d(yc, ux)
        grads[k, 0] = _cr_1d_deriv(yc, ux) / spacing[0]
        grads[k, 1] = _cr_1d(yd_y, ux) / spacing[1]
        grads[k, 2] = _cr_1d(yd_z, ux) / spacing[2]
    return vals, grads
