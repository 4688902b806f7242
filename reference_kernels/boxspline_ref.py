"""f64 numpy oracle for the Zwart–Powell box-spline scheme.

Deliberately independent of the device kernel's coefficient tables: the
ZP element is evaluated from first principles as the convolution of the
two 2-direction box splines,

    ZP = M_{e1,e2} * M_{d1,d2},   d1 = e1+e2, d2 = e1−e2,

via exact area integration (M_{e1,e2} is the unit-square indicator;
M_{d1,d2} is half the indicator of the diamond {0 ≤ x+y < 2, 0 ≤ x−y < 2};
their convolution is an intersection area with closed piecewise-quadratic
form, computed here by exact 1-D piecewise-linear integration). The
centred element ZP_c(t) = M(t + (3/2, 1/2)) satisfies (and the tests
assert): partition of unity, ZP_c(0,0) = 1/2, four-neighbour samples 1/8,
all other integer samples 0, reproduction of all quadratics, octagonal
support with 7 nonzero translates at generic points.

Prefilter: exact quadratic-B-spline tridiagonal solve along z
(triquadratic_ref) and the order-3 quasi-interpolation q = I + D + D²,
D = I − A with A the integer-sample mask above, applied per z-slice with
edge replication.
"""
from __future__ import annotations

import numpy as np

from .triquadratic_ref import prefilter_1d_ref


def _wedge_area(s, d):
    """Area{q in [0,1]^2 : qx+qy >= s, qx-qy >= d}, exact."""
    bps = sorted({0.0, 1.0,
                  min(max(d, 0.0), 1.0), min(max(d + 1.0, 0.0), 1.0),
                  min(max(s, 0.0), 1.0), min(max(s - 1.0, 0.0), 1.0)})
    def hl(qx):
        return min(1.0, qx - d) - max(0.0, s - qx)
    def g(qx):
        return max(0.0, hl(qx))
    tot = 0.0
    for a, b in zip(bps[:-1], bps[1:]):
        if b <= a:
            continue
        ha, hb = hl(a + 1e-12), hl(b - 1e-12)
        if (ha < 0) != (hb < 0):
            qm = a + (b - a) * (0.0 - ha) / (hb - ha)
            tot += 0.5 * (g(a + 1e-12) + g(qm)) * (qm - a)
            tot += 0.5 * (g(qm) + g(b - 1e-12)) * (b - qm)
        else:
            tot += 0.5 * (g(a + 1e-12) + g(b - 1e-12)) * (b - a)
    return tot


def _area_sum_gt(s):
    if s <= 0:
        return 1.0
    if s <= 1:
        return 1.0 - 0.5 * s * s
    if s <= 2:
        return 0.5 * (2.0 - s) ** 2
    return 0.0


def _area_diff_gt(d):
    return _area_sum_gt(d + 1.0)


def _v(s, d):
    """Area{qx+qy <= s, qx-qy <= d} over the unit square."""
    return (1.0 - _area_sum_gt(s) - _area_diff_gt(d)
            + _wedge_area(s, d))


def zp(x, y):
    """Centred Zwart–Powell element, exact f64, from area integrals."""
    px, py = x + 1.5, y + 0.5
    s, d = px + py, px - py
    return 0.5 * (_v(s, d) - _v(s - 2.0, d) - _v(s, d - 2.0)
                  + _v(s - 2.0, d - 2.0))


def zp_grad(x, y, eps=1e-7):
    """Gradient of the centred element (central differences at f64 —
    exact to ~1e-9 for a piecewise quadratic away from breaklines)."""
    return ((zp(x + eps, y) - zp(x - eps, y)) / (2 * eps),
            (zp(x, y + eps) - zp(x, y - eps)) / (2 * eps))


def _qb_1d(c, u):
    cm, c0, cp = c
    return (0.5 * (0.5 - u) ** 2 * cm + (0.75 - u * u) * c0
            + 0.5 * (0.5 + u) ** 2 * cp)


def _qb_1d_deriv(c, u):
    cm, c0, cp = c
    return (u - 0.5) * cm - 2.0 * u * c0 + (u + 0.5) * cp


def _apply_a_xy(f):
    fp = np.pad(f, ((1, 1), (1, 1)), mode="edge")
    return (0.5 * f + 0.125 * (fp[:-2, 1:-1] + fp[2:, 1:-1]
                               + fp[1:-1, :-2] + fp[1:-1, 2:]))


def prefilter_ref(field):
    """Exact-z + order-3 quasi-interp xy prefilter, f64."""
    f = np.asarray(field, np.float64)
    c = np.moveaxis(prefilter_1d_ref(np.moveaxis(f, 2, 0)), 0, 2)
    out = np.empty_like(c)
    for k in range(c.shape[2]):
        s = c[:, :, k]
        d1 = s - _apply_a_xy(s)
        d2 = d1 - _apply_a_xy(d1)
        out[:, :, k] = s + d1 + d2
    return out


def interp_ref(coef, origin, spacing, points):
    """Σ_k c_k ZP(x−kx, y−ky) β₂(z−kz), looped over the full support —
    no piece tables, no stencil logic. Interior points only."""
    coef = np.asarray(coef, np.float64)
    origin = np.asarray(origin, np.float64)
    spacing = np.asarray(spacing, np.float64)
    points = np.atleast_2d(np.asarray(points, np.float64))
    nx, ny, nz = coef.shape
    out = np.empty(points.shape[0])
    for i, pt in enumerate(points):
        t = (pt - origin) / spacing
        kx0, ky0 = int(np.floor(t[0])), int(np.floor(t[1]))
        bz = int(np.rint(min(max(t[2], 1.0), nz - 2.0)))
        bz = min(max(bz, 1), nz - 2)
        wz = t[2] - bz
        acc = 0.0
        for kx in range(kx0 - 1, kx0 + 3):
            for ky in range(ky0 - 1, ky0 + 3):
                wxy = zp(t[0] - kx, t[1] - ky)
                if wxy == 0.0:
                    continue
                zl = coef[kx, ky, bz - 1:bz + 2]
                acc += wxy * _qb_1d(zl, wz)
        out[i] = acc
    return out


def interp_grad_ref(coef, origin, spacing, points):
    """Value + physical gradient, same full-support loop."""
    coef = np.asarray(coef, np.float64)
    origin = np.asarray(origin, np.float64)
    spacing = np.asarray(spacing, np.float64)
    points = np.atleast_2d(np.asarray(points, np.float64))
    nx, ny, nz = coef.shape
    vals = np.empty(points.shape[0])
    grads = np.empty((points.shape[0], 3))
    for i, pt in enumerate(points):
        t = (pt - origin) / spacing
        kx0, ky0 = int(np.floor(t[0])), int(np.floor(t[1]))
        bz = int(np.rint(min(max(t[2], 1.0), nz - 2.0)))
        bz = min(max(bz, 1), nz - 2)
        wz = t[2] - bz
        acc = gx = gy = gz = 0.0
        for kx in range(kx0 - 1, kx0 + 3):
            for ky in range(ky0 - 1, ky0 + 3):
                wxy = zp(t[0] - kx, t[1] - ky)
                du, dv = zp_grad(t[0] - kx, t[1] - ky)
                if wxy == 0.0 and du == 0.0 and dv == 0.0:
                    continue
                zl = coef[kx, ky, bz - 1:bz + 2]
                cz = _qb_1d(zl, wz)
                acc += wxy * cz
                gx += du * cz
                gy += dv * cz
                gz += wxy * _qb_1d_deriv(zl, wz)
        vals[i] = acc
        grads[i] = (gx / spacing[0], gy / spacing[1], gz / spacing[2])
    return vals, grads
