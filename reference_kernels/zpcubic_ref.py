"""f64 oracle for the ZP-xy × Catmull–Rom-z hybrid field model
(``ionotomo_tpu.core.zpcubic``): full-support loops, no piece tables, no
stencil logic — ZP evaluated by the exact area integrals of
``boxspline_ref`` and the z axis by the literal 4-tap Catmull–Rom sum of
``tricubic_ref``. Interior points only (same contract as the other
oracles)."""
import numpy as np

from .boxspline_ref import zp, zp_grad, _apply_a_xy
from .tricubic_ref import _cr_1d, _cr_1d_deriv


def prefilter_ref(field, order: int = 2):
    """xy-only order-``order`` quasi-interpolation prefilter, f64 —
    the z axis stays raw samples (Catmull–Rom interpolates directly)."""
    f = np.asarray(field, np.float64)
    out = np.empty_like(f)
    for k in range(f.shape[2]):
        s = f[:, :, k]
        acc = s.copy()
        d = s
        for _ in range(order):
            d = d - _apply_a_xy(d)
            acc = acc + d
        out[:, :, k] = acc
    return out


def interp_ref(coef, origin, spacing, points):
    """Σ_{k,l} ZP(x−k, y−l) · CR_z(coef[k, l, :], z). Interior only."""
    coef = np.asarray(coef, np.float64)
    origin = np.asarray(origin, np.float64)
    spacing = np.asarray(spacing, np.float64)
    points = np.atleast_2d(np.asarray(points, np.float64))
    nx, ny, nz = coef.shape
    out = np.empty(points.shape[0])
    for i, pt in enumerate(points):
        t = (pt - origin) / spacing
        kx0, ky0 = int(np.floor(t[0])), int(np.floor(t[1]))
        bz = int(np.floor(min(max(t[2], 0.0), nz - 2.0)))
        bz = min(max(bz, 1), nz - 3)
        fz = t[2] - bz
        acc = 0.0
        for kx in range(kx0 - 1, kx0 + 3):
            for ky in range(ky0 - 1, ky0 + 3):
                wxy = zp(t[0] - kx, t[1] - ky)
                if wxy == 0.0:
                    continue
                acc += wxy * _cr_1d(coef[kx, ky, bz - 1:bz + 3], fz)
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
        bz = int(np.floor(min(max(t[2], 0.0), nz - 2.0)))
        bz = min(max(bz, 1), nz - 3)
        fz = t[2] - bz
        acc = gx = gy = gz = 0.0
        for kx in range(kx0 - 1, kx0 + 3):
            for ky in range(ky0 - 1, ky0 + 3):
                wxy = zp(t[0] - kx, t[1] - ky)
                du, dv = zp_grad(t[0] - kx, t[1] - ky)
                if wxy == 0.0 and du == 0.0 and dv == 0.0:
                    continue
                zl = coef[kx, ky, bz - 1:bz + 3]
                cz = _cr_1d(zl, fz)
                acc += wxy * cz
                gx += du * cz
                gy += dv * cz
                gz += wxy * _cr_1d_deriv(zl, fz)
        vals[i] = acc
        grads[i] = (gx / spacing[0], gy / spacing[1], gz / spacing[2])
    return vals, grads
