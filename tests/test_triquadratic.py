"""Analytic-invariant + oracle-parity tests for the triquadratic kernel.

Same strategy as test_tricubic.py (SURVEY.md §4): exact reproduction of
the polynomial class the scheme guarantees, f64-oracle parity, gradient
consistency — plus the two properties this kernel is shipped for: C¹
continuity across cell boundaries (the tracer's requirement) and the
measured accuracy advantage over the tricubic kernel on band-limited
fields at 9/16 the gather cost (DESIGN.md §14).
"""
import numpy as np
import jax
import jax.numpy as jnp

from ionotomo_tpu.core.grids import Grid3D
from ionotomo_tpu.core import tricubic, triquadratic
from reference_kernels import triquadratic_ref


def make_grid(shape=(12, 13, 14), origin=(-1.0, 0.5, 2.0),
              spacing=(0.5, 0.4, 0.3)):
    return Grid3D.create(origin, spacing, shape)


def sample_field(grid, fn):
    pts = grid.meshgrid()
    return fn(pts[..., 0], pts[..., 1], pts[..., 2])


def interior_points(grid, n, rng, margin=1.5):
    lo = np.asarray(grid.origin) + margin * np.asarray(grid.spacing)
    hi = np.asarray(grid.upper()) - margin * np.asarray(grid.spacing)
    return rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)


def test_prefilter_restores_samples_at_grid_points():
    grid = make_grid()
    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.normal(size=grid.shape), jnp.float32)
    coef = triquadratic.prefilter(field)
    ax = [np.asarray(a) for a in grid.axes()]
    pts = np.stack([
        np.array([ax[0][i], ax[1][j], ax[2][k]])
        for i in range(1, 11) for j in range(2, 8) for k in range(2, 8)
    ]).astype(np.float32)
    got = triquadratic.interp(coef, grid, jnp.asarray(pts))
    want = np.asarray(field)[1:11, 2:8, 2:8].reshape(-1)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_reproduces_linear_everywhere_quadratic_interior(rng):
    grid = make_grid()

    def lin(x, y, z):
        return 1.0 + 2 * x - y + 0.5 * z

    field = jnp.asarray(sample_field(grid, lin), jnp.float32)
    coef = triquadratic.prefilter(field)
    # linear fields survive the boundary closure: margin 0.1 cells only
    pts = interior_points(grid, 300, rng, margin=0.1)
    got = triquadratic.interp(coef, grid, jnp.asarray(pts))
    want = lin(pts[:, 0], pts[:, 1], pts[:, 2])
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=2e-4)

    def quad(x, y, z):
        return 0.3 * x * y - 0.2 * y * z + 0.1 * x * x + 0.05 * z * z - y

    field = jnp.asarray(sample_field(grid, quad), jnp.float32)
    coef = triquadratic.prefilter(field)
    pts = interior_points(grid, 300, rng, margin=2.0)
    got = triquadratic.interp(coef, grid, jnp.asarray(pts))
    want = quad(pts[:, 0], pts[:, 1], pts[:, 2])
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=2e-4)


def test_matches_f64_oracle(rng):
    grid = make_grid()
    field_np = rng.normal(size=grid.shape).astype(np.float32)
    coef = triquadratic.prefilter(jnp.asarray(field_np))
    coef_ref = triquadratic_ref.prefilter_ref(field_np)
    # the device prefilter itself (f32 matmul of the exact inverse) stays
    # at the f32 rounding floor of the exact f64 solve
    np.testing.assert_allclose(np.asarray(coef), coef_ref, atol=5e-6)
    pts = interior_points(grid, 300, rng)
    got = np.asarray(triquadratic.interp(coef, grid, jnp.asarray(pts)))
    want = triquadratic_ref.interp_ref(
        coef_ref, np.asarray(grid.origin), np.asarray(grid.spacing), pts)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


def test_gradient_matches_oracle_and_fd(rng):
    grid = make_grid()
    field_np = rng.normal(size=grid.shape).astype(np.float32)
    coef = triquadratic.prefilter(jnp.asarray(field_np))
    pts = interior_points(grid, 100, rng)
    vals, grads = triquadratic.interp_with_grad(coef, grid,
                                                jnp.asarray(pts))
    coef_ref = triquadratic_ref.prefilter_ref(field_np)
    ref_vals, ref_grads = triquadratic_ref.interp_grad_ref(
        coef_ref, np.asarray(grid.origin), np.asarray(grid.spacing), pts)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=5e-6)
    np.testing.assert_allclose(np.asarray(grads), ref_grads, atol=5e-5)
    # central finite differences of the interpolant itself
    eps = 1e-3
    for d in range(3):
        dp = np.zeros(3, np.float32)
        dp[d] = eps
        up = triquadratic.interp(coef, grid, jnp.asarray(pts + dp))
        dn = triquadratic.interp(coef, grid, jnp.asarray(pts - dp))
        fd = (np.asarray(up) - np.asarray(dn)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(grads)[:, d], fd,
                                   rtol=0, atol=5e-3)


def test_c1_across_cell_boundaries(rng):
    """The piecewise-quadratic interpolant and its gradient must be
    continuous at the half-integer stencil switchovers (u = ±1/2) — the
    property the Fermat tracer requires of any field model."""
    grid = make_grid()
    field_np = rng.normal(size=grid.shape).astype(np.float32)
    coef = triquadratic.prefilter(jnp.asarray(field_np))
    sp = np.asarray(grid.spacing)
    org = np.asarray(grid.origin)
    # points straddling the x stencil boundary at index 5.5 (and random
    # y/z), evaluated eps inside each side
    eps = 1e-4
    yz = interior_points(grid, 50, rng)[:, 1:]
    x_lo = org[0] + (5.5 - eps) * sp[0]
    x_hi = org[0] + (5.5 + eps) * sp[0]
    pts_lo = np.column_stack([np.full(50, x_lo, np.float32), yz])
    pts_hi = np.column_stack([np.full(50, x_hi, np.float32), yz])
    v_lo, g_lo = triquadratic.interp_with_grad(coef, grid,
                                               jnp.asarray(pts_lo))
    v_hi, g_hi = triquadratic.interp_with_grad(coef, grid,
                                               jnp.asarray(pts_hi))
    scale = np.abs(np.asarray(field_np)).max()
    np.testing.assert_allclose(np.asarray(v_lo), np.asarray(v_hi),
                               atol=1e-3 * scale)
    np.testing.assert_allclose(np.asarray(g_lo), np.asarray(g_hi),
                               atol=2e-2 * scale)


def test_row_path_matches_block_path(rng):
    grid = make_grid()
    field_np = rng.normal(size=grid.shape).astype(np.float32)
    coef = triquadratic.prefilter(jnp.asarray(field_np))
    nx, ny, nz = grid.shape
    coef2d = coef.reshape(nx * ny, nz)
    pts = interior_points(grid, 200, rng, margin=0.0)  # incl. boundary
    a = triquadratic.interp(coef, grid, jnp.asarray(pts))
    b = triquadratic.interp_rows(coef2d, grid, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    va, ga = triquadratic.interp_with_grad(coef, grid, jnp.asarray(pts))
    vb, gb = triquadratic.interp_rows_with_grad(coef2d, grid,
                                                jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


def test_interp_weights_reproduce_interp(rng):
    grid = make_grid()
    field_np = rng.normal(size=grid.shape).astype(np.float32)
    coef = triquadratic.prefilter(jnp.asarray(field_np))
    pts = interior_points(grid, 150, rng)
    idx, w = triquadratic.interp_weights(grid, jnp.asarray(pts))
    via_w = (np.asarray(coef).ravel()[np.asarray(idx)]
             * np.asarray(w)).sum(-1)
    direct = triquadratic.interp(coef, grid, jnp.asarray(pts))
    np.testing.assert_allclose(via_w, np.asarray(direct), atol=1e-5)


def test_adjoint_identity_through_prefilter(rng):
    """<J v, y> == <v, Jᵀ y> for the composed field → values map
    (prefilter + interpolation), i.e. AD transposes the whole chain."""
    grid = make_grid(shape=(8, 9, 10))
    pts = jnp.asarray(interior_points(grid, 40, rng))

    def fwd(field):
        return triquadratic.interp(triquadratic.prefilter(field), grid, pts)

    field = jnp.asarray(rng.normal(size=grid.shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=grid.shape), jnp.float32)
    y = jnp.asarray(rng.normal(size=(40,)), jnp.float32)
    _, jv = jax.jvp(fwd, (field,), (v,))
    _, vjp = jax.vjp(fwd, field)
    (jty,) = vjp(y)
    lhs = float(jnp.vdot(jv, y))
    rhs = float(jnp.vdot(v, jty))
    assert abs(lhs - rhs) <= 1e-4 * max(abs(lhs), 1.0)


def test_more_accurate_than_tricubic_on_bandlimited_field(rng):
    """The shipped claim (DESIGN.md §14): prefiltered quadratic B-spline
    interpolation beats Catmull-Rom cubic convolution in BOTH value and
    gradient error on band-limited fields — at 9 row gathers vs 16."""
    grid = Grid3D.create((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (32, 32, 32))
    ks = np.array([[0.9, 0.3, 0.5], [0.2, 1.0, 0.6], [0.5, 0.6, 1.1]])
    ph = np.array([0.3, 1.1, 2.4])
    amp = np.array([1.0, 0.7, 0.5])

    def f(x, y, z):
        r = np.stack(np.broadcast_arrays(x, y, z), axis=-1)
        return sum(a * np.sin(r @ k + p) for a, k, p in zip(amp, ks, ph))

    def gradf(pts):
        out = np.zeros_like(pts)
        for a, k, p in zip(amp, ks, ph):
            out += a * np.cos(pts @ k + p)[:, None] * k[None, :]
        return out

    field = jnp.asarray(sample_field(grid, f), jnp.float32)
    pts = interior_points(grid, 2000, np.random.default_rng(7), margin=2.0)
    truth = f(pts[:, 0], pts[:, 1], pts[:, 2])
    gtruth = gradf(pts.astype(np.float64))

    vc, gc = tricubic.interp_with_grad(field, grid, jnp.asarray(pts))
    coef = triquadratic.prefilter(field)
    vq, gq = triquadratic.interp_with_grad(coef, grid, jnp.asarray(pts))

    err_vc = np.sqrt(np.mean((np.asarray(vc) - truth) ** 2))
    err_vq = np.sqrt(np.mean((np.asarray(vq) - truth) ** 2))
    err_gc = np.sqrt(np.mean((np.asarray(gc) - gtruth) ** 2))
    err_gq = np.sqrt(np.mean((np.asarray(gq) - gtruth) ** 2))
    # measured ~2x better; assert the direction with margin
    assert err_vq < 0.8 * err_vc, (err_vq, err_vc)
    assert err_gq < 0.8 * err_gc, (err_gq, err_gc)
