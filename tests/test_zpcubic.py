"""Oracle-parity + invariant tests for the ZP-xy × cubic-z hybrid field
model (core.zpcubic, ``interp="zpc"`` — VERDICT r4 #6's untried 256³
route). The oracle (reference_kernels/zpcubic_ref.py) composes the
first-principles ZP area integrals with the literal Catmull–Rom z sum,
independent of the device kernel's tables and banding."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ionotomo_tpu.core.grids import Grid3D
from ionotomo_tpu.core import zpcubic
from reference_kernels import zpcubic_ref


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def make_grid(shape=(12, 13, 14), origin=(-1.0, 0.5, 2.0),
              spacing=(0.5, 0.4, 0.3)):
    return Grid3D.create(origin, spacing, shape)


def interior_points(grid, n, rng, margin=2.0):
    lo = np.asarray(grid.origin) + margin * np.asarray(grid.spacing)
    hi = np.asarray(grid.upper()) - margin * np.asarray(grid.spacing)
    return rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)


def test_matches_f64_oracle(rng):
    grid = make_grid()
    field_np = rng.normal(size=grid.shape).astype(np.float32)
    coef = zpcubic.prefilter(jnp.asarray(field_np))
    coef_ref = zpcubic_ref.prefilter_ref(field_np)
    np.testing.assert_allclose(np.asarray(coef), coef_ref, atol=1e-5)
    pts = interior_points(grid, 150, rng)
    got = np.asarray(zpcubic.interp(coef, grid, jnp.asarray(pts)))
    want = zpcubic_ref.interp_ref(
        coef_ref, np.asarray(grid.origin), np.asarray(grid.spacing), pts)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_gradient_matches_oracle_and_fd(rng):
    grid = make_grid()
    field_np = rng.normal(size=grid.shape).astype(np.float32)
    coef = zpcubic.prefilter(jnp.asarray(field_np))
    coef_ref = zpcubic_ref.prefilter_ref(field_np)
    pts = interior_points(grid, 60, rng)
    val, gr = zpcubic.interp_with_grad(coef, grid, jnp.asarray(pts))
    want_v, want_g = zpcubic_ref.interp_grad_ref(
        coef_ref, np.asarray(grid.origin), np.asarray(grid.spacing), pts)
    np.testing.assert_allclose(np.asarray(val), want_v, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gr), want_g, atol=2e-4)
    # central finite differences of the device interpolant itself
    eps = 1e-3
    for ax in range(3):
        d = np.zeros(3, np.float32)
        d[ax] = eps
        f_p = np.asarray(zpcubic.interp(coef, grid, jnp.asarray(pts + d)))
        f_m = np.asarray(zpcubic.interp(coef, grid, jnp.asarray(pts - d)))
        fd = (f_p - f_m) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gr)[:, ax], fd, atol=3e-3)


def test_reproduces_quadratics_interior(rng):
    grid = make_grid(shape=(14, 14, 14), spacing=(0.5, 0.5, 0.5))
    pts_grid = grid.meshgrid()
    x, y, z = pts_grid[..., 0], pts_grid[..., 1], pts_grid[..., 2]
    field = (0.3 + 0.7 * x - 0.4 * y + 0.2 * z + 0.11 * x * y
             - 0.07 * y * z + 0.05 * x * x - 0.03 * z * z)
    coef = zpcubic.prefilter(jnp.asarray(field, jnp.float32))
    pts = interior_points(grid, 100, rng, margin=3.0)
    got = np.asarray(zpcubic.interp(coef, grid, jnp.asarray(pts)))
    want = (0.3 + 0.7 * pts[:, 0] - 0.4 * pts[:, 1] + 0.2 * pts[:, 2]
            + 0.11 * pts[:, 0] * pts[:, 1] - 0.07 * pts[:, 1] * pts[:, 2]
            + 0.05 * pts[:, 0] ** 2 - 0.03 * pts[:, 2] ** 2)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_constant_field_everywhere():
    grid = make_grid()
    coef = zpcubic.prefilter(jnp.full(grid.shape, 2.5, jnp.float32))
    rng = np.random.default_rng(0)
    lo = np.asarray(grid.origin) - 2.0
    hi = np.asarray(grid.upper()) + 2.0
    pts = rng.uniform(lo, hi, size=(200, 3)).astype(np.float32)
    got = np.asarray(zpcubic.interp(coef, grid, jnp.asarray(pts)))
    np.testing.assert_allclose(got, 2.5, atol=1e-5)


def test_adjoint_identity_through_prefilter(rng):
    """⟨interp(P f), y⟩ == ⟨f, (interp∘P)ᵀ y⟩ with the hand transpose
    (rows_value_p) inside — the exact-adjoint contract that lets the
    hybrid join every Krylov solver unchanged."""
    grid = make_grid(shape=(10, 10, 12))
    pts = jnp.asarray(interior_points(grid, 80, rng))

    def fwd(f):
        coef = zpcubic.prefilter(f)
        nx, ny, nz = grid.shape
        return zpcubic.interp_rows(coef.reshape(nx * ny, nz), grid, pts)

    f = jnp.asarray(rng.normal(size=grid.shape).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(80,)).astype(np.float32))
    out, vjp = jax.vjp(fwd, f)
    (ft,) = vjp(y)
    lhs = float(jnp.vdot(out, y))
    rhs = float(jnp.vdot(f, ft))
    assert abs(lhs - rhs) < 5e-4 * max(abs(lhs), 1.0)


def test_hand_transpose_matches_derived_adjoint(rng):
    """The rows_value_p hand scatter equals XLA's derived transpose of
    the plain impl for the hybrid's (K=8, L=4) shape."""
    from ionotomo_tpu.core.tricubic import rows_value, _rows_value_impl
    from functools import partial

    grid = make_grid(shape=(10, 11, 12))
    field = jnp.asarray(rng.normal(size=grid.shape).astype(np.float32))
    coef = zpcubic.prefilter(field)
    nx, ny, nz = grid.shape
    table = coef.reshape(nx * ny, nz)
    pts = jnp.asarray(interior_points(grid, 70, rng))
    bx, by, u, v, zi, fz = zpcubic._neighborhood(grid, pts)
    from ionotomo_tpu.core.boxspline import _xy_weights, _row_index
    from ionotomo_tpu.core.tricubic import _catmull_rom_weights
    dx, dy, wxy = _xy_weights(u, v, with_grad=False)
    ri = _row_index(bx, by, dx, dy, grid)
    wz = _catmull_rom_weights(fz)

    f_prim = lambda tb: rows_value(tb, ri, wxy, zi, wz, xy_first=True)
    f_plain = partial(_rows_value_impl, ri=ri, wxy=wxy, zi=zi, wz=wz,
                      xy_first=True)
    ct = jnp.asarray(rng.normal(size=(70,)).astype(np.float32))
    g1 = jax.vjp(f_prim, table)[1](ct)[0]
    g2 = jax.vjp(lambda tb: f_plain(tb), table)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)


def test_zpc_order_grammar():
    assert zpcubic.zpc_order("zpc") == 2
    assert zpcubic.zpc_order("zpc4") == 4
    for bad in ("zp", "zpc1", "zpcx", "cubic"):
        with pytest.raises(ValueError):
            zpcubic.zpc_order(bad)


def test_forward_operator_dispatch(rng):
    """interp="zpc" runs through the production TEC forward + its
    adjoint (once wired into forward.tec's dispatch)."""
    from ionotomo_tpu.forward import tec as tec_mod
    from ionotomo_tpu.geometry import rays as rays_mod
    from ionotomo_tpu.models import chapman

    grid = Grid3D.from_bounds((-200, -200, 0.0), (200, 200, 800.0),
                              (12, 12, 12))
    m = chapman.log_parametrize(chapman.chapman_field(grid))
    # perturb so dTEC carries real structure: on a pure smooth Chapman
    # the paired difference is ~1e-7 of TEC — pure f32 cancellation
    # noise, where even zp-vs-cubic disagrees at the dTEC scale. The
    # perturbation must be band-limited (~3-voxel correlation) — at
    # voxel-scale white noise the C¹ field models legitimately diverge
    # (zp-vs-cubic measures ~60% of the dTEC scale there).
    from scipy.ndimage import gaussian_filter
    pert = gaussian_filter(rng.normal(size=grid.shape), 1.5)
    m = m + 0.6 * jnp.asarray(pert.astype(np.float32))
    ants = np.concatenate([rng.uniform(-20, 20, (4, 2)),
                           np.zeros((4, 1))], -1).astype(np.float32)
    zen = rng.uniform(0.05, 0.3, 3)
    az = rng.uniform(0, 2 * np.pi, 3)
    dirs = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                     np.cos(zen)], -1).astype(np.float32)
    o, d = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(o, d, n_samples=17)
    out_zpc = tec_mod.dtec_paired_q(m, grid, rb, 3, 0, "hermite", "zpc")
    out_cub = tec_mod.dtec_paired_q(m, grid, rb, 3, 0, "hermite", "cubic")
    out_zp = tec_mod.dtec_paired_q(m, grid, rb, 3, 0, "hermite", "zp")
    # different C¹ models of the same band-limited field: close, not
    # equal — and the hybrid (cubic z, ZP xy) must sit at least as close
    # to cubic as the full ZP model does
    scale = np.abs(np.asarray(out_cub)).max()
    d_zpc = np.abs(np.asarray(out_zpc) - np.asarray(out_cub)).max()
    d_zp = np.abs(np.asarray(out_zp) - np.asarray(out_cub)).max()
    assert d_zpc < 0.05 * scale
    assert d_zpc <= 1.05 * d_zp
    # and the linearised operator is adjoint-consistent
    def fwd(mm):
        return tec_mod.dtec_paired_q(mm, grid, rb, 3, 0,
                                     "hermite", "zpc").ravel()
    _, jvp = jax.linearize(fwd, jnp.asarray(m))
    vjp = jax.linear_transpose(jvp, jnp.asarray(m))
    v = jnp.asarray(rng.normal(size=grid.shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    lhs = float(jnp.vdot(jvp(v), w))
    (jt,) = vjp(w)
    rhs = float(jnp.vdot(v, jt))
    assert abs(lhs - rhs) < 5e-4 * max(abs(lhs), 1.0)
