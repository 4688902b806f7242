"""Analytic-invariant + oracle-parity tests for the tricubic kernel.

Mirrors the reference's test strategy (SURVEY.md §4): interpolation must
reproduce polynomial fields exactly (cubic convolution is 3rd-order, exact
for quadratics along each axis), agree with analytic fields to tolerance,
and its gradient must match finite differences and the f64 oracle.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ionotomo_tpu.core.grids import Grid3D
from ionotomo_tpu.core import tricubic
from reference_kernels import tricubic_ref


def make_grid(shape=(12, 13, 14), origin=(-1.0, 0.5, 2.0),
              spacing=(0.5, 0.4, 0.3)):
    return Grid3D.create(origin, spacing, shape)


def sample_field(grid, fn):
    pts = grid.meshgrid()
    return fn(pts[..., 0], pts[..., 1], pts[..., 2])


def interior_points(grid, n, rng):
    lo = np.asarray(grid.origin) + 1.5 * np.asarray(grid.spacing)
    hi = np.asarray(grid.upper()) - 1.5 * np.asarray(grid.spacing)
    return rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)


def test_reproduces_quadratic_exactly(rng):
    grid = make_grid()

    def f(x, y, z):
        return 1.0 + 2 * x - y + 0.5 * z + 0.3 * x * y - 0.2 * y * z + 0.1 * x * x

    field = jnp.asarray(sample_field(grid, f), jnp.float32)
    pts = interior_points(grid, 200, rng)
    got = tricubic.interp(field, grid, jnp.asarray(pts))
    want = f(pts[:, 0], pts[:, 1], pts[:, 2])
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=2e-4)


def test_grid_points_are_interpolated_exactly():
    grid = make_grid()
    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.normal(size=grid.shape), jnp.float32)
    ax = [np.asarray(a) for a in grid.axes()]
    pts = np.stack([
        np.array([ax[0][i], ax[1][j], ax[2][k]])
        for i in range(2, 8) for j in range(2, 8) for k in range(2, 8)
    ]).astype(np.float32)
    got = tricubic.interp(field, grid, jnp.asarray(pts))
    want = np.asarray(field)[2:8, 2:8, 2:8].reshape(-1)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_matches_f64_oracle(rng):
    grid = make_grid()
    field_np = rng.normal(size=grid.shape)
    field = jnp.asarray(field_np, jnp.float32)
    pts = interior_points(grid, 300, rng)
    got = np.asarray(tricubic.interp(field, grid, jnp.asarray(pts)))
    want = tricubic_ref.interp_ref(
        field_np.astype(np.float32),  # oracle sees the same f32 samples
        np.asarray(grid.origin), np.asarray(grid.spacing), pts)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


def test_gradient_matches_oracle_and_fd(rng):
    grid = make_grid()
    field_np = rng.normal(size=grid.shape)
    field = jnp.asarray(field_np, jnp.float32)
    pts = interior_points(grid, 100, rng)
    vals, grads = tricubic.interp_with_grad(field, grid, jnp.asarray(pts))
    ref_vals, ref_grads = tricubic_ref.interp_grad_ref(
        field_np.astype(np.float32),
        np.asarray(grid.origin), np.asarray(grid.spacing), pts)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=5e-6)
    np.testing.assert_allclose(np.asarray(grads), ref_grads, atol=5e-5)

    # finite differences on the interpolant itself
    eps = 1e-3
    for d in range(3):
        dp = pts.copy(); dp[:, d] += eps
        dm = pts.copy(); dm[:, d] -= eps
        fd = (np.asarray(tricubic.interp(field, grid, jnp.asarray(dp)))
              - np.asarray(tricubic.interp(field, grid, jnp.asarray(dm)))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(grads[:, d]), fd,
                                   rtol=2e-2, atol=2e-3)


def test_constant_extrapolation_outside():
    grid = make_grid()
    field = jnp.ones(grid.shape, jnp.float32) * 3.5
    far = jnp.asarray([[-100.0, -100.0, -100.0], [100.0, 100.0, 100.0]],
                      jnp.float32)
    got = tricubic.interp(field, grid, far)
    np.testing.assert_allclose(np.asarray(got), 3.5, atol=1e-5)


def test_interp_weights_consistency(rng):
    grid = make_grid()
    field_np = rng.normal(size=grid.shape).astype(np.float32)
    field = jnp.asarray(field_np)
    pts = jnp.asarray(interior_points(grid, 64, rng))
    idx, w = tricubic.interp_weights(grid, pts)
    via_weights = (field.reshape(-1)[idx] * w).sum(-1)
    direct = tricubic.interp(field, grid, pts)
    np.testing.assert_allclose(np.asarray(via_weights), np.asarray(direct),
                               atol=1e-5)
    # partition of unity
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)


def test_field_hdf5_roundtrip(tmp_path, rng):
    from ionotomo_tpu.core.grids import save_field, load_field
    grid = make_grid()
    field = rng.normal(size=grid.shape).astype(np.float32)
    p = tmp_path / "field.h5"
    save_field(p, grid, field, name="ne", attrs={"note": "test"})
    grid2, field2, attrs = load_field(p)
    np.testing.assert_array_equal(field2, field)
    assert grid2.shape == grid.shape
    np.testing.assert_allclose(np.asarray(grid2.origin),
                               np.asarray(grid.origin))
    assert attrs["note"] == "test"


def test_jit_and_vmap_compatible(rng):
    grid = make_grid()
    field = jnp.asarray(rng.normal(size=grid.shape), jnp.float32)
    pts = jnp.asarray(interior_points(grid, 32, rng))
    f = jax.jit(lambda fld, p: tricubic.interp(fld, grid, p))
    np.testing.assert_allclose(
        np.asarray(f(field, pts)),
        np.asarray(tricubic.interp(field, grid, pts)), atol=5e-6)
