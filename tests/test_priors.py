"""GP covariance operator and smoothness prior tests."""
import numpy as np
import jax
import jax.numpy as jnp

from ionotomo_tpu.core.grids import Grid3D
from ionotomo_tpu.inversion.priors import GPCovariance, laplacian


def grid():
    return Grid3D.from_bounds((0, 0, 0), (300, 300, 300), (24, 24, 24))


def test_covariance_apply_matches_dense_kernel_row():
    """C_m applied to a delta function reproduces the kernel around that
    voxel (up to periodic wrap, negligible at L ≪ extent)."""
    g = grid()
    cov = GPCovariance.create(g, sigma=2.0, length_scale=40.0,
                              kind="exponential")
    delta = jnp.zeros(g.shape).at[12, 12, 12].set(1.0)
    row = np.asarray(cov.apply(delta))
    pts = g.meshgrid()
    r = np.linalg.norm(pts - pts[12, 12, 12], axis=-1)
    want = 4.0 * np.exp(-r / 40.0)
    np.testing.assert_allclose(row, want, atol=4.0 * 2e-3)


def test_covariance_is_symmetric_psd():
    g = grid()
    cov = GPCovariance.create(g, sigma=1.0, length_scale=60.0,
                              kind="matern52")
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=g.shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=g.shape), jnp.float32)
    lhs = float(jnp.vdot(cov.apply(u), v))
    rhs = float(jnp.vdot(u, cov.apply(v)))
    assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), 1.0)
    quad = float(jnp.vdot(u, cov.apply(u)))
    assert quad > 0


def test_covariance_inverse_roundtrip():
    g = grid()
    cov = GPCovariance.create(g, sigma=1.5, length_scale=50.0, kind="sqexp")
    rng = np.random.default_rng(1)
    # use a smooth vector (in range of C) for a well-conditioned roundtrip
    v = cov.apply(jnp.asarray(rng.normal(size=g.shape), jnp.float32))
    back = cov.apply(cov.apply_inv(v))
    np.testing.assert_allclose(np.asarray(back), np.asarray(v),
                               atol=2e-2 * float(jnp.abs(v).max()))


def test_sampling_variance_and_correlation():
    g = grid()
    sigma, ell = 1.0, 60.0
    cov = GPCovariance.create(g, sigma=sigma, length_scale=ell,
                              kind="sqexp")
    samples = cov.sample(jax.random.key(0), n=32)
    s = np.asarray(samples)
    var = s.var()
    assert abs(var - sigma**2) < 0.25 * sigma**2
    # spatial correlation at one voxel lag ≈ k(dx)/σ²
    dx = float(np.asarray(g.spacing)[0])
    want_corr = np.exp(-0.5 * (dx / ell) ** 2)
    num = (s[:, :-1] * s[:, 1:]).mean()
    got_corr = num / var
    assert abs(got_corr - want_corr) < 0.1


def test_sqrt_consistency():
    g = grid()
    cov = GPCovariance.create(g, sigma=1.0, length_scale=40.0,
                              kind="exponential")
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.normal(size=g.shape), jnp.float32)
    a = cov.apply(v)
    b = cov.apply_sqrt(cov.apply_sqrt(v))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-3 * float(jnp.abs(a).max()))


def test_laplacian_of_quadratic_is_constant():
    g = grid()
    pts = g.meshgrid()
    f = jnp.asarray(pts[..., 0] ** 2 + 2 * pts[..., 1] ** 2
                    - pts[..., 2] ** 2, jnp.float32)
    lap = np.asarray(laplacian(f, g))
    # interior voxels: ∇²f = 2 + 4 − 2 = 4
    np.testing.assert_allclose(lap[2:-2, 2:-2, 2:-2], 4.0, rtol=1e-3)
