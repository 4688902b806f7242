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


def _implied_marginal_var(spec):
    """Marginal variance of the field implied by an rfftn-layout spectrum
    (conjugate pairs counted twice; see GPCovariance.sample convention)."""
    s = np.asarray(spec)
    nx, ny, nzr = s.shape
    nz = (nzr - 1) * 2
    w = np.full(s.shape, 2.0)
    w[:, :, 0] = 1.0
    w[:, :, -1] = 1.0
    return float((s * w).sum() / (nx * ny * nz))


def test_fit_shell_spectrum_recovers_sample_covariance():
    """Shell-averaged periodogram of prior draws reproduces the prior's
    marginal variance, and scales quadratically with the anomaly scale —
    the building block of the EnKF adaptive spectral gain."""
    from ionotomo_tpu.inversion.priors import fit_shell_spectrum
    g = grid()
    cov = GPCovariance.create(g, sigma=0.4, length_scale=90.0,
                              kind="von_karman")
    draws = cov.sample(jax.random.key(3), n=24)
    anoms = draws - draws.mean(0, keepdims=True)
    s_fit = fit_shell_spectrum(anoms, g, n_bins=32)
    var_fit = _implied_marginal_var(s_fit)
    # pooled over shells, 24 members: the total variance estimate is tight
    assert abs(var_fit - 0.4**2) < 0.35 * 0.4**2
    # DC stays zero (zero-mean field class) and the spectrum is PSD
    assert float(np.asarray(s_fit)[0, 0, 0]) == 0.0
    assert (np.asarray(s_fit) >= 0.0).all()
    # quadratic scaling: shrunk anomalies -> shrunk fitted covariance
    s_small = fit_shell_spectrum(0.3 * anoms, g, n_bins=32)
    np.testing.assert_allclose(np.asarray(s_small),
                               0.09 * np.asarray(s_fit), rtol=1e-4)
    # a field with covariance spectrum S reproduces S shell-by-shell:
    # compare on the mid shells where both are well populated
    s_true = np.asarray(cov.spectrum)
    s_est = np.asarray(s_fit)
    mask = s_true > 1e-3 * s_true.max()
    ratio = s_est[mask] / s_true[mask]
    assert 0.5 < np.median(ratio) < 1.5


def test_anisotropic_length_scales():
    """length_scale=(Lx,Ly,Lz): correlation decays per-axis; isotropic
    scalar input is the (L,L,L) special case; von Kármán honours the
    stretch too."""
    import jax
    g = Grid3D.from_bounds((0, 0, 0), (200, 200, 200), (32, 32, 32))
    cov = GPCovariance.create(g, sigma=1.0, length_scale=(120.0, 25.0, 25.0),
                              kind="sqexp")
    # apply to a centred delta: C e_0 column = kernel around the centre
    d = jnp.zeros(g.shape).at[16, 16, 16].set(1.0)
    k = np.array(cov.apply(d))
    k /= k[16, 16, 16]
    # +8 voxels = 51.6 km: along x (L=120) corr stays high, along y (L=25) low
    assert k[24, 16, 16] > 0.85
    assert k[16, 24, 16] < 0.25
    # scalar == tuple of equal entries
    ca = GPCovariance.create(g, sigma=0.7, length_scale=60.0, kind="matern32")
    cb = GPCovariance.create(g, sigma=0.7, length_scale=(60.0, 60.0, 60.0),
                             kind="matern32")
    np.testing.assert_allclose(np.asarray(ca.spectrum),
                               np.asarray(cb.spectrum), rtol=1e-6)
    # anisotropic von Kármán: x-correlation (stretched) > y-correlation
    cv = GPCovariance.create(g, sigma=1.0, length_scale=(150.0, 30.0, 30.0),
                             kind="von_karman")
    kv = np.asarray(cv.apply(d))
    assert kv[24, 16, 16] > 2.0 * kv[16, 24, 16]
    # samples remain finite with the documented marginal variance
    s = cv.sample(jax.random.key(0))
    assert np.isfinite(np.asarray(s)).all()
    assert abs(float(jnp.std(s)) - 1.0) < 0.35
