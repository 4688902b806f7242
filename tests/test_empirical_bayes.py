"""Empirical-Bayes prior fitting (inversion/empirical_bayes.py): the SLQ
marginal likelihood must match the dense linear-Gaussian evidence exactly
where dense is computable, and maximising it must recover the
hyperparameters that generated the data."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ionotomo_tpu.core.grids import Grid3D
from ionotomo_tpu.geometry import rays as rays_mod
from ionotomo_tpu.inversion import empirical_bayes as eb
from ionotomo_tpu.inversion import solvers
from ionotomo_tpu.inversion.priors import GPCovariance
from ionotomo_tpu.models import chapman


def small_world(n_ants=6, n_dirs=5, shape=(14, 14, 14), seed=3,
                extent_km=15.0):
    rng = np.random.default_rng(seed)
    ants = np.concatenate([rng.uniform(-extent_km, extent_km, (n_ants, 2)),
                           np.zeros((n_ants, 1))], -1).astype(np.float32)
    zen = rng.uniform(0.05, 0.5, n_dirs)
    az = rng.uniform(0, 2 * np.pi, n_dirs)
    dirs = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                     np.cos(zen)], -1).astype(np.float32)
    grid = Grid3D.from_bounds((-120.0, -120.0, 0.0), (120.0, 120.0, 700.0),
                              shape)
    m_prior = chapman.log_parametrize(chapman.chapman_field(grid))
    o, dv = rays_mod.make_ray_batch(jnp.asarray(ants), jnp.asarray(dirs))
    rb = rays_mod.sample_straight_rays(o, dv, n_samples=17)
    return grid, m_prior, rb, n_dirs


def dense_data_operator(grid, m_prior, rb, n_dirs, cov):
    """A = J C Jᵀ built densely by applying the matvec to the identity."""
    apply_j, apply_jt, g0 = solvers._dtec_operator(
        grid, rb, n_dirs, 0, m_prior, None, quadrature="hermite",
        interp="cubic")
    n = g0.shape[0]

    def col(y):
        return apply_j(cov.apply(apply_jt(y)))

    A = jax.vmap(col)(jnp.eye(n, dtype=jnp.float32))
    return np.asarray(A).T, np.asarray(g0), apply_j, apply_jt


def test_slq_matches_dense_evidence():
    """With k ≥ n the Lanczos quadrature is exact: SLQ log ML(γ) must
    match the dense Gaussian evidence at every γ on a problem small
    enough to compute densely (n = 30 data)."""
    grid, m_prior, rb, n_dirs = small_world()
    cov1 = GPCovariance.create(grid, sigma=1.0, length_scale=60.0,
                               kind="von_karman")
    A, g0, _, _ = dense_data_operator(grid, m_prior, rb, n_dirs, cov1)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    d = g0 + rng.normal(0, 50.0, n).astype(np.float32)
    noise = 40.0
    gammas = np.asarray([0.01, 0.04, 0.09, 0.25], np.float64)

    ll, _ = eb.log_marginal_family(
        grid, rb, jnp.asarray(d), noise, m_prior, cov1,
        jnp.asarray(gammas, jnp.float32), n_dirs,
        n_probes=n, lanczos_iters=n, key=jax.random.key(1))
    ll = np.asarray(ll, np.float64)

    r = (d - g0).astype(np.float64)
    A64 = np.asarray(A, np.float64)
    A64 = 0.5 * (A64 + A64.T)
    for i, g in enumerate(gammas):
        S = g * A64 + noise**2 * np.eye(n)
        sign, logdet = np.linalg.slogdet(S)
        assert sign > 0
        quad = float(r @ np.linalg.solve(S, r))
        ll_dense = -0.5 * (quad + logdet + n * np.log(2 * np.pi))
        # k = n Lanczos is exact up to f32 matvec noise; the probe
        # average over n Rademacher vectors still carries MC error in
        # the logdet term — tolerance covers both
        assert abs(ll[i] - ll_dense) < 0.03 * abs(ll_dense), (
            i, ll[i], ll_dense)


def test_data_seeded_ritz_matches_dense_spectrum():
    """With k = n and full reorthogonalisation the data-seeded Lanczos
    run's Ritz values must reproduce the dense eigenvalues of
    A = J C Jᵀ in the part of the spectrum that carries the likelihood
    (the dominant eigenvalues) — the f32 twin of exactness."""
    grid, m_prior, rb, n_dirs = small_world(seed=5)
    cov1 = GPCovariance.create(grid, sigma=1.0, length_scale=80.0,
                               kind="exponential")
    A, g0, _, _ = dense_data_operator(grid, m_prior, rb, n_dirs, cov1)
    n = A.shape[0]
    rng = np.random.default_rng(2)
    d = g0 + rng.normal(0, 30.0, n).astype(np.float32)
    _, diag = eb.log_marginal_family(
        grid, rb, jnp.asarray(d), 25.0, m_prior, cov1,
        jnp.asarray([0.04], jnp.float32), n_dirs,
        n_probes=2, lanczos_iters=n, key=jax.random.key(3))
    A64 = 0.5 * (np.asarray(A, np.float64) + np.asarray(A, np.float64).T)
    ev_top = np.sort(np.linalg.eigvalsh(A64))[-5:]
    # the family is solved in whitened form: Ã = A/σ_n² for scalar noise
    th_top = np.sort(np.asarray(diag["ritz_data"], np.float64))[-5:] * 25.0**2
    np.testing.assert_allclose(th_top, ev_top, rtol=5e-3)


def test_slq_noise_axis_matches_dense_evidence():
    """The (γ, ρ) plane from ONE Lanczos batch must match the dense
    evidence of S = γA + ρ²σ_n²I at every grid point (k = n exactness,
    as test_slq_matches_dense_evidence but along the noise axis too)."""
    grid, m_prior, rb, n_dirs = small_world()
    cov1 = GPCovariance.create(grid, sigma=1.0, length_scale=60.0,
                               kind="von_karman")
    A, g0, _, _ = dense_data_operator(grid, m_prior, rb, n_dirs, cov1)
    n = A.shape[0]
    rng = np.random.default_rng(1)
    d = g0 + rng.normal(0, 50.0, n).astype(np.float32)
    noise = 40.0
    gammas = np.asarray([0.04, 0.25], np.float64)
    rhos = np.asarray([0.5, 1.0, 2.0], np.float64)

    ll, _ = eb.log_marginal_family(
        grid, rb, jnp.asarray(d), noise, m_prior, cov1,
        jnp.asarray(gammas, jnp.float32), n_dirs,
        n_probes=n, lanczos_iters=n, key=jax.random.key(2),
        noise_scales=jnp.asarray(rhos, jnp.float32))
    ll = np.asarray(ll, np.float64)
    assert ll.shape == (2, 3)

    r = (d - g0).astype(np.float64)
    A64 = np.asarray(A, np.float64)
    A64 = 0.5 * (A64 + A64.T)
    for i, g in enumerate(gammas):
        for j, rho in enumerate(rhos):
            S = g * A64 + (rho * noise)**2 * np.eye(n)
            sign, logdet = np.linalg.slogdet(S)
            assert sign > 0
            quad = float(r @ np.linalg.solve(S, r))
            ll_dense = -0.5 * (quad + logdet + n * np.log(2 * np.pi))
            assert abs(ll[i, j] - ll_dense) < 0.03 * abs(ll_dense), (
                i, j, ll[i, j], ll_dense)


def test_dense_method_matches_dense_evidence_tightly():
    """method="dense" is exact (one eigh of the explicitly assembled
    data operator): it must match the numpy dense evidence to f32
    round-off, across BOTH axes — including the ρ corners where SLQ's
    quadrature cannot reach (the reason the method exists)."""
    grid, m_prior, rb, n_dirs = small_world()
    cov1 = GPCovariance.create(grid, sigma=1.0, length_scale=60.0,
                               kind="von_karman")
    A, g0, _, _ = dense_data_operator(grid, m_prior, rb, n_dirs, cov1)
    n = A.shape[0]
    rng = np.random.default_rng(8)
    d = g0 + rng.normal(0, 50.0, n).astype(np.float32)
    noise = 40.0
    gammas = np.asarray([0.01, 0.25], np.float64)
    rhos = np.asarray([0.25, 1.0, 4.0], np.float64)

    ll, _ = eb.log_marginal_family(
        grid, rb, jnp.asarray(d), noise, m_prior, cov1,
        jnp.asarray(gammas, jnp.float32), n_dirs,
        noise_scales=jnp.asarray(rhos, jnp.float32), method="dense")
    ll = np.asarray(ll, np.float64)

    r = (d - g0).astype(np.float64)
    A64 = np.asarray(A, np.float64)
    A64 = 0.5 * (A64 + A64.T)
    for i, g in enumerate(gammas):
        for j, rho in enumerate(rhos):
            S = g * A64 + (rho * noise)**2 * np.eye(n)
            _, logdet = np.linalg.slogdet(S)
            quad = float(r @ np.linalg.solve(S, r))
            ll_dense = -0.5 * (quad + logdet + n * np.log(2 * np.pi))
            assert abs(ll[i, j] - ll_dense) < 5e-3 * abs(ll_dense), (
                i, j, ll[i, j], ll_dense)


def test_fit_recovers_noise_scale():
    """Data whose true noise is 2.5x the assumed noise_std: the joint
    (σ, L, ρ) fit must select ρ* = 2.5 from a decade-wide grid (and not
    inflate the prior σ to absorb the extra white power — white noise
    and correlated prior power are spectrally separable)."""
    grid, m_prior, rb, n_dirs = small_world(n_ants=20, n_dirs=30,
                                            shape=(20, 20, 20), seed=11,
                                            extent_km=100.0)
    cov_t = GPCovariance.create(grid, sigma=0.22, length_scale=60.0,
                                kind="von_karman")
    dm = cov_t.sample(jax.random.key(7))
    apply_j, _, g0 = solvers._dtec_operator(
        grid, rb, n_dirs, 0, m_prior, None, quadrature="hermite",
        interp="cubic")
    noise_assumed = 3.0
    d = np.asarray(g0 + apply_j(dm))
    d = d + np.random.default_rng(4).normal(0, 2.5 * noise_assumed, d.shape)

    s_star, l_star, rho_star, table, _ = eb.fit_hyperparameters(
        grid, rb, jnp.asarray(d, jnp.float32), noise_assumed, m_prior,
        n_dirs, [15.0, 60.0, 240.0], [0.07, 0.13, 0.22, 0.38, 0.65],
        kind="von_karman", n_probes=8, lanczos_iters=48, seed=1,
        noise_scales=[0.4, 1.0, 2.5, 6.0])
    assert table.shape == (3, 5, 4)
    assert rho_star == 2.5, (rho_star, table.max(axis=(0, 1)))
    assert l_star == 60.0, (l_star,)
    assert s_star in (0.13, 0.22, 0.38), (s_star,)


def test_fit_recovers_generating_hyperparameters():
    """Data drawn from a known prior (σ=0.22, L=60 km on a 20³ grid):
    the (σ, L) grid fit must peak at the generating L and within one
    σ cell. Identifiability needs the array aperture to EXCEED the
    outer scale — with a ±15 km aperture every candidate L ≥ 35 km sits
    on the σ–L ridge (measured; dTEC only senses the inertial range
    below the aperture), so this test uses a ±100 km array."""
    grid, m_prior, rb, n_dirs = small_world(n_ants=20, n_dirs=30,
                                            shape=(20, 20, 20), seed=11,
                                            extent_km=100.0)
    sig_t, ell_t = 0.22, 60.0
    cov_t = GPCovariance.create(grid, sigma=sig_t, length_scale=ell_t,
                                kind="von_karman")
    key = jax.random.key(7)
    dm = cov_t.sample(key)
    apply_j, _, g0 = solvers._dtec_operator(
        grid, rb, n_dirs, 0, m_prior, None, quadrature="hermite",
        interp="cubic")
    noise = 3.0
    d = np.asarray(g0 + apply_j(dm))
    d = d + np.random.default_rng(4).normal(0, noise, d.shape)

    sigmas = [0.07, 0.13, 0.22, 0.38, 0.65]
    ells = [15.0, 60.0, 240.0]
    s_star, l_star, table, cov_star = eb.fit_hyperparameters(
        grid, rb, jnp.asarray(d, jnp.float32), noise, m_prior, n_dirs,
        ells, sigmas, kind="von_karman", n_probes=8, lanczos_iters=48,
        seed=1)
    assert l_star == 60.0, (l_star, table)
    assert s_star in (0.13, 0.22, 0.38), (s_star, table)
    assert cov_star.sigma == s_star and cov_star.length_scale == l_star
