"""Empirical-Bayes prior hyperparameter estimation from the dTEC data.

The reference fixes its prior covariance hyperparameters by hand (SURVEY.md
§2 "Prior covariance operator"; its GP toolkit fits marginal likelihoods
only for 2-D antenna screens). This module completes that layer for the 3-D
field prior: estimate the von Kármán (or any GPCovariance family)
hyperparameters (σ_m, L) **from the observed dTEC itself** by maximising
the exact linear-Gaussian marginal likelihood

    r = d − g(m_prior) ~ N(0, S(γ, L)),   S = γ·J C₀(L) Jᵀ + σ_n² I

where J is the linearised dTEC operator about the prior mean, C₀ the
unit-variance covariance, and γ = σ_m². Both terms of

    −2 log ML = rᵀ S⁻¹ r + logdet S + n log 2π

are evaluated matrix-free with **stochastic Lanczos quadrature** (SLQ;
Ubaru–Chen–Saad 2017): Lanczos tridiagonalisation of the PSD data-space
operator A = J C₀ Jᵀ turns f(S) quadratic forms into k-point Gauss
quadratures on the Ritz values,

    logdet S ≈ (n/m) Σ_i Σ_j w_ij · log(γ θ_ij + σ_n²)       (probes z_i)
    rᵀS⁻¹r  ≈ ‖r‖²  Σ_j w_j  / (γ θ_j  + σ_n²)              (seed r/‖r‖)

TPU-native structure: S is an **affine family in γ** over a fixed A, so
ONE batch of Lanczos runs (vmapped over probes — each step applies the
forward+adjoint+FFT-covariance to all probes at once) prices the *entire*
γ axis for free; only the outer loop over candidate L re-runs Lanczos
(the covariance spectrum is a pytree data field, so every L reuses one
compiled program). Total cost per L ≈ (n_probes+1)·k forward/adjoint
pairs — about one MAP solve — and the whole 2-D (σ_m, L) surface needs
n_L Lanczos batches, not n_L·n_γ.

Full reorthogonalisation keeps the f32 Lanczos honest (k ≤ 64, V is
(k, n_data) — a few MB); the dense (k, k) eigenproblems are trivial and
vmapped. Accuracy is validated against dense logdet/solves in
tests/test_empirical_bayes.py, and hyperparameter recovery on data drawn
from a known prior.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grids import Grid3D
from ..geometry.rays import RayBundle
from .priors import GPCovariance
from .solvers import _dtec_operator


def _lanczos_batch(matvec, v0s, k):
    """Lanczos with full reorthogonalisation, vmapped over seed vectors.

    ``v0s`` (m, n) unit-norm seeds; ``matvec`` maps (m, n) → (m, n)
    (batched). Returns (alphas (m, k), betas (m, k-1)). Breakdown
    (β → 0: the Krylov space is exhausted, e.g. n small or A low-rank)
    is guarded by freezing the recursion — the spurious trailing Ritz
    values get ~zero quadrature weight.
    """
    m, n = v0s.shape

    def step(carry, _):
        V, v, v_prev, beta_prev, j = carry
        w = matvec(v)
        # contractions over the data axis as axis-reductions, not
        # dot_general: the data axis may be ray-sharded (pipeline use),
        # and reductions lower to an unambiguous psum while a sharded
        # dot contraction needs an explicit out_sharding
        alpha = jnp.sum(w * v, axis=1)
        w = w - alpha[:, None] * v - beta_prev[:, None] * v_prev
        # full reorthogonalisation against all stored vectors (V holds
        # zeros beyond step j, which project to nothing)
        proj = jnp.sum(V * w[:, None, :], axis=-1)
        w = w - jnp.sum(proj[:, :, None] * V, axis=1)
        beta = jnp.linalg.norm(w, axis=1)
        ok = beta > 1e-7
        v_next = jnp.where(ok[:, None], w / jnp.maximum(beta, 1e-30)[:, None],
                           v)
        # one-hot write (not .at[].set): propagates a sharded data axis
        # cleanly, and the final step (j+1 == k) is naturally a no-op
        onehot = (jnp.arange(V.shape[1]) == j + 1)
        V_next = jnp.where(onehot[None, :, None],
                           jnp.where(ok[:, None], v_next, 0.0)[:, None, :],
                           V)
        carry = (V_next, jnp.where(ok[:, None], v_next, v),
                 jnp.where(ok[:, None], v, v_prev),
                 jnp.where(ok, beta, 0.0), j + 1)
        return carry, (alpha, jnp.where(ok, beta, 0.0))

    V0 = jnp.where((jnp.arange(k) == 0)[None, :, None], v0s[:, None, :],
                   jnp.zeros((m, k, n), v0s.dtype))
    carry = (V0, v0s, jnp.zeros_like(v0s), jnp.zeros((m,), v0s.dtype),
             jnp.asarray(0))
    _, (alphas, betas) = jax.lax.scan(step, carry, None, length=k)
    # alphas (k, m) → (m, k); betas: last one closes the recursion only
    return alphas.T, betas.T[:, :-1]


def _ritz(alphas, betas):
    """Ritz values θ (m, k) and quadrature weights w = (e₁ᵀq)² (m, k)
    from batched Lanczos tridiagonals."""
    T = jax.vmap(lambda a, b: jnp.diag(a) + jnp.diag(b, 1) + jnp.diag(b, -1)
                 )(alphas, betas)
    theta, Q = jnp.linalg.eigh(T)
    w = Q[:, 0, :] ** 2
    return theta, w


@partial(jax.jit, static_argnames=("num_directions", "i0", "quadrature",
                                   "interp", "n_probes", "lanczos_iters"))
def log_marginal_family(grid: Grid3D, rays: RayBundle, d_obs, noise_std,
                        m_prior, cov_unit: GPCovariance, gammas,
                        num_directions: int, i0: int = 0,
                        quadrature: str = "hermite",
                        interp: str = "cubic", n_probes: int = 8,
                        lanczos_iters: int = 48,
                        key=jax.random.key(0)):
    """log ML(γ) along a γ = σ_m² grid for S = γ·J C₀ Jᵀ + σ_n² I.

    One Lanczos batch prices every γ (the family is affine in γ — the
    Ritz decomposition of A = J C₀ Jᵀ is γ-independent). Returns
    (log_ml (n_γ,), diagnostics dict).
    """
    d = jnp.asarray(d_obs, jnp.float32).ravel()
    n = d.shape[0]
    apply_j, apply_jt, g0 = _dtec_operator(grid, rays, num_directions, i0,
                                           m_prior, None,
                                           quadrature=quadrature,
                                           interp=interp)
    # heteroscedastic noise (scalar or per-datum): whiten so the family
    # stays affine — S̃ = D^{-1/2} S D^{-1/2} = γ·Ã + I with
    # Ã = D^{-1/2} J C₀ Jᵀ D^{-1/2}; logdet S = logdet S̃ + Σ log σᵢ²
    sd = jnp.broadcast_to(
        jnp.asarray(noise_std, jnp.float32).ravel()
        if jnp.ndim(jnp.asarray(noise_std)) else
        jnp.asarray(noise_std, jnp.float32), (n,))
    inv_sd = 1.0 / jnp.maximum(sd, 1e-30)
    r = inv_sd * (d - g0)
    logdet_noise = 2.0 * jnp.sum(jnp.log(sd))

    def a_single(y):
        v = cov_unit.apply(apply_jt(inv_sd * y))
        return inv_sd * apply_j(v)

    a_batched = jax.vmap(a_single)

    z = jax.random.rademacher(key, (n_probes, n), jnp.float32)
    z = z / jnp.sqrt(jnp.float32(n))
    r_norm = jnp.linalg.norm(r)
    seeds = jnp.concatenate([z, (r / jnp.maximum(r_norm, 1e-30))[None]], 0)
    alphas, betas = _lanczos_batch(a_batched, seeds, lanczos_iters)
    theta, w = _ritz(alphas, betas)
    theta = jnp.maximum(theta, 0.0)  # A is PSD; clip f32 Ritz leakage
    th_z, w_z = theta[:-1], w[:-1]   # probe runs → logdet
    th_r, w_r = theta[-1], w[-1]     # data-seeded run → quadratic form

    gammas = jnp.asarray(gammas, jnp.float32)

    def one_gamma(g):
        logdet = jnp.float32(n) * jnp.mean(
            jnp.sum(w_z * jnp.log(g * th_z + 1.0), axis=1)) + logdet_noise
        quad = r_norm**2 * jnp.sum(w_r / (g * th_r + 1.0))
        return -0.5 * (quad + logdet + n * jnp.log(2 * jnp.pi))

    log_ml = jax.vmap(one_gamma)(gammas)
    return log_ml, {"ritz_probe": th_z, "ritz_data": th_r,
                    "r_norm": r_norm}


def fit_hyperparameters(grid: Grid3D, rays: RayBundle, d_obs, noise_std,
                        m_prior, num_directions: int,
                        length_scales, sigmas, kind: str = "von_karman",
                        i0: int = 0, quadrature: str = "hermite",
                        interp: str = "cubic", n_probes: int = 8,
                        lanczos_iters: int = 48, seed: int = 0):
    """Maximise the dTEC marginal likelihood over (σ_m, L) on a grid.

    Host loop over ``length_scales`` (each L is one Lanczos batch; the
    covariance spectrum is a pytree data field so all L share one
    compile); the σ_m axis is priced in closed form from each batch.
    Returns (sigma*, length_scale*, ll_table (n_L, n_σ), fitted
    GPCovariance ready for the solvers).
    """
    length_scales = [float(v) for v in np.asarray(length_scales).ravel()]
    sigmas = np.asarray(sigmas, np.float64).ravel()
    lanczos_iters = min(lanczos_iters, int(np.prod(np.shape(d_obs))))
    # (k > n buys nothing: the Krylov space is exhausted)
    gammas = jnp.asarray(sigmas**2, jnp.float32)
    template = None
    rows = []
    key = jax.random.key(seed)
    for ell in length_scales:
        cov_l = GPCovariance.create(grid, sigma=1.0, length_scale=ell,
                                    kind=kind)
        if template is None:
            # constant pytree metadata across L → one compiled program
            template = dataclasses.replace(cov_l, length_scale=-1.0,
                                           sigma=1.0)
        cov_t = dataclasses.replace(template, spectrum=cov_l.spectrum)
        ll, _ = log_marginal_family(grid, rays, d_obs, noise_std, m_prior,
                                    cov_t, gammas, num_directions, i0,
                                    quadrature, interp, n_probes,
                                    lanczos_iters, key)
        rows.append(np.asarray(ll))
    table = np.stack(rows)                       # (n_L, n_sigma)
    i_l, i_s = np.unravel_index(int(np.argmax(table)), table.shape)
    sigma_star = float(sigmas[i_s])
    ell_star = float(length_scales[i_l])
    cov_star = GPCovariance.create(grid, sigma=sigma_star,
                                   length_scale=ell_star, kind=kind)
    return sigma_star, ell_star, table, cov_star
