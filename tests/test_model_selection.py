"""GCV prior selection: the chosen (sigma, L) generalises near-optimally
among the candidates (GCV is a held-out-error proxy)."""
import numpy as np
import jax
import jax.numpy as jnp

from ionotomo_tpu.core.grids import Grid3D
from ionotomo_tpu.forward import tec as tec_mod
from ionotomo_tpu.geometry import rays as rays_mod
from ionotomo_tpu.inversion import solvers
from ionotomo_tpu.inversion.model_selection import gcv_score, select_prior
from ionotomo_tpu.inversion.priors import GPCovariance
from ionotomo_tpu.models import chapman


def world(seed=0):
    rng = np.random.default_rng(seed)
    na, nd = 14, 7
    ants = np.concatenate([rng.uniform(-80, 80, (na, 2)),
                           np.zeros((na, 1))], -1).astype(np.float32)
    zen = rng.uniform(0.05, 0.45, nd)
    az = rng.uniform(0, 2 * np.pi, nd)
    dirs = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                     np.cos(zen)], -1).astype(np.float32)
    grid = chapman.grid_enclosing_rays(ants, dirs, max_length_km=900.0,
                                       shape=(18, 18, 18), h_min_km=0.0)
    m_prior = chapman.log_parametrize(chapman.chapman_field(grid))
    cov_true = GPCovariance.create(grid, sigma=0.4, length_scale=90.0,
                                   kind="sqexp")
    m_true = m_prior + cov_true.sample(jax.random.key(3))
    o, d = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(o, d, max_length_km=900.0,
                                       n_samples=49)
    d_obs = tec_mod.dtec_paired(m_true, grid, rb, nd, 0)
    noise = jnp.float32(0.01 * float(jnp.std(d_obs)))
    d_obs = d_obs + noise * jax.random.normal(jax.random.key(1),
                                              d_obs.shape)
    # held-out rays
    ants_h = np.concatenate([rng.uniform(-80, 80, (8, 2)),
                             np.zeros((8, 1))], -1).astype(np.float32)
    zen_h = rng.uniform(0.05, 0.45, 5)
    az_h = rng.uniform(0, 2 * np.pi, 5)
    dirs_h = np.stack([np.sin(zen_h) * np.sin(az_h),
                       np.sin(zen_h) * np.cos(az_h),
                       np.cos(zen_h)], -1).astype(np.float32)
    o_h, d_h = rays_mod.make_ray_batch(ants_h, dirs_h)
    rb_h = rays_mod.sample_straight_rays(o_h, d_h, max_length_km=900.0,
                                         n_samples=49)
    d_held = tec_mod.dtec_paired(m_true, grid, rb_h, 5, 0)
    return grid, m_prior, rb, d_obs, noise, nd, rb_h, d_held


def test_gcv_selects_near_optimal_prior():
    grid, m_prior, rb, d_obs, noise, nd, rb_h, d_held = world()
    candidates = [
        dict(sigma=0.4, length_scale=90.0, kind="sqexp"),    # truth-ish
        dict(sigma=0.02, length_scale=90.0, kind="sqexp"),   # underfit
        dict(sigma=3.0, length_scale=8.0, kind="sqexp"),     # overfit-ish
        dict(sigma=0.4, length_scale=400.0, kind="sqexp"),   # too smooth
    ]
    best_cov, best_params, scores = select_prior(
        grid, rb, d_obs, noise, m_prior, candidates, num_directions=nd,
        key=jax.random.key(0), cg_iters=30, n_probes=4)
    assert np.isfinite(scores).all()

    # held-out dTEC error of the MAP solve under each candidate
    def heldout(cov):
        res = solvers.map_gauss_newton(grid, rb, d_obs, noise, m_prior,
                                       cov, num_directions=nd, gn_iters=1,
                                       cg_iters=30)
        g = tec_mod.dtec_paired(res.m, grid, rb_h, 5, 0)
        return float(jnp.sqrt(jnp.mean((g - d_held) ** 2)))

    errs = [heldout(GPCovariance.create(grid, **c)) for c in candidates]
    picked = errs[int(np.argmin(scores))]
    # GCV's pick generalises near-optimally among the candidates
    assert picked <= 1.3 * min(errs), (scores, errs)
    # and clearly beats the worst candidate
    assert picked < 0.7 * max(errs), (scores, errs)


def test_gcv_score_is_deterministic_given_key():
    grid, m_prior, rb, d_obs, noise, nd, *_ = world(seed=5)
    cov = GPCovariance.create(grid, sigma=0.3, length_scale=80.0,
                              kind="sqexp")
    s1 = float(gcv_score(grid, rb, d_obs, noise, m_prior, cov,
                         num_directions=nd, key=jax.random.key(2)))
    s2 = float(gcv_score(grid, rb, d_obs, noise, m_prior, cov,
                         num_directions=nd, key=jax.random.key(2)))
    assert s1 == s2 and np.isfinite(s1)


def test_pipeline_auto_selects_prior(tmp_path):
    """prior.auto_select runs GCV over the candidate grid at setup and
    logs the choice; the run completes with the selected covariance."""
    import dataclasses
    from ionotomo_tpu.config import (EngineConfig, GridConfig, RayConfig,
                                     SolverConfig, RuntimeConfig,
                                     PriorConfig)
    from ionotomo_tpu.data.synth import generate_example_datapack
    from ionotomo_tpu.inversion.pipeline import InversionPipeline

    dp, _ = generate_example_datapack(
        n_antennas=8, n_directions=4, n_times=1, mjd0=58000.45,
        grid_shape=(12, 12, 12), n_samples=17)
    cfg = EngineConfig(
        grid=GridConfig(shape=(12, 12, 12)),
        rays=RayConfig(n_samples=17),
        prior=PriorConfig(sigma=0.3, length_scale_km=90.0, kind="sqexp",
                          auto_select=True),
        solver=SolverConfig(gn_iters=1, cg_iters=10),
        runtime=RuntimeConfig(checkpoint_dir=str(tmp_path / "c"),
                              metrics_path=str(tmp_path / "m.jsonl")))
    pipe = InversionPipeline(dp, cfg)
    events = [r for r in pipe.metrics.read_all()
              if r.get("event") == "prior_auto_selected"]
    assert len(events) == 1
    assert events[0]["n_candidates"] == 27   # 3 kinds x 3 sigma x 3 L
    assert np.isfinite(events[0]["best_score"])
    chosen = events[0]["chosen"]
    assert pipe.cov.kind == chosen["kind"]
    sol = pipe.run(resume=False)
    assert np.isfinite(sol.m).all()


def test_pipeline_auto_selects_prior_by_evidence(tmp_path):
    """prior.auto_select="evidence" fits (σ, L, kind) by SLQ marginal
    likelihood at setup (inversion/empirical_bayes.py) and logs the
    choice; the run completes with the fitted covariance."""
    from ionotomo_tpu.config import (EngineConfig, GridConfig, RayConfig,
                                     SolverConfig, RuntimeConfig,
                                     PriorConfig)
    from ionotomo_tpu.data.synth import generate_example_datapack
    from ionotomo_tpu.inversion.pipeline import InversionPipeline

    dp, _ = generate_example_datapack(
        n_antennas=8, n_directions=4, n_times=1, mjd0=58000.45,
        grid_shape=(12, 12, 12), n_samples=17)
    cfg = EngineConfig(
        grid=GridConfig(shape=(12, 12, 12)),
        rays=RayConfig(n_samples=17),
        prior=PriorConfig(sigma=0.3, length_scale_km=90.0, kind="sqexp",
                          auto_select="evidence", fit_noise=True),
        solver=SolverConfig(gn_iters=1, cg_iters=10),
        runtime=RuntimeConfig(checkpoint_dir=str(tmp_path / "c"),
                              metrics_path=str(tmp_path / "m.jsonl")))
    pipe = InversionPipeline(dp, cfg)
    events = [r for r in pipe.metrics.read_all()
              if r.get("event") == "prior_auto_selected"]
    assert len(events) == 1
    assert events[0]["method"] == "evidence"
    assert np.isfinite(events[0]["log_evidence"])
    chosen = events[0]["chosen"]
    assert pipe.cov.kind == chosen["kind"]
    assert pipe.cov.sigma == chosen["sigma"]
    # fit_noise: the run's noise_std is the datapack's scaled by rho*
    rho = chosen["noise_scale"]
    assert rho > 0
    unflagged = pipe.noise_std < 1e5
    np.testing.assert_allclose(
        pipe.noise_std[unflagged],
        np.asarray(dp.noise_std)[unflagged] * rho, rtol=1e-6)
    sol = pipe.run(resume=False)
    assert np.isfinite(sol.m).all()
