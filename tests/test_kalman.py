"""Frozen-flow Kalman filter tests (config 5 miniature): tracking a moving
blob beats both the static prior and a no-advection filter."""
import numpy as np
import jax.numpy as jnp

from ionotomo_tpu.forward import tec as tec_mod
from ionotomo_tpu.geometry import rays as rays_mod
from ionotomo_tpu.inversion.kalman import kalman_filter
from ionotomo_tpu.inversion.priors import GPCovariance
from ionotomo_tpu.models import chapman
from ionotomo_tpu.models.frozen_flow import advect_periodic


def moving_world(nx=18, n_ants=10, n_dirs=6, nt=4, seed=0):
    rng = np.random.default_rng(seed)
    ants = np.concatenate([rng.uniform(-80, 80, (n_ants, 2)),
                           np.zeros((n_ants, 1))], -1)
    zen = rng.uniform(0.05, 0.45, n_dirs)
    az = rng.uniform(0, 2 * np.pi, n_dirs)
    dirs = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                     np.cos(zen)], -1)
    grid = chapman.grid_enclosing_rays(ants, dirs, max_length_km=900.0,
                                       shape=(nx, nx, nx), h_min_km=0.0)
    m_bg = chapman.log_parametrize(chapman.chapman_field(grid))
    pts = grid.meshgrid()
    c = np.array([0.0, 0.0, 330.0])
    blob = jnp.asarray(0.5 * np.exp(
        -0.5 * np.sum((pts - c) ** 2, -1) / 70.0**2), jnp.float32)

    wind = np.array([0.4, 0.0, 0.0])   # km/s
    dt_s = 60.0
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    rb1 = rays_mod.sample_straight_rays(origins, dvecs, max_length_km=900.0,
                                        n_samples=49)
    pts_seq = jnp.stack([rb1.points] * nt)
    ds_seq = jnp.stack([rb1.ds] * nt)
    rays_seq = rays_mod.RayBundle(points=pts_seq, ds=ds_seq)

    m_true_seq, d_seq = [], []
    for t in range(nt):
        pert = advect_periodic(blob, grid,
                               jnp.asarray(wind * t * dt_s, jnp.float32))
        m_t = m_bg + pert
        m_true_seq.append(np.asarray(m_t))
        d_seq.append(np.asarray(
            tec_mod.dtec_paired(m_t, grid, rb1, n_dirs, 0)))
    noise = 1e-2 * np.abs(np.asarray(d_seq)).max()
    d_seq = np.asarray(d_seq) + rng.normal(scale=noise, size=np.shape(d_seq))
    return dict(grid=grid, rays_seq=rays_seq, d_seq=jnp.asarray(d_seq,
                jnp.float32), noise=jnp.float32(noise), m_bg=m_bg,
                m_true=np.asarray(m_true_seq), wind=wind, dt_s=dt_s,
                n_dirs=n_dirs)


def test_kalman_tracks_moving_structure():
    w = moving_world()
    cov = GPCovariance.create(w["grid"], sigma=0.3, length_scale=80.0,
                              kind="sqexp")
    res = kalman_filter(w["grid"], w["rays_seq"], w["d_seq"], w["noise"],
                        w["m_bg"], cov, w["wind"], w["dt_s"],
                        num_directions=w["n_dirs"], cg_iters=25,
                        fade=0.95)
    m_seq = np.asarray(res.m_seq)
    assert m_seq.shape == w["m_true"].shape
    # filtered states beat the static background on average (per-step wins
    # can fluctuate in this 60-ray miniature as noise-fit structure advects)
    err_bg = [np.sqrt(np.mean((np.asarray(w["m_bg"]) -
                               w["m_true"][t]) ** 2))
              for t in range(m_seq.shape[0])]
    err_f = [np.sqrt(np.mean((m_seq[t] - w["m_true"][t]) ** 2))
             for t in range(m_seq.shape[0])]
    assert np.mean(err_f) < 0.95 * np.mean(err_bg)
    assert np.sum(np.asarray(err_f) < np.asarray(err_bg)) >= 3
    # update reduces the whitened residual at every step
    assert (np.asarray(res.post_residuals)
            < np.asarray(res.residuals)).all()


def test_frozen_flow_prediction_helps():
    """With correct wind, the pre-update residual at t>0 should be smaller
    than with zero wind (prediction carries information forward)."""
    w = moving_world(seed=1)
    cov = GPCovariance.create(w["grid"], sigma=0.3, length_scale=80.0,
                              kind="sqexp")
    res_wind = kalman_filter(w["grid"], w["rays_seq"], w["d_seq"],
                             w["noise"], w["m_bg"], cov, w["wind"],
                             w["dt_s"], num_directions=w["n_dirs"],
                             cg_iters=25)
    res_still = kalman_filter(w["grid"], w["rays_seq"], w["d_seq"],
                              w["noise"], w["m_bg"], cov, (0.0, 0.0, 0.0),
                              w["dt_s"], num_directions=w["n_dirs"],
                              cg_iters=25)
    pre_wind = np.asarray(res_wind.residuals)[1:].mean()
    pre_still = np.asarray(res_still.residuals)[1:].mean()
    assert pre_wind < pre_still
