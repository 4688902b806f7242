"""Config 3: single-snapshot inversion — ray–voxel Jacobian + LSQR/CG with
smoothness prior, 128³ grid, 5k rays (BASELINE.json configs[2]).

Metric: wall seconds to converge + inversion iterations/sec on the 128³
grid (the BASELINE.json metric definition)."""
import numpy as np
import jax
import jax.numpy as jnp

from bench.common import make_rays, timed, emit
from ionotomo_tpu.models import chapman
from ionotomo_tpu.geometry import rays as rays_mod
from ionotomo_tpu.forward import tec as tec_mod
from ionotomo_tpu.inversion import solvers


def main():
    ants, dirs = make_rays(50, 100)   # 5000 rays
    grid = chapman.grid_enclosing_rays(ants, dirs, shape=(128, 128, 128),
                                       h_min_km=0.0)
    m_prior = chapman.log_parametrize(chapman.chapman_field(grid))
    pts = grid.meshgrid()
    blob = 0.4 * np.exp(-0.5 * np.sum(
        (pts - np.array([50.0, -30.0, 330.0])) ** 2, -1) / 90.0**2)
    m_true = m_prior + jnp.asarray(blob, jnp.float32)
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(origins, dvecs, n_samples=129)
    d_obs = tec_mod.dtec_paired(m_true, grid, rb, 100, 0)
    noise = jnp.float32(1e-3 * float(jnp.abs(d_obs).max()))
    d_obs = d_obs + noise * jax.random.normal(jax.random.key(0),
                                              d_obs.shape)

    iters = 48
    f = jax.jit(lambda d: solvers.lsqr_smoothness(
        grid, rb, d, noise, m_prior, num_directions=100, damp=3e-3,
        smooth=0.2, max_iters=iters))
    res, secs = timed(f, d_obs, reps=1)
    err_pr = float(jnp.sqrt(jnp.mean((m_prior - m_true) ** 2)))
    err_po = float(jnp.sqrt(jnp.mean((res.m - m_true) ** 2)))
    emit("config3", "lsqr_seconds_to_solve", secs, "s",
         iters_per_sec=iters / secs, model_rmse_prior=err_pr,
         model_rmse_post=err_po, under_10s=bool(secs < 10.0))


if __name__ == "__main__":
    main()
