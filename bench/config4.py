"""Config 4: Bayesian MAP inversion with GP covariance prior on a 256³
grid, 10k rays, batched Krylov solves (BASELINE.json configs[3]).

Metric: wall seconds per Gauss-Newton solve and data-space CG
iterations/sec with the 256³ covariance operator in the loop."""
import jax
import jax.numpy as jnp

from bench.common import make_rays, timed, emit
from ionotomo_tpu.models import chapman
from ionotomo_tpu.geometry import rays as rays_mod
from ionotomo_tpu.forward import tec as tec_mod
from ionotomo_tpu.inversion import solvers
from ionotomo_tpu.inversion.priors import GPCovariance


def main():
    ants, dirs = make_rays(100, 100)  # 10k rays
    grid = chapman.grid_enclosing_rays(ants, dirs, shape=(256, 256, 256),
                                       h_min_km=0.0)
    m_prior = chapman.log_parametrize(chapman.chapman_field(grid))
    # truth: prior + GP sample (the prior is correctly specified)
    cov = GPCovariance.create(grid, sigma=0.2, length_scale=80.0,
                              kind="sqexp")
    m_true = m_prior + cov.sample(jax.random.key(1))
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(origins, dvecs, n_samples=129)
    d_obs = tec_mod.dtec_paired(m_true, grid, rb, 100, 0)
    noise = jnp.float32(1e-3 * float(jnp.abs(d_obs).max()))
    d_obs = d_obs + noise * jax.random.normal(jax.random.key(0),
                                              d_obs.shape)

    gn_iters, cg_iters = 2, 20
    f = jax.jit(lambda d: solvers.map_gauss_newton(
        grid, rb, d, noise, m_prior, cov, num_directions=100,
        gn_iters=gn_iters, cg_iters=cg_iters))
    res, secs = timed(f, d_obs, reps=1)
    err_pr = float(jnp.sqrt(jnp.mean((m_prior - m_true) ** 2)))
    err_po = float(jnp.sqrt(jnp.mean((res.m - m_true) ** 2)))
    emit("config4", "map_gn_seconds_to_solve", secs, "s",
         cg_iters_per_sec=gn_iters * cg_iters / secs,
         model_rmse_prior=err_pr, model_rmse_post=err_po)


if __name__ == "__main__":
    main()
