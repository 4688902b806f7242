"""Config 5: time-evolving tomography — Kalman-filtered frozen-flow
ionosphere, 30 timesteps × 10k rays end-to-end (BASELINE.json configs[4]).

Metric: end-to-end wall seconds for the 30-step filter and timesteps/sec."""
import jax
import jax.numpy as jnp

from bench.common import make_rays, timed, emit
from ionotomo_tpu.models import chapman
from ionotomo_tpu.geometry import rays as rays_mod
from ionotomo_tpu.forward import tec as tec_mod
from ionotomo_tpu.inversion.kalman import kalman_filter
from ionotomo_tpu.inversion.priors import GPCovariance
from ionotomo_tpu.models.frozen_flow import advect_periodic


def main():
    nt = 30
    ants, dirs = make_rays(100, 100)  # 10k rays per step
    grid = chapman.grid_enclosing_rays(ants, dirs, shape=(128, 128, 128),
                                       h_min_km=0.0)
    m_bg = chapman.log_parametrize(chapman.chapman_field(grid))
    cov = GPCovariance.create(grid, sigma=0.2, length_scale=80.0,
                              kind="sqexp")
    pert = cov.sample(jax.random.key(2))
    wind = jnp.asarray([0.3, 0.1, 0.0])
    dt_s = 30.0
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(origins, dvecs, n_samples=65)

    # synthesize the 30-step observation sequence on device
    def obs(t):
        m_t = m_bg + advect_periodic(pert, grid, wind * (t * dt_s))
        return tec_mod.dtec_paired(m_t, grid, rb, 100, 0)

    d_seq = jnp.stack([obs(t) for t in range(nt)])
    noise = jnp.float32(1e-2 * float(jnp.abs(d_seq).max()))
    rays_seq = rays_mod.RayBundle(
        points=jnp.broadcast_to(rb.points, (nt,) + rb.points.shape),
        ds=jnp.broadcast_to(rb.ds, (nt,) + rb.ds.shape))

    f = jax.jit(lambda d: kalman_filter(
        grid, rays_seq, d, noise, m_bg, cov, wind, dt_s,
        num_directions=100, cg_iters=10))
    res, secs = timed(f, d_seq, reps=1)
    emit("config5", "kalman_30steps_seconds", secs, "s",
         timesteps_per_sec=nt / secs,
         mean_residual_reduction=float(
             (res.residuals / jnp.maximum(res.post_residuals, 1e-9)).mean()))


if __name__ == "__main__":
    main()
