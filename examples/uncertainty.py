"""Demo: posterior uncertainty — randomise-then-optimise samples for a
single snapshot, and the ensemble Kalman filter (with covariance
inflation) for a drifting ionosphere.

Run:  python examples/uncertainty.py [--outdir OUT]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="uncertainty_out")
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--members", type=int, default=8)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from ionotomo_tpu.forward import tec as tec_mod
    from ionotomo_tpu.geometry import rays as rays_mod
    from ionotomo_tpu.inversion import solvers
    from ionotomo_tpu.inversion.kalman import ensemble_kalman_filter
    from ionotomo_tpu.inversion.priors import GPCovariance
    from ionotomo_tpu.models import chapman
    from ionotomo_tpu.models.frozen_flow import advect_periodic

    rng = np.random.default_rng(0)
    na, nd, nt = 12, 6, 5
    ants = np.concatenate([rng.uniform(-80, 80, (na, 2)),
                           np.zeros((na, 1))], -1)
    zen = rng.uniform(0.05, 0.45, nd)
    az = rng.uniform(0, 2 * np.pi, nd)
    dirs = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                     np.cos(zen)], -1)
    grid = chapman.grid_enclosing_rays(ants, dirs, max_length_km=900.0,
                                       shape=(20, 20, 20), h_min_km=0.0)
    m_bg = chapman.log_parametrize(chapman.chapman_field(grid))
    pts = grid.meshgrid()
    blob = jnp.asarray(0.5 * np.exp(-0.5 * np.sum(
        (pts - np.array([0.0, 0.0, 330.0])) ** 2, -1) / 70.0**2),
        jnp.float32)
    cov = GPCovariance.create(grid, sigma=0.3, length_scale=90.0,
                              kind="sqexp")
    o, d = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(o, d, max_length_km=900.0,
                                       n_samples=49)

    # --- snapshot: RTO posterior samples --------------------------------
    m_true = m_bg + blob
    d_obs = tec_mod.dtec_paired(m_true, grid, rb, nd, 0)
    noise = jnp.float32(0.01 * float(jnp.abs(d_obs).max()))
    d_obs = d_obs + noise * jax.random.normal(jax.random.key(1),
                                              d_obs.shape)
    samples, mean, std = solvers.posterior_samples(
        grid, rb, d_obs, noise, m_bg, cov, num_directions=nd,
        key=jax.random.key(2), n_samples=args.samples, cg_iters=25)
    err = np.abs(np.asarray(mean) - np.asarray(m_true))
    cover_frac = float((err <= 2.0 * np.asarray(std) + 1e-6).mean())
    print(f"RTO: {args.samples} posterior samples; "
          f"|mean-truth| <= 2 std on {100*cover_frac:.1f}% of voxels")

    # --- sequence: EnKF with inflation ----------------------------------
    wind = np.array([0.4, 0.0, 0.0])
    dt_s = 60.0
    d_seq = []
    for t in range(nt):
        m_t = m_bg + advect_periodic(blob, grid,
                                     jnp.asarray(wind * t * dt_s,
                                                 jnp.float32))
        d_seq.append(np.asarray(tec_mod.dtec_paired(m_t, grid, rb, nd, 0)))
    d_seq = jnp.asarray(np.asarray(d_seq), jnp.float32)
    rays_seq = rays_mod.RayBundle(
        points=jnp.stack([rb.points] * nt), ds=jnp.stack([rb.ds] * nt))
    res = ensemble_kalman_filter(
        grid, rays_seq, d_seq, noise, m_bg, cov, wind, dt_s,
        num_directions=nd, key=jax.random.key(3), n_members=args.members,
        cg_iters=15, inflation=1.1, process_sigma=0.02)
    print(f"EnKF: mean spread per step: "
          f"{[round(float(s), 4) for s in res.std_seq.mean(axis=(1,2,3))]}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    k = grid.shape[2] // 2
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.6))
    for ax, (title, f) in zip(axes, [
            ("posterior mean - prior", np.asarray(mean) - np.asarray(m_bg)),
            ("posterior std", np.asarray(std)),
            ("EnKF final spread", np.asarray(res.std_seq[-1]))]):
        im = ax.imshow(f[:, :, k].T, origin="lower", cmap="viridis")
        ax.set_title(title)
        fig.colorbar(im, ax=ax, shrink=0.8)
    out = os.path.join(args.outdir, "uncertainty.png")
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
