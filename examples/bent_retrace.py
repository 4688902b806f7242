"""Demo: nonlinear bent-ray tomography — re-trace rays through the
updated model each iteration (the reference's calc_rays-inside-the-loop,
SURVEY.md §3.1) and compare against the frozen-at-prior linearisation.

Strong-bending regime: 30 MHz through a dense plasma blob bends paths by
~100 km, so the linearisation's frozen paths carry real model error.

Run:  python examples/bent_retrace.py [--outdir OUT]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="retrace_out")
    ap.add_argument("--frequency-mhz", type=float, default=30.0)
    ap.add_argument("--outer", type=int, default=4)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    import jax.numpy as jnp
    from ionotomo_tpu.core.grids import Grid3D
    from ionotomo_tpu.forward import tec as tec_mod
    from ionotomo_tpu.geometry import fermat, rays as rays_mod
    from ionotomo_tpu.inversion import solvers
    from ionotomo_tpu.inversion.priors import GPCovariance
    from ionotomo_tpu.models import chapman

    grid = Grid3D.from_bounds((-400, -400, 0.0), (400, 400, 1100.0),
                              (24, 24, 24))
    m_prior = chapman.log_parametrize(
        chapman.chapman_field(grid, n_peak=2e12))
    pts = grid.meshgrid()
    blob = 0.7 * np.exp(-np.sum(
        (pts - np.array([60.0, -40.0, 320.0])) ** 2
        / np.array([2 * 80.0**2, 2 * 80.0**2, 2 * 120.0**2]), -1))
    m_true = m_prior + jnp.asarray(blob, jnp.float32)

    rng = np.random.default_rng(2)
    na, nd = 12, 6
    ants = np.concatenate([rng.uniform(-60, 60, (na, 2)),
                           np.zeros((na, 1))], -1).astype(np.float32)
    zen = rng.uniform(0.1, 0.5, nd)
    az = rng.uniform(0, 2 * np.pi, nd)
    dirs = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                     np.cos(zen)], -1).astype(np.float32)
    o, d = rays_mod.make_ray_batch(jnp.asarray(ants), jnp.asarray(dirs))
    freq = args.frequency_mhz * 1e6

    # observations: bent TEC through the TRUE field + noise
    _, tau = fermat.trace_rays(m_true, grid, o, d, freq, 1000.0,
                               n_steps=48, keep_path=False)
    tau = np.asarray(tau).reshape(na, nd)
    d_obs = jnp.asarray(tau - tau[0:1]
                        + rng.normal(0, 50.0, (na, nd)).astype(np.float32))
    noise = jnp.float32(50.0)
    cov = GPCovariance.create(grid, sigma=0.5, length_scale=120.0,
                              kind="sqexp")

    def trace(mf):
        return fermat.trace_rays(mf, grid, o, d, freq, 1000.0, n_steps=48,
                                 keep_path=True)[0]

    rb0 = trace(m_prior)
    cover = np.asarray(tec_mod.ray_coverage(grid, rb0))
    mask = cover > 0.05 * cover.max()

    def rms(m):
        e = (np.asarray(m) - np.asarray(m_true))[mask]
        return float(np.sqrt((e ** 2).mean()))

    res_frozen = solvers.map_gauss_newton(
        grid, rb0, d_obs, noise, m_prior, cov, num_directions=nd, i0=0,
        gn_iters=args.outer, cg_iters=30)
    print(f"frozen linearisation : rmse {rms(res_frozen.m):.4f} "
          f"(prior {rms(m_prior):.4f})")

    m_k, history = m_prior, []
    for it in range(args.outer):
        rb = trace(m_k)
        res = solvers.map_gauss_newton(
            grid, rb, d_obs, noise, m_prior, cov, num_directions=nd, i0=0,
            gn_iters=1, cg_iters=30, m0=m_k)
        m_k = res.m
        history.append(rms(m_k))
        print(f"re-trace iteration {it}: rmse {history[-1]:.4f} "
              f"(residual {float(res.residual_norm):.1f})")

    # plot: slice through the blob, truth vs frozen vs re-traced
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    k = int(np.argmin(np.abs(np.asarray(grid.axes()[2]) - 320.0)))
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.6))
    for ax, (title, m) in zip(axes, [("truth", m_true),
                                     ("frozen", res_frozen.m),
                                     ("re-traced", m_k)]):
        im = ax.imshow(np.asarray(m)[:, :, k].T - np.asarray(m_prior)[:, :, k].T,
                       origin="lower", cmap="magma")
        ax.set_title(title)
        fig.colorbar(im, ax=ax, shrink=0.8)
    out = os.path.join(args.outdir, "retrace_vs_frozen.png")
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
