"""End-to-end demo: simulate a LOFAR-like observation, invert it, plot.

Run:  python examples/invert_synthetic.py [--bent] [--outdir OUT]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="demo_out")
    ap.add_argument("--bent", action="store_true",
                    help="trace bent rays through the prior model")
    ap.add_argument("--antennas", type=int, default=30)
    ap.add_argument("--directions", type=int, default=10)
    ap.add_argument("--grid", type=int, default=32)
    ap.add_argument("--turbulence", type=float, default=0.3)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    from ionotomo_tpu.config import (EngineConfig, GridConfig, RayConfig,
                                     SolverConfig, RuntimeConfig,
                                     PriorConfig)
    from ionotomo_tpu.data.synth import generate_example_datapack
    from ionotomo_tpu.inversion.pipeline import InversionPipeline
    from ionotomo_tpu.plotting import plot_tools

    print("generating synthetic observation ...")
    dp, truth = generate_example_datapack(
        n_antennas=args.antennas, n_directions=args.directions, n_times=1,
        mjd0=58000.45, grid_shape=(args.grid,) * 3, noise_tecu=1e-3,
        turbulence_amp=args.turbulence, n_samples=65)
    dp.save(os.path.join(args.outdir, "observation.h5"))

    cfg = EngineConfig(
        grid=GridConfig(shape=(args.grid,) * 3),
        rays=RayConfig(n_samples=65, bent=args.bent),
        # matched prior: the synthetic world's turbulence IS a von Kármán
        # field with outer scale 100 km and this amplitude
        prior=PriorConfig(sigma=args.turbulence, length_scale_km=100.0,
                          kind="von_karman"),
        solver=SolverConfig(gn_iters=1, cg_iters=100),
        runtime=RuntimeConfig(
            checkpoint_dir=os.path.join(args.outdir, "ckpt"),
            metrics_path=os.path.join(args.outdir, "metrics.jsonl")),
    )
    print("inverting ...")
    pipe = InversionPipeline(dp, cfg)
    sol = pipe.run(resume=False)
    sol.save(os.path.join(args.outdir, "solution.h5"))

    for rec in pipe.metrics.read_all():
        print("  ", {k: v for k, v in rec.items() if k != "t_wall"})

    print("plotting ...")
    plot_tools.plot_datapack(dp, filename=os.path.join(args.outdir,
                                                       "datapack.png"))
    # compare against the known truth on the same grid
    from ionotomo_tpu import constants
    truth_ne = constants.K_NE * np.exp(truth["m"][0])
    plot_tools.plot_model_slices(
        sol, truth=truth_ne,
        filename=os.path.join(args.outdir, "slices.png"))
    # evaluate where the data actually constrain the model: use the
    # Jacobian sensitivity |∂Σg/∂m| (ne-weighted), not raw path length —
    # path-length maxima sit at near-antenna ray convergence points and
    # low-altitude voxels carry rays but ~zero sensitivity (n_e ≈ 0)
    import jax
    import jax.numpy as jnp
    from ionotomo_tpu.forward import tec as tec_mod
    rb = pipe.rays_for_time(0)
    sens = np.abs(np.asarray(jax.grad(
        lambda mm: jnp.sum(tec_mod.tec(mm, pipe.grid, rb)))(pipe.m_prior)))
    mask = sens > np.quantile(sens[sens > 1e-12 * sens.max()], 0.75)

    def rmse(m):
        d = (np.asarray(m) - truth["m"][0])
        return (np.sqrt(np.mean(d**2)),
                np.sqrt(np.mean(d[mask] ** 2)))

    ep, epc = rmse(pipe.m_prior)
    es, esc = rmse(sol.m[0])
    print(f"model rmse        : prior {ep:.4f} -> posterior {es:.4f}")
    print(f"rmse (ray-covered): prior {epc:.4f} -> posterior {esc:.4f} "
          f"({mask.mean()*100:.0f}% of voxels)")
    print(f"outputs in {args.outdir}/")


if __name__ == "__main__":
    main()
