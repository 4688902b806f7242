"""Demo: track a drifting turbulent ionosphere with the frozen-flow Kalman
filter, including automatic wind estimation.

Run:  python examples/kalman_tracking.py [--outdir OUT] [--times 8]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="kalman_out")
    ap.add_argument("--times", type=int, default=6)
    ap.add_argument("--grid", type=int, default=24)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    from ionotomo_tpu.config import (EngineConfig, GridConfig, RayConfig,
                                     RuntimeConfig, SolverConfig,
                                     PriorConfig)
    from ionotomo_tpu.data.synth import generate_example_datapack
    from ionotomo_tpu.inversion.pipeline import InversionPipeline
    from ionotomo_tpu.plotting import plot_tools

    wind_true = (0.25, 0.1, 0.0)
    print(f"simulating {args.times} timesteps, wind {wind_true} km/s ...")
    dp, truth = generate_example_datapack(
        n_antennas=20, n_directions=8, n_times=args.times, mjd0=58000.45,
        dt_s=60.0, grid_shape=(args.grid,) * 3, noise_tecu=2e-3,
        turbulence_amp=0.3, wind_kmps=wind_true, seed=1)

    cfg = EngineConfig(
        grid=GridConfig(shape=(args.grid,) * 3),
        rays=RayConfig(n_samples=49),
        prior=PriorConfig(sigma=0.3, length_scale_km=100.0,
                          kind="von_karman"),
        solver=SolverConfig(solver="kalman", cg_iters=25,
                            kalman_fade=0.98),
        runtime=RuntimeConfig(
            checkpoint_dir=os.path.join(args.outdir, "ckpt"),
            metrics_path=os.path.join(args.outdir, "metrics.jsonl")),
    )
    print("filtering (wind estimated from the first two snapshots) ...")
    pipe = InversionPipeline(dp, cfg)
    sol = pipe.run(resume=False)

    for rec in pipe.metrics.read_all():
        rec.pop("t_wall", None)
        print("  ", rec)
    pre = sol.diagnostics["pre_residuals"]
    post = sol.diagnostics["post_residuals"]
    print("whitened residuals per step:")
    for t in range(args.times):
        print(f"  t={t}: pre {pre[t]:9.1f} -> post {post[t]:9.1f}")

    err = [np.sqrt(np.mean((sol.m[t] - truth["m"][t]) ** 2))
           for t in range(args.times)]
    err_bg = [np.sqrt(np.mean((truth["m_background"] - truth["m"][t]) ** 2))
              for t in range(args.times)]
    print("model rmse filtered vs static background:")
    for t in range(args.times):
        print(f"  t={t}: {err[t]:.4f} vs {err_bg[t]:.4f}")

    plot_tools.animate_model(sol, filename=os.path.join(args.outdir,
                                                        "evolution.gif"))
    print(f"outputs in {args.outdir}/")


if __name__ == "__main__":
    main()
