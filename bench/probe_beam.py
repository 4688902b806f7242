"""Measured study: does the stochastic-beam observation-noise inflation
(`fermat.beam_noise_for_epoch`, pipeline/serving `rays.beam_noise`) beat
both uninflated and globally-inflated C_d in the strong-turbulence
regime? (VERDICT r3 #5 acceptance measurement.)

World: analytic honest world (closed-form Chapman x Fourier-mode von
Karman, DESIGN.md section 15) at strong amplitude (default sigma_log
0.3) and low frequency (default 100 MHz) — the chaotic-bending regime
where a deterministic trace stops being meaningful (DESIGN.md section 9)
— observed over a MIXED-elevation ray set (zen_max 1.0 rad, so path
lengths through the turbulence vary ~2x across rays and the chaotic
spread is strongly per-ray heterogeneous; that heterogeneity is what
per-ray inflation can exploit and global inflation cannot).

Data: bent Fermat tracer through the closed-form truth at 2x quadrature
+ small instrument noise (0.5%) so FORWARD-MODEL error dominates the
noise budget. Inversion: the production straight-ray MAP solver; the
experiment varies only C_d:

  A  uninflated      — instrument noise only
  B1 beam@prior      — per-ray inflation, beam traced through the smooth
                       prior (what the batch pipeline does at epoch
                       start: no estimate exists yet)
  B2 beam@estimate   — per-ray inflation, beam traced through solve A's
                       posterior (what a filter/serving deployment sees:
                       the beam runs through the current state estimate,
                       which contains reconstructed turbulence)
  C  global          — uniform inflation matched to B2's mean power
                       (sqrt(noise^2 + mean(beam^2))): the null
                       hypothesis that only the *level*, not the per-ray
                       structure, matters

Metric: held-out dTEC rms on rays never used in the solve (new antennas
and directions), the same generalisation metric as the judged configs.

Run:  python -m bench.probe_beam            (one JSON line per variant)
Env:  BEAM_FREQ_HZ (default 1e8), BEAM_AMP (0.3), BEAM_GRID (48),
      BEAM_PATHS (8), BEAM_SEED (7).
"""
import json
import os

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench.common import (make_rays, analytic_world,
                              bent_dtec_data_callable, heldout_dtec_rms)
    from ionotomo_tpu.models import chapman
    from ionotomo_tpu.geometry import fermat, rays as rays_mod
    from ionotomo_tpu.inversion.solvers import map_gauss_newton
    from ionotomo_tpu.inversion.priors import GPCovariance

    freq = float(os.environ.get("BEAM_FREQ_HZ", "1e8"))
    amp = float(os.environ.get("BEAM_AMP", "0.3"))
    n = int(os.environ.get("BEAM_GRID", "48"))
    n_paths = int(os.environ.get("BEAM_PATHS", "8"))
    seed = int(os.environ.get("BEAM_SEED", "7"))

    ants, dirs = make_rays(20, 24, seed=seed, zen_max=1.0)
    ants_h, dirs_h = make_rays(10, 16, seed=seed + 90, zen_max=1.0)
    grid = chapman.grid_enclosing_rays(
        np.concatenate([ants, ants_h]), np.concatenate([dirs, dirs_h]),
        shape=(n, n, n), h_min_km=0.0)
    m_true, ne_fn = analytic_world(grid, amplitude=amp, n_modes=384,
                                   seed=seed + 1)
    m_bg = chapman.log_parametrize(chapman.chapman_field(grid))
    cov = GPCovariance.create(grid, sigma=0.3, length_scale=80.0,
                              kind="von_karman")

    d, noise = bent_dtec_data_callable(ne_fn, ants, dirs,
                                       frequency_hz=freq, n_steps=256,
                                       noise_frac=0.005, seed=seed + 2)
    d_h, _ = bent_dtec_data_callable(ne_fn, ants_h, dirs_h,
                                     frequency_hz=freq, n_steps=256,
                                     noise_frac=0.0, seed=0)

    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(origins, dvecs, n_samples=65)
    nd = dirs.shape[0]

    def solve(noise_arr):
        return map_gauss_newton(grid, rb, d, noise_arr, m_bg, cov, nd,
                                gn_iters=2, cg_iters=20)

    def beam(field):
        key = jax.random.key(seed + 3)
        return fermat.beam_noise_for_epoch(
            field, grid, ants, dirs, freq, key, n_paths=n_paths,
            n_steps=64)

    def emit(name, noise_arr, infl=None):
        m = solve(noise_arr).m
        ho = heldout_dtec_rms(m, grid, ants_h, dirs_h, d_h, n_samples=65)
        rec = dict(probe="beam_inflation", variant=name,
                   heldout_dtec_rms=round(ho, 2),
                   freq_mhz=freq / 1e6, amp=amp, grid=n,
                   instrument_noise=round(float(noise), 3))
        if infl is not None:
            rec.update(beam_mean=round(float(jnp.mean(infl)), 3),
                       beam_max=round(float(jnp.max(infl)), 3),
                       beam_p90=round(float(jnp.percentile(infl, 90)), 3))
        print(json.dumps(rec), flush=True)
        return m, ho

    ho_pr = heldout_dtec_rms(m_bg, grid, ants_h, dirs_h, d_h, n_samples=65)
    print(json.dumps(dict(probe="beam_inflation", variant="prior",
                          heldout_dtec_rms=round(ho_pr, 2))), flush=True)

    m_a, _ = emit("A_uninflated", noise)

    infl_prior = beam(m_bg)
    emit("B1_beam_at_prior", jnp.sqrt(noise ** 2 + infl_prior ** 2),
         infl_prior)

    infl_est = beam(m_a)
    emit("B2_beam_at_estimate", jnp.sqrt(noise ** 2 + infl_est ** 2),
         infl_est)

    g = float(jnp.sqrt(noise ** 2 + jnp.mean(infl_est ** 2)))
    emit("C_global_matched", jnp.full_like(infl_est, g), infl_est)

    infl_true = beam(m_true)
    print(json.dumps(dict(probe="beam_inflation", variant="spread_oracle",
                          note="beam spread traced through the truth "
                               "(diagnostic only)",
                          beam_mean=round(float(jnp.mean(infl_true)), 3),
                          beam_max=round(float(jnp.max(infl_true)), 3))),
          flush=True)


if __name__ == "__main__":
    main()
