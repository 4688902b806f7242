"""Re-probe: zp-operator determinism at 256³ on the live backend.

Round-4 finding (DESIGN.md §17): inside large CG-scan programs at 256³,
the zp box-spline operator path returns DIFFERENT results on repeated
invocations of the same jitted solve on the same inputs (cold residual
4459 vs 2621; warm-started variants diverge to ~200 log units and NaN),
while the identically-shaped cubic program is bit-deterministic and the
isolated zp operator in a small program is bit-deterministic too. The
defect therefore sits in the experimental backend's execution of the
large fused program. Until this probe passes, zp-family operators are
gated off >128³-class grids (config 4 stays cubic; its speed path is
warm-start + progressive fidelity).

Run after every jax / Mosaic / axon toolchain bump:

    python -m bench.probe_zp256          # needs the TPU (axon) backend

ZP256_INTERP selects the inner field model under test (default "zp";
"zpc" probes the round-5 ZP-xy × cubic-z hybrid — VERDICT r4 #6 gates
any 256³ use of it behind this same determinism check).

Prints PASS/FAIL per case; exits nonzero on FAIL. ~10 min including
remote compiles.
"""
import os
import sys

import jax
import jax.numpy as jnp


def main():
    from bench.common import (make_rays, analytic_world,
                              bent_dtec_data_callable)
    from ionotomo_tpu.models import chapman
    from ionotomo_tpu.geometry import rays as rays_mod
    from ionotomo_tpu.inversion import solvers
    from ionotomo_tpu.inversion.priors import GPCovariance

    ants, dirs = make_rays(100, 100)
    grid = chapman.grid_enclosing_rays(ants, dirs,
                                       shape=(256, 256, 256),
                                       h_min_km=0.0)
    m_prior = chapman.log_parametrize(chapman.chapman_field(grid))
    _, ne_fn = analytic_world(grid, amplitude=0.25, outer_scale_km=120.0,
                              seed=11)
    cov = GPCovariance.create(grid, sigma=0.3, length_scale=80.0,
                              kind="von_karman")
    d_obs, noise = bent_dtec_data_callable(ne_fn, ants, dirs,
                                           frequency_hz=150e6,
                                           n_steps=256, noise_frac=0.01)
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    rb_inner = rays_mod.sample_straight_rays(origins, dvecs, n_samples=33)
    d = jnp.asarray(d_obs)

    inner = os.environ.get("ZP256_INTERP", "zp")
    ok = True
    for warm in (False, True):
        outs = []
        for _ in range(2):
            r = solvers.map_gauss_newton(
                grid, rb_inner, d, noise, m_prior, cov,
                num_directions=100, gn_iters=1, cg_iters=20,
                quadrature="hermite", interp="cubic",
                warm_start=warm, interp_inner=inner)
            outs.append((float(r.residual_norm),
                         float(jnp.abs(r.m - m_prior).max())))
        (res0, dm0), (res1, dm1) = outs
        deterministic = res0 == res1
        sane = max(dm0, dm1) < 5.0 and max(res0, res1) < 1e5
        status = "PASS" if (deterministic and sane) else "FAIL"
        ok &= deterministic and sane
        print(f"[{status}] {inner}-inner 256^3 warm={warm}: "
              f"res {res0:.6g} / {res1:.6g} "
              f"|m-prior|max {dm0:.3g} / {dm1:.3g} "
              f"(deterministic={deterministic}, sane={sane})",
              flush=True)

    if ok:
        print(f"PASS: {inner} at 256^3 is deterministic and sane on this "
              "toolchain — the DESIGN.md §17 gate can be lifted "
              "(re-measure the §17 config-4 zp-inner frontier first).")
    else:
        print(f"FAIL: {inner} at 256^3 remains untrustworthy on this backend "
              "— keep config 4 on interp=cubic (DESIGN.md §17).")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
