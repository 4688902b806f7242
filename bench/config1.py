"""Config 1: straight-line TEC forward model — analytic Chapman n_e on a
64³ grid, 50 antennas × 10 sources (BASELINE.json configs[0]).

Metric: TEC integrals/sec (full dTEC forward applications/sec × rays), plus
f64-oracle max TEC error (the correctness gate)."""
import numpy as np
import jax

from bench.common import make_rays, timed, emit
from ionotomo_tpu.models import chapman
from ionotomo_tpu.geometry import rays as rays_mod
from ionotomo_tpu.forward import tec as tec_mod


def main():
    ants, dirs = make_rays(50, 10)
    grid = chapman.grid_enclosing_rays(ants, dirs, shape=(64, 64, 64),
                                       h_min_km=0.0)
    m = chapman.log_parametrize(chapman.chapman_field(grid))
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(origins, dvecs, n_samples=129)

    f = jax.jit(lambda mm: tec_mod.dtec_paired(mm, grid, rb, 10, 0))
    g, secs = timed(f, m, reps=10)

    # correctness gate vs the f64 oracle
    from reference_kernels import tec_ref
    ref = tec_ref.dtec_ref(np.asarray(m, np.float64),
                           np.asarray(grid.origin), np.asarray(grid.spacing),
                           np.asarray(rb.points), np.asarray(rb.ds), 10, 0)
    tec_mag = np.abs(np.asarray(
        tec_ref.tec_ref(np.asarray(m, np.float64), np.asarray(grid.origin),
                        np.asarray(grid.spacing),
                        np.asarray(rb.points[:20]),
                        np.asarray(rb.ds[:20])))).max()
    err = np.abs(np.asarray(g) - ref).max()
    emit("config1", "tec_integrals_per_sec", rb.num_rays / secs, "rays/s",
         oracle_max_abs_err_working_units=float(err),
         oracle_err_rel_to_tec=float(err / tec_mag),
         seconds_per_forward=secs)


if __name__ == "__main__":
    main()
