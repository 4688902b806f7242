"""Demo: tomography on a spatially-sharded grid (the >HBM growth path).

The field is sharded along x over a device mesh (2-plane halo exchange
over ICI); bent rays trace through it and a damped least-squares TEC
inversion runs end-to-end on the sharded field — jax transposes the
shard_map exactly, so the stock Krylov solvers need no changes.

Run on any machine (virtual mesh):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python examples/sharded_grid.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ionotomo_tpu.core import linalg
    from ionotomo_tpu.core.grids import Grid3D
    from ionotomo_tpu.geometry import rays as rays_mod
    from ionotomo_tpu.models import chapman
    from ionotomo_tpu.parallel import grid_sharding as gs

    n_dev = len(jax.devices())
    print(f"{n_dev} device(s); field sharded over all of them")
    grid = Grid3D.from_bounds((-300, -300, 0.0), (300, 300, 1000.0),
                              (8 * max(2, n_dev // 2), 24, 24))
    m_prior = chapman.log_parametrize(chapman.chapman_field(grid))

    rng = np.random.default_rng(0)
    n = 48
    o = np.concatenate([rng.uniform(-40, 40, (n, 2)), np.zeros((n, 1))],
                       -1).astype(np.float32)
    zen = rng.uniform(0.1, 0.5, n)
    az = rng.uniform(0, 2 * np.pi, n)
    d = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                  np.cos(zen)], -1).astype(np.float32)

    mesh = gs.grid_mesh()
    f_sh = gs.shard_field(mesh, m_prior)

    # 1) bent-ray trace through the sharded field
    bundle, tec = gs.trace_rays_sharded(mesh, f_sh, grid, jnp.asarray(o),
                                        jnp.asarray(d), 60e6, 900.0,
                                        n_steps=32)
    print(f"bent trace through sharded field: TEC mean "
          f"{float(tec.mean()):.1f} working units")

    # 2) TEC inversion on the sharded field (2% excess to recover)
    rb = rays_mod.sample_straight_rays(jnp.asarray(o), jnp.asarray(d),
                                       max_length_km=900.0, n_samples=33)
    d_obs = gs.tec_sharded(mesh, f_sh, grid, rb) * 1.02
    with jax.set_mesh(mesh):
        g0, jvp = jax.linearize(
            lambda f: gs.tec_sharded(mesh, f, grid, rb), f_sh)
        vjp = jax.linear_transpose(jvp, f_sh)
        dm, info = linalg.lsqr(jvp, lambda y: vjp(y)[0], d_obs - g0,
                               jnp.zeros_like(f_sh), damp=1e-3,
                               max_iters=25)
        fit = gs.tec_sharded(mesh, f_sh + dm, grid, rb)
    res0 = float(jnp.linalg.norm(d_obs - g0))
    res1 = float(jnp.linalg.norm(d_obs - fit))
    print(f"sharded LSQR: residual {res0:.2f} -> {res1:.2f} "
          f"({info.iterations} masked-convergence iters)")
    print("update field stays sharded:", dm.sharding)


if __name__ == "__main__":
    main()
