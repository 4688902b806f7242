"""Spatially-sharded tricubic (halo exchange) vs the replicated path
(SURVEY.md §5.7b prototype; VERDICT r1 #6)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ionotomo_tpu.core.grids import Grid3D
from ionotomo_tpu.core import tricubic
from ionotomo_tpu.parallel import grid_sharding as gs

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multi-device mesh")


def world(nx=16, seed=0):
    rng = np.random.default_rng(seed)
    grid = Grid3D.from_bounds((-200, -200, 0.0), (200, 200, 800.0),
                              (nx, nx, nx))
    # smooth random field (band-limited so tricubic is exercised, values O(1))
    f = rng.normal(size=(nx, nx, nx))
    from scipy.ndimage import gaussian_filter
    f = gaussian_filter(f, 1.5).astype(np.float32)
    return grid, jnp.asarray(f)


def test_sharded_interp_matches_replicated():
    grid, f = world()
    rng = np.random.default_rng(1)
    pts = rng.uniform((-200, -200, 0), (200, 200, 800),
                      (500, 3)).astype(np.float32)
    want = np.asarray(tricubic.interp(f, grid, jnp.asarray(pts)))
    mesh = gs.grid_mesh()
    f_sh = gs.shard_field(mesh, f)
    got = np.asarray(gs.interp_sharded(mesh, f_sh, grid, jnp.asarray(pts)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_sharded_interp_handles_edges_and_outside_points():
    """Points on shard boundaries, grid edges, and outside the grid
    (clamped constant extrapolation) — exactly one shard must own each."""
    grid, f = world()
    xs = np.asarray(grid.axes()[0])
    # points exactly on every x-plane (shard boundaries included), plus
    # beyond both edges
    pts = np.stack([
        np.concatenate([xs, [-500.0, 500.0]]),
        np.full(len(xs) + 2, 13.0),
        np.full(len(xs) + 2, 390.0),
    ], axis=-1).astype(np.float32)
    want = np.asarray(tricubic.interp(f, grid, jnp.asarray(pts)))
    mesh = gs.grid_mesh()
    f_sh = gs.shard_field(mesh, f)
    got = np.asarray(gs.interp_sharded(mesh, f_sh, grid, jnp.asarray(pts)))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_shard_field_rejects_indivisible_axis():
    grid, f = world(nx=16)
    mesh = gs.grid_mesh()
    if mesh.shape[gs.GRID_AXIS] > 1:
        with pytest.raises(AssertionError):
            gs.shard_field(mesh, jnp.zeros((17, 8, 8)))


def test_sharded_interp_with_grad_matches_replicated():
    grid, f = world()
    rng = np.random.default_rng(3)
    pts = rng.uniform((-200, -200, 0), (200, 200, 800),
                      (300, 3)).astype(np.float32)
    want_v, want_g = tricubic.interp_with_grad(f, grid, jnp.asarray(pts))
    mesh = gs.grid_mesh()
    f_sh = gs.shard_field(mesh, f)
    got_v, got_g = gs.interp_sharded_with_grad(mesh, f_sh, grid,
                                               jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=2e-4, atol=2e-5)


def test_sharded_grid_bent_trace_matches_replicated():
    """End-to-end: Fermat trace through an x-sharded field (halo-exchange
    interp per integrator step) equals the replicated-grid trace."""
    from ionotomo_tpu.geometry import fermat
    from ionotomo_tpu.models import chapman

    grid = Grid3D.from_bounds((-300, -300, 0.0), (300, 300, 1000.0),
                              (16, 16, 16))
    m = chapman.log_parametrize(chapman.chapman_field(grid))
    rng = np.random.default_rng(5)
    n = 24
    o = np.concatenate([rng.uniform(-30, 30, (n, 2)), np.zeros((n, 1))],
                       -1).astype(np.float32)
    zen = rng.uniform(0.1, 0.5, n)
    az = rng.uniform(0, 2 * np.pi, n)
    d = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                  np.cos(zen)], -1).astype(np.float32)
    b_rep, t_rep = fermat.trace_rays(m, grid, jnp.asarray(o),
                                     jnp.asarray(d), 60e6, 900.0,
                                     n_steps=24, method="leapfrog")
    mesh = gs.grid_mesh()
    f_sh = gs.shard_field(mesh, m)
    b_sh, t_sh = gs.trace_rays_sharded(mesh, f_sh, grid, jnp.asarray(o),
                                       jnp.asarray(d), 60e6, 900.0,
                                       n_steps=24, method="leapfrog")
    np.testing.assert_allclose(np.asarray(b_sh.points),
                               np.asarray(b_rep.points), atol=2e-3)
    np.testing.assert_allclose(np.asarray(t_sh), np.asarray(t_rep),
                               rtol=3e-5)


def test_2d_grid_ray_mesh_trace_matches_replicated():
    """Production layout: 2 grid shards × 4 ray shards. Field ops psum
    over the grid axis, rays stay embarrassingly parallel."""
    from ionotomo_tpu.geometry import fermat
    from ionotomo_tpu.models import chapman
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ionotomo_tpu.parallel.sharding import RAY_AXIS

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    grid = Grid3D.from_bounds((-300, -300, 0.0), (300, 300, 1000.0),
                              (16, 16, 16))
    m = chapman.log_parametrize(chapman.chapman_field(grid))
    rng = np.random.default_rng(9)
    n = 32                                    # divisible by 4 ray shards
    o = np.concatenate([rng.uniform(-30, 30, (n, 2)), np.zeros((n, 1))],
                       -1).astype(np.float32)
    zen = rng.uniform(0.1, 0.5, n)
    az = rng.uniform(0, 2 * np.pi, n)
    d = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                  np.cos(zen)], -1).astype(np.float32)
    b_rep, t_rep = fermat.trace_rays(m, grid, jnp.asarray(o),
                                     jnp.asarray(d), 60e6, 900.0,
                                     n_steps=16, method="leapfrog")
    mesh = gs.grid_ray_mesh(2, 4)
    f_sh = jax.device_put(m, NamedSharding(mesh, P(gs.GRID_AXIS)))
    o_sh = jax.device_put(jnp.asarray(o), NamedSharding(mesh, P(RAY_AXIS)))
    d_sh = jax.device_put(jnp.asarray(d), NamedSharding(mesh, P(RAY_AXIS)))
    b_sh, t_sh = gs.trace_rays_sharded(mesh, f_sh, grid, o_sh, d_sh,
                                       60e6, 900.0, n_steps=16,
                                       method="leapfrog",
                                       rays_sharded=True)
    np.testing.assert_allclose(np.asarray(b_sh.points),
                               np.asarray(b_rep.points), atol=2e-3)
    np.testing.assert_allclose(np.asarray(t_sh), np.asarray(t_rep),
                               rtol=3e-5)


def test_sharded_tec_forward_and_adjoint_match_replicated():
    """TEC over an x-sharded field: forward matches forward/tec.tec and
    jax's transpose through the shard_map (scatter + reverse halo
    ppermute) matches the replicated gradient — inversion works on
    sharded grids."""
    from ionotomo_tpu.forward import tec as tec_mod
    from ionotomo_tpu.geometry import rays as rays_mod
    from ionotomo_tpu.models import chapman

    grid = Grid3D.from_bounds((-300, -300, 0.0), (300, 300, 1000.0),
                              (16, 16, 16))
    m = chapman.log_parametrize(chapman.chapman_field(grid))
    rng = np.random.default_rng(4)
    n = 24
    o = np.concatenate([rng.uniform(-30, 30, (n, 2)), np.zeros((n, 1))],
                       -1).astype(np.float32)
    zen = rng.uniform(0.1, 0.5, n)
    az = rng.uniform(0, 2 * np.pi, n)
    d = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                  np.cos(zen)], -1).astype(np.float32)
    rb = rays_mod.sample_straight_rays(jnp.asarray(o), jnp.asarray(d),
                                       n_samples=17)
    want = np.asarray(tec_mod.tec(m, grid, rb))
    mesh = gs.grid_mesh()
    f_sh = gs.shard_field(mesh, m)
    got = np.asarray(gs.tec_sharded(mesh, f_sh, grid, rb))
    np.testing.assert_allclose(got, want, rtol=3e-6)

    y = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    g_rep = np.asarray(jax.grad(
        lambda f: jnp.vdot(tec_mod.tec(f, grid, rb), y))(m))
    with jax.set_mesh(mesh):
        g_sh = np.asarray(jax.grad(
            lambda f: jnp.vdot(gs.tec_sharded(mesh, f, grid, rb), y))(f_sh))
    np.testing.assert_allclose(g_sh, g_rep,
                               atol=2e-5 * np.abs(g_rep).max())


def test_lsqr_inversion_on_sharded_grid_matches_replicated():
    """A damped least-squares solve where the forward operator runs on the
    x-sharded field end-to-end (linearize/transpose through shard_map +
    the stock masked-convergence LSQR)."""
    from ionotomo_tpu.core import linalg
    from ionotomo_tpu.forward import tec as tec_mod
    from ionotomo_tpu.geometry import rays as rays_mod
    from ionotomo_tpu.models import chapman

    grid = Grid3D.from_bounds((-300, -300, 0.0), (300, 300, 1000.0),
                              (16, 16, 16))
    m0 = chapman.log_parametrize(chapman.chapman_field(grid))
    rng = np.random.default_rng(6)
    n = 32
    o = np.concatenate([rng.uniform(-40, 40, (n, 2)), np.zeros((n, 1))],
                       -1).astype(np.float32)
    zen = rng.uniform(0.1, 0.5, n)
    az = rng.uniform(0, 2 * np.pi, n)
    d = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                  np.cos(zen)], -1).astype(np.float32)
    rb = rays_mod.sample_straight_rays(jnp.asarray(o), jnp.asarray(d),
                                       n_samples=17)
    d_obs = tec_mod.tec(m0, grid, rb) * 1.02     # 2% TEC excess to fit

    def solve(fwd, field0):
        g0, jvp = jax.linearize(fwd, field0)
        vjp = jax.linear_transpose(jvp, field0)
        r = d_obs - g0
        # model-space operands stay field-shaped so they inherit the
        # field's sharding (replicated or x-sharded alike)
        dm, _ = linalg.lsqr(jvp, lambda y: vjp(y)[0], r,
                            jnp.zeros_like(field0), damp=1e-3,
                            max_iters=20)
        return dm

    dm_rep = np.asarray(solve(lambda f: tec_mod.tec(f, grid, rb), m0))
    mesh = gs.grid_mesh()
    f_sh = gs.shard_field(mesh, m0)
    with jax.set_mesh(mesh):
        dm_sh = np.asarray(solve(
            lambda f: gs.tec_sharded(mesh, f, grid, rb), f_sh))
    scale = np.abs(dm_rep).max()
    assert np.abs(dm_sh - dm_rep).max() < 2e-3 * scale


def test_sharded_hermite_tec_matches_replicated():
    """The production (Hermite) quadrature on an x-sharded grid equals
    the replicated-path result — values + the endpoint-gradient
    correction both served by the halo-exchange interpolator, and the
    AD transpose matches too (solvers run hermite on sharded grids)."""
    from ionotomo_tpu.forward import tec as tec_mod
    from ionotomo_tpu.geometry import rays as rays_mod
    from ionotomo_tpu.models import chapman

    grid = Grid3D.from_bounds((-300, -300, 0.0), (300, 300, 1000.0),
                              (16, 16, 16))
    m = chapman.log_parametrize(chapman.chapman_field(grid))
    rng = np.random.default_rng(9)
    n = 24
    o = np.concatenate([rng.uniform(-30, 30, (n, 2)), np.zeros((n, 1))],
                       -1).astype(np.float32)
    zen = rng.uniform(0.1, 0.5, n)
    az = rng.uniform(0, 2 * np.pi, n)
    d = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                  np.cos(zen)], -1).astype(np.float32)
    rb = rays_mod.sample_straight_rays(jnp.asarray(o), jnp.asarray(d),
                                       n_samples=17)
    mesh = gs.grid_mesh()
    f_sh = gs.shard_field(mesh, m)
    got_t = np.asarray(gs.tec_hermite_sharded(mesh, f_sh, grid, rb))
    want_t = np.asarray(tec_mod.tec_hermite(m, grid, rb))
    np.testing.assert_allclose(got_t, want_t, rtol=3e-6)
    got_d = np.asarray(gs.dtec_paired_hermite_sharded(
        mesh, f_sh, grid, rb, 2, 0))
    want_d = np.asarray(tec_mod.dtec_paired_hermite(m, grid, rb, 2, 0))
    np.testing.assert_allclose(got_d, want_d, rtol=3e-6,
                               atol=2e-6 * np.abs(want_t).max())

    y = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    g_rep = np.asarray(jax.grad(
        lambda f: jnp.vdot(tec_mod.tec_hermite(f, grid, rb), y))(m))
    with jax.set_mesh(mesh):
        g_sh = np.asarray(jax.grad(
            lambda f: jnp.vdot(gs.tec_hermite_sharded(mesh, f, grid, rb),
                               y))(f_sh))
    np.testing.assert_allclose(g_sh, g_rep,
                               atol=2e-5 * np.abs(g_rep).max())

def test_sharded_grid_rejects_nonreplicated_field_models():
    """The sharded-grid operators enforce their cubic-only field-model
    contract loudly (VERDICT r3 weak #4): interp='zp' raises
    NotImplementedError everywhere instead of silently running a
    different operator than the production model."""
    import pytest
    import numpy as np
    import jax.numpy as jnp

    from ionotomo_tpu.core.grids import Grid3D
    from ionotomo_tpu.geometry.rays import RayBundle
    from ionotomo_tpu.parallel import grid_sharding as gs

    mesh = gs.grid_mesh()
    grid = Grid3D.create((0.0, 0.0, 0.0), (10.0, 10.0, 10.0),
                         (16, 12, 12))
    f = gs.shard_field(mesh, jnp.zeros(grid.shape, jnp.float32))
    pts = jnp.asarray(np.full((4, 3), 30.0, np.float32))
    rays = RayBundle(points=jnp.broadcast_to(pts[None], (2, 4, 3)),
                     ds=jnp.ones((2,), jnp.float32))
    for call in [
        lambda: gs.interp_sharded(mesh, f, grid, pts, interp="zp"),
        lambda: gs.interp_sharded_with_grad(mesh, f, grid, pts,
                                            interp="zp"),
        lambda: gs.tec_sharded(mesh, f, grid, rays, interp="zp"),
        lambda: gs.dtec_paired_sharded(mesh, f, grid, rays, 2,
                                       interp="zp"),
        lambda: gs.tec_hermite_sharded(mesh, f, grid, rays, interp="zp"),
        lambda: gs.dtec_paired_hermite_sharded(mesh, f, grid, rays, 2,
                                               interp="zp"),
        lambda: gs.trace_rays_sharded(mesh, f, grid, pts,
                                      jnp.asarray([[0.0, 0.0, 1.0]] * 4),
                                      150e6, interp="zp"),
    ]:
        with pytest.raises(NotImplementedError, match="cubic"):
            call()
