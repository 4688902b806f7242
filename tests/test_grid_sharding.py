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
