"""Property-based grid/ray fuzzing (SURVEY.md §4 rebuild test plan).

Algebraic invariants that must hold for ANY grid geometry (anisotropic
spacings, odd shapes, shifted origins) and any query points, including
points far outside the grid:

- linearity: interp(a·f + b·g) = a·interp(f) + b·interp(g)
- translation equivariance: shifting origin and points together is a no-op
- partition of unity: interp of a constant field is that constant
- TEC positivity and scaling: tec(m + c) = e^c · tec(m)
"""
import numpy as np
import jax.numpy as jnp

from ionotomo_tpu.core.grids import Grid3D
from ionotomo_tpu.core import tricubic
from ionotomo_tpu.forward import tec as tec_mod
from ionotomo_tpu.geometry import rays as rays_mod


def random_world(rng):
    shape = tuple(int(s) for s in rng.integers(5, 20, 3))
    origin = rng.uniform(-100, 100, 3)
    spacing = rng.uniform(0.5, 30.0, 3)
    grid = Grid3D.create(origin, spacing, shape)
    f = rng.normal(size=shape).astype(np.float32)
    hi = origin + spacing * (np.asarray(shape) - 1)
    pts = rng.uniform(origin - 0.5 * (hi - origin),
                      hi + 0.5 * (hi - origin),
                      size=(50, 3)).astype(np.float32)
    return grid, f, pts


def test_fuzz_linearity_and_translation():
    rng = np.random.default_rng(0)
    for trial in range(8):
        grid, f, pts = random_world(rng)
        g = rng.normal(size=f.shape).astype(np.float32)
        a, b = rng.normal(), rng.normal()
        lin = np.asarray(tricubic.interp(
            jnp.asarray(a * f + b * g), grid, jnp.asarray(pts)))
        sep = a * np.asarray(tricubic.interp(jnp.asarray(f), grid,
                                             jnp.asarray(pts))) \
            + b * np.asarray(tricubic.interp(jnp.asarray(g), grid,
                                             jnp.asarray(pts)))
        scale = np.abs(lin).max() + 1.0
        np.testing.assert_allclose(lin, sep, atol=3e-5 * scale,
                                   err_msg=f"trial {trial}")

        shift = rng.normal(size=3).astype(np.float32) * 50
        grid2 = Grid3D.create(np.asarray(grid.origin) + shift,
                              np.asarray(grid.spacing), grid.shape)
        moved = np.asarray(tricubic.interp(jnp.asarray(f), grid2,
                                           jnp.asarray(pts + shift)))
        base = np.asarray(tricubic.interp(jnp.asarray(f), grid,
                                          jnp.asarray(pts)))
        np.testing.assert_allclose(moved, base, atol=2e-4 * scale,
                                   err_msg=f"trial {trial} translation")


def test_fuzz_constant_field_and_row_path_agree():
    rng = np.random.default_rng(1)
    for trial in range(6):
        grid, f, pts = random_world(rng)
        c = float(rng.normal())
        const = np.asarray(tricubic.interp(
            jnp.full(grid.shape, c, jnp.float32), grid, jnp.asarray(pts)))
        np.testing.assert_allclose(const, c, atol=1e-5 * (abs(c) + 1))
        # flat-gather and row-gather paths agree everywhere (incl. edges)
        nx, ny, nz = grid.shape
        flat = np.asarray(tricubic.interp(jnp.asarray(f), grid,
                                          jnp.asarray(pts)))
        rows = np.asarray(tricubic.interp_rows(
            jnp.asarray(f).reshape(nx * ny, nz), grid, jnp.asarray(pts)))
        np.testing.assert_allclose(flat, rows, atol=1e-5,
                                   err_msg=f"trial {trial}")


def test_fuzz_tec_exponential_scaling():
    rng = np.random.default_rng(2)
    for _ in range(4):
        grid, f, _ = random_world(rng)
        m = jnp.asarray(0.1 * f)
        n_rays = 7
        lo = np.asarray(grid.origin)
        hi = np.asarray(grid.upper())
        o = rng.uniform(lo, hi, (n_rays, 3)).astype(np.float32)
        d = rng.normal(size=(n_rays, 3))
        d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
        rb = rays_mod.sample_straight_rays(jnp.asarray(o), jnp.asarray(d),
                                           max_length_km=50.0, n_samples=21)
        t0 = np.asarray(tec_mod.tec(m, grid, rb))
        assert (t0 > 0).all()
        c = 0.7
        t1 = np.asarray(tec_mod.tec(m + c, grid, rb))
        np.testing.assert_allclose(t1, np.exp(c) * t0, rtol=2e-5)


def test_fuzz_sharded_interp_matches_replicated():
    """Property fuzz over grid shapes/extents/points: the halo-exchange
    interpolator equals the replicated one everywhere (incl. outside)."""
    import jax
    from ionotomo_tpu.parallel import grid_sharding as gs
    if len(jax.devices()) < 2:
        return
    n_dev = len(jax.devices())
    rng = np.random.default_rng(77)
    for trial in range(6):
        nx = int(n_dev * rng.integers(2, 5))       # divisible, ≥2/shard
        ny = int(rng.integers(5, 14))
        nz = int(rng.integers(5, 14))
        lo = rng.uniform(-500, 0, 3)
        hi = lo + rng.uniform(100, 900, 3)
        grid = Grid3D.from_bounds(lo, hi, (nx, ny, nz))
        f = jnp.asarray(rng.normal(size=(nx, ny, nz)).astype(np.float32))
        pts = rng.uniform(lo - 50, hi + 50, (80, 3)).astype(np.float32)
        want = np.asarray(tricubic.interp(f, grid, jnp.asarray(pts)))
        mesh = gs.grid_mesh()
        got = np.asarray(gs.interp_sharded(
            mesh, gs.shard_field(mesh, f), grid, jnp.asarray(pts)))
        np.testing.assert_allclose(got, want, rtol=3e-5,
                                   atol=3e-6 * max(1, np.abs(want).max()),
                                   err_msg=str((trial, nx, ny, nz)))


def test_fuzz_h5parm_axis_permutations(tmp_path):
    """The h5parm loader must reorder ANY AXES permutation (with/without
    pol and degenerate freq) to (ant, time, dir) and land the same values."""
    import itertools
    import h5py
    from ionotomo_tpu import constants
    from ionotomo_tpu.data.datapack import DataPack
    from ionotomo_tpu.data.radio_array import generate_lofar_like_array

    rng = np.random.default_rng(3)
    arr = generate_lofar_like_array(n_core=2, n_remote=2, seed=2)
    na, nt, nd = 4, 3, 2
    names = np.asarray(arr.labels, dtype="S64")
    ant_dtype = np.dtype([("name", "S64"), ("position", np.float64, (3,))])
    ant = np.zeros(na, ant_dtype)
    ant["name"] = names; ant["position"] = arr.itrs * 1e3
    src_dtype = np.dtype([("name", "S64"), ("dir", np.float64, (2,))])
    src = np.zeros(nd, src_dtype)
    src["name"] = np.asarray([f"S{j}" for j in range(nd)], dtype="S64")
    src["dir"] = np.stack([np.full(nd, 1.0), 0.5 + 0.1 * np.arange(nd)], -1)
    tec = rng.normal(scale=0.1, size=(na, nt, nd))        # TECU, canonical

    perms = list(itertools.permutations(["ant", "time", "dir"]))
    want = (tec - tec[0:1]) * constants.TECU / constants.TEC_SCALE
    for k, axes in enumerate(perms):
        with_pol = k % 2 == 0
        ax_list = list(axes) + (["pol"] if with_pol else [])
        src_axes = {"ant": 0, "time": 1, "dir": 2}
        val = np.transpose(tec, [src_axes[a] for a in axes])
        if with_pol:
            val = np.stack([val, val], axis=-1)
        p = tmp_path / f"f{k}.h5"
        with h5py.File(p, "w") as f:
            ss = f.create_group("sol000")
            ss.create_dataset("antenna", data=ant)
            ss.create_dataset("source", data=src)
            st = ss.create_group("tec000")
            st.attrs["TITLE"] = np.bytes_(b"tec")
            v = st.create_dataset("val", data=val)
            v.attrs["AXES"] = np.bytes_(",".join(ax_list).encode())
            st.create_dataset("time",
                              data=58000.0 * 86400 + np.arange(nt) * 30.0)
            st.create_dataset("ant", data=names)
            st.create_dataset("dir", data=src["name"])
            if with_pol:
                st.create_dataset("pol", data=np.asarray([b"XX", b"YY"]))
        dp = DataPack.from_h5parm(p)
        assert dp.shape == (na, nt, nd)
        np.testing.assert_allclose(dp.dtec, want, rtol=1e-9)
