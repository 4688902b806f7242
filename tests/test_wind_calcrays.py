"""Wind estimation + calc_rays facade tests."""
import numpy as np
import jax.numpy as jnp

from ionotomo_tpu.core.grids import Grid3D
from ionotomo_tpu.geometry import rays as rays_mod
from ionotomo_tpu.models import chapman
from ionotomo_tpu.models.frozen_flow import advect_periodic, estimate_wind
from ionotomo_tpu.models.turbulence import turbulent_log_perturbation


def test_estimate_wind_recovers_truth():
    grid = Grid3D.from_bounds((0, 0, 0), (400, 400, 400), (24, 24, 24))
    pert = turbulent_log_perturbation(grid, amplitude=0.5, seed=4,
                                      outer_scale_km=150.0)
    v_true = jnp.asarray([0.25, -0.1, 0.0])
    dt = 120.0
    pert_b = advect_periodic(pert, grid, v_true * dt)
    v_est, hist = estimate_wind(pert, pert_b, grid, dt, n_iters=300,
                                lr=0.02)
    np.testing.assert_allclose(np.asarray(v_est)[:2],
                               np.asarray(v_true)[:2], atol=0.03)
    assert float(hist[-1]) < float(hist[0])


def test_calc_rays_straight_matches_sampler():
    ants = np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]], np.float32)
    dirs = np.array([[0.0, 0.0, 1.0]], np.float32)
    rb = rays_mod.calc_rays(ants, dirs, straight_line_approx=True,
                            max_length_km=500.0, n_samples=21)
    assert rb.points.shape == (2, 21, 3)
    np.testing.assert_allclose(np.asarray(rb.points[0, -1]),
                               [0, 0, 500.0], atol=1e-3)


def test_calc_rays_bent_dispatch():
    grid = Grid3D.from_bounds((-300, -300, 0), (300, 300, 1000),
                              (16, 16, 16))
    m = chapman.log_parametrize(chapman.chapman_field(grid))
    ants = np.zeros((1, 3), np.float32)
    dirs = np.array([[0.3, 0.0, 0.954]], np.float32) / 1.0
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    rb = rays_mod.calc_rays(ants, dirs, ne_field_m=m, grid=grid,
                            frequency_hz=150e6,
                            straight_line_approx=False,
                            max_length_km=900.0, n_samples=33)
    assert rb.points.shape == (1, 33, 3)
    # bent path still ends near (but not exactly at) the straight endpoint
    end = np.asarray(rb.points[0, -1])
    straight = 900.0 * np.asarray(dirs[0])
    assert np.linalg.norm(end - straight) < 5.0


def test_advect_shear_per_slice_shift():
    """(2,3) shear form of advect_periodic: zero shear row reproduces the
    rigid path on band-limited fields (the even-size Nyquist bin under a
    fractional shift is convention-dependent, so white noise is excluded
    by construction); integer-voxel shear shifts match per-slice rolls
    exactly; mid-grid slices move least."""
    import jax.numpy as jnp
    from ionotomo_tpu.core.grids import Grid3D
    from ionotomo_tpu.models.frozen_flow import advect_periodic

    nx = 16
    grid = Grid3D.create((0.0, 0.0, 0.0), (10.0, 10.0, 10.0),
                         (nx, nx, nx))               # exactly 10 km voxels
    # band-limited smooth field: a few low-k Fourier modes
    rng = np.random.default_rng(0)
    spec = np.zeros((nx, nx, nx), np.complex128)
    spec[:4, :4, :4] = (rng.normal(size=(4, 4, 4))
                        + 1j * rng.normal(size=(4, 4, 4)))
    f = jnp.asarray(np.real(np.fft.ifftn(spec)), jnp.float32)

    rigid = advect_periodic(f, grid, jnp.asarray([23.0, -7.0, 31.0]))
    shear0 = advect_periodic(
        f, grid, jnp.asarray([[23.0, -7.0, 31.0], [0.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(shear0), np.asarray(rigid),
                               atol=1e-6)

    # pure shear, integer voxels at the faces: slice k shifts in x by
    # zeta_k * 80 km = zeta_k * 8 voxels; integral at the faces
    g = jnp.asarray(rng.normal(size=(nx, nx, nx)), jnp.float32)
    sh = advect_periodic(g, grid,
                         jnp.asarray([[0.0, 0.0, 0.0], [80.0, 0.0, 0.0]]))
    zeta = (2.0 * np.arange(nx) - (nx - 1)) / (nx - 1)
    for k in (0, nx - 1):
        vox = zeta[k] * 8.0
        assert vox == int(vox)
        expect = np.roll(np.asarray(g[:, :, k]), int(vox), axis=0)
        np.testing.assert_allclose(np.asarray(sh[:, :, k]), expect,
                                   atol=2e-5)
    # mid-grid slices move least — checked on the SMOOTH field (on white
    # noise a fractional spectral shift decorrelates high-k content as
    # much as a large roll, so the comparison is only meaningful where
    # displacement ∝ change): |zeta_7| = 1/15 vs |zeta_0| = 1
    shf = advect_periodic(f, grid,
                          jnp.asarray([[0.0, 0.0, 0.0], [80.0, 0.0, 0.0]]))
    mid = np.abs(np.asarray(shf[:, :, 7]) - np.asarray(f[:, :, 7])).max()
    edge = np.abs(np.asarray(shf[:, :, 0]) - np.asarray(f[:, :, 0])).max()
    assert mid < 0.5 * edge
