"""Faraday rotation measure: dipole geomagnetic field + RM path integral."""
import numpy as np
import jax.numpy as jnp

from ionotomo_tpu.core.grids import Grid3D
from ionotomo_tpu.forward import rm as rm_mod
from ionotomo_tpu.forward import tec as tec_mod
from ionotomo_tpu import constants
from ionotomo_tpu.geometry import frames, rays as rays_mod
from ionotomo_tpu.models import chapman, geomagnetic


def test_dipole_field_magnitude_and_direction():
    """Surface field ~3.1e-5 T at the geomagnetic equator, ~2x at the
    pole and pointing into the ground there (Earth's m points south)."""
    m = geomagnetic.dipole_moment_ecef()
    # construct a point on the geomagnetic axis (north), Earth radius
    n_pole = -m / np.linalg.norm(m)
    r_e = 6371.0
    b_pole = np.asarray(geomagnetic.dipole_b_ecef(r_e * n_pole[None], m))[0]
    b_eq_dir = np.cross(n_pole, [0.0, 0.0, 1.0])
    b_eq_dir /= np.linalg.norm(b_eq_dir)
    b_eq = np.asarray(geomagnetic.dipole_b_ecef(r_e * b_eq_dir[None], m))[0]
    assert abs(np.linalg.norm(b_eq) - 3.07e-5) < 0.1e-5
    assert abs(np.linalg.norm(b_pole) - 2 * np.linalg.norm(b_eq)) < 2e-7
    # at the N geomagnetic pole the field points down (toward -r̂)
    assert np.dot(b_pole, n_pole) < 0
    # decays as 1/r^3
    b_far = np.asarray(geomagnetic.dipole_b_ecef(2 * r_e * n_pole[None],
                                                 m))[0]
    np.testing.assert_allclose(np.linalg.norm(b_far),
                               np.linalg.norm(b_pole) / 8.0, rtol=1e-5)


def _world(nx=24):
    ants = np.array([[0.0, 0.0, 0.0], [30.0, 0.0, 0.0],
                     [0.0, 50.0, 0.0]])
    dirs = np.array([[0.0, 0.0, 1.0], [0.25, 0.0, 0.97],
                     [0.0, -0.2, 0.98]])
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    grid = chapman.grid_enclosing_rays(ants, dirs, max_length_km=900.0,
                                       shape=(nx, nx, nx), h_min_km=0.0)
    m = chapman.log_parametrize(chapman.chapman_field(grid))
    o, d = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(o, d, max_length_km=900.0,
                                       n_samples=65)
    return grid, m, rb


def test_uniform_field_rm_matches_tec_product():
    """With B uniform and parallel to each ray, RM = K_RM * B * TEC_SI
    exactly (same quadrature) — the unit/constant chain check."""
    grid, m, rb = _world()
    b0 = 4.2e-5
    tangents = np.asarray(rm_mod._tangents(rb.points))

    def b_fn(pts):
        # uniform magnitude along the local *propagation* direction
        # (source -> observer = minus the antenna->sky tangent)
        return -b0 * tangents.reshape(-1, 3)

    rmv = np.asarray(rm_mod.rotation_measure(m, grid, rb, b_fn))
    tec_si = np.asarray(tec_mod.tec(m, grid, rb)) * constants.TEC_SCALE
    np.testing.assert_allclose(rmv, rm_mod.K_RM * b0 * tec_si, rtol=1e-5)


def test_dipole_rm_realistic_and_drm_reference_row():
    """Dipole B over a LOFAR-like site: vertical RM of a 26-TECU Chapman
    ionosphere lands in the observed ~0.5–10 rad/m² range; differential
    RM vanishes at the reference antenna."""
    grid, m, rb = _world()
    site = frames.geodetic_to_ecef(np.deg2rad(52.9), np.deg2rad(6.87))
    enu = frames.ENUFrame(site)
    b_fn = geomagnetic.dipole_b_enu_fn(enu)
    rmv = np.asarray(rm_mod.rotation_measure(m, grid, rb, b_fn))
    assert np.isfinite(rmv).all()
    assert (0.3 < np.abs(rmv)).all() and (np.abs(rmv) < 12.0).all()
    # sign convention: B points downward (toward the observer) at 53° N,
    # so ionospheric RM is positive there
    assert (rmv > 0).all()
    d = np.asarray(rm_mod.drm(m, grid, rb, b_fn, num_directions=3, i0=0))
    assert d.shape == (3, 3)
    np.testing.assert_allclose(d[0], 0.0, atol=1e-7)
    # Faraday rotation angle at 150 MHz stays sub-radian-ish (sanity on
    # magnitudes): chi = RM * lambda^2, lambda = 2 m
    assert (np.abs(rmv) * 4.0 < 50.0).all()


def test_tangents_unit_and_straight():
    grid, m, rb = _world()
    t = np.asarray(rm_mod._tangents(rb.points))
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)
    # straight rays: tangent constant along the ray
    assert np.abs(t - t[:, :1]).max() < 1e-5
