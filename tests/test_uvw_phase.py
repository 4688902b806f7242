"""UVW frame + dispersive phase conversion tests."""
import numpy as np

from ionotomo_tpu import constants
from ionotomo_tpu.geometry import frames
from ionotomo_tpu.data.radio_array import RadioArray, \
    generate_lofar_like_array
from ionotomo_tpu.data.synth import generate_example_datapack
import os


def site():
    ref = frames.geodetic_to_ecef(np.deg2rad(52.905), np.deg2rad(6.868),
                                  0.0)
    return frames.ENUFrame(ref)


def test_uvw_preserves_baseline_length():
    enu = site()
    rng = np.random.default_rng(0)
    b = rng.normal(scale=20.0, size=(10, 3))
    uvw = frames.enu_to_uvw(b, 58000.3, ra=1.0, dec=0.7, enu=enu)
    np.testing.assert_allclose(np.linalg.norm(uvw, axis=-1),
                               np.linalg.norm(b, axis=-1), rtol=1e-12)


def test_uvw_w_is_projection_onto_source():
    """w must equal the baseline component toward the source direction."""
    enu = site()
    mjd = 58000.37
    ra, dec = 0.8, 0.9
    s = frames.icrs_to_enu(ra, dec, mjd, enu)   # unit vector to source
    rng = np.random.default_rng(1)
    b = rng.normal(scale=30.0, size=(8, 3))
    uvw = frames.enu_to_uvw(b, mjd, ra, dec, enu)
    np.testing.assert_allclose(uvw[:, 2], b @ s, atol=1e-6)


def test_uvw_zenith_source_u_points_east():
    """For a source at zenith, (u,v,w) ≈ (east, north, up)."""
    enu = site()
    mjd = 58000.3
    lst = frames.gmst_rad(mjd) + enu.lon
    # coordinates built directly in the of-date frame: skip precession
    uvw = frames.enu_to_uvw(np.eye(3), mjd, ra=lst, dec=enu.lat, enu=enu,
                            apply_precession_nutation=False)
    np.testing.assert_allclose(uvw, np.eye(3), atol=2e-3)


def test_phase_conversion_magnitude():
    """1 TECU at 150 MHz ≈ 56.3 rad (the canonical number)."""
    dp, _ = generate_example_datapack(n_antennas=3, n_directions=2,
                                      n_times=1, grid_shape=(12, 12, 12),
                                      n_samples=17)
    dp.dtec[:] = constants.TECU / constants.TEC_SCALE  # exactly 1 TECU
    ph = dp.phase(150e6)
    np.testing.assert_allclose(ph, 8.4479745e9 / 150e6, rtol=1e-6)


def test_shipped_array_config_loads():
    path = os.path.join(os.path.dirname(frames.__file__), "..", "data",
                        "arrays", "lofar_like_hba.cfg")
    arr = RadioArray.load_config(os.path.abspath(path))
    assert len(arr) == 62
    gen = generate_lofar_like_array()
    np.testing.assert_allclose(arr.itrs, gen.itrs, atol=1e-6)
