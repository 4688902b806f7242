"""Round-trip and invariant tests for host-side coordinate frames
(SURVEY.md §4: "round-trip ITRS↔ENU↔ICRS transform consistency")."""
import numpy as np

from ionotomo_tpu.geometry import frames


def test_geodetic_ecef_roundtrip():
    rng = np.random.default_rng(1)
    lat = rng.uniform(-1.4, 1.4, 50)
    lon = rng.uniform(-np.pi, np.pi, 50)
    h = rng.uniform(-1.0, 100.0, 50)
    xyz = frames.geodetic_to_ecef(lat, lon, h)
    lat2, lon2, h2 = frames.ecef_to_geodetic(xyz)
    np.testing.assert_allclose(lat2, lat, atol=1e-10)
    np.testing.assert_allclose(lon2, lon, atol=1e-12)
    np.testing.assert_allclose(h2, h, atol=1e-6)


def test_enu_roundtrip_and_orthonormality():
    ref = frames.geodetic_to_ecef(np.deg2rad(52.9), np.deg2rad(6.9), 0.0)
    enu = frames.ENUFrame(ref)
    np.testing.assert_allclose(enu.rot @ enu.rot.T, np.eye(3), atol=1e-12)
    rng = np.random.default_rng(2)
    pts = ref + rng.normal(scale=50.0, size=(20, 3))
    back = enu.to_ecef(enu.from_ecef(pts))
    np.testing.assert_allclose(back, pts, atol=1e-9)
    # Up axis points away from Earth centre (ellipsoid normal ~ radial)
    up_ecef = enu.direction_from_ecef(ref / np.linalg.norm(ref))
    assert up_ecef[2] > 0.99


def test_icrs_to_enu_zenith_source():
    """A source at the local zenith must map to ENU ≈ (0,0,1)."""
    ref = frames.geodetic_to_ecef(np.deg2rad(52.905), np.deg2rad(6.868), 0.0)
    enu = frames.ENUFrame(ref)
    mjd = 58000.3
    lst = frames.gmst_rad(mjd) + enu.lon
    v = frames.icrs_to_enu(ra=lst, dec=enu.lat, mjd=mjd, enu=enu)
    # geodetic vs geocentric latitude difference bends this by <0.2 deg
    assert v[2] > 0.99998
    alt, _ = frames.enu_to_altaz(v)
    assert np.rad2deg(alt) > 89.5


def test_icrs_direction_drifts_with_sidereal_time():
    ref = frames.geodetic_to_ecef(np.deg2rad(52.905), np.deg2rad(6.868), 0.0)
    enu = frames.ENUFrame(ref)
    mjds = 58000.0 + np.linspace(0, 0.25, 7)  # 6 hours
    v = frames.icrs_to_enu(ra=1.0, dec=0.9, mjd=mjds, enu=enu)
    assert v.shape == (7, 3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-12)
    # the source must move on the sky over 6 hours
    assert np.linalg.norm(v[0] - v[-1]) > 0.1
    # sidereal day periodicity: ~23.9345 h later the direction repeats
    sidereal_day = 0.9972695663
    v2 = frames.icrs_to_enu(ra=1.0, dec=0.9, mjd=mjds[0] + sidereal_day,
                            enu=enu)
    np.testing.assert_allclose(v2, v[0], atol=1e-3)


def test_solar_position_sanity():
    """Sun near vernal equinox 2020 (MJD 58928.0, ~Mar 20): dec ≈ 0,
    ra ≈ 0/2π; and local solar zenith follows day/night over 24 h."""
    ra, dec = frames.solar_radec(58928.0)
    assert abs(dec) < np.deg2rad(1.0)
    assert min(ra, 2 * np.pi - ra) < np.deg2rad(2.0)

    ref = frames.geodetic_to_ecef(np.deg2rad(52.905), np.deg2rad(6.868), 0.0)
    enu = frames.ENUFrame(ref)
    mjds = 58928.0 + np.linspace(0, 1, 25)
    cz = frames.solar_cos_zenith(mjds, enu)
    # at 53N on the equinox: noon cos χ ≈ cos(53°) ≈ 0.6, midnight < 0
    assert cz.max() > 0.5
    assert cz.min() < -0.4
    # noon occurs near 12h UT minus lon/15 ≈ 11.5h UT
    assert abs(float(np.argmax(cz)) - 11.5) <= 1.5


def test_gmst_reference_value():
    """GMST at J2000.0 epoch (MJD 51544.5, 12h UT) ≈ 18.697 h (IAU 1982)."""
    got_hours = frames.gmst_rad(51544.5) * 12.0 / np.pi
    assert abs(got_hours - 18.697374558) < 1e-6
