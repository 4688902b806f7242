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


def test_precession_matrix_identity_at_j2000():
    p = frames.precession_matrix(51544.5)
    np.testing.assert_allclose(p, np.eye(3), atol=2e-8)
    n = frames.nutation_matrix(51544.5)
    # nutation is small but nonzero at J2000 (|Δψ| up to ~17″)
    assert np.abs(n - np.eye(3)).max() < 1e-4
    assert np.abs(n - np.eye(3)).max() > 1e-6


def test_precession_is_orthonormal_and_matches_theta():
    """The angle between the ICRS pole and the mean pole of date is θ_A
    (2004.19″/century to first order)."""
    for years in (10.0, 26.0, 50.0):
        mjd = 51544.5 + years * 365.25
        p = frames.precession_matrix(mjd)
        np.testing.assert_allclose(p @ p.T, np.eye(3), atol=1e-12)
        pole_date = p @ np.array([0.0, 0.0, 1.0])
        ang = np.degrees(np.arccos(np.clip(pole_date[2], -1, 1)))
        theta_deg = 2004.191903 / 3600.0 * (years / 100.0)
        np.testing.assert_allclose(ang, theta_deg, rtol=2e-3)


def test_nutation_angles_within_physical_bounds():
    mjd = 51544.5 + np.linspace(0, 40 * 365.25, 400)
    dpsi, deps = frames.nutation_angles_rad(mjd)
    arcsec = np.degrees(1) * 3600
    assert (np.abs(dpsi) * arcsec <= 19.5).all()
    assert (np.abs(deps) * arcsec <= 10.5).all()
    # the 18.6-yr Ω term dominates: Δψ must change sign over half a period
    assert dpsi.max() > 0 and dpsi.min() < 0


def test_polaris_pole_distance_decreases_by_2026():
    """Known sky value: Polaris (ICRS 2h31m49s, +89°15′51″) is ~0.736° from
    the ICRS pole; precession carries the pole toward it, ~0.66° apparent
    polar distance in 2026."""
    ra = np.deg2rad(37.9546)
    dec = np.deg2rad(89.2641)
    v = np.array([np.cos(dec) * np.cos(ra), np.cos(dec) * np.sin(ra),
                  np.sin(dec)])
    mjd_2026 = 51544.5 + 26.2 * 365.25
    v_date = frames.icrs_to_true_of_date(v, mjd_2026)
    pd_icrs = np.degrees(np.arccos(v[2]))
    pd_date = np.degrees(np.arccos(v_date[2]))
    assert abs(pd_icrs - 0.7359) < 0.01
    assert 0.60 < pd_date < 0.70


def test_icrs_to_enu_precession_shifts_directions_at_2026():
    """The full chain moves apparent directions by ~0.3–0.4° at 2026 vs the
    bare-GMST legacy path (26 yr × 50.3″/yr of precession)."""
    site = frames.ENUFrame(frames.geodetic_to_ecef(np.deg2rad(52.9),
                                                   np.deg2rad(6.87)))
    mjd = 51544.5 + 26.0 * 365.25 + 0.37
    ra, dec = np.deg2rad(123.4), np.deg2rad(48.2)
    v_full = frames.icrs_to_enu(ra, dec, mjd, site)
    v_bare = frames.icrs_to_enu(ra, dec, mjd, site,
                                apply_precession_nutation=False)
    ang = np.degrees(np.arccos(np.clip(np.dot(v_full, v_bare), -1, 1)))
    assert 0.2 < ang < 0.5
    np.testing.assert_allclose(np.linalg.norm(v_full), 1.0, atol=1e-12)


def test_solar_cos_zenith_field_matches_origin_and_varies():
    """Per-column solar zenith map: agrees with the scalar driver at the
    origin; drifts by the expected ~1 deg of arc per ~111 km eastward."""
    ref = frames.geodetic_to_ecef(np.deg2rad(52.9), np.deg2rad(6.9), 0.0)
    enu = frames.ENUFrame(ref)
    mjd = 58000.25
    c0 = float(frames.solar_cos_zenith(mjd, enu))
    x = np.array([-400.0, 0.0, 400.0])
    field = frames.solar_cos_zenith_field(mjd, enu, x[:, None],
                                          np.zeros((1, 1)))
    np.testing.assert_allclose(field[1, 0], c0, atol=2e-3)
    # monotone drift across 800 km of longitude, and a physical magnitude:
    # dcos/dangle <= 1, 400 km ~ 0.063 rad of arc
    assert abs(field[2, 0] - field[0, 0]) > 1e-3
    assert abs(field[2, 0] - c0) < 0.13


def test_gaussian_earth_radius_bounds():
    rm, rn = frames.earth_curvature_radii(np.deg2rad(52.9))
    assert 6350.0 < rm < 6400.0 and 6380.0 < rn < 6400.0
    r = frames.gaussian_earth_radius(np.deg2rad(52.9))
    assert rm < r < rn or rn < r < rm or abs(r - rm) < 50.0
