"""Host-side coordinate frames: ECEF/ITRS, local ENU, and ICRS→ENU pointing.

Design stance (SURVEY.md §7 "Host/device boundary"): all astronomical
coordinate work happens **once at setup**, on the host, in plain numpy f64,
producing flat arrays (antenna ENU offsets, per-time per-source ENU unit
vectors) that are shipped to the device. Nothing here is ever traced.

The reference uses astropy custom frames (ENU / Pointing / UVW,
SURVEY.md §2 "Coordinate frames"); astropy is not available in this image,
and a self-consistent analytic implementation is all the synthetic world
needs: IAU-1982 GMST + spherical trigonometry gives the same alt-az to
arcsecond-level minus precession/nutation, which cancels in a
self-consistent forward/invert loop.

Conventions:
- ECEF/ITRS coordinates in km.
- ENU frame tangent at a reference ECEF point: x=East, y=North, z=Up, km.
- Times as MJD (UTC≈UT1).
- ICRS directions as (ra, dec) in radians.
"""
from __future__ import annotations

import numpy as np


# WGS84 ellipsoid (km)
WGS84_A = 6378.137
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)


def geodetic_to_ecef(lat, lon, height_km=0.0):
    """Geodetic (rad, rad, km) → ECEF xyz (km). WGS84."""
    lat, lon, height_km = np.broadcast_arrays(
        np.asarray(lat, np.float64), np.asarray(lon, np.float64),
        np.asarray(height_km, np.float64))
    sl, cl = np.sin(lat), np.cos(lat)
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sl * sl)
    x = (n + height_km) * cl * np.cos(lon)
    y = (n + height_km) * cl * np.sin(lon)
    z = (n * (1.0 - WGS84_E2) + height_km) * sl
    return np.stack([x, y, z], axis=-1)


def ecef_to_geodetic(xyz):
    """ECEF xyz (km) → geodetic (lat, lon, height_km). Bowring's method."""
    xyz = np.asarray(xyz, np.float64)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    lon = np.arctan2(y, x)
    p = np.hypot(x, y)
    # iterate latitude
    lat = np.arctan2(z, p * (1.0 - WGS84_E2))
    for _ in range(5):
        sl = np.sin(lat)
        n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sl * sl)
        h = p / np.cos(lat) - n
        lat = np.arctan2(z, p * (1.0 - WGS84_E2 * n / (n + h)))
    sl = np.sin(lat)
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sl * sl)
    h = p / np.cos(lat) - n
    return lat, lon, h


def enu_rotation(lat, lon):
    """Rows are the East/North/Up unit vectors in ECEF at (lat, lon)."""
    sl, cl = np.sin(lat), np.cos(lat)
    so, co = np.sin(lon), np.cos(lon)
    return np.array([
        [-so, co, 0.0],
        [-sl * co, -sl * so, cl],
        [cl * co, cl * so, sl],
    ])


class ENUFrame:
    """Local East-North-Up tangent frame at a reference ECEF point (km)."""

    def __init__(self, ref_ecef_km):
        self.ref = np.asarray(ref_ecef_km, np.float64)
        self.lat, self.lon, self.height = ecef_to_geodetic(self.ref)
        self.rot = enu_rotation(self.lat, self.lon)  # ECEF→ENU

    def from_ecef(self, xyz):
        return (np.asarray(xyz, np.float64) - self.ref) @ self.rot.T

    def to_ecef(self, enu):
        return np.asarray(enu, np.float64) @ self.rot + self.ref

    def direction_from_ecef(self, vec):
        """Rotate an ECEF direction vector into ENU (no translation)."""
        return np.asarray(vec, np.float64) @ self.rot.T


def gmst_rad(mjd_ut):
    """Greenwich Mean Sidereal Time (radians), IAU-1982 linear model."""
    mjd_ut = np.asarray(mjd_ut, np.float64)
    d0 = np.floor(mjd_ut) - 51544.5          # days since J2000 at prev 0h UT
    hours = (mjd_ut % 1.0) * 24.0            # UT hours of day
    gmst_hours = (6.697374558 + 0.06570982441908 * d0
                  + 1.00273790935 * hours)
    return (gmst_hours % 24.0) * (np.pi / 12.0)


def icrs_to_enu(ra, dec, mjd, enu: ENUFrame):
    """ICRS (ra, dec) [rad] at times mjd → ENU unit vectors.

    ra/dec broadcast against mjd: returns shape broadcast(ra, mjd) + (3,).
    Equivalent to the reference's Pointing frame transform (SURVEY.md §3.2):
    hour angle from local sidereal time, then alt-az, then ENU components.
    """
    ra = np.asarray(ra, np.float64)
    dec = np.asarray(dec, np.float64)
    lst = gmst_rad(mjd) + enu.lon  # local sidereal time
    ra, dec, lst = np.broadcast_arrays(ra, dec, lst)
    h = lst - ra  # hour angle
    slat, clat = np.sin(enu.lat), np.cos(enu.lat)
    sdec, cdec = np.sin(dec), np.cos(dec)
    sh, ch = np.sin(h), np.cos(h)
    sin_alt = slat * sdec + clat * cdec * ch
    # ENU components directly (az measured from North through East):
    e = -cdec * sh
    n = sdec * clat - cdec * ch * slat
    u = sin_alt
    v = np.stack([e, n, u], axis=-1)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def enu_to_uvw(baselines_enu, mjd, ra, dec, enu: "ENUFrame"):
    """Interferometric UVW coordinates of ENU baselines (km) toward a
    phase centre (ra, dec) at times mjd — the reference's UVW frame
    (SURVEY.md §2 "Coordinate frames").

    Convention: w toward the source, u toward increasing east-ish RA,
    v completing the right-handed set (toward north celestial pole
    projection). baselines_enu (..., 3); returns same shape.
    """
    h = gmst_rad(mjd) + enu.lon - ra  # hour angle of the phase centre
    lat = enu.lat
    # ENU -> (equatorial XYZ at the site): X toward (H=0, dec=0),
    # Y toward (H=-6h), Z toward the pole
    b = np.asarray(baselines_enu, np.float64)
    e, n, u = b[..., 0], b[..., 1], b[..., 2]
    x = -np.sin(lat) * n + np.cos(lat) * u
    y = e
    z = np.cos(lat) * n + np.sin(lat) * u
    sh, ch = np.sin(h), np.cos(h)
    sd, cd = np.sin(dec), np.cos(dec)
    uu = sh * x + ch * y
    vv = -sd * ch * x + sd * sh * y + cd * z
    ww = cd * ch * x - cd * sh * y + sd * z
    return np.stack([uu, vv, ww], axis=-1)


def solar_radec(mjd):
    """Low-precision solar ICRS (ra, dec) [rad] — ±0.01° class (adequate
    for Chapman day/night modulation; the reference used astropy's sun)."""
    mjd = np.asarray(mjd, np.float64)
    d = mjd - 51544.5
    g = np.deg2rad((357.529 + 0.98560028 * d) % 360.0)   # mean anomaly
    q = (280.459 + 0.98564736 * d) % 360.0               # mean longitude
    lam = np.deg2rad(q + 1.915 * np.sin(g) + 0.020 * np.sin(2 * g))
    eps = np.deg2rad(23.439 - 0.00000036 * d)            # obliquity
    ra = np.arctan2(np.cos(eps) * np.sin(lam), np.cos(lam)) % (2 * np.pi)
    dec = np.arcsin(np.sin(eps) * np.sin(lam))
    return ra, dec


def solar_cos_zenith(mjd, enu: ENUFrame):
    """cos of the solar zenith angle at the frame origin — the Chapman
    day/night driver: pass as ``cos_chi`` to models.chapman.chapman_field."""
    ra, dec = solar_radec(mjd)
    v = icrs_to_enu(ra, dec, mjd, enu)
    return v[..., 2]


def enu_to_altaz(enu_vec):
    """ENU unit vector → (alt, az) in radians, az from North through East."""
    v = np.asarray(enu_vec, np.float64)
    alt = np.arcsin(np.clip(v[..., 2], -1.0, 1.0))
    az = np.arctan2(v[..., 0], v[..., 1]) % (2.0 * np.pi)
    return alt, az
