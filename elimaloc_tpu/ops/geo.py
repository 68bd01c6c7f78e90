"""Geodetic <-> local-Cartesian (ENU) projection on the WGS84 ellipsoid.

TPU-native replacement for the GeographicLib ``LocalCartesian`` forward/reverse
used by the reference EKF node (reference: src/app/localization/ekf_localization/
src/ekf_localization.cpp:412-418, 643-648). Implemented from the standard
geodetic <-> ECEF equations (no third-party geodesy dependency); the reverse
uses Bowring's iteration, accurate to sub-millimeter at vehicle scales.
"""

from __future__ import annotations

import jax.numpy as jnp

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)


def _geodetic_to_ecef(lat_deg, lon_deg, h):
    lat = jnp.deg2rad(lat_deg)
    lon = jnp.deg2rad(lon_deg)
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    n = _A / jnp.sqrt(1.0 - _E2 * sl * sl)
    x = (n + h) * cl * jnp.cos(lon)
    y = (n + h) * cl * jnp.sin(lon)
    z = (n * (1.0 - _E2) + h) * sl
    return jnp.stack([x, y, z], axis=-1)


def _ecef_to_geodetic(xyz):
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    lon = jnp.arctan2(y, x)
    p = jnp.sqrt(x * x + y * y)
    # Bowring-style fixed-point iteration on latitude (5 iters ~ f64 precision).
    lat = jnp.arctan2(z, p * (1.0 - _E2))
    for _ in range(5):
        sl = jnp.sin(lat)
        n = _A / jnp.sqrt(1.0 - _E2 * sl * sl)
        h = p / jnp.cos(lat) - n
        lat = jnp.arctan2(z, p * (1.0 - _E2 * n / (n + h)))
    sl = jnp.sin(lat)
    n = _A / jnp.sqrt(1.0 - _E2 * sl * sl)
    h = p / jnp.cos(lat) - n
    return jnp.rad2deg(lat), jnp.rad2deg(lon), h


def _enu_basis(lat_deg, lon_deg):
    lat = jnp.deg2rad(lat_deg)
    lon = jnp.deg2rad(lon_deg)
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    so, co = jnp.sin(lon), jnp.cos(lon)
    east = jnp.stack([-so, co, jnp.zeros_like(so)], axis=-1)
    north = jnp.stack([-sl * co, -sl * so, cl], axis=-1)
    up = jnp.stack([cl * co, cl * so, sl], axis=-1)
    return jnp.stack([east, north, up], axis=-2)  # rows are E,N,U


def project_gps_point(lat, lon, height, ref_lat, ref_lon, ref_height):
    """(lat, lon, h) -> local ENU xyz relative to the reference origin.

    Equivalent of GeographicLib LocalCartesian::Forward as used by
    ProjectGpsPoint (ekf_localization.cpp:643-648).
    """
    ecef = _geodetic_to_ecef(jnp.asarray(lat), jnp.asarray(lon), jnp.asarray(height))
    ecef0 = _geodetic_to_ecef(
        jnp.asarray(ref_lat), jnp.asarray(ref_lon), jnp.asarray(ref_height)
    )
    basis = _enu_basis(ref_lat, ref_lon)
    return jnp.einsum("...ij,...j->...i", basis, ecef - ecef0)


def unproject_local_point(xyz, ref_lat, ref_lon, ref_height):
    """Local ENU xyz -> (lat, lon, h); LocalCartesian::Reverse equivalent
    (ekf_localization.cpp:412-418)."""
    ecef0 = _geodetic_to_ecef(
        jnp.asarray(ref_lat), jnp.asarray(ref_lon), jnp.asarray(ref_height)
    )
    basis = _enu_basis(ref_lat, ref_lon)
    ecef = ecef0 + jnp.einsum("...ji,...j->...i", basis, jnp.asarray(xyz))
    return _ecef_to_geodetic(ecef)


# ---- UTM (transverse Mercator, Karney series) -------------------------------
#
# The reference parses ``projection_mode = Cartesian | UTM``
# (ekf_localization.cpp:253, localization.ini:14) and includes
# GeographicLib/UTMUPS.hpp, but never actually dispatches on it — UTM is dead
# config upstream. We implement it for real: 3rd-order Krueger/Karney series
# (mm-level inside a zone), standard UTM scale/offsets.

_K0 = 0.9996
_E = _E2 ** 0.5  # host float: module-level jnp would initialize the backend
_N3 = _F / (2.0 - _F)  # third flattening n
_A_TM = _A / (1.0 + _N3) * (1.0 + _N3**2 / 4.0 + _N3**4 / 64.0)
_ALPHA = (
    _N3 / 2.0 - 2.0 * _N3**2 / 3.0 + 5.0 * _N3**3 / 16.0,
    13.0 * _N3**2 / 48.0 - 3.0 * _N3**3 / 5.0,
    61.0 * _N3**3 / 240.0,
)
_BETA = (
    _N3 / 2.0 - 2.0 * _N3**2 / 3.0 + 37.0 * _N3**3 / 96.0,
    _N3**2 / 48.0 + _N3**3 / 15.0,
    17.0 * _N3**3 / 480.0,
)


def utm_zone(lon_deg) -> int:
    """Standard 6-degree UTM zone (no Norway/Svalbard exceptions — the
    reference never exercises UTM at all, see module comment)."""
    return int(jnp.floor((float(lon_deg) + 180.0) / 6.0)) % 60 + 1


def utm_forward(lat_deg, lon_deg, zone: int | None = None):
    """(lat, lon) -> (easting, northing, zone). Southern-hemisphere points get
    the 10,000 km false northing, as in GeographicLib UTMUPS::Forward."""
    lat_deg = jnp.asarray(lat_deg, jnp.float64)
    lon_deg = jnp.asarray(lon_deg, jnp.float64)
    if zone is None:
        zone = utm_zone(jnp.reshape(lon_deg, (-1,))[0])
    lon0 = -183.0 + 6.0 * zone
    lat = jnp.deg2rad(lat_deg)
    lam = jnp.deg2rad(lon_deg - lon0)
    sphi = jnp.sin(lat)
    # conformal latitude
    t = jnp.sinh(jnp.arctanh(sphi) - _E * jnp.arctanh(_E * sphi))
    xi0 = jnp.arctan2(t, jnp.cos(lam))
    eta0 = jnp.arcsinh(jnp.sin(lam) / jnp.sqrt(t * t + jnp.cos(lam) ** 2))
    xi, eta = xi0, eta0
    for j, a in enumerate(_ALPHA, start=1):
        xi = xi + a * jnp.sin(2 * j * xi0) * jnp.cosh(2 * j * eta0)
        eta = eta + a * jnp.cos(2 * j * xi0) * jnp.sinh(2 * j * eta0)
    easting = 500000.0 + _K0 * _A_TM * eta
    northing = _K0 * _A_TM * xi + jnp.where(lat_deg < 0.0, 1e7, 0.0)
    return easting, northing, zone


def utm_reverse(easting, northing, zone: int, southern: bool = False):
    """(easting, northing, zone) -> (lat, lon); UTMUPS::Reverse equivalent."""
    easting = jnp.asarray(easting, jnp.float64)
    northing = jnp.asarray(northing, jnp.float64)
    xi0 = (northing - (1e7 if southern else 0.0)) / (_K0 * _A_TM)
    eta0 = (easting - 500000.0) / (_K0 * _A_TM)
    xi, eta = xi0, eta0
    for j, b in enumerate(_BETA, start=1):
        xi = xi - b * jnp.sin(2 * j * xi0) * jnp.cosh(2 * j * eta0)
        eta = eta - b * jnp.cos(2 * j * xi0) * jnp.sinh(2 * j * eta0)
    lam = jnp.arctan2(jnp.sinh(eta), jnp.cos(xi))
    chi = jnp.arcsin(jnp.sin(xi) / jnp.cosh(eta))  # conformal latitude
    e2, e4, e6, e8 = _E2, _E2**2, _E2**3, _E2**4
    lat = (
        chi
        + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * jnp.sin(2 * chi)
        + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * jnp.sin(4 * chi)
        + (7 * e6 / 120 + 81 * e8 / 1120) * jnp.sin(6 * chi)
        + (4279 * e8 / 161280) * jnp.sin(8 * chi)
    )
    lon0 = -183.0 + 6.0 * zone
    return jnp.rad2deg(lat), lon0 + jnp.rad2deg(lam)


def project_gps_point_utm(lat, lon, height, ref_lat, ref_lon, ref_height):
    """UTM-plane local projection: the point's UTM coordinates minus the
    reference origin's, in the origin's zone (projection_mode = UTM,
    localization.ini:14 — dead config in the reference, live here)."""
    zone = utm_zone(ref_lon)
    e0, n0, _ = utm_forward(ref_lat, ref_lon, zone=zone)
    e1, n1, _ = utm_forward(lat, lon, zone=zone)
    return jnp.stack(
        jnp.broadcast_arrays(
            e1 - e0, n1 - n0, jnp.asarray(height, jnp.float64) - ref_height
        ),
        axis=-1,
    )


def unproject_local_point_utm(xyz, ref_lat, ref_lon, ref_height):
    """Inverse of :func:`project_gps_point_utm`."""
    xyz = jnp.asarray(xyz, jnp.float64)
    zone = utm_zone(ref_lon)
    e0, n0, _ = utm_forward(ref_lat, ref_lon, zone=zone)
    southern = float(ref_lat) < 0.0
    lat, lon = utm_reverse(xyz[..., 0] + e0, xyz[..., 1] + n0, zone, southern)
    return lat, lon, xyz[..., 2] + ref_height
