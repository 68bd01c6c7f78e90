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
