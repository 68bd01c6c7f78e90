"""Frame conversions: global/local twists and IMU extrinsic compensation.

Re-implements the free functions of the reference's shared header (reference:
src/app/localization/localization_interface/localization_functions.hpp:112-181,
491-581) as vectorizable jnp ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import lie
from .lie import euler_to_rot


def global_to_local_velocity(v_global, rpy):
    """Rotate a global-frame vector into the body frame (R(rpy)^T v).

    Reference: ConvertGlobalToLocalVelocity (hpp:491-513). Used for velocity,
    acceleration, and (as the reference does, somewhat loosely) covariance
    diagonals.
    """
    rot = euler_to_rot(rpy)
    return jnp.einsum("...ji,...j->...i", rot, jnp.asarray(v_global), precision=lie._HI)


def local_to_global_velocity(v_local, rpy):
    """Body-frame vector -> global frame (R(rpy) v)."""
    rot = euler_to_rot(rpy)
    return jnp.einsum("...ij,...j->...i", rot, jnp.asarray(v_local), precision=lie._HI)


def local_to_global_angular_rate(rate_local, rpy):
    """Body angular rates -> Euler-angle rates.

    Reference: ConvertLocalToGlobalAngularRate (hpp:521-543). Note the
    reference's matrix (kept verbatim for behavioral parity):
        [1      0        -sin(p)      ]
        [0   cos(r)   sin(r) cos(p)   ]
        [0  -sin(r)   cos(r) cos(p)   ]
    """
    rate_local = jnp.asarray(rate_local)
    r, p = rpy[..., 0], rpy[..., 1]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    lr, lp, ly = rate_local[..., 0], rate_local[..., 1], rate_local[..., 2]
    return jnp.stack(
        [
            lr - ly * sp,
            lp * cr + ly * sr * cp,
            -lp * sr + ly * cr * cp,
        ],
        axis=-1,
    )


def global_to_local_angular_rate(rate_global, rpy):
    """Euler-angle rates -> body angular rates (inverse of the above).

    Reference: ConvertGlobalToLocalAngularRate (hpp:551-581), kept verbatim
    including its sign conventions.
    """
    rate_global = jnp.asarray(rate_global)
    r, p = rpy[..., 0], rpy[..., 1]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp = jnp.cos(p)
    safe_cp = jnp.where(jnp.abs(cp * cr) < 1e-6, jnp.ones_like(cp), cp)
    gr, gp, gy = rate_global[..., 0], rate_global[..., 1], rate_global[..., 2]
    local_roll = gr + gp * (sr / safe_cp) + gy * (-cr / safe_cp)
    local_pitch = gp * cr + gy * sr
    local_yaw = gp * (-sr / safe_cp) + gy * (cr / safe_cp)
    return jnp.stack([local_roll, local_pitch, local_yaw], axis=-1)


def imu_to_ego(acc_imu, gyro_imu, rot_calib, trans_calib=None):
    """IMU sample -> ego frame, optionally with the centrifugal term.

    Reference: ImuStructConverter overloads (hpp:125-181). ``rot_calib`` is the
    ego->imu rotation applied directly to both acc and gyro (as the reference
    does); when ``trans_calib`` (ego->imu lever arm, ego coords) is given the
    centrifugal acceleration  w x (w x (-r))  is added.
    """
    acc = jnp.einsum("...ij,...j->...i", rot_calib, jnp.asarray(acc_imu), precision=lie._HI)
    gyro = jnp.einsum("...ij,...j->...i", rot_calib, jnp.asarray(gyro_imu), precision=lie._HI)
    if trans_calib is not None:
        r = jnp.asarray(trans_calib)
        centrifugal = jnp.cross(gyro, jnp.cross(gyro, -r))
        acc = acc + centrifugal
    return acc, gyro
