"""Unit tests for elimaloc_tpu.ops.lie against identities and the NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elimaloc_tpu.ops import lie

import ref_numpy as ref

RNG = np.random.default_rng(0)


def rand_rotvecs(n, scale=2.5):
    return RNG.normal(size=(n, 3)) * scale


class TestSo3:
    def test_exp_matches_oracle(self):
        for v in rand_rotvecs(20):
            np.testing.assert_allclose(
                np.asarray(lie.so3_exp(jnp.asarray(v))), ref.so3_exp(v), atol=1e-12
            )

    def test_exp_small_angle_identity(self):
        v = np.array([1e-7, -2e-7, 5e-8])
        np.testing.assert_allclose(np.asarray(lie.so3_exp(jnp.asarray(v))), np.eye(3))

    def test_log_inverse_of_exp(self):
        for v in rand_rotvecs(20, scale=1.0):
            back = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(v))))
            np.testing.assert_allclose(back, v, atol=1e-9)

    def test_log_matches_oracle(self):
        for v in rand_rotvecs(10):
            R = ref.so3_exp(v)
            np.testing.assert_allclose(
                np.asarray(lie.so3_log(jnp.asarray(R))), ref.so3_log(R), atol=1e-12
            )

    def test_rotation_orthonormal(self):
        for v in rand_rotvecs(10):
            R = np.asarray(lie.so3_exp(jnp.asarray(v)))
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
            assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-12)

    def test_right_jacobian_matches_reference_formula(self):
        for v in rand_rotvecs(10, scale=1.0):
            dt = 0.013
            got = np.asarray(lie.right_jacobian_d_rot_d_gyro(jnp.asarray(v), dt))
            np.testing.assert_allclose(
                got, ref.partial_derivative_rot_wrt_gyro(v, dt), atol=1e-12
            )

    def test_right_jacobian_zero_for_small(self):
        got = np.asarray(
            lie.right_jacobian_d_rot_d_gyro(jnp.asarray([1e-9, 0.0, 0.0]), 0.01)
        )
        np.testing.assert_array_equal(got, np.zeros((3, 3)))

    def test_batched_exp(self):
        vs = rand_rotvecs(7)
        batched = np.asarray(lie.so3_exp(jnp.asarray(vs)))
        for i, v in enumerate(vs):
            np.testing.assert_allclose(batched[i], ref.so3_exp(v), atol=1e-12)


class TestEuler:
    def test_roundtrip(self):
        for _ in range(20):
            rpy = RNG.uniform(-1.4, 1.4, 3)
            R = np.asarray(lie.euler_to_rot(jnp.asarray(rpy)))
            np.testing.assert_allclose(R, ref.euler_to_rot(rpy), atol=1e-12)
            back = np.asarray(lie.rot_to_euler(jnp.asarray(R)))
            np.testing.assert_allclose(back, rpy, atol=1e-9)

    def test_gimbal_lock_branch_matches_oracle(self):
        rpy = np.array([0.3, np.pi / 2 - 1e-5, -0.7])
        R = ref.euler_to_rot(rpy)
        np.testing.assert_allclose(
            np.asarray(lie.rot_to_euler(jnp.asarray(R))), ref.rot_to_euler(R), atol=1e-9
        )

    def test_angle_wrap(self):
        assert float(lie.norm_angle_rad(3 * np.pi)) == pytest.approx(np.pi)
        assert float(lie.norm_angle_rad(-3 * np.pi + 0.1)) == pytest.approx(
            -np.pi + 0.1
        )
        assert float(lie.norm_angle_deg(361.0)) == pytest.approx(1.0)
        assert float(lie.angle_diff_deg(350.0, 10.0)) == pytest.approx(20.0)
        assert float(lie.angle_diff_rad(-3.0, 3.0)) == pytest.approx(
            6.0 - 2 * np.pi
        )


class TestQuat:
    def test_mul_matches_matrix_compose(self):
        for _ in range(10):
            v1, v2 = RNG.normal(size=3), RNG.normal(size=3)
            q1 = lie.rot_to_quat(jnp.asarray(ref.so3_exp(v1)))
            q2 = lie.rot_to_quat(jnp.asarray(ref.so3_exp(v2)))
            R = np.asarray(lie.quat_to_rot(lie.quat_mul(q1, q2)))
            np.testing.assert_allclose(R, ref.so3_exp(v1) @ ref.so3_exp(v2), atol=1e-10)

    def test_rot_quat_roundtrip(self):
        for v in rand_rotvecs(20):
            R = ref.so3_exp(v)
            R2 = np.asarray(lie.quat_to_rot(lie.rot_to_quat(jnp.asarray(R))))
            np.testing.assert_allclose(R2, R, atol=1e-10)

    def test_rot_to_quat_near_pi(self):
        # Exercise all four construction branches.
        for axis in (np.eye(3)):
            R = ref.so3_exp(axis * (np.pi - 1e-7))
            R2 = np.asarray(lie.quat_to_rot(lie.rot_to_quat(jnp.asarray(R))))
            np.testing.assert_allclose(R2, R, atol=1e-9)

    def test_quat_from_axis_angle_zero_safe(self):
        q = np.asarray(lie.quat_from_axis_angle(jnp.zeros(3)))
        np.testing.assert_array_equal(q, [1.0, 0.0, 0.0, 0.0])

    def test_quat_rotate(self):
        v = RNG.normal(size=3)
        rv = RNG.normal(size=3)
        q = lie.rot_to_quat(jnp.asarray(ref.so3_exp(rv)))
        np.testing.assert_allclose(
            np.asarray(lie.quat_rotate(q, jnp.asarray(v))), ref.so3_exp(rv) @ v,
            atol=1e-10,
        )

    def test_euler_residual_matches_oracle(self):
        for _ in range(10):
            R1, R2 = ref.so3_exp(RNG.normal(size=3)), ref.so3_exp(RNG.normal(size=3))
            q1 = lie.rot_to_quat(jnp.asarray(R1))
            q2 = lie.rot_to_quat(jnp.asarray(R2))
            np.testing.assert_allclose(
                np.asarray(lie.euler_residual_from_quats(q1, q2)),
                ref.euler_residual(R1, R2),
                atol=1e-9,
            )


class TestTransforms:
    def test_inverse(self):
        R = ref.so3_exp(RNG.normal(size=3))
        t = RNG.normal(size=3)
        T = np.asarray(lie.make_transform(jnp.asarray(R), jnp.asarray(t)))
        Tinv = np.asarray(lie.transform_inverse(jnp.asarray(T)))
        np.testing.assert_allclose(T @ Tinv, np.eye(4), atol=1e-12)

    def test_transform_points(self):
        R = ref.so3_exp(RNG.normal(size=3))
        t = RNG.normal(size=3)
        pts = RNG.normal(size=(5, 3))
        T = lie.make_transform(jnp.asarray(R), jnp.asarray(t))
        got = np.asarray(lie.transform_points(T, jnp.asarray(pts)))
        np.testing.assert_allclose(got, pts @ R.T + t, atol=1e-12)

    def test_interpolate_identity_at_zero_dt_trans(self):
        T = lie.make_transform(jnp.asarray(ref.so3_exp([0.1, 0, 0])), jnp.ones(3))
        out = np.asarray(lie.interpolate_tf_with_time(T, 0.5, 0.0))
        np.testing.assert_allclose(out, np.eye(4))

    def test_interpolate_half(self):
        rv = np.array([0.0, 0.0, 0.4])
        T = lie.make_transform(jnp.asarray(ref.so3_exp(rv)), jnp.asarray([2.0, 0, 0]))
        out = np.asarray(lie.interpolate_tf_with_time(T, 0.05, 0.1))
        np.testing.assert_allclose(out[:3, :3], ref.so3_exp(rv * 0.5), atol=1e-10)
        np.testing.assert_allclose(out[:3, 3], [1.0, 0, 0], atol=1e-12)


def test_all_jit_compatible():
    fns = [
        lambda: lie.so3_exp(jnp.ones(3)),
        lambda: lie.so3_log(jnp.eye(3)),
        lambda: lie.rot_to_euler(jnp.eye(3)),
        lambda: lie.rot_to_quat(jnp.eye(3)),
        lambda: lie.right_jacobian_d_rot_d_gyro(jnp.ones(3), 0.01),
    ]
    for f in fns:
        jax.jit(f)()
