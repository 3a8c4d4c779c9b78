import jax.numpy as jnp
import numpy as np

from orb_slam_tpu.geometry import se3


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(se3.from_quaternion(jnp.asarray(q, jnp.float64)))


def test_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(64, 6)) * 0.5)
    R, t = se3.exp(xi)
    xi2 = se3.log(R, t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-5)


def test_exp_small_angle(rng):
    xi = jnp.asarray(rng.normal(size=(8, 6)) * 1e-8)
    R, t = se3.exp(xi)
    np.testing.assert_allclose(np.asarray(R), np.tile(np.eye(3), (8, 1, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(xi[:, :3]), atol=1e-6)


def test_compose_inverse(rng):
    xi = jnp.asarray(rng.normal(size=(16, 6)) * 0.3)
    R, t = se3.exp(xi)
    Ri, ti = se3.inverse(R, t)
    Re, te = se3.compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Re), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-5)


def test_transform_matches_matrix(rng):
    xi = jnp.asarray(rng.normal(size=(6,)) * 0.3)
    R, t = se3.exp(xi)
    x = jnp.asarray(rng.normal(size=(32, 3)))
    y = se3.transform(R, t, x)
    T = se3.to_matrix(R, t)
    xh = jnp.concatenate([x, jnp.ones((32, 1))], axis=-1)
    y2 = (T @ xh.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)


def test_quaternion_roundtrip(rng):
    Rs = random_rotations(rng, 64)
    q = se3.to_quaternion(jnp.asarray(Rs))
    R2 = se3.from_quaternion(q)
    np.testing.assert_allclose(np.asarray(R2), Rs, atol=1e-5)


def test_rotation_orthonormal(rng):
    xi = jnp.asarray(rng.normal(size=(32, 6)))
    R, _ = se3.exp(xi)
    RtR = jnp.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(np.asarray(RtR), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    det = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_retract_is_left_multiplication(rng):
    xi = jnp.asarray(rng.normal(size=(6,)) * 0.2)
    R, t = se3.exp(xi)
    dxi = jnp.asarray(rng.normal(size=(6,)) * 0.05)
    Ru, tu = se3.retract(R, t, dxi)
    dR, dt = se3.exp(dxi)
    Re, te = se3.compose(dR, dt, R, t)
    np.testing.assert_allclose(np.asarray(Ru), np.asarray(Re), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tu), np.asarray(te), atol=1e-6)
