import jax.numpy as jnp
import numpy as np

from orb_slam_tpu.geometry import se3, sim3


def test_exp_log_roundtrip(rng):
    zeta = jnp.asarray(rng.normal(size=(32, 7)) * 0.4)
    s, R, t = sim3.exp(zeta)
    z2 = sim3.log(s, R, t)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(zeta), atol=1e-4)


def test_exp_zero_is_identity():
    s, R, t = sim3.exp(jnp.zeros((7,)))
    np.testing.assert_allclose(float(s), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-6)


def test_compose_inverse(rng):
    z = jnp.asarray(rng.normal(size=(16, 7)) * 0.3)
    s, R, t = sim3.exp(z)
    si, Ri, ti = sim3.inverse(s, R, t)
    se_, Re, te = sim3.compose(s, R, t, si, Ri, ti)
    np.testing.assert_allclose(np.asarray(se_), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Re), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-5)


def test_action_consistency(rng):
    """exp(zeta) applied to x == numerically integrating small steps."""
    zeta = jnp.asarray(rng.normal(size=(7,)) * 0.5)
    x = jnp.asarray(rng.normal(size=(8, 3)))
    s, R, t = sim3.exp(zeta)
    y = sim3.transform(s, R, t, x)
    # compose of halves equals full
    sh, Rh, th = sim3.exp(zeta * 0.5)
    s2, R2, t2 = sim3.compose(sh, Rh, th, sh, Rh, th)
    y2 = sim3.transform(s2, R2, t2, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-4)


def test_sigma_only():
    zeta = jnp.zeros((7,)).at[6].set(0.7)
    s, R, t = sim3.exp(zeta)
    np.testing.assert_allclose(float(s), np.exp(0.7), atol=1e-5)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_se3_embedding(rng):
    xi = jnp.asarray(rng.normal(size=(6,)) * 0.3)
    R, t = se3.exp(xi)
    zeta = jnp.concatenate([xi, jnp.zeros((1,))])
    s2, R2, t2 = sim3.exp(zeta)
    np.testing.assert_allclose(float(s2), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-5)
