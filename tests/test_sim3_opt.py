import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.geometry import sim3
from orb_slam_tpu.solvers import sim3_opt
from synthetic import default_K


def make_pair(rng, n=100, noise=0.3, zeta_scale=0.2):
    K = default_K()
    X2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                   rng.uniform(3, 8, n)], 1).astype(np.float32)
    zeta = rng.normal(0, zeta_scale, 7).astype(np.float32)
    s, R, t = sim3.exp(jnp.asarray(zeta))
    X1 = np.asarray(sim3.transform(s, R, t, jnp.asarray(X2)))

    def proj(Xc):
        return np.stack([500 * Xc[:, 0] / Xc[:, 2] + 320,
                         500 * Xc[:, 1] / Xc[:, 2] + 240], 1)

    uv1 = proj(X1) + rng.normal(0, noise, (n, 2))
    uv2 = proj(X2) + rng.normal(0, noise, (n, 2))
    return dict(K=K, X1=jnp.asarray(X1), X2=jnp.asarray(X2),
                uv1=jnp.asarray(uv1.astype(np.float32)),
                uv2=jnp.asarray(uv2.astype(np.float32)),
                s=s, R=R, t=t)


def test_refines_perturbed_sim3(rng):
    p = make_pair(rng)
    n = p["X1"].shape[0]
    # perturb the ground-truth Sim3
    dz = jnp.asarray(rng.normal(0, 0.02, 7).astype(np.float32))
    s0, R0, t0 = sim3.retract(p["s"], p["R"], p["t"], dz)
    res = sim3_opt.optimize_sim3(
        s0, R0, t0, p["X1"], p["X2"], p["uv1"], p["uv2"],
        jnp.ones(n), jnp.ones(n), jnp.ones(n, bool), jnp.asarray(p["K"]))
    assert int(res.n_inliers) > 0.9 * n
    np.testing.assert_allclose(float(res.s), float(p["s"]), rtol=0.01)
    dR = np.asarray(res.R) @ np.asarray(p["R"]).T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.2, f"rot err {ang}"


def test_gates_outliers(rng):
    """Mild residual outliers (the gross ones are removed by the preceding
    Sim3 RANSAC, matching the reference call chain LoopClosing.cc:287-328)
    must be gated without dragging the estimate."""
    p = make_pair(rng, n=120)
    n = 120
    X2 = np.asarray(p["X2"]).copy()
    out = rng.choice(n, 18, replace=False)
    X2[out] += rng.uniform(0.08, 0.25, (18, 3)) * rng.choice([-1, 1], (18, 3))
    dz = jnp.asarray(rng.normal(0, 0.01, 7).astype(np.float32))
    s0, R0, t0 = sim3.retract(p["s"], p["R"], p["t"], dz)
    res = sim3_opt.optimize_sim3(
        s0, R0, t0, p["X1"], jnp.asarray(X2), p["uv1"], p["uv2"],
        jnp.ones(n), jnp.ones(n), jnp.ones(n, bool), jnp.asarray(p["K"]))
    inl = np.asarray(res.inliers)
    assert inl[out].mean() < 0.35
    assert inl[np.setdiff1d(np.arange(n), out)].mean() > 0.85
    np.testing.assert_allclose(float(res.s), float(p["s"]), rtol=0.02)


def test_fix_scale_mode(rng):
    p = make_pair(rng, zeta_scale=0.1)
    n = p["X1"].shape[0]
    res = sim3_opt.optimize_sim3(
        jnp.ones(()), p["R"], p["t"], p["X1"], p["X2"], p["uv1"], p["uv2"],
        jnp.ones(n), jnp.ones(n), jnp.ones(n, bool), jnp.asarray(p["K"]),
        fix_scale=True)
    np.testing.assert_allclose(float(res.s), 1.0, atol=1e-6)
