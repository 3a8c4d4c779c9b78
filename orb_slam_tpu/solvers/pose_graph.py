"""Essential-graph optimization: Gauss-Newton over Sim(3) keyframe poses.

Replaces Optimizer::OptimizeEssentialGraph (src/Optimizer.cc:540-789) —
g2o's VertexSim3Expmap/EdgeSim3 graph becomes one batched residual
evaluation (vmapped Sim3 log of the relative-pose error) with autodiff
Jacobians, scatter-added into a dense 7K x 7K system (K keyframes is a few
hundred; the dense solve is trivial on the MXU; the reference's 20 LM
iterations with lambda_init=1e-16, i.e. effectively Gauss-Newton, are kept).

Edges (Optimizer.cc:566-729): spanning tree + existing loop edges + strong
covisibility (weight >= 100) + the new loop connections; all with identity
7x7 information.  Residual for edge (i, j) with measurement Shat_ij:
    r = log_sim3( Shat_ij^-1 o S_i o S_j^-1 )  in R^7
After convergence the caller re-maps landmarks via their reference keyframe
(correct_points) and converts Sim3 back to SE3 by folding scale into
translation (Optimizer.cc:731-789).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import se3, sim3

_EPS = 1e-9


def _safe_so3_log(R):
    tr = jnp.trace(R)
    w = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    wnorm = jnp.sqrt(jnp.sum(w * w) + _EPS)  # differentiable at 0
    theta = jnp.arctan2(wnorm, tr - 1.0)
    scale = jnp.where(wnorm < 1e-6, 0.5 + theta * theta / 12.0,
                      theta / jnp.maximum(2.0 * 0.5 * wnorm, _EPS))
    return scale * w


def _sim3_log(s, R, t):
    """Differentiation-safe Sim3 log (r7 = [ups, omega, sigma])."""
    sigma = jnp.log(jnp.maximum(s, 1e-12))
    omega = _safe_so3_log(R)
    # V matrix from the exp coefficients (sim3.exp with unit ups basis)
    zeta0 = jnp.concatenate([jnp.zeros(3), omega, sigma[None]])
    _, _, e1 = sim3.exp(zeta0.at[0].set(1.0))
    _, _, e2 = sim3.exp(zeta0.at[1].set(1.0))
    _, _, e3 = sim3.exp(zeta0.at[2].set(1.0))
    V = jnp.stack([e1, e2, e3], axis=-1)
    ups = jnp.linalg.solve(V + _EPS * jnp.eye(3), t)
    return jnp.concatenate([ups, omega, sigma[None]])


class Sim3Edges(NamedTuple):
    i: jnp.ndarray        # [E] int32
    j: jnp.ndarray        # [E] int32
    s_meas: jnp.ndarray   # [E]
    R_meas: jnp.ndarray   # [E, 3, 3]
    t_meas: jnp.ndarray   # [E, 3]
    valid: jnp.ndarray    # [E] bool


def _edge_residual(si, Ri, ti, sj, Rj, tj, sm, Rm, tm):
    """r = log( Shat_ij^-1 o S_i o S_j^-1 )."""
    sji, Rji, tji = sim3.inverse(sj, Rj, tj)
    s_ij, R_ij, t_ij = sim3.compose(si, Ri, ti, sji, Rji, tji)
    smi, Rmi, tmi = sim3.inverse(sm, Rm, tm)
    se_, Re_, te_ = sim3.compose(smi, Rmi, tmi, s_ij, R_ij, t_ij)
    return _sim3_log(se_, Re_, te_)


def _edge_residual_tangent(xi_i, xi_j, si, Ri, ti, sj, Rj, tj, sm, Rm, tm):
    """Residual after left-multiplicative tangent updates (for autodiff)."""
    dsi, dRi, dti = sim3.exp(xi_i)
    dsj, dRj, dtj = sim3.exp(xi_j)
    si2, Ri2, ti2 = sim3.compose(dsi, dRi, dti, si, Ri, ti)
    sj2, Rj2, tj2 = sim3.compose(dsj, dRj, dtj, sj, Rj, tj)
    return _edge_residual(si2, Ri2, ti2, sj2, Rj2, tj2, sm, Rm, tm)


@partial(jax.jit, static_argnames=("n_iters",))
def optimize_essential_graph(
    s: jnp.ndarray,       # [K]
    R: jnp.ndarray,       # [K, 3, 3]
    t: jnp.ndarray,       # [K, 3]
    fixed: jnp.ndarray,   # [K] bool (the loop keyframe, Optimizer.cc:576)
    edges: Sim3Edges,
    n_iters: int = 20,
):
    K = s.shape[0]

    def gn_step(carry, _):
        s, R, t = carry

        def per_edge(i, j, sm, Rm, tm):
            zi = jnp.zeros(7)
            zj = jnp.zeros(7)
            r = _edge_residual_tangent(zi, zj, s[i], R[i], t[i],
                                       s[j], R[j], t[j], sm, Rm, tm)
            Ji = jax.jacfwd(_edge_residual_tangent, argnums=0)(
                zi, zj, s[i], R[i], t[i], s[j], R[j], t[j], sm, Rm, tm)
            Jj = jax.jacfwd(_edge_residual_tangent, argnums=1)(
                zi, zj, s[i], R[i], t[i], s[j], R[j], t[j], sm, Rm, tm)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(
            edges.i, edges.j, edges.s_meas, edges.R_meas, edges.t_meas)
        w = edges.valid.astype(s.dtype)

        # assemble H [K,7,K,7], b [K,7]
        Hii = jnp.einsum("eab,e,eac->ebc", Ji, w, Ji)
        Hjj = jnp.einsum("eab,e,eac->ebc", Jj, w, Jj)
        Hij = jnp.einsum("eab,e,eac->ebc", Ji, w, Jj)
        bi = jnp.einsum("eab,e,ea->eb", Ji, w, r)
        bj = jnp.einsum("eab,e,ea->eb", Jj, w, r)

        H = jnp.zeros((K, 7, K, 7), s.dtype)
        H = H.at[edges.i, :, edges.i, :].add(Hii)
        H = H.at[edges.j, :, edges.j, :].add(Hjj)
        H = H.at[edges.i, :, edges.j, :].add(Hij)
        H = H.at[edges.j, :, edges.i, :].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((K, 7), s.dtype)
        b = b.at[edges.i].add(bi)
        b = b.at[edges.j].add(bj)

        free = (~fixed).astype(s.dtype)
        H = H * free[:, None, None, None] * free[None, None, :, None]
        H = H.at[jnp.arange(K), :, jnp.arange(K), :].add(
            jnp.einsum("k,ab->kab", 1.0 - free + 1e-6, jnp.eye(7, dtype=s.dtype)))
        b = b * free[:, None]

        dx = -jnp.linalg.solve(H.reshape(7 * K, 7 * K), b.reshape(-1))
        dx = dx.reshape(K, 7)
        s1, R1, t1 = jax.vmap(sim3.retract)(s, R, t, dx)
        ok = jnp.all(jnp.isfinite(dx))
        s = jnp.where(ok, s1, s)
        R = jnp.where(ok, R1, R)
        t = jnp.where(ok, t1, t)
        return (s, R, t), jnp.sum(r * r * w[:, None])

    (s, R, t), costs = jax.lax.scan(gn_step, (s, R, t), None, length=n_iters)
    return s, R, t, costs


def correct_points(
    mp_pos: jnp.ndarray,       # [P, 3] world positions
    ref_kf: jnp.ndarray,       # [P] reference keyframe per point
    s_old, R_old, t_old,       # pre-optimization keyframe Sim3 (world->cam)
    s_new, R_new, t_new,       # post-optimization
):
    """Re-map landmarks through their reference keyframe
    (Optimizer.cc:746-779): X' = S_new_ref^-1 ( S_old_ref (X) )."""
    ref = jnp.clip(ref_kf, 0, s_old.shape[0] - 1)
    so, Ro, to = s_old[ref], R_old[ref], t_old[ref]
    sn, Rn, tn = s_new[ref], R_new[ref], t_new[ref]
    Xc = sim3.transform(so, Ro, to, mp_pos)
    sni, Rni, tni = sim3.inverse(sn, Rn, tn)
    return sim3.transform(sni, Rni, tni, Xc)
