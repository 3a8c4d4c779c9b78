"""Distributed essential-graph optimization: keyframe-block-sharded edges
over the device mesh (VERDICT round-1 item 2; BASELINE config 5).

The Sim3 pose graph (Optimizer::OptimizeEssentialGraph,
src/Optimizer.cc:540-789) has K keyframe vertices and E edges (spanning
tree + loop + strong covisibility).  The per-iteration cost is dominated by
the E per-edge residual/Jacobian evaluations (7-dim Sim3 autodiff); the
reduced system H [7K, 7K] is small.  So the layout mirrors dist_ba:

  * poses are REPLICATED;
  * edges are SHARDED, grouped by the keyframe block of their `j` vertex so
    each device owns a contiguous slice of the graph (locality-preserving
    keyframe-block sharding — the covisibility structure makes most edges
    block-local, which is what will let city-scale maps shard);
  * each device assembles its partial (H, b); ONE psum per GN iteration
    yields the full system; the dense solve runs replicated.

Communication per iteration: one psum of [7K, 7K] + [7K] — independent of
the edge count.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..solvers.pose_graph import Sim3Edges, _edge_residual_tangent
from ..geometry import sim3


def partition_edges(edges: Sim3Edges, n_kf: int, n_shards: int) -> Sim3Edges:
    """Group edges into n_shards by the keyframe block of vertex j
    (contiguous blocks of ceil(K / n_shards) keyframes), padded to a uniform
    per-shard count.  Returns Sim3Edges with a leading shard axis."""
    kf_block = -(-n_kf // n_shards)
    j = np.asarray(edges.j)
    ev = np.asarray(edges.valid)
    owner = np.clip(j // kf_block, 0, n_shards - 1)

    per_shard = [np.where((owner == d) & ev)[0] for d in range(n_shards)]
    # power-of-two padding: a few shape buckets over a run, not one per call
    E_raw = max(1, max(len(sl) for sl in per_shard))
    E_shard = 1 << (E_raw - 1).bit_length()

    D = n_shards
    ii = np.zeros((D, E_shard), np.int32)
    jj = np.zeros((D, E_shard), np.int32)
    sm = np.ones((D, E_shard), np.float32)
    Rm = np.tile(np.eye(3, dtype=np.float32), (D, E_shard, 1, 1))
    tm = np.zeros((D, E_shard, 3), np.float32)
    vv = np.zeros((D, E_shard), bool)
    for d, sl in enumerate(per_shard):
        n = len(sl)
        ii[d, :n] = np.asarray(edges.i)[sl]
        jj[d, :n] = np.asarray(edges.j)[sl]
        sm[d, :n] = np.asarray(edges.s_meas)[sl]
        Rm[d, :n] = np.asarray(edges.R_meas)[sl]
        tm[d, :n] = np.asarray(edges.t_meas)[sl]
        vv[d, :n] = True
    return Sim3Edges(i=jnp.asarray(ii), j=jnp.asarray(jj),
                     s_meas=jnp.asarray(sm), R_meas=jnp.asarray(Rm),
                     t_meas=jnp.asarray(tm), valid=jnp.asarray(vv))


@lru_cache(maxsize=32)
def _sharded_pg_fn(mesh: Mesh, axis: str, n_iters: int):
    """Cached jitted builder (compiled executables cached per shape bucket)."""

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(),
                  P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
    )
    def run(s, R, t, fixed, ei, ej, es, eR, et, ev):
        K = s.shape[0]
        edges = Sim3Edges(i=ei[0], j=ej[0], s_meas=es[0], R_meas=eR[0],
                          t_meas=et[0], valid=ev[0])

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

            # ---- the collective: psum of the reduced pose system ----
            H = jax.lax.psum(H, axis)
            b = jax.lax.psum(b, axis)

            free = (~fixed).astype(s.dtype)
            H = H * free[:, None, None, None] * free[None, None, :, None]
            H = H.at[jnp.arange(K), :, jnp.arange(K), :].add(
                jnp.einsum("k,ab->kab", 1.0 - free + 1e-6,
                           jnp.eye(7, dtype=s.dtype)))
            b = b * free[:, None]

            dx = -jnp.linalg.solve(H.reshape(7 * K, 7 * K), b.reshape(-1))
            dx = dx.reshape(K, 7)
            s1, R1, t1 = jax.vmap(sim3.retract)(s, R, t, dx)
            ok = jnp.all(jnp.isfinite(dx))
            s = jnp.where(ok, s1, s)
            R = jnp.where(ok, R1, R)
            t = jnp.where(ok, t1, t)
            return (s, R, t), None

        (s, R, t), _ = jax.lax.scan(gn_step, (s, R, t), None, length=n_iters)
        return s, R, t

    return run


def optimize_essential_graph_sharded(
    mesh: Mesh,
    s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
    fixed: jnp.ndarray,
    sharded_edges: Sim3Edges,
    n_iters: int = 20,
    axis: str = "data",
):
    """Distributed twin of solvers.pose_graph.optimize_essential_graph:
    identical math, edge work sharded, one psum of (H, b) per iteration."""
    run = _sharded_pg_fn(mesh, axis, n_iters)
    e = sharded_edges
    args = (s, R, t, fixed, e.i, e.j, e.s_meas, e.R_meas, e.t_meas, e.valid)
    if jax.process_count() > 1:
        from .dist_ba import _put_global
        rep = _put_global(mesh, P(), (s, R, t, fixed))
        shd = _put_global(mesh, P(axis),
                          (e.i, e.j, e.s_meas, e.R_meas, e.t_meas, e.valid))
        args = (*rep, *shd)
    return run(*args)


def optimize_essential_graph_dist(
    s, R, t, fixed, edges: Sim3Edges, n_iters: int = 20,
    n_shards: int | None = None, mesh: Mesh | None = None,
    axis: str = "data",
):
    """Drop-in twin of pose_graph.optimize_essential_graph over a mesh.

    Small graphs auto-reduce the shard count: sharding 500 edges 8 ways is
    pure collective overhead (every GN iteration pays the psum latency for
    ~60 edges of work per device — measured 100x SLOWDOWN on the virtual
    mesh).  Keyframe-block sharding pays off when per-shard edge counts
    amortize the collective, i.e. city-scale essential graphs."""
    from .dist_ba import make_mesh

    min_edges_per_shard = 512
    E = int(np.asarray(edges.valid).sum()) if hasattr(edges, "valid") \
        else edges.i.shape[0]
    if mesh is None:
        want = n_shards or len(jax.devices())
        want = max(1, min(want, E // min_edges_per_shard or 1))
        mesh = make_mesh(want, axis=axis)
    else:
        axis = mesh.axis_names[0]
    D = mesh.devices.size
    sharded = partition_edges(edges, s.shape[0], D)
    s1, R1, t1 = optimize_essential_graph_sharded(
        mesh, s, R, t, fixed, sharded, n_iters=n_iters, axis=axis)
    return s1, R1, t1, None
