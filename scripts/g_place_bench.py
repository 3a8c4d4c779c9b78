"""Measure G-placement formulations for the Schur half-matrix.

The r4 wall (BA_CITY_r04.json, VERDICT r4 missing #3): `_half_schur`
places per-edge [6,3] blocks into the dense G [6K,3P] with a two-index
block scatter; XLA materializes the scatter update as a ~24 GB buffer at
512 KF x 24.5k pts, so BOTH single-chip solvers fail to compile at city
scale, and at smaller sizes the scatter (not the MXU matmuls) dominates
the LM iteration (13-130x off speed-of-light).

Candidates (edges in cam-major GRID order, o = k*N + s, which is how
`_build_ba_problem` already lays them out — obs is a [K, N] table):
  scatter2      zeros((K,P,6,3)).at[cam,pt].add(blk)      (current)
  vmap_scatter  vmap over K of single-index scatter into [P,6,3]
  onehot_scan   scan over K: [18,N] @ [N,P] one-hot matmul (MXU placement)
  onehot_chunk  same, lax.map over chunks of 8 cameras

Prints one JSON line per (K, P, variant): ms per placement + GG^T, and
max |G - reference| at the smallest size.
"""
import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def make_problem(rng, K, P, N):
    """Grid edges: camera k observes N random distinct-ish points."""
    pt = rng.integers(0, P, (K, N)).astype(np.int32)
    valid = rng.uniform(size=(K, N)) < 0.9
    blk = rng.normal(size=(K, N, 6, 3)).astype(np.float32)
    blk[~valid] = 0.0
    return jnp.asarray(pt), jnp.asarray(blk)


def scatter2(pt, blk, P):
    K, N = pt.shape
    cam = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None], (K, N))
    G4 = jnp.zeros((K, P, 6, 3), blk.dtype).at[
        cam.reshape(-1), pt.reshape(-1)].add(blk.reshape(-1, 6, 3))
    return G4.transpose(0, 2, 1, 3).reshape(K * 6, P * 3)


def vmap_scatter(pt, blk, P):
    K, N = pt.shape
    G4 = jax.vmap(
        lambda p, b: jnp.zeros((P, 6, 3), blk.dtype).at[p].add(b)
    )(pt, blk)                                        # [K, P, 6, 3]
    return G4.transpose(0, 2, 1, 3).reshape(K * 6, P * 3)


def onehot_scan(pt, blk, P):
    K, N = pt.shape

    def step(_, inp):
        p, b = inp                                    # [N], [N,6,3]
        oh = (p[:, None] == jnp.arange(P, dtype=p.dtype)[None, :]
              ).astype(b.dtype)                       # [N, P]
        # HIGHEST: TPU default matmul precision is bf16 — placement must
        # carry full f32 payloads (measured 1.7e-2 error at default)
        slab = jnp.einsum("sac,sp->apc", b, oh,
                          precision=jax.lax.Precision.HIGHEST)
        return None, slab.reshape(6, 3 * P)

    _, G = lax.scan(step, None, (pt, blk))            # [K, 6, 3P]
    return G.reshape(K * 6, P * 3)


def onehot_chunk(pt, blk, P, chunk=8):
    K, N = pt.shape
    Kc = K // chunk

    def step(inp):
        p, b = inp                                    # [c,N], [c,N,6,3]
        oh = (p[:, :, None] == jnp.arange(P, dtype=p.dtype)[None, None, :]
              ).astype(b.dtype)                       # [c, N, P]
        return jnp.einsum("ksac,ksp->kapc", b, oh,
                          precision=jax.lax.Precision.HIGHEST)

    G = lax.map(step, (pt.reshape(Kc, chunk, N),
                       blk.reshape(Kc, chunk, N, 6, 3)))
    return G.reshape(K * 6, P * 3)


VARIANTS = {"scatter2": scatter2, "vmap_scatter": vmap_scatter,
            "onehot_scan": onehot_scan, "onehot_chunk": onehot_chunk}


def timed(fn, *args, iters=5):
    fn_j = jax.jit(fn)
    try:
        out = fn_j(*args)
        out.block_until_ready()
    except Exception as e:
        return None, f"{type(e).__name__}: {str(e)[:200]}"
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3, None


def timed_with_gram(fn, pt, blk, P, iters=5):
    """Placement + G G^T (the real consumer) so fusion effects count."""
    def full(pt, blk):
        G = fn(pt, blk, P)
        return G @ G.T
    return timed(full, pt, blk, iters=iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0].device_kind), "cases": []}

    # correctness at a small size
    pt, blk = make_problem(rng, 16, 1024, 256)
    ref = np.asarray(jax.jit(lambda p, b: scatter2(p, b, 1024))(pt, blk))
    for name, fn in VARIANTS.items():
        got = np.asarray(jax.jit(lambda p, b: fn(p, b, 1024))(pt, blk))
        err = float(np.abs(got - ref).max())
        print(f"# {name}: max err {err:.2e}")
        assert err < 1e-4, (name, err)

    N = 1024
    for (K, P) in ((64, 8192), (256, 16384), (512, 24576)):
        pt, blk = make_problem(rng, K, P, N)
        for name, fn in VARIANTS.items():
            ms, err = timed(lambda p, b: fn(p, b, P), pt, blk,
                            iters=args.iters)
            ms_g, err_g = timed_with_gram(fn, pt, blk, P, iters=args.iters)
            row = {"K": K, "P": P, "variant": name,
                   "place_ms": None if ms is None else round(ms, 2),
                   "place_plus_gram_ms":
                       None if ms_g is None else round(ms_g, 2),
                   "error": err or err_g}
            results["cases"].append(row)
            print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
