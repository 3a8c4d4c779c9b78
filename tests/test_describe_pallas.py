"""The fused Pallas IC-angle+BRIEF kernel must reproduce the XLA gather
path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_tpu.ops import brief, patches
from orb_slam_tpu.ops.describe_pallas import orient_describe


def xla_reference(stack, blurred, kp_xy, dims):
    """The extractor's gather-based formulation (extractor_batched.py)."""
    L, H0, W0 = stack.shape
    cap = kp_xy.shape[1]
    lh = dims[:, 0]
    lw = dims[:, 1]
    flat_xy = kp_xy.reshape(L * cap, 2)
    lvl_of = jnp.repeat(jnp.arange(L), cap)
    r = patches.HALF_PATCH
    cx = jnp.round(flat_xy[:, 0]).astype(jnp.int32)
    cy = jnp.round(flat_xy[:, 1]).astype(jnp.int32)
    d = jnp.arange(-r, r + 1)
    ys = jnp.clip(cy[:, None] + d[None, :], 0, lh[lvl_of, None] - 1)
    xs = jnp.clip(cx[:, None] + d[None, :], 0, lw[lvl_of, None] - 1)
    flat = (lvl_of[:, None, None] * H0 + ys[:, :, None]) * W0 + xs[:, None, :]
    pat = jnp.take(stack.reshape(-1), flat, mode="clip")
    pm = pat * jnp.asarray(patches._IC_MASK)
    dx = jnp.asarray(patches._IC_DX)
    m10 = jnp.sum(pm * dx[None, None, :], axis=(1, 2))
    m01 = jnp.sum(pm * dx[None, :, None], axis=(1, 2))
    angle = jnp.arctan2(m01, m10)
    ca = jnp.cos(angle)[:, None]
    sa = jnp.sin(angle)[:, None]
    px = jnp.asarray(brief._POINTS[:, 0])[None, :]
    py = jnp.asarray(brief._POINTS[:, 1])[None, :]
    sx = jnp.round(px * ca - py * sa + flat_xy[:, 0:1])
    sy = jnp.round(px * sa + py * ca + flat_xy[:, 1:2])
    xi = jnp.clip(sx.astype(jnp.int32), 0, lw[lvl_of, None] - 1)
    yi = jnp.clip(sy.astype(jnp.int32), 0, lh[lvl_of, None] - 1)
    samples = jnp.take(blurred.reshape(-1),
                       (lvl_of[:, None] * H0 + yi) * W0 + xi, mode="clip")
    bits = (samples[:, 0::2] < samples[:, 1::2]).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    desc = jnp.sum(bits.reshape(-1, 8, 32) * weights, axis=-1, dtype=jnp.uint32)
    return m01, m10, desc


def make_case(rng, L=3, H0=96, W0=384, cap=17):
    dims = np.stack([np.array([96, 80, 67][:L]),
                     np.array([384, 320, 267][:L])], 1).astype(np.int32)
    stack = np.zeros((L, H0, W0), np.float32)
    blurred = np.zeros((L, H0, W0), np.float32)
    for li in range(L):
        h, w = dims[li]
        # integer-valued pixels: the production pyramid/blur are quantized
        # to ints (reference 8-bit images), which the kernel's bf16
        # selection matmuls rely on for exactness
        stack[li, :h, :w] = rng.integers(0, 256, (h, w))
        blurred[li, :h, :w] = rng.integers(0, 256, (h, w))
    xy = np.zeros((L, cap, 2), np.float32)
    for li in range(L):
        h, w = dims[li]
        xy[li, :, 0] = rng.uniform(16, w - 17, cap)
        xy[li, :, 1] = rng.uniform(16, h - 17, cap)
    return (jnp.asarray(stack), jnp.asarray(blurred), jnp.asarray(xy),
            jnp.asarray(dims))


def test_kernel_matches_xla_path(rng):
    stack, blurred, xy, dims = make_case(rng)
    m01p, m10p, descp = orient_describe(stack, blurred, xy, dims,
                                        interpret=True)
    m01x, m10x, descx = xla_reference(stack, blurred, xy, dims)
    L, cap = m01p.shape
    np.testing.assert_allclose(np.asarray(m01p).ravel(), np.asarray(m01x),
                               rtol=3e-4, atol=2.0)
    np.testing.assert_allclose(np.asarray(m10p).ravel(), np.asarray(m10x),
                               rtol=3e-4, atol=2.0)
    dp = np.asarray(descp).reshape(L * cap, 8)
    dx_ = np.asarray(descx)
    for i in range(L * cap):
        ham = sum(bin(int(v)).count("1")
                  for v in np.bitwise_xor(dp[i], dx_[i]))
        # cos/sin computed by ratio vs transcendental differ by ulps; a
        # sample landing exactly on a .5 rounding boundary may flip a bit
        assert ham <= 2, (i, ham)


def test_kernel_edge_keypoints(rng):
    """Keypoints at the minimum border margin must stay in-bounds."""
    stack, blurred, xy, dims = make_case(rng, cap=8)
    xy = np.array(xy)
    for li in range(xy.shape[0]):
        h, w = np.asarray(dims)[li]
        xy[li, 0] = (16.0, 16.0)
        xy[li, 1] = (w - 17.0, h - 17.0)
        xy[li, 2] = (16.0, h - 17.0)
        xy[li, 3] = (w - 17.0, 16.0)
    xy = jnp.asarray(xy)
    m01p, m10p, descp = orient_describe(stack, blurred, xy, dims,
                                        interpret=True)
    m01x, m10x, descx = xla_reference(stack, blurred, xy, dims)
    np.testing.assert_allclose(np.asarray(m01p).ravel(), np.asarray(m01x),
                               rtol=3e-4, atol=2.0)
    dp = np.asarray(descp).reshape(-1, 8)
    dx_ = np.asarray(descx)
    bad = sum(1 for i in range(dp.shape[0])
              if sum(bin(int(v)).count("1")
                     for v in np.bitwise_xor(dp[i], dx_[i])) > 2)
    assert bad == 0, bad


def test_kernel_counts_prefix(rng):
    """The counts fast path (extractor_batched passes the per-level valid
    prefix length) must (a) match the full-cap run on slots [0, counts)
    and (b) leave the skipped slots zero-initialized — callers with a
    non-prefix valid mask would otherwise silently lose keypoints
    (advisor r4)."""
    stack, blurred, xy, dims = make_case(rng, cap=17)
    counts = jnp.asarray([5, 17, 0], jnp.int32)
    m01c, m10c, descc = orient_describe(stack, blurred, xy, dims,
                                        counts=counts, interpret=True)
    m01f, m10f, descf = orient_describe(stack, blurred, xy, dims,
                                        interpret=True)
    for li, c in enumerate(np.asarray(counts)):
        np.testing.assert_array_equal(np.asarray(m01c)[li, :c],
                                      np.asarray(m01f)[li, :c])
        np.testing.assert_array_equal(np.asarray(m10c)[li, :c],
                                      np.asarray(m10f)[li, :c])
        np.testing.assert_array_equal(np.asarray(descc)[li, :c],
                                      np.asarray(descf)[li, :c])
        # skipped slots: exact zeros, not stale/garbage values
        np.testing.assert_array_equal(np.asarray(m01c)[li, c:], 0.0)
        np.testing.assert_array_equal(np.asarray(m10c)[li, c:], 0.0)
        np.testing.assert_array_equal(np.asarray(descc)[li, c:], 0)
