"""A/B bilinear descriptor sampling: 4 corner gathers (current) vs one
2x2xC patch gather (XLA gather clamps starts, weights remapped to patch
slots). bs=16 bf16 [120,160,128] map, 8192 pts.

Usage: python tools/bench_gather.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from posfeat_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from posfeat_tpu.ops.grid_sample import sample_feat_by_coord  # noqa: E402

B, H, W, C = 16, 120, 160, 128
N = 8192
N_SCAN = 8


def patch_sample_one(img, pts):
    """img [H,W,C]; pts [N,2] normalized -> [N,C] (zeros padding)."""
    Hh, Ww, _ = img.shape
    ix = ((pts[:, 0] + 1.0) * Ww - 1.0) / 2.0
    iy = ((pts[:, 1] + 1.0) * Hh - 1.0) / 2.0
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    # weights stay f32 until the final multiply (bf16 maps)
    wx1 = ix - x0
    wy1 = iy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    sx = jnp.clip(x0i, 0, Ww - 2)
    sy = jnp.clip(y0i, 0, Hh - 2)
    # slot weights: virtual corner c lands on patch slot j iff its index
    # equals s+j and it is in bounds (zeros padding) — out-of-window
    # corners are exactly the out-of-bounds ones
    def slot_w(c0, c1, w0, w1, s, size):
        in0 = (c0 >= 0) & (c0 < size)
        in1 = (c1 >= 0) & (c1 < size)
        w0 = jnp.where(in0, w0, 0.0)
        w1 = jnp.where(in1, w1, 0.0)
        j0 = jnp.where(c0 == s, w0, 0.0) + jnp.where(c1 == s, w1, 0.0)
        j1 = jnp.where(c0 == s + 1, w0, 0.0) + jnp.where(c1 == s + 1, w1, 0.0)
        return j0, j1

    wxa, wxb = slot_w(x0i, x0i + 1, wx0, wx1, sx, Ww)
    wya, wyb = slot_w(y0i, y0i + 1, wy0, wy1, sy, Hh)

    starts = jnp.stack([sy, sx], axis=-1)
    patch = jax.lax.gather(
        img,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        ),
        slice_sizes=(2, 2, img.shape[-1]),
    )  # [N, 2, 2, C]
    w = jnp.stack(
        [wya * wxa, wya * wxb, wyb * wxa, wyb * wxb], axis=-1
    )  # [N, 4] f32
    out = jnp.einsum(
        "npqc,npq->nc",
        patch,
        w.reshape(-1, 2, 2).astype(patch.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(patch.dtype)


def patch_sample(x, coord_n, norm=True):
    feat = jax.vmap(patch_sample_one)(x, coord_n)
    if norm:
        feat = feat / jnp.clip(
            jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12, None
        )
    return feat


def timeit(name, fn, *args):
    run = jax.jit(
        lambda m, c: jax.lax.scan(
            lambda acc, _: (acc + jnp.sum(fn(m, c).astype(jnp.float32)), None),
            0.0,
            None,
            length=N_SCAN,
        )[0]
    )
    float(run(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts) / (N_SCAN * B) * 1e3:.4f} ms/img", flush=True)


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    fmap = jax.random.normal(k1, (B, H, W, C), jnp.bfloat16)
    # include border + out-of-range points to exercise clamp semantics
    pts = jax.random.uniform(k2, (B, N, 2), jnp.float32, -1.15, 1.15)

    ref = sample_feat_by_coord(fmap, pts, norm=True)
    new = patch_sample(fmap, pts, norm=True)
    err = jnp.max(jnp.abs(ref.astype(jnp.float32) - new.astype(jnp.float32)))
    print("max abs diff:", float(err), flush=True)

    timeit("4-corner gathers", lambda m, c: sample_feat_by_coord(m, c, True), fmap, pts)
    timeit("2x2 patch gather", lambda m, c: patch_sample(m, c, True), fmap, pts)
