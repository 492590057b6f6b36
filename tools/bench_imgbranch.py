"""A/B the head's image branch at bs=16 bf16 480x640.

A (current): convimg 3x3 (3->64) full-res -> IN -> conv2img 3x3 (64->128)
   full-res  => z_img [B, 480, 640, 128]   (~46 GF/img, full-res layouts)
B (composite, phase out): 8x8 stride-4 patches of the raw image ->
   per-image folded kernel bmm [B, 19200, 192] @ [B, 192, 2048]
   => z_img phase [B, 120, 160, 2048]      (~15 GF/img, no full-res maps)
C: same as B but a shared (batch-invariant) 8x8/4 conv 3->2048
S: exact-IN-stats Gram pass: patches^T patches per image ([B, 27, 27])

Usage: python tools/bench_imgbranch.py [abcs]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from posfeat_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B, H, W = 16, 480, 640
h, w, k = H // 4, W // 4, 4
N_SCAN = 4
dt = jnp.bfloat16

keys = jax.random.split(jax.random.PRNGKey(0), 8)
imgs = jax.random.normal(keys[0], (N_SCAN, B, H, W, 3), dt)
k_img = jax.random.normal(keys[1], (3, 3, 3, 64), jnp.float32) * 0.1
k_2i = jax.random.normal(keys[2], (3, 3, 64, 128), jnp.float32) * 0.05
k_bmm = jax.random.normal(keys[3], (B, 8 * 8 * 3, 16 * 128), dt) * 0.05
k_c8 = jax.random.normal(keys[4], (8, 8, 3, 16 * 128), jnp.float32) * 0.05


def timeit(name, run, args):
    run = jax.jit(run)
    float(run(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts) / (N_SCAN * B) * 1e3:.3f} ms/img", flush=True)


def conv(x, kern, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x,
        kern.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


def instance_norm(x):
    xf = x.astype(jnp.float32)
    n = x.shape[1] * x.shape[2]
    s1 = jnp.sum(xf, axis=(1, 2), keepdims=True)
    s2 = jnp.sum(xf * xf, axis=(1, 2), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    return ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)


def run_a(ims):
    def step(c, im):
        y = instance_norm(conv(im, k_img))
        z = conv(y, k_2i)
        return c + jnp.sum(z[:, ::63, ::61].astype(jnp.float32)), None

    acc, _ = jax.lax.scan(step, 0.0, ims)
    return acc


def _patches(im):
    # [B, H, W, 3] -> [B, h, w, 8*8*3] patches at stride 4, pad 2
    # (8x8 window covering the composite 5x5 receptive field + phases)
    p = jax.lax.conv_general_dilated_patches(
        im,
        filter_shape=(8, 8),
        window_strides=(4, 4),
        padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return p


def run_b(ims):
    def step(c, im):
        p = _patches(im)  # [B, h, w, 192]
        z = jnp.einsum(
            "bhwp,bpf->bhwf",
            p,
            k_bmm,
            precision=jax.lax.Precision.DEFAULT,
        )
        return c + jnp.sum(z[:, ::31, ::37, ::129].astype(jnp.float32)), None

    acc, _ = jax.lax.scan(step, 0.0, ims)
    return acc


def run_c(ims):
    def step(c, im):
        z = jax.lax.conv_general_dilated(
            im,
            k_c8.astype(im.dtype),
            window_strides=(4, 4),
            padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.DEFAULT,
        )
        return c + jnp.sum(z[:, ::31, ::37, ::129].astype(jnp.float32)), None

    acc, _ = jax.lax.scan(step, 0.0, ims)
    return acc


def run_s(ims):
    def step(c, im):
        # 3x3 patch planes at stride 1 (27 ch) for the convimg Gram stats
        p = jax.lax.conv_general_dilated_patches(
            im,
            filter_shape=(3, 3),
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [B, H, W, 27]
        pf = p.reshape(B, H * W, 27)
        gram = jnp.einsum(
            "bna,bnc->bac", pf, pf, preferred_element_type=jnp.float32
        )
        ssum = jnp.sum(pf.astype(jnp.float32), axis=1)
        return c + jnp.sum(gram) + jnp.sum(ssum), None

    acc, _ = jax.lax.scan(step, 0.0, ims)
    return acc


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "abcs"
    if "a" in which:
        timeit("A convimg+IN+conv2img", run_a, (imgs,))
    if "b" in which:
        timeit("B patches+bmm(phase)", run_b, (imgs,))
    if "c" in which:
        timeit("C conv8x8s4(phase)", run_c, (imgs,))
    if "s" in which:
        timeit("S gram-stats", run_s, (imgs,))
