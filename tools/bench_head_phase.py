"""Micro-benchmark of the phase-head pieces on the TPU.

Times, per image at bs=16 bf16 480x640 (trunk 120x160x192):
  A: phase conv alone
  B: phase conv + ring fix (4 dynamic-update-slices)
  C: phase conv + space_to_phase(z_img) add
  D: full fused tail (conv + ring + z_img + IN + prelu)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from posfeat_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from posfeat_tpu.models.keypoint_det import (  # noqa: E402
    _fix_border_ring_phase,
    fused_upsample_conv3x3_phase,
    instance_norm,
    space_to_phase,
)

B, h, w, Cin, Cout = 16, 120, 160, 192, 128
H, W = 4 * h, 4 * w
N_SCAN = 4

k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
trunk = jax.random.normal(k1, (N_SCAN, B, h, w, Cin), jnp.bfloat16)
z_img = jax.random.normal(k2, (B, H, W, Cout), jnp.bfloat16)
kernel = jax.random.normal(k3, (3, 3, Cin, Cout), jnp.float32) * 0.05


def scan_bench(name, body):
    @jax.jit
    def run(ts):
        def step(c, t):
            out = body(t)
            return c + jnp.sum(out[:, ::31, ::37].astype(jnp.float32)), None

        acc, _ = jax.lax.scan(step, 0.0, ts)
        return acc

    float(run(trunk))  # compile+warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(trunk))
        times.append(time.perf_counter() - t0)
    dt = min(times) / (N_SCAN * B)
    print(f"{name}: {dt * 1e3:.3f} ms/img", flush=True)


def a(t):
    return fused_upsample_conv3x3_phase(t, kernel, 4)


def b(t):
    z = fused_upsample_conv3x3_phase(t, kernel, 4)
    return _fix_border_ring_phase(z, t, kernel, 4)


def c(t):
    z = fused_upsample_conv3x3_phase(t, kernel, 4)
    return z + space_to_phase(z_img, 4)


def d(t):
    z = fused_upsample_conv3x3_phase(t, kernel, 4)
    z = _fix_border_ring_phase(z, t, kernel, 4)
    z = z + space_to_phase(z_img, 4)
    x = instance_norm(z, axes=(1, 2, 3, 4))
    return jnp.where(x >= 0, x, 0.25 * x)


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "abcd"
    for nm, fn in [("A_conv", a), ("B_ring", b), ("C_zimg", c), ("D_tail", d)]:
        if nm[0].lower() in which:
            scan_bench(nm, fn)
