"""Microbench: image-branch IN statistics (sum, sumsq over full-res
64-ch map) strategies under a bf16 map.

Trace (2026-08-19, all-gates bs16): the two MXU contractions cost
0.37 ms/img combined (fusion.915 + convert_reduce_fusion.7). The map
is 480x640x64 bf16 = 39 MB/img; each extra full read is ~0.05 ms.

  mxu2    current: ones-contraction (s1) + gram diag (s2), 2 reads
  fused2  jnp.sum twice with on-the-fly f32 accumulation — XLA should
          emit ONE multi-output input fusion (1 read, VPU)
  gram65  one contraction on a 65th-constant-channel augmented conv
          output: s1 and s2 from a single [B,65,65] gram (1 read, MXU)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from posfeat_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

B, H, W, C = 16, 480, 640, 64
N_SCAN = 32


def mxu2(y):
    ones_i = jnp.ones(y.shape[1:3], y.dtype)
    s1 = jax.lax.dot_general(
        y, ones_i,
        dimension_numbers=(((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gram = jax.lax.dot_general(
        y, y,
        dimension_numbers=(((1, 2), (1, 2)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s2 = jnp.einsum("bcc->bc", gram)
    return s1, s2


def fused2(y):
    y32 = y.astype(jnp.float32)
    s1 = jnp.sum(y32, axis=(1, 2))
    s2 = jnp.sum(y32 * y32, axis=(1, 2))
    return s1, s2


def gram65(y):
    # emulate the augmented-channel trick: y65 = concat(y, ones) comes
    # free from the conv (65th zero filter + bias 1); here we pay the
    # concat so the measurement is an upper bound on the real cost
    ones = jnp.ones(y.shape[:3] + (1,), y.dtype)
    y65 = jnp.concatenate([y, ones], axis=-1)
    gram = jax.lax.dot_general(
        y65, y65,
        dimension_numbers=(((1, 2), (1, 2)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, 65, 65]
    s1 = gram[:, :C, C]
    s2 = jnp.einsum("bcc->bc", gram)[:, :C]
    return s1, s2


def bench(name, fn):
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16
    )

    @jax.jit
    def run(y):
        def body(carry, i):
            # roll defeats loop-invariant hoisting without perturbing
            # the values (a carry-feedback perturbation measured
            # non-finite on the TPU relay)
            s1, s2 = fn(jnp.roll(y, i, axis=1))
            return carry + jnp.sum(s1) * 1e-9 + jnp.sum(s2) * 1e-9, None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(N_SCAN))
        return acc

    v = float(run(y))
    assert np.isfinite(v), name
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(y))
        times.append(time.perf_counter() - t0)
    ms_per_img = min(times) / (N_SCAN * B) * 1e3
    print(f"{name}: {ms_per_img:.4f} ms/img", flush=True)


if __name__ == "__main__":
    for name, fn in [("mxu2", mxu2), ("fused2", fused2), ("gram65", gram65)]:
        try:
            bench(name, fn)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
