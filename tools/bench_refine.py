"""Microbench: 3x3 refinement-neighborhood fetch strategies on TPU.

The all-gates trace (2026-08-19) shows the detector's 9-neighbor gather
(`take_along_axis` of [B, k*9] elements from the flat [B, H*W] score
map) costs 0.75 ms/img at B=16, k=8192 — the single largest non-conv
op in the extraction program. Candidates:

  elem9   current: one take_along_axis of k*9 element indices
  win33   lax.gather of k (3,3) window slices (contiguous rows)
  rows3   lax.gather of k*3 (1,3) row slices
  pool    dense avg/max-pool maps + 3-value per-point gather
          (the POSFEAT_REFINE=pool formulation's fetch pattern)

Each candidate computes the same refined (fx, fy, smax) so XLA cannot
DCE the fetch. Timed like bench.py: N_SCAN reps inside one jitted scan,
fetch one dependent scalar.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from posfeat_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

B, H, W, K = 16, 480, 640, 8192
N_SCAN = 32
JW = jnp.asarray([0.0, 1.0, 2.0], jnp.float32)


def refine_from_s9(s9):
    stot = s9.sum(axis=(2, 3))
    fx = (s9.sum(axis=2) @ JW) / stot
    fy = (s9.sum(axis=3) @ JW) / stot
    return fx, fy, s9.max(axis=(2, 3))


def elem9(kp_map, r, c):
    offs = (jnp.arange(3)[:, None] * W + jnp.arange(3)[None, :]).reshape(-1)
    idx9 = (r * W + c)[..., None] + offs[None, None, :]
    flat = kp_map.reshape(B, H * W)
    s9 = jnp.take_along_axis(flat, idx9.reshape(B, -1), axis=1).reshape(
        B, -1, 3, 3
    )
    return refine_from_s9(s9)


def win33(kp_map, r, c):
    # one gather of K (1,3,3) window slices from [B, H, W]
    m = kp_map.reshape(B, H, W)
    starts = jnp.stack([r, c], axis=-1)  # [B, K, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    s9 = jax.lax.gather(
        m,
        starts,
        dnums,
        slice_sizes=(1, 3, 3),
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return refine_from_s9(s9)


def rows3(kp_map, r, c):
    # K*3 row slices of 3 contiguous elements from the flat map
    flat = kp_map.reshape(B, H * W)
    base = (r * W + c)[..., None] + (jnp.arange(3) * W)[None, None, :]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,),
        collapsed_slice_dims=(),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    s9 = jax.lax.gather(
        flat,
        base.reshape(B, -1, 1),
        dnums,
        slice_sizes=(1, 3),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(B, K, 3, 3)
    return refine_from_s9(s9)


def pool(kp_map, r, c):
    # dense pooled maps, then 3 values per point (grid 2 + score 1)
    from posfeat_tpu.ops.pooling import avg_pool2d, max_pool2d
    from posfeat_tpu.ops.coords import gen_grid

    m4 = kp_map.reshape(B, H, W, 1)
    grids_org = gen_grid(-1, 1, -1, 1, H, W, dtype=m4.dtype).reshape(
        1, H, W, 2
    )
    grids = avg_pool2d(m4 * grids_org, 3, 1) / avg_pool2d(m4, 3, 1)
    smax = max_pool2d(m4, 3, 1)  # VALID: [B, H-2, W-2, .]
    idx = (r * (W - 2) + c)[..., None]
    g = jnp.take_along_axis(grids.reshape(B, -1, 2), idx, axis=1)
    s = jnp.take_along_axis(smax.reshape(B, -1, 1), idx, axis=1)
    return g[..., 0], g[..., 1], s[..., 0]


def bench(name, fn):
    rng = np.random.RandomState(0)
    kp_map = jnp.asarray(rng.rand(B, H, W).astype(np.float32))
    r = jnp.asarray(rng.randint(0, H - 2, size=(B, K)).astype(np.int32))
    c = jnp.asarray(rng.randint(0, W - 2, size=(B, K)).astype(np.int32))

    @jax.jit
    def run(kp_map, r, c):
        def body(carry, i):
            fx, fy, s = fn(kp_map, (r + i) % (H - 2), c)
            return carry + jnp.sum(fx) + jnp.sum(fy) + jnp.sum(s), None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(N_SCAN))
        return acc

    v = float(run(kp_map, r, c))
    assert np.isfinite(v), name
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(kp_map, r, c))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    ms_per_img = dt / (N_SCAN * B) * 1e3
    print(f"{name}: {ms_per_img:.4f} ms/img", flush=True)
    return ms_per_img


if __name__ == "__main__":
    for name, fn in [
        ("elem9", elem9),
        ("rows3", rows3),
        ("win33", win33),
        ("pool", pool),
    ]:
        try:
            bench(name, fn)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
