"""A/B benchmark: old composite (lhs_dilation) head vs phase-layout head.

Times the FULL KeypointDet.apply at bs=16 bf16 (trunk 120x160x192 + image
480x640x3) on the default device. Old implementation is loaded from a
file passed as argv[1] (e.g. `git show HEAD:...keypoint_det.py`).
"""

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from posfeat_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


B, h, w, Cin = 16, 120, 160, 192
H, W = 4 * h, 4 * w
N_SCAN = 4


def bench(label, head_cls):
    m = head_cls(
        in_channels=Cin, out_channels=1, prior="identity", act="Softplus",
        fused_upsample="always", dtype=jnp.bfloat16,
    )
    k0 = jax.random.PRNGKey(0)
    fm0 = jnp.zeros((1, h, w, Cin), jnp.float32)
    im0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = m.init(k0, fm0, im0)

    @jax.jit
    def run(variables, fms, ims):
        def step(c, xs):
            fm, im = xs
            s = m.apply(variables, fm, im)
            return c + jnp.sum(s[:, ::63, ::61].astype(jnp.float32)), None

        acc, _ = jax.lax.scan(step, 0.0, (fms, ims))
        return acc

    kf, ki = jax.random.split(jax.random.PRNGKey(1))
    fms = jax.random.normal(kf, (N_SCAN, B, h, w, Cin), jnp.bfloat16)
    ims = jax.random.normal(ki, (N_SCAN, B, H, W, 3), jnp.bfloat16)

    float(run(variables, fms, ims))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(variables, fms, ims))
        ts.append(time.perf_counter() - t0)
    per_img = min(ts) / (N_SCAN * B) * 1e3
    print(f"{label}: {per_img:.3f} ms/img", flush=True)


if __name__ == "__main__":
    old_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/old_keypoint_det.py"
    which = sys.argv[2] if len(sys.argv) > 2 else "on"
    if "o" in which:
        old = load_module(old_path, "old_kd")
        bench("old_composite", old.KeypointDet)
    if "n" in which:
        from posfeat_tpu.models.keypoint_det import KeypointDet

        bench(
            "new_phase",
            lambda **kw: KeypointDet(**{**kw, "fused_upsample": "phase"}),
        )
    if "p" in which:
        from posfeat_tpu.models.keypoint_det import KeypointDet

        bench(
            "pallas_fused",
            lambda **kw: KeypointDet(**{**kw, "fused_upsample": "pallas"}),
        )
