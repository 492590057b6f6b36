"""Formulation shoot-out for the head's upsample+conv2 hot op.

All variants compute (up to layout) conv3x3(upsample_x4(trunk)) at
bs=16 bf16, trunk 120x160x192 -> 2048 phase channels (= 480x640x128).

  G: dilated composite conv (current default dataflow's hot op)
  A: phase conv as one [3,3,192,2048] VALID conv (current phase impl)
  E: phase conv as 9 accumulated matmuls over shifted slices (im2col-free)
  F: phase conv with Cin zero-padded to 256 (MXU tile alignment)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from posfeat_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from posfeat_tpu.models.keypoint_det import (  # noqa: E402
    _phase_mix_matrix,
    fused_upsample_conv3x3_dilated,
    fused_upsample_conv3x3_phase,
)

B, h, w, Cin, Cout = 16, 120, 160, 192, 128
N_SCAN = 4

kk1, kk3 = jax.random.split(jax.random.PRNGKey(0))
trunk = jax.random.normal(kk1, (N_SCAN, B, h, w, Cin), jnp.bfloat16)
kernel = jax.random.normal(kk3, (3, 3, Cin, Cout), jnp.float32) * 0.05


def phase_kernel():
    M, D = _phase_mix_matrix(4)
    kph = jnp.einsum("rda,sep,apcf->decrsf", jnp.asarray(M), jnp.asarray(M),
                     kernel, precision=jax.lax.Precision.HIGHEST)
    return kph.reshape(D, D, Cin, 16 * Cout), D


def scan_bench(name, body):
    @jax.jit
    def run(ts):
        def step(c, t):
            out = body(t)
            return c + jnp.sum(out[:, ::31, ::37].astype(jnp.float32)), None

        acc, _ = jax.lax.scan(step, 0.0, ts)
        return acc

    float(run(trunk))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(trunk))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts) / (N_SCAN * B) * 1e3:.3f} ms/img", flush=True)


def var_g(t):
    return fused_upsample_conv3x3_dilated(t, kernel, 4)


def var_a(t):
    return fused_upsample_conv3x3_phase(t, kernel, 4).reshape(B, h, w, 16 * Cout)


def var_e(t):
    kph, D = phase_kernel()
    kph = kph.astype(jnp.bfloat16)
    tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    acc = None
    for dy in range(D):
        for dx in range(D):
            sl = tp[:, dy : dy + h, dx : dx + w, :].reshape(B * h * w, Cin)
            part = jax.lax.dot_general(
                sl, kph[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    return acc.astype(t.dtype).reshape(B, h, w, 16 * Cout)


def var_f(t):
    kph, D = phase_kernel()
    kph = jnp.pad(kph, ((0, 0), (0, 0), (0, 256 - Cin), (0, 0))).astype(
        jnp.bfloat16
    )
    tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    tp = jnp.pad(tp, ((0, 0), (0, 0), (0, 0), (0, 256 - Cin)))
    z = jax.lax.conv_general_dilated(
        tp, kph, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.DEFAULT,
    )
    return z


def var_h(t):
    from posfeat_tpu.models.keypoint_det import (
        _fix_border_ring,
        phase_to_space,
    )

    z = fused_upsample_conv3x3_phase(t, kernel, 4)
    out = phase_to_space(z)
    return _fix_border_ring(out, t, kernel, 4).astype(t.dtype)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "gaef"
    for nm, fn in [("G_dilated", var_g), ("A_physconv", var_a),
                   ("E_matmuls", var_e), ("F_pad256", var_f),
                   ("H_phase_d2s_ring", var_h)]:
        if nm[0].lower() in which:
            scan_bench(nm, fn)
