"""Capture a device trace of the flagship extraction program and print a
per-op time breakdown (top HLO ops by self time).

Usage: python tools/trace_ops.py [bs] [bf16|f32] [head_mode]
"""

import glob
import gzip
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from posfeat_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

H, W = 480, 640


def build(bs, dtype, head_mode):
    import copy

    from __graft_entry__ import FLAGSHIP_MODEL_CONFIG
    from posfeat_tpu.models import PoSFeat
    from posfeat_tpu.ops.detect import generate_kpts_single
    from posfeat_tpu.ops.grid_sample import sample_feat_by_coord

    cfg = copy.deepcopy(FLAGSHIP_MODEL_CONFIG)
    if head_mode:
        cfg["localheader_config"]["fused_upsample"] = (
            False if head_mode == "false" else head_mode
        )
    model = PoSFeat(cfg, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), im_shape=(1, 64, 64, 3))

    @jax.jit
    def run(variables, ims):
        def body(c, im):
            out = model.extract(variables, im, train=False)
            coord_n, score, valid = generate_kpts_single(
                out["local_point"], num_pts=8192, nms_radius=1,
                use_nms=True, thr=0.9, thr_mod="abs",
            )
            feat = sample_feat_by_coord(out["local_map"], coord_n, norm=True)
            return c + jnp.sum(coord_n.astype(jnp.float32)) + jnp.sum(
                feat[:, :8].astype(jnp.float32)
            ) + jnp.sum(valid), None

        acc, _ = jax.lax.scan(body, 0.0, ims)
        return acc

    rng = np.random.RandomState(0)
    ims = jnp.asarray(rng.rand(4, bs, H, W, 3).astype(np.float32))
    return run, variables, ims


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = jnp.bfloat16 if (len(sys.argv) < 3 or sys.argv[2] == "bf16") else jnp.float32
    head_mode = sys.argv[3] if len(sys.argv) > 3 else (
        "pallas" if dtype == jnp.bfloat16 else ""
    )
    run, variables, ims = build(bs, dtype, head_mode)
    float(run(variables, ims))  # compile + warm

    trace_dir = "/tmp/posfeat_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        float(run(variables, ims))

    # parse the xplane and print top ops by self time (xplane_parse is
    # the in-repo wire-format parser; the tensorboard profile plugin's
    # bundled protobuf bindings are incompatible with this image)
    import subprocess

    subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "xplane_parse.py"),
            trace_dir,
            str(4 * bs),
            "40",
        ],
        check=True,
    )


if __name__ == "__main__":
    main()
