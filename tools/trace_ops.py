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

    # parse the xplane and print top ops by self time
    xplanes = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not xplanes:
        print("no xplane captured", file=sys.stderr)
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

    params = {"tqx": "out:json;"}
    data, _ = rttd.xspace_to_tool_data(xplanes, "framework_op_stats^", params)
    obj = json.loads(data) if isinstance(data, (str, bytes)) else data
    rows = obj["table"]["rows"] if "table" in obj else None
    cols = [c["label"] for c in obj["table"]["cols"]] if rows else []
    print("columns:", cols, file=sys.stderr)
    items = []
    for r in rows or []:
        vals = [c.get("v") for c in r["c"]]
        rec = dict(zip(cols, vals))
        items.append(rec)
    # column names observed: 'Type', 'Operation', 'Total self-time (us)' ...
    key_self = next(
        (c for c in cols if "self" in c.lower() and "us" in c.lower()), None
    )
    key_name = next((c for c in cols if "operation" in c.lower()), None)
    items.sort(key=lambda r: -(r.get(key_self) or 0))
    n_img = 4 * bs
    total = sum(r.get(key_self) or 0 for r in items)
    print(f"total self time: {total / n_img / 1e3:.3f} ms/img over {n_img} images")
    for r in items[:40]:
        t = (r.get(key_self) or 0) / n_img / 1e3
        if t < 0.001:
            break
        print(f"{t:8.4f} ms/img  {str(r.get(key_name))[:110]}")


if __name__ == "__main__":
    main()
