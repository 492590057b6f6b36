"""Stage-wise extraction profiler: times cumulative prefixes of the
extraction program (backbone -> +head -> +detector -> +desc sampling) with
the same one-scan/one-fetch methodology as bench.py, so stage costs can be
read off as deltas. Usage: python tools/profile_extract.py [bs] [dtype].
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from posfeat_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from __graft_entry__ import FLAGSHIP_MODEL_CONFIG  # noqa: E402
from posfeat_tpu.models import PoSFeat  # noqa: E402
from posfeat_tpu.ops.detect import generate_kpts_single  # noqa: E402
from posfeat_tpu.ops.grid_sample import sample_feat_by_coord  # noqa: E402

H, W = 480, 640


def timed(fn, variables, ims):
    run = jax.jit(fn)
    v = float(run(variables, ims))  # compile + run
    assert np.isfinite(v), v
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(variables, ims))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = jnp.bfloat16 if (len(sys.argv) < 3 or sys.argv[2] == "bf16") else jnp.float32
    n_scan = 8

    model = PoSFeat(FLAGSHIP_MODEL_CONFIG, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), im_shape=(1, 64, 64, 3))
    rng = np.random.RandomState(0)
    ims = jnp.asarray(rng.rand(n_scan, bs, H, W, 3).astype(np.float32))

    def scan_over(step):
        def fn(variables, ims):
            def body(carry, im):
                return carry + step(variables, im), None

            acc, _ = jax.lax.scan(body, 0.0, ims)
            return acc

        return fn

    def backbone_only(variables, im):
        feats = model.backbone.apply(variables["backbone"], im, train=False)
        return (
            jnp.sum(feats["local_map"][:, ::64, ::64].astype(jnp.float32))
            + jnp.sum(feats["global_map"][:, ::16, ::16].astype(jnp.float32))
        )

    def with_head(variables, im):
        out = model.extract(variables, im, train=False)
        return jnp.sum(out["local_point"][:, ::64, ::64].astype(jnp.float32)) + jnp.sum(
            out["local_map"][:, ::64, ::64].astype(jnp.float32)
        )

    def with_detector(variables, im):
        out = model.extract(variables, im, train=False)
        coord_n, score, valid = generate_kpts_single(
            out["local_point"], num_pts=8192, nms_radius=1,
            use_nms=True, thr=0.9, thr_mod="abs",
        )
        return (
            jnp.sum(coord_n.astype(jnp.float32))
            + jnp.sum(score.astype(jnp.float32))
            + jnp.sum(valid)
        )

    def full(variables, im):
        out = model.extract(variables, im, train=False)
        coord_n, score, valid = generate_kpts_single(
            out["local_point"], num_pts=8192, nms_radius=1,
            use_nms=True, thr=0.9, thr_mod="abs",
        )
        feat = sample_feat_by_coord(out["local_map"], coord_n, norm=True)
        return (
            jnp.sum(coord_n.astype(jnp.float32))
            + jnp.sum(feat[:, :8].astype(jnp.float32))
            + jnp.sum(valid)
        )

    stages = [
        ("backbone", backbone_only),
        ("backbone+head", with_head),
        ("+detector", with_detector),
        ("+desc_sample(full)", full),
    ]
    prev = 0.0
    n_img = n_scan * bs
    for name, step in stages:
        dt = timed(scan_over(step), variables, ims)
        ms = dt / n_img * 1000
        print(
            f"{name:22s} {ms:7.3f} ms/img  (delta {ms - prev:+7.3f})  "
            f"{n_img / dt:7.1f} im/s",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
