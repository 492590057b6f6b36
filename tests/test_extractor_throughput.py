"""Product-path throughput: the shipped Extractor must deliver the bench
number, not just the bench's synthetic scan program.

Runs only on real TPU (`POSFEAT_TPU_TESTS=1 python -m pytest
tests/test_extractor_throughput.py`): builds 200 synthetic 480×640
images on disk, extracts them through the full batched Extractor
pipeline (decode → bucket → batched device program → npz writes), and
asserts ≥80% of the lax.scan bench throughput at the same batch/dtype
(VERDICT round-1 item #2)."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="TPU throughput test (set POSFEAT_TPU_TESTS=1 on TPU)",
    ),
]


N_IMAGES = 200
H, W = 480, 640


def make_images(root, n=N_IMAGES):
    import cv2

    from posfeat_tpu.data.synthetic import _texture

    rng = np.random.RandomState(3)
    base = _texture(rng, H, W)
    os.makedirs(os.path.join(root, "seq"), exist_ok=True)
    for i in range(n):
        # cheap per-image variation; decode cost is what matters
        im = np.roll(base, shift=i * 7, axis=1)
        cv2.imwrite(
            os.path.join(root, "seq", f"{i}.ppm"),
            cv2.cvtColor(im, cv2.COLOR_RGB2BGR),
        )


def test_extractor_matches_bench_throughput(tmp_path):
    import bench as bench_mod
    from __graft_entry__ import FLAGSHIP_MODEL_CONFIG
    from posfeat_tpu.extract import Extractor

    data_root = str(tmp_path / "imgs")
    make_images(data_root)

    config = {
        "output_root": "tpu_throughput",
        "postfix": "tp",
        "load_path": None,
        "loss_distance": "cos",
        "output_desc": True,
        "output_img": False,
        "compute_dtype": "bfloat16",
        "model": "PoSFeat",
        "model_config": FLAGSHIP_MODEL_CONFIG,
        "data": "HPatch_SIFT",
        "data_config_extract": {
            "data_path": data_root,
            "batch_size": 16,
            "workers": 8,
        },
        "local_thr": 0.99,
        "use_sift": False,
        "detector": "generate_kpts_single",
        "detector_config": {
            "num_pts": 8192,
            "stable": True,
            "use_nms": True,
            "nms_radius": 1,
            "thr": 0.9,
            "thr_mod": "abs",
        },
    }
    ex = Extractor(config, ckpt_root=str(tmp_path / "ckpts"))
    # warmup pass compiles the (16, 480, 640) program; the timed pass
    # below measures the steady state the bench reports
    ex.extract()
    cfg2 = dict(config)
    cfg2["output_root"] = "tpu_throughput2"
    ex2 = Extractor(cfg2, ckpt_root=str(tmp_path / "ckpts"))
    n_images, dt = ex2.extract()
    assert n_images == N_IMAGES
    extractor_ips = n_images / dt

    bench_ips = bench_mod.bench_extraction(16, jnp.bfloat16, n_scan=8)
    record = {
        "extractor_im_s": round(extractor_ips, 2),
        "bench_im_s": round(bench_ips, 2),
        "ratio": round(extractor_ips / bench_ips, 3),
    }
    print(json.dumps(record))
    assert extractor_ips >= 0.8 * bench_ips, record
