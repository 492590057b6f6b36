"""Product-path throughput: the shipped Extractor must deliver the bench
number, not just the bench's synthetic scan program.

Runs only on real TPU (`POSFEAT_TPU_TESTS=1 python -m pytest
tests/test_extractor_throughput.py`): builds 200 synthetic 480×640
images on disk, extracts them through the full batched Extractor
pipeline (decode → bucket → batched device program → npz writes), and
asserts ≥80% of the *achievable* throughput: min(scan-bench rate,
host<->device IO bound). The IO bound is measured in-process: unlike
the scan bench (device-resident data, one scalar fetch), the product
path must upload every image and download every feature slate, so on
an IO-starved link (the axon dev relay moves ~5 MB/s device->host;
a real TPU host's PCIe moves GB/s) the link, not the chip, caps
throughput — the pipeline's job is to keep that link saturated
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


def measure_io_bound_ips(batch=16, num_pts=8192, c=128):
    """Images/s if the host<->device link were the only cost: per batch,
    upload the uint8 images and download the (coords, scores, descriptors,
    valid) slates exactly as the Extractor does.

    Two measurement traps, both hit in earlier revisions: (a) constant
    tensors compress over relay links, so payloads must be random; (b) a
    jax.Array caches its host copy after the first device_get, so
    re-fetching the same buffers measures memcpy, not the wire — every
    iteration must fetch FRESH device buffers. Fetches are serial, like
    the Extractor's single fetch thread (concurrent fetches collapse
    relay bandwidth ~10x)."""
    import time

    rng = np.random.RandomState(0)
    up = rng.randint(0, 255, (batch, H, W, 3)).astype(np.uint8)
    key = jax.random.PRNGKey(0)
    coords = jax.random.uniform(key, (batch, num_pts, 2), jnp.float32)
    score = jax.random.uniform(key, (batch, num_pts, 1), jnp.float32)
    feat = jax.random.uniform(key, (batch, num_pts, c)).astype(jnp.bfloat16)
    valid = jnp.zeros((batch,), jnp.int32)
    bump = jax.jit(lambda t, s: jax.tree.map(lambda x: x + s.astype(x.dtype), t))
    jax.block_until_ready((coords, score, feat, valid))

    def once(i):
        # fresh device buffers -> genuine transfers, never cached copies
        out = bump((coords, score, feat, valid), jnp.float32(i + 1))
        jax.block_until_ready(out)
        up[0, 0, 0, 0] = i  # defeat host-side upload caching too
        x = jnp.asarray(up)
        x.block_until_ready()
        t0 = time.perf_counter()
        for o in out:
            np.asarray(o)
        return time.perf_counter() - t0

    once(0)  # warm (compiles bump)
    ts = [once(i) for i in range(1, 3)]
    return batch / min(ts)


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
    io_ips = measure_io_bound_ips()
    achievable = min(bench_ips, io_ips)
    record = {
        "extractor_im_s": round(extractor_ips, 2),
        "bench_im_s": round(bench_ips, 2),
        "io_bound_im_s": round(io_ips, 2),
        "ratio_vs_achievable": round(extractor_ips / achievable, 3),
    }
    print(json.dumps(record))
    assert extractor_ips >= 0.8 * achievable, record
