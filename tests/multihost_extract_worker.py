"""Worker for the 2-process extraction sharding test.

  python tests/multihost_extract_worker.py <shard_index> <num_shards> \
      <data_root> <workdir>

Extraction sharding is embarrassingly parallel (the reference's
DistributedSampler analog, extractor.py:95-98): each host strides into
the image list and writes its own shard — no collectives, no process
group. Each worker runs a full Extractor on its shard of a shared
HPatches-layout dataset and prints its shard's image count.
"""

import os
import sys

shard_index, num_shards, data_root, workdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["POSFEAT_PLATFORM"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from test_e2e import MODEL_CONFIG  # noqa: E402

from posfeat_tpu.extract import Extractor  # noqa: E402

config = {
    "output_root": "hp_mh",
    "postfix": "mh",
    "load_path": None,
    "loss_distance": "cos",
    "output_desc": True,
    "output_img": False,
    "model": "PoSFeat",
    "model_config": MODEL_CONFIG,
    "data": "HPatch_SIFT",
    "data_config_extract": {
        "data_path": data_root,
        "batch_size": 1,
        "workers": 2,
        "num_shards": num_shards,
        "shard_index": shard_index,
    },
    "local_thr": 0.99,
    "use_sift": False,
    "detector": "generate_kpts_single",
    "detector_config": {
        "num_pts": 128,
        "stable": True,
        "use_nms": True,
        "nms_radius": 1,
        "thr": False,
    },
}

ex = Extractor(config, ckpt_root=os.path.join(workdir, "ckpts"))
n_images, _ = ex.extract()
print(f"EXTRACT_SHARD_OK shard={shard_index} n={n_images}")
