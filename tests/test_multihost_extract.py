"""Multi-host extraction sharding (VERDICT r4 item 7): two real
processes extract disjoint shards of one image list into a shared
output root — per-host name lists, full coverage, no double-writes.
Mirrors test_multihost.py's process layout for the extraction side
(reference DistributedSampler analog, extractor.py:95-98)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_extraction_sharding(tmp_path):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_e2e import make_mini_hpatches

    data_root = str(tmp_path / "hp")
    os.makedirs(data_root)
    make_mini_hpatches(data_root, n_seq=2, n_img=4)  # 8 images
    worker = os.path.join(os.path.dirname(__file__), "multihost_extract_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", data_root, str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"shard {i} failed:\n{out[-4000:]}"
        assert f"EXTRACT_SHARD_OK shard={i}" in out, out[-2000:]

    save_root = tmp_path / "ckpts" / "hp_mh"
    # per-shard name lists exist and are disjoint
    lists = {}
    for i in range(2):
        path = save_root / "image" / f"name_list.shard{i}.txt"
        assert path.exists(), f"missing shard list {path}"
        with open(path) as f:
            lists[i] = {line.split(" ", 1)[1].strip() for line in f if line.strip()}
        assert lists[i], f"shard {i} extracted nothing"
    assert not (lists[0] & lists[1]), f"double-writes: {lists[0] & lists[1]}"

    # together the shards cover every image exactly once
    all_names = lists[0] | lists[1]
    assert len(all_names) == 8, sorted(all_names)
    for name in all_names:
        npz = save_root / "desc" / (name + ".mh")
        assert npz.exists(), f"missing feature file {npz}"
