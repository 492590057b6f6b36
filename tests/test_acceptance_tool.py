"""Smoke for tools/acceptance.py (the one-command real-data parity
chain, VERDICT r3 item 8): exercised end-to-end on synthetic assets so
the tool cannot bitrot while the real HPatches/weights stay
environment-blocked. The checkpoint's saved config overrides the
flagship extract config (reference semantics), and a copy of our own
eval cache stands in for the published PoSFeat_CVPR cache — a
self-comparison must PASS at delta 0."""

import glob
import json
import os
import shutil
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))


@pytest.mark.slow
def test_acceptance_tool_end_to_end(tmp_path):
    from test_e2e import _train_config, make_mini_hpatches

    from posfeat_tpu.train import Trainer

    hp_root = str(tmp_path / "hp")
    os.makedirs(hp_root)
    make_mini_hpatches(hp_root, n_seq=2, n_img=6)

    t = Trainer(_train_config(tmp_path, "desc"), ckpt_root=str(tmp_path / "ck"))
    t.train()
    ckpt = str(tmp_path / "ck" / "smoke_desc" / "001")
    assert os.path.exists(os.path.join(ckpt, "backbone.msgpack"))

    env = dict(os.environ)
    env["POSFEAT_PLATFORM"] = "cpu"

    def run(ref_cache):
        r = subprocess.run(
            [
                sys.executable, "tools/acceptance.py",
                "--hpatches", hp_root, "--weights", ckpt,
                "--work", str(tmp_path / "acc"),
                "--ref_cache", ref_cache, "--batch_size", "2",
            ],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, env=env, timeout=900,
        )
        recs = [
            json.loads(line)
            for line in r.stdout.splitlines()
            if line.startswith("{")
        ]
        return r, recs[-1] if recs else None

    # 1st run: no reference cache -> absolute numbers, exit 0
    r1, rec1 = run(str(tmp_path / "missing.npy"))
    assert r1.returncode == 0, r1.stdout[-3000:] + r1.stderr[-3000:]
    assert rec1 and 0.0 <= rec1["mma3"] <= 1.0 and rec1["passed"] is None

    # 2nd run: our own eval cache as the "reference" -> delta 0, PASS
    cache = glob.glob(str(tmp_path / "acc" / "eval_cache" / "*.npy"))
    assert cache
    ref = str(tmp_path / "ref_cache.npy")
    shutil.copy(cache[0], ref)
    r2, rec2 = run(ref)
    assert r2.returncode == 0, r2.stdout[-3000:] + r2.stderr[-3000:]
    assert rec2["passed"] is True and abs(rec2["delta_mma3"]) < 1e-9
