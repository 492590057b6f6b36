"""Reference-checkpoint import dress rehearsal (VERDICT round-1 item #8).

Writes a reference-format run directory (`backbone.pth` +
`localheader.pth`, PoSFeat_model.py:74-81) from the torch replica
models, converts it end to end with `tools/import_torch_weights.py
posfeat`, loads the result through the composite's `load_checkpoint`
(the path the Extractor uses), and asserts full-model output parity
with the torch replicas — day-one compatibility with a published
reference checkpoint."""

import os
import subprocess
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests.test_models_parity import TKeypointDet, TResUNet

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODEL_CONFIG = {
    "backbone": "ResUNet",
    "backbone_config": {
        "encoder": "resnet50",
        "pretrained": False,
        "coarse_out_ch": 128,
        "fine_out_ch": 128,
    },
    "localheader": "KeypointDet",
    "localheader_config": {
        "in_channels": 192,
        "out_channels": 2,  # score + threshold map (PoSFeat_model.py:109-113)
        "prior": "identity",
        "act": "Softplus",
        "fused_upsample": False,  # reference dataflow for exact parity
    },
    "align_local_grad": False,
    "local_input_elements": ["local_map", "local_map_small"],
    "local_with_img": True,
}


@pytest.mark.slow
def test_posfeat_checkpoint_import_rehearsal(tmp_path, rng):
    from posfeat_tpu.models import PoSFeat

    # 1. a reference-format checkpoint dir from the torch replicas
    torch.manual_seed(3)
    tb = TResUNet().eval()
    th = TKeypointDet().eval()
    with torch.no_grad():
        for m in tb.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    ckpt_dir = str(tmp_path / "ref_run" / "010")
    os.makedirs(ckpt_dir)
    torch.save(tb.state_dict(), os.path.join(ckpt_dir, "backbone.pth"))
    torch.save(th.state_dict(), os.path.join(ckpt_dir, "localheader.pth"))

    # 2. the conversion tool, end to end
    out_dir = str(tmp_path / "converted")
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "import_torch_weights.py"),
            "posfeat",
            ckpt_dir,
            out_dir,
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        env={**os.environ, "POSFEAT_PLATFORM": "cpu"},
    )
    assert res.returncode == 0, res.stderr
    assert os.path.exists(os.path.join(out_dir, "backbone.msgpack"))
    assert os.path.exists(os.path.join(out_dir, "localheader.msgpack"))

    # 3. load through the composite (the Extractor's load path) and
    # compare the full extraction outputs with the torch replicas
    model = PoSFeat(MODEL_CONFIG, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), im_shape=(1, 64, 64, 3))
    variables = model.load_checkpoint(variables, out_dir)

    im_np = rng.rand(1, 64, 80, 3).astype(np.float32)
    ours = model.extract(variables, jnp.asarray(im_np), train=False)

    x_t = torch.from_numpy(im_np.transpose(0, 3, 1, 2))
    with torch.no_grad():
        feats = tb(x_t)
        fine = torch.cat([feats["local_map"], feats["local_map_small"]], dim=1)
        score = th(fine, x_t)

    np.testing.assert_allclose(
        np.asarray(ours["local_map"]),
        feats["local_map"].permute(0, 2, 3, 1).numpy(),
        rtol=1e-3,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["local_point"]),
        score[:, :1].permute(0, 2, 3, 1).numpy(),
        rtol=1e-3,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["local_thr"]),
        score[:, 1:].permute(0, 2, 3, 1).numpy(),
        rtol=1e-3,
        atol=2e-4,
    )
