"""Pallas fused head tail (interpret mode) vs the reference XLA dataflow."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from posfeat_tpu.ops.pallas.fused_head import fused_head_tail
from posfeat_tpu.ops.resize import interpolate_bilinear
from posfeat_tpu.models.keypoint_det import instance_norm


def _img_branch(s, k1, b1):
    """convimg + IN stats, replicating KeypointDet exactly (f32 here)."""
    y = jax.lax.conv_general_dilated(
        s, k1, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b1
    n = y.shape[1] * y.shape[2]
    s1 = jnp.sum(y, axis=(1, 2))
    s2 = jnp.sum(y * y, axis=(1, 2))
    mu = s1 / n
    var = jnp.maximum(s2 / n - mu * mu, 0.0)
    a = jax.lax.rsqrt(var + 1e-5)
    return y, mu, a


def reference_tail(trunk, s, k1, b1, k2t, k2i, b2, w3, b3, a, act="Softplus"):
    H, W = s.shape[1:3]
    xu = interpolate_bilinear(trunk, (H, W), align_corners=False)
    y, mu, ia = _img_branch(s, k1, b1)
    img_feat = (y - mu[:, None, None, :]) * ia[:, None, None, :]
    z_img = jax.lax.conv_general_dilated(
        img_feat, k2i, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    z = jax.lax.conv_general_dilated(
        xu, k2t, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + z_img + b2
    x = instance_norm(z)
    x = jnp.where(x >= 0, x, a * x)
    u = jax.lax.conv_general_dilated(
        x, w3, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b3
    xn = instance_norm(u)
    return jax.nn.softplus(xn) if act == "Softplus" else jax.nn.sigmoid(xn)


def _setup(rng, B=2, h=12, w=16, cin=24, cy=16, cout=32, out=2):
    trunk = jnp.asarray(rng.randn(B, h, w, cin).astype(np.float32))
    s = jnp.asarray(rng.randn(B, 4 * h, 4 * w, 3).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, 3, cy).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(cy).astype(np.float32) * 0.1)
    k2t = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    k2i = jnp.asarray(rng.randn(3, 3, cy, cout).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rng.randn(1, 1, cout, out).astype(np.float32) * 0.1)
    b3 = jnp.asarray(rng.randn(out).astype(np.float32) * 0.1)
    a = jnp.asarray([0.25], np.float32)
    return trunk, s, k1, b1, k2t, k2i, b2, w3, b3, a


def _run_fused(args, mode, **kw):
    trunk, s, k1, b1, k2t, k2i, b2, w3, b3, a = args
    y, mu, ia = _img_branch(s, k1, b1)
    return np.asarray(
        fused_head_tail(
            trunk, s, y, mu, ia, k1, b1, k2t, k2i, b2, w3, b3, a,
            act="Softplus", interpret=True, **kw,
        )
    )


@pytest.mark.parametrize("mode", ["v3", "v3t", "v3i", "v1"])
def test_fused_head_tail_interpret_matches(rng, monkeypatch, mode):
    kw = {}
    if mode == "v3t":
        monkeypatch.setenv("POSFEAT_HEAD_MODE", "v3")
        kw["triple"] = True  # explicit kwarg since r5 (env knob retired)
    elif mode == "v3i":
        # im2col trunk operand (env-gated OFF by default on device
        # pending Mosaic validation; the math is covered here)
        monkeypatch.setenv("POSFEAT_HEAD_MODE", "v3")
        monkeypatch.setenv("POSFEAT_HEAD_IM2COL", "1")
    else:
        monkeypatch.setenv("POSFEAT_HEAD_MODE", mode)
    args = _setup(rng)
    ref = np.asarray(reference_tail(*args[:1], *args[1:], act="Softplus"))
    got = _run_fused(args, mode, **kw)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_fused_head_tail_no_ring_interior(rng, monkeypatch):
    """POSFEAT_HEAD_RING=0 drops the border-ring correction AND (since
    r4) replaces the edge-clamp halo with a zero halo (one constant pad
    instead of the concat-of-slices + pad pair, −0.09 ms/img): scores on
    the 4-px full-res ring become approximate, but interior scores must
    stay within the small IN-statistics shift the uncorrected ring
    induces."""
    args = _setup(rng, B=2, h=16, w=24, cin=24, cy=16, cout=32, out=2)
    ref = np.asarray(reference_tail(*args, act="Softplus"))
    monkeypatch.setenv("POSFEAT_HEAD_RING", "0")
    got = _run_fused(args, "v3")
    assert got.shape == ref.shape
    assert np.isfinite(got).all()
    d_int = np.abs(got[:, 4:-4, 4:-4] - ref[:, 4:-4, 4:-4])
    scale = np.abs(ref).mean()
    # the interior shift scales with the ring's share of the IN
    # statistics (perimeter/area — much larger on this 64x96 test grid
    # than at production 480x640: measured relmax 0.059 here vs 0.019
    # at 128x192 and shrinking); the production-quality gate is the
    # trained-weights delta-MMA probe, not this diagnostic bound
    assert d_int.max() < 0.1 * scale, (d_int.max(), scale)
    assert d_int.mean() < 0.02 * scale, (d_int.mean(), scale)


@pytest.mark.parametrize("mode", ["v3", "v1"])
def test_fused_head_tail_odd_tiles(rng, monkeypatch, mode):
    # h=6 -> th=2 fallback path; w=20 -> tw=4
    monkeypatch.setenv("POSFEAT_HEAD_MODE", mode)
    args = _setup(rng, B=1, h=6, w=20, cin=8, cy=8, cout=16, out=1)
    ref = np.asarray(reference_tail(*args, act="Softplus"))
    got = _run_fused(args, mode)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_extractor_bf16_autoselects_pallas(tmp_path, rng):
    """bf16 extraction defaults to the fused Pallas head and produces the
    same keypoints as the f32 reference dataflow (tiny synthetic image)."""
    import cv2

    from posfeat_tpu.extract import Extractor

    root = tmp_path / "hp" / "i_x"
    root.mkdir(parents=True)
    from posfeat_tpu.data.synthetic import _texture

    im = _texture(rng, 96, 128)
    cv2.imwrite(str(root / "1.ppm"), cv2.cvtColor(im, cv2.COLOR_RGB2BGR))

    model_cfg = {
        "backbone": "ResUNet",
        "backbone_config": {
            "encoder": "resnet18",
            "pretrained": False,
            "coarse_out_ch": 32,
            "fine_out_ch": 32,
        },
        "localheader": "KeypointDet",
        "localheader_config": {
            "in_channels": 96,
            "prior": "identity",
            "act": "Softplus",
        },
        "align_local_grad": False,
        "local_input_elements": ["local_map", "local_map_small"],
        "local_with_img": True,
    }

    def run(tag, dtype):
        cfg = {
            "output_root": f"ex_{tag}",
            "postfix": "pf",
            "loss_distance": "cos",
            "output_desc": True,
            "output_img": False,
            "compute_dtype": dtype,
            # auto-selection is TPU-only; opt in explicitly on the CPU
            # test backend (runs the kernels in interpret mode)
            **({"head_dataflow": "pallas"} if dtype == "bfloat16" else {}),
            "model": "PoSFeat",
            "model_config": __import__("copy").deepcopy(model_cfg),
            "data": "HPatch_SIFT",
            "data_config_extract": {"data_path": str(tmp_path / "hp")},
            "use_sift": False,
            "local_thr": 0.9,
            "detector": "generate_kpts_single",
            "detector_config": {"num_pts": 128, "nms_radius": 1, "use_nms": True},
        }
        ex = Extractor(cfg, ckpt_root=str(tmp_path / "ck"))
        lh = ex.config["model_config"]["localheader_config"]
        assert lh.get("fused_upsample") == (
            "pallas" if dtype == "bfloat16" else None
        )
        # the head_dataflow injection must not leak into the caller's cfg
        assert "fused_upsample" not in model_cfg["localheader_config"]
        ex.extract()
        d = np.load(
            str(tmp_path / "ck" / f"ex_{tag}" / "desc" / "i_x" / "1.ppm.pf")
        )
        return d["keypoints"], d["scores"]

    kp32, sc32 = run("f32", "float32")
    kp16, sc16 = run("bf16", "bfloat16")
    assert kp16.dtype == np.float32 and np.isfinite(kp16).all()
    assert len(kp16) == len(kp32) == 128
    # random-init score maps are near-uniform noise, so top-k ordering is
    # rounding-sensitive; require set-level overlap, not slot equality
    d = np.linalg.norm(kp32[:, None, :] - kp16[None, :, :], axis=-1)
    overlap = (d.min(axis=1) < 2.0).mean()
    assert overlap > 0.5, overlap


def test_gram_stats_match_xla_stats(rng, monkeypatch):
    """img_stats='gram' (the default) derives the convimg IN statistics
    from the patch gram matrix (no full-res y_img reduction). Against
    the operand ('xla') path the only differences are summation order
    and skipping y's bf16 rounding — outputs must agree tightly in f32
    and to bf16 resolution in bf16."""
    for dt, rtol in ((jnp.float32, 2e-4), (jnp.bfloat16, 2e-2)):
        args = _setup(rng, B=2, h=16, w=24, cin=24, cy=16, cout=32, out=2)
        args = tuple(
            a.astype(dt) if a.ndim >= 3 else a for a in args
        )
        got_g = _run_fused(args, "v3", img_stats="gram")
        got_x = _run_fused(args, "v3", img_stats="xla")
        scale = np.abs(got_x).mean()
        assert np.abs(got_g - got_x).max() < rtol * scale, (
            dt, np.abs(got_g - got_x).max(), scale,
        )
