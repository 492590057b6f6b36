"""Full-model numeric parity: torch replicas (structured like the reference
networks) with random weights -> torch_import -> our flax modules.

Validates the model math AND the checkpoint-conversion mapping end to end.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from posfeat_tpu.core.torch_import import import_resunet, import_keypoint_det
from posfeat_tpu.models import ResUNet, KeypointDet
from posfeat_tpu.ops.resize import interpolate_bilinear


# ---------------------------------------------------------------- replicas


class TBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return F.relu(out + idt)


def _make_layer(inplanes, planes, blocks, stride):
    downsample = tnn.Sequential(
        tnn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
        tnn.BatchNorm2d(planes * 4),
    )
    layers = [TBottleneck(inplanes, planes, stride, downsample)]
    for _ in range(1, blocks):
        layers.append(TBottleneck(planes * 4, planes))
    return tnn.Sequential(*layers)


class TConv(tnn.Module):
    def __init__(self, cin, cout, k, s):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, (k - 1) // 2)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.elu(self.bn(self.conv(x)))


class TUpconv(tnn.Module):
    def __init__(self, cin, cout, k, scale):
        super().__init__()
        self.scale = scale
        self.conv = TConv(cin, cout, k, 1)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=self.scale, align_corners=True, mode="bilinear")
        return self.conv(x)


class TResUNet(tnn.Module):
    """torch golden with reference ResUNet structure (resnet50 encoder)."""

    def __init__(self):
        super().__init__()
        self.firstconv = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.firstbn = tnn.BatchNorm2d(64)
        self.firstmaxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = _make_layer(64, 64, 3, 1)
        self.layer2 = _make_layer(256, 128, 4, 2)
        self.layer3 = _make_layer(512, 256, 6, 2)
        self.conv_coarse = TConv(1024, 128, 1, 1)
        self.upconv3 = TUpconv(1024, 512, 3, 2)
        self.iconv3 = TConv(512 + 512, 512, 3, 1)
        self.upconv2 = TUpconv(512, 256, 3, 2)
        self.iconv2 = TConv(256 + 256, 256, 3, 1)
        self.conv_fine = TConv(256, 128, 1, 1)

    def forward(self, x):
        x = F.relu(self.firstbn(self.firstconv(x)))
        x_first = self.firstmaxpool(x)
        x1 = self.layer1(x_first)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x_coarse = self.conv_coarse(x3)
        y = self.upconv3(x3)
        y = torch.cat([x2, y], dim=1)
        y = self.iconv3(y)
        y = self.upconv2(y)
        y = torch.cat([x1, y], dim=1)
        y = self.iconv2(y)
        x_fine = self.conv_fine(y)
        return {"global_map": x_coarse, "local_map": x_fine, "local_map_small": x_first}


class TKeypointDet(tnn.Module):
    def __init__(self, in_channels=192, out_channels=2):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_channels, in_channels, 3, 1, 1)
        self.conv2 = tnn.Conv2d(in_channels + 64, 128, 3, 1, 1)
        self.conv3 = tnn.Conv2d(128, out_channels, 1, 1, 0)
        self.relu = tnn.PReLU()
        self.convimg = tnn.Conv2d(3, 64, 3, 1, 1)
        self.inorm = lambda x: F.instance_norm(x)

    def forward(self, fine_map, img):
        x_pf = torch.ones_like(fine_map).mean(1, True)
        x_pi = torch.ones_like(img).mean(1, True)
        x = self.relu(self.inorm(self.conv1(x_pf * fine_map)))
        x = F.interpolate(x, img.shape[2:], align_corners=False, mode="bilinear")
        img_t = self.inorm(self.convimg(x_pi * img))
        x = torch.cat([x, img_t], dim=1)
        x = self.relu(self.inorm(self.conv2(x)))
        score = F.softplus(self.inorm(self.conv3(x)))
        score = (
            F.interpolate(x_pf, img.shape[2:], align_corners=False, mode="bilinear").mean(1, True)
            * x_pi.mean(1, True)
            * score
        )
        return score


# ------------------------------------------------------------------- tests


def test_resize_matches_torch(rng):
    x = torch.from_numpy(rng.rand(2, 5, 12, 16).astype(np.float32))
    for ac, size in [(True, (24, 32)), (False, (24, 32)), (False, (48, 64)), (True, (7, 9))]:
        ref = F.interpolate(x, size, mode="bilinear", align_corners=ac)
        ours = interpolate_bilinear(
            jnp.asarray(x.permute(0, 2, 3, 1).numpy()), size, align_corners=ac
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_resunet_parity(rng):
    torch.manual_seed(0)
    tmodel = TResUNet().eval()
    # randomize BN running stats so the import path is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x_t = torch.from_numpy(rng.rand(1, 3, 64, 80).astype(np.float32))
    with torch.no_grad():
        ref = tmodel(x_t)

    variables = jax.tree.map(jnp.asarray, import_resunet(tmodel.state_dict()))
    model = ResUNet(encoder="resnet50")
    ours = model.apply(variables, jnp.asarray(x_t.permute(0, 2, 3, 1).numpy()), train=False)

    for key_ in ("global_map", "local_map", "local_map_small"):
        np.testing.assert_allclose(
            np.asarray(ours[key_]),
            ref[key_].permute(0, 2, 3, 1).numpy(),
            rtol=1e-3,
            atol=2e-4,
            err_msg=key_,
        )


def test_keypoint_det_parity(rng):
    torch.manual_seed(1)
    tmodel = TKeypointDet().eval()
    fm = torch.from_numpy(rng.rand(1, 192, 16, 20).astype(np.float32))
    img = torch.from_numpy(rng.rand(1, 3, 64, 80).astype(np.float32))
    with torch.no_grad():
        ref = tmodel(fm, img)

    variables = jax.tree.map(jnp.asarray, import_keypoint_det(tmodel.state_dict()))
    model = KeypointDet(in_channels=192, out_channels=2, prior="identity", act="Softplus",
                        fused_upsample=False)
    ours = model.apply(
        variables,
        jnp.asarray(fm.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=2e-4
    )


def test_decoder_accum_f32_checkpoint_compatible(rng, monkeypatch):
    """POSFEAT_DECODER_ACCUM=f32 swaps decoder convs for the
    bf16-in/f32-out accumulator variant; its parameter tree must be
    IDENTICAL to the default path (same names/shapes) so checkpoints
    interchange, and outputs must agree to bf16 rounding."""
    model = ResUNet(encoder="resnet18", pretrained=False,
                    coarse_out_ch=64, fine_out_ch=64, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    v0 = model.init(jax.random.PRNGKey(0), x)
    out0 = model.apply(v0, x)

    monkeypatch.setenv("POSFEAT_DECODER_ACCUM", "f32")
    model2 = ResUNet(encoder="resnet18", pretrained=False,
                     coarse_out_ch=64, fine_out_ch=64, dtype=jnp.bfloat16)
    v1 = model2.init(jax.random.PRNGKey(0), x)
    t0 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v0)
    t1 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v1)
    assert t0 == t1
    # cross-load: default-path params through the accum path
    out1 = model2.apply(v0, x)
    d = np.abs(
        np.asarray(out1["local_map"], np.float32)
        - np.asarray(out0["local_map"], np.float32)
    )
    scale = float(np.abs(np.asarray(out0["local_map"], np.float32)).mean())
    assert np.isfinite(d).all()
    assert d.max() <= 0.12 * max(scale, 1e-3), (d.max(), scale)


def test_resunet_hr_shape_contract(rng):
    """ResUNetHR (DescNet.py:86-165): one more decoder level — local_map
    at H/2 (vs H/4), local_map_small = the un-pooled stem at H/2."""
    from posfeat_tpu.models import ResUNetHR

    model = ResUNetHR(encoder="resnet18", pretrained=False,
                      coarse_out_ch=64, fine_out_ch=64)
    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    assert out["local_map"].shape == (1, 32, 48, 64)
    assert out["local_map_small"].shape == (1, 32, 48, 64)
    assert out["global_map"].shape == (1, 4, 6, 64)
    for k, a in out.items():
        assert np.isfinite(np.asarray(a, np.float32)).all(), k


# ------------------------------------------------- ResUNetHR parity


class TBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return F.relu(out + idt)


def _make_layer_basic(inplanes, planes, blocks, stride):
    downsample = None
    if stride != 1 or inplanes != planes:
        downsample = tnn.Sequential(
            tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
            tnn.BatchNorm2d(planes),
        )
    layers = [TBasicBlock(inplanes, planes, stride, downsample)]
    for _ in range(1, blocks):
        layers.append(TBasicBlock(planes, planes))
    return tnn.Sequential(*layers)


class TResUNetHR(tnn.Module):
    """torch golden with reference ResUNetHR structure (DescNet.py:86-165),
    resnet18 encoder (filters [64,128,256])."""

    def __init__(self, out_ch=64):
        super().__init__()
        self.firstconv = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.firstbn = tnn.BatchNorm2d(64)
        self.firstmaxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = _make_layer_basic(64, 64, 2, 1)
        self.layer2 = _make_layer_basic(64, 128, 2, 2)
        self.layer3 = _make_layer_basic(128, 256, 2, 2)
        self.conv_coarse = TConv(256, out_ch, 1, 1)
        self.upconv3 = TUpconv(256, 512, 3, 2)
        self.iconv3 = TConv(128 + 512, 512, 3, 1)
        self.upconv2 = TUpconv(512, 256, 3, 2)
        self.iconv2 = TConv(64 + 256, 256, 3, 1)
        self.upconv1 = TUpconv(256, 192, 3, 2)
        self.iconv1 = TConv(64 + 192, 256, 3, 1)
        self.conv_fine = TConv(256, out_ch, 1, 1)

    def forward(self, x):
        x_first1 = F.relu(self.firstbn(self.firstconv(x)))
        x_first = self.firstmaxpool(x_first1)
        x1 = self.layer1(x_first)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x_coarse = self.conv_coarse(x3)
        y = self.upconv3(x3)
        y = torch.cat([x2, y], dim=1)
        y = self.iconv3(y)
        y = self.upconv2(y)
        y = torch.cat([x1, y], dim=1)
        y = self.iconv2(y)
        y = self.upconv1(y)
        y = torch.cat([x_first1, y], dim=1)
        y = self.iconv1(y)
        x_fine = self.conv_fine(y)
        return {
            "global_map": x_coarse,
            "local_map": x_fine,
            "local_map_small": x_first1,
        }


@pytest.mark.slow
def test_resunet_hr_parity(rng):
    """Numeric parity of ResUNetHR + the HR branch of import_resunet
    (top-level stem_conv/stem_bn/layerN_i naming) vs a torch golden."""
    from posfeat_tpu.models import ResUNetHR

    torch.manual_seed(2)
    tmodel = TResUNetHR().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x_t = torch.from_numpy(rng.rand(1, 3, 64, 80).astype(np.float32))
    with torch.no_grad():
        ref = tmodel(x_t)

    variables = jax.tree.map(jnp.asarray, import_resunet(tmodel.state_dict()))
    model = ResUNetHR(encoder="resnet18", pretrained=False,
                      coarse_out_ch=64, fine_out_ch=64)
    ours = model.apply(
        variables, jnp.asarray(x_t.permute(0, 2, 3, 1).numpy()), train=False
    )

    for key_ in ("global_map", "local_map", "local_map_small"):
        np.testing.assert_allclose(
            np.asarray(ours[key_]),
            ref[key_].permute(0, 2, 3, 1).numpy(),
            rtol=1e-3,
            atol=2e-4,
            err_msg=key_,
        )


def test_desc_tail_f32_checkpoint_compatible(rng, monkeypatch):
    """POSFEAT_DESC_TAIL_F32 runs the descriptor-forming tail (upconv2/
    iconv2/conv_fine) with f32 OPERANDS under a bf16 trunk. The param
    tree must be identical to the default path (checkpoints
    interchange) and outputs must agree to bf16 rounding."""
    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    model = ResUNet(encoder="resnet18", pretrained=False,
                    coarse_out_ch=64, fine_out_ch=64, dtype=jnp.bfloat16)
    v0 = model.init(jax.random.PRNGKey(0), x)
    out0 = model.apply(v0, x)

    for tail in ("iconv2", "up2", "split2"):
        monkeypatch.setenv("POSFEAT_DESC_TAIL_F32", tail)
        m2 = ResUNet(encoder="resnet18", pretrained=False,
                     coarse_out_ch=64, fine_out_ch=64, dtype=jnp.bfloat16)
        v1 = m2.init(jax.random.PRNGKey(0), x)
        t0 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v0)
        t1 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v1)
        assert t0 == t1, tail
        out1 = m2.apply(v0, x)
        assert out1["local_map"].dtype == jnp.float32, tail
        d = np.abs(
            np.asarray(out1["local_map"], np.float32)
            - np.asarray(out0["local_map"], np.float32)
        )
        scale = float(np.abs(np.asarray(out0["local_map"], np.float32)).mean())
        assert np.isfinite(d).all(), tail
        assert d.max() <= 0.12 * max(scale, 1e-3), (tail, d.max(), scale)
    monkeypatch.delenv("POSFEAT_DESC_TAIL_F32")


def test_desc_tail_f32_hr_checkpoint_compatible(rng, monkeypatch):
    """ResUNetHR honors the same POSFEAT_DESC_TAIL_F32 contract on ITS
    last decoder handoff (upconv1/iconv1 at H/2) — previously the knob
    was silently ignored there, the trap ADVICE r2 flagged for
    DESC_F32. Checkpoint-compatible, outputs agree to bf16 rounding."""
    from posfeat_tpu.models import ResUNetHR

    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    model = ResUNetHR(encoder="resnet18", pretrained=False,
                      coarse_out_ch=64, fine_out_ch=64, dtype=jnp.bfloat16)
    v0 = model.init(jax.random.PRNGKey(0), x)
    out0 = model.apply(v0, x)

    for tail in ("up2", "iconv2", "split3"):
        monkeypatch.setenv("POSFEAT_DESC_TAIL_F32", tail)
        m2 = ResUNetHR(encoder="resnet18", pretrained=False,
                       coarse_out_ch=64, fine_out_ch=64, dtype=jnp.bfloat16)
        v1 = m2.init(jax.random.PRNGKey(0), x)
        t0 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v0)
        t1 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v1)
        assert t0 == t1, tail
        out1 = m2.apply(v0, x)
        assert out1["local_map"].dtype == jnp.float32, tail
        d = np.abs(
            np.asarray(out1["local_map"], np.float32)
            - np.asarray(out0["local_map"], np.float32)
        )
        scale = float(np.abs(np.asarray(out0["local_map"], np.float32)).mean())
        assert np.isfinite(d).all(), tail
        assert d.max() <= 0.12 * max(scale, 1e-3), (tail, d.max(), scale)
    monkeypatch.delenv("POSFEAT_DESC_TAIL_F32")


def test_score_f32_prevents_tie_collapse(rng, monkeypatch):
    """A bf16 score map collapses to a handful of distinct values, and
    the reference's index tie-breaking then raster-biases the top-k
    (measured -0.068 MMA at the HPatches operating point, PROOFS.md).
    POSFEAT_SCORE_F32 (default on) must keep the score values f32-
    distinct under a bf16 trunk."""
    from posfeat_tpu.models import KeypointDet

    fm = jnp.asarray(rng.rand(1, 48, 64, 192).astype(np.float32))
    img = jnp.asarray(rng.rand(1, 192, 256, 3).astype(np.float32))

    def top_distinct(score):
        s = np.asarray(score, np.float32)[0, :, :, 0].ravel()
        top = np.sort(s)[-2048:]
        return len(np.unique(top))

    model = KeypointDet(in_channels=192, out_channels=2, prior="identity",
                        act="Softplus", fused_upsample=False,
                        dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(3), fm, img)

    monkeypatch.setenv("POSFEAT_SCORE_F32", "0")
    n_off = top_distinct(model.apply(v, fm, img))
    monkeypatch.setenv("POSFEAT_SCORE_F32", "1")
    out_on = model.apply(v, fm, img)
    n_on = top_distinct(out_on)
    assert out_on.dtype == jnp.float32
    # bf16 buckets the top-2048 into a few score classes; f32 keeps
    # nearly every value distinct
    assert n_off < 300, n_off
    assert n_on > 1800, n_on


def test_conv_split3_matches_true_f32():
    """_ConvSplit2 n_passes=3 (bf16x3) must reproduce the true-f32 conv
    to ~bf16^2 precision — the basis for shipping split3 as the cheap
    f32-equivalent descriptor tail (PROOFS.md)."""
    from posfeat_tpu.models.resunet import _ConvSplit2

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 16, 24, 64).astype(np.float32))
    m3 = _ConvSplit2(32, 3, 1, n_passes=3)
    m2 = _ConvSplit2(32, 3, 1, n_passes=2)
    v = m3.init(jax.random.PRNGKey(0), x)
    w = v["params"]["kernel"]
    b = v["params"]["bias"]
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b
    scale = float(np.abs(np.asarray(ref)).mean())
    d3 = float(np.abs(np.asarray(m3.apply(v, x) - ref)).max())
    d2 = float(np.abs(np.asarray(m2.apply(v, x) - ref)).max())
    # 3-pass: both operands' rounding corrected -> ~2^-16 relative
    assert d3 <= 2e-4 * scale, (d3, scale)
    # 2-pass corrects activations only; weight rounding (~2^-8) remains
    assert d3 < d2, (d3, d2)



def test_splitcat_matches_concat_dataflow():
    """The concat-free skip iconv (ConvBNEluSplitCat — the bf16 default
    since r5; device A/B 279.2 vs 278.6 im/s) must equal the reference
    concat dataflow on identical params. Parameter trees are
    interchangeable by construction."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from posfeat_tpu.models.resunet import (
        ConvBNElu,
        ConvBNEluSplitCat,
        _skipconnect,
    )

    key = jax.random.PRNGKey(0)
    ka, kb, ki = jax.random.split(key, 3)
    a = jax.random.normal(ka, (2, 12, 16, 24))  # skip operand
    b = jax.random.normal(kb, (2, 12, 16, 40))  # upsampled operand
    ref_mod = ConvBNElu(32, 3, 1, jnp.float32)
    split_mod = ConvBNEluSplitCat(32, 3, jnp.float32)
    cat = _skipconnect(b, a)  # [a, b] channel order
    params = ref_mod.init(ki, cat)
    ref = ref_mod.apply(params, cat)
    got = split_mod.apply(params, a, b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )
