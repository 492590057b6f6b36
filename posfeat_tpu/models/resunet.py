"""ResUNet descriptor backbone: ResNet encoder + U-Net decoder (flax, NHWC).

TPU-first rebuild of the reference DescNet (networks/DescNet.py:11-165):
same topology and numerics (Conv+BN+ELU decoder blocks, bilinear ×2
align_corners=True upsampling, pad-corrected skip concat), implemented as
flax.linen modules with a configurable compute dtype (bf16 on TPU, f32
params/statistics). The torchvision encoder is re-implemented natively;
ImageNet weights can be imported via tools/import_torch_weights.py.

Outputs (NHWC): {'global_map': H/16 × coarse_out_ch,
                 'local_map': H/4 × fine_out_ch,
                 'local_map_small': H/4 × 64 (post-maxpool stem)}.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import interpolate_bilinear

# layer configs of the torchvision families (only layers 1-3 are used)
_ENCODERS = {
    "resnet18": ("basic", (2, 2, 2), 1),
    "resnet34": ("basic", (3, 4, 6), 1),
    "resnet50": ("bottleneck", (3, 4, 6), 1),
    "resnet101": ("bottleneck", (3, 4, 23), 1),
    "resnet152": ("bottleneck", (3, 8, 36), 1),
    "wide_resnet50_2": ("bottleneck", (3, 4, 6), 2),
}


def _bn(train: bool, dtype, name: str):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def _conv(out_ch, kernel, stride, dtype, name, use_bias=False):
    p = (kernel - 1) // 2
    # HIGHEST: exact f32 when dtype is f32 (this jax build's default would
    # silently downcast to bf16); native-speed when dtype is bf16.
    return nn.Conv(
        out_ch,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(p, p), (p, p)],
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
        name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.planes, 3, self.stride, self.dtype, "conv1")(x)
        out = _bn(train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dtype, "conv2")(out)
        out = _bn(train, self.dtype, "bn2")(out)
        if self.downsample:
            identity = _conv(self.planes, 1, self.stride, self.dtype, "ds_conv")(x)
            identity = _bn(train, self.dtype, "ds_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    # r5 A/B note: expressing the layer-1 1×1 convs as explicit
    # dot_generals (the POSFEAT_MM1X1 experiment, retired to git
    # history) measured 247.4 vs 278.6 im/s — XLA's chosen conv layouts
    # for the 64-lane tensors are already the best available; the r4
    # trace's ~0.11 ms "layout waste" is compiler-bound.
    planes: int
    stride: int = 1
    downsample: bool = False
    width_mult: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.planes * self.width_mult
        identity = x
        out = _conv(width, 1, 1, self.dtype, "conv1")(x)
        out = _bn(train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = _conv(width, 3, self.stride, self.dtype, "conv2")(out)
        out = _bn(train, self.dtype, "bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, 1, self.dtype, "conv3")(out)
        out = _bn(train, self.dtype, "bn3")(out)
        if self.downsample:
            identity = _conv(self.planes * 4, 1, self.stride, self.dtype, "ds_conv")(x)
            identity = _bn(train, self.dtype, "ds_bn")(identity)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """torchvision-compatible ResNet stem + layers 1-3 (DescNet.py:27-35)."""

    encoder: str = "resnet50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, counts, width_mult = _ENCODERS[self.encoder]
        x = _conv(64, 7, 2, self.dtype, "firstconv")(x)
        x = _bn(train, self.dtype, "firstbn")(x)
        x = nn.relu(x)
        x_first = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )

        feats = [x_first]
        out = x_first
        for li, (n_blocks, planes, stride) in enumerate(
            zip(counts, (64, 128, 256), (1, 2, 2))
        ):
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                if block_kind == "bottleneck":
                    need_ds = bi == 0  # layer1 expands 64->256 even at stride 1
                    out = Bottleneck(
                        planes, s, need_ds, width_mult, self.dtype,
                        name=f"layer{li + 1}_{bi}",
                    )(out, train)
                else:
                    need_ds = bi == 0 and (s != 1 or li > 0)
                    out = BasicBlock(
                        planes, s, need_ds, self.dtype, name=f"layer{li + 1}_{bi}"
                    )(out, train)
            feats.append(out)
        return feats  # [x_first(H/4,64), x1(H/4), x2(H/8), x3(H/16)]


class _ConvAccumF32(nn.Module):
    """bf16-in / f32-out conv: one native MXU pass (bf16 operands) with
    the systolic array's f32 accumulator surfaced via
    preferred_element_type — removes a bf16 trunk's per-block OUTPUT
    rounding at only the f32 feature-map bandwidth cost (the MXU pass
    count is unchanged). Parameter names/shapes match nn.Conv
    ('kernel' [kh,kw,Cin,Cout], 'bias') so checkpoints interchange."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin, self.out_ch),
            jnp.float32,
        )
        p = (self.kernel - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            (self.stride, self.stride),
            [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.out_ch,), jnp.float32
            )
            y = y + b
        return y


class _ConvSplit2(nn.Module):
    """2-pass activation-split conv: f32-in / f32-out at 2x bf16 MXU
    cost. The f32 activations are split hi = bf16(x), lo = bf16(x - hi)
    and the two bf16 passes are summed in f32 — the activations'
    operand rounding (the bf16 ΔMMA residual the tail probes localized,
    PROOFS.md) is removed to ~bf16² precision while the weights stay
    single-rounded bf16 (measured benign: the iconv2-f32 probe showed
    f32 weights alone do nothing). Compare: Precision.HIGHEST f32 on
    the MXU is a 6-pass emulation — 3x the cost of this. Parameter
    names/shapes match nn.Conv so checkpoints interchange."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    # 2 passes: activations split hi/lo, weights single-rounded bf16.
    # 3 passes: + the hi-activation x lo-weight cross term — the
    # bf16x3 scheme (≈ lax.Precision.HIGH) at half HIGHEST's cost.
    n_passes: int = 2

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin, self.out_ch),
            jnp.float32,
        )
        p = (self.kernel - 1) // 2
        x = x.astype(jnp.float32)
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        whi = w.astype(jnp.bfloat16)

        def pass_(a, ww):
            return jax.lax.conv_general_dilated(
                a, ww, (self.stride, self.stride), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )

        y = pass_(hi, whi) + pass_(lo, whi)
        if self.n_passes >= 3:
            wlo = (w - whi.astype(jnp.float32)).astype(jnp.bfloat16)
            y = y + pass_(hi, wlo)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.out_ch,), jnp.float32
            )
            y = y + b
        return y


class _SplitCatConv(nn.Module):
    """conv(concat(a, b), K) as conv(a, K[..., :Ca, :]) +
    conv(b, K[..., Ca:, :]) — the operand concat never materializes.
    Both partial convs surface the f32 accumulator and the sum + bias
    round ONCE to the compute dtype, so numerics are the single-conv
    result with one fewer intermediate rounding. Params identical to
    nn.Conv over the concatenated input ('kernel' [k,k,Ca+Cb,Cout],
    'bias') — checkpoints interchange."""

    out_ch: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        ca, cb = a.shape[-1], b.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, ca + cb, self.out_ch),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_ch,), jnp.float32
        )
        p = (self.kernel - 1) // 2

        def part(x, ww):
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), ww.astype(self.dtype),
                (1, 1), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )

        y = part(a, w[:, :, :ca, :]) + part(b, w[:, :, ca:, :]) + bias
        return y.astype(self.dtype)


class ConvBNEluSplitCat(nn.Module):
    """ConvBNElu over a (virtual) channel concat of two operands without
    materializing the concat — the bf16 default for the decoder skip
    iconvs since r5 (device A/B 279.2 vs 278.6 im/s, two runs; one
    fewer output rounding than the concat dataflow). Parameter tree
    identical to ConvBNElu ('conv' + 'bn'), so checkpoints
    interchange."""

    out_ch: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a, b, train: bool = False):
        x = _SplitCatConv(self.out_ch, self.kernel, self.dtype, name="conv")(a, b)
        x = _bn(train, self.dtype, "bn")(x)
        return nn.elu(x)


class ConvBNElu(nn.Module):
    """The reference's `conv` block: Conv2d + BN + ELU (DescNet.py:167-179).

    accum_f32: use the bf16-in/f32-out conv and keep BN + ELU in f32
    (parameters identical either way).
    split2: use the 2-pass activation-split conv (f32-in/f32-out at 2x
    bf16 cost); wins over accum_f32 when both are set."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    accum_f32: bool = False
    split2: bool = False
    split_passes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.split2:
            x = _ConvSplit2(
                self.out_ch, self.kernel, self.stride,
                n_passes=self.split_passes, name="conv"
            )(x)
            x = _bn(train, jnp.float32, "bn")(x)
        elif self.accum_f32:
            x = _ConvAccumF32(
                self.out_ch, self.kernel, self.stride, name="conv"
            )(x)
            x = _bn(train, jnp.float32, "bn")(x)
        else:
            x = _conv(self.out_ch, self.kernel, self.stride, self.dtype,
                      "conv", use_bias=True)(x)
            x = _bn(train, self.dtype, "bn")(x)
        return nn.elu(x)


class UpConv(nn.Module):
    """bilinear ×scale (align_corners=True) + ConvBNElu (DescNet.py:182-190)."""

    out_ch: int
    kernel: int = 3
    scale: int = 2
    dtype: Any = jnp.float32
    accum_f32: bool = False
    # run the bilinear lerp arithmetic in f32 and round ONCE to the
    # compute dtype (instead of rounding every lerp partial) — pure
    # VPU work, zero MXU cost; a candidate piece of the bf16 ΔMMA fix
    interp_f32: bool = False
    # 2/3-pass activation-split conv; with interp_f32 the f32 lerp
    # output feeds the split UNROUNDED (the full 'split2' tail dataflow)
    split2: bool = False
    split_passes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        xi = x.astype(jnp.float32) if self.interp_f32 else x
        xi = interpolate_bilinear(
            xi, (H * self.scale, W * self.scale), align_corners=True
        )
        xi = xi if (self.split2 and self.interp_f32) else xi.astype(x.dtype)
        return ConvBNElu(self.out_ch, self.kernel, 1, self.dtype,
                         accum_f32=self.accum_f32, split2=self.split2,
                         split_passes=self.split_passes,
                         name="conv")(
            xi, train
        )


def _skip_pad(x1, x2):
    """Zero-pad x1 to x2's spatial size (DescNet.py:50-62); no-op at
    %16-cropped shapes where the sizes already agree."""
    dy = x2.shape[1] - x1.shape[1]
    dx = x2.shape[2] - x1.shape[2]
    if dy == 0 and dx == 0:
        return x1
    return jnp.pad(
        x1,
        ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)),
    )


def _skipconnect(x1, x2):
    """Pad + concat channels, skip first (DescNet.py:50-62)."""
    return jnp.concatenate([x2, _skip_pad(x1, x2)], axis=-1)



TAIL_VARIANTS = (
    "iconv2", "up2",
    "split2", "split3", "split3w",
)


def _tail_plan(tail: str, bf16: bool):
    """Resolve the POSFEAT_DESC_TAIL_F32 / desc_tail variant into the
    plan for a backbone's LAST decoder handoff (the level descriptors
    form at): (split2, split_passes, up_f32, ic_f32, interp_f32).
    Raises on unknown names — a typo'd variant must not silently run
    the plain bf16 tail while probes record it as active.

    The round-2 decomposition probes 'up2o', 'upsamp' and 'upsamp3'
    (partial f32 cuts that all failed the 0.005 ΔMMA budget on the wide
    fixture, ARCHITECTURE.md "Numerics") were retired in round 4; 'up2'
    stays as the true-f32 gold tail the split variants are validated
    against (split3 matches it to 8e-6, PROOFS.md)."""
    if tail and tail not in TAIL_VARIANTS:
        raise ValueError(
            f"unknown POSFEAT_DESC_TAIL_F32/desc_tail variant {tail!r}; "
            f"expected one of {TAIL_VARIANTS}"
        )
    split2 = bf16 and tail in ("split2", "split3", "split3w")
    split_passes = 2 if tail == "split2" else 3
    up_f32 = bf16 and tail == "up2"
    ic_f32 = bf16 and tail in ("iconv2", "up2")
    interp = split2
    return split2, split_passes, up_f32, ic_f32, interp


class ResUNet(nn.Module):
    """Dense-descriptor U-Net (reference networks/DescNet.py:11-84)."""

    encoder: str = "resnet50"
    pretrained: bool = True  # weights imported externally; kept for config parity
    coarse_out_ch: int = 128
    fine_out_ch: int = 128
    dtype: Any = jnp.float32
    # config-level default for the bf16 descriptor-tail numerics fix
    # (same values as POSFEAT_DESC_TAIL_F32, which overrides it) — lets
    # an extract config request e.g. backbone_config: {desc_tail:
    # split3} without environment plumbing
    desc_tail: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.encoder in _ENCODERS, f"Incorrect encoder type {self.encoder}"
        x = x.astype(self.dtype)
        x_first, x1, x2, x3 = ResNetEncoder(self.encoder, self.dtype, name="encoder")(
            x, train
        )

        x_coarse = ConvBNElu(self.coarse_out_ch, 1, 1, self.dtype, name="conv_coarse")(
            x3, train
        )

        # Numerics knobs for the bf16 fast path (both no-ops at f32;
        # both checkpoint-compatible; judged by the trained delta-MMA
        # probe, tools/selection_stability.py):
        #   POSFEAT_DECODER_ACCUM=f32 — decoder convs stay single bf16
        #     MXU passes but surface the f32 accumulator
        #     (bf16-in/f32-out) with BN/ELU in f32, removing the
        #     descriptor path's per-block output rounding for only
        #     feature-map bandwidth.
        #   POSFEAT_DESC_F32=1 — final projection (conv_fine) fully f32
        #     (~1.3 GF/img, negligible).
        import os

        acc = (
            os.environ.get("POSFEAT_DECODER_ACCUM") == "f32"
            and self.dtype == jnp.bfloat16
        )
        # POSFEAT_DESC_TAIL_F32: run the descriptor-FORMING tail with f32
        # OPERANDS (not just f32 accumulation — the round-2 ΔMMA
        # decomposition showed the residual bf16 error is operand
        # rounding where descriptors form, ARCHITECTURE.md "Numerics").
        #   'up2'    — upconv2 + iconv2 + conv_fine in f32 (the gold
        #              tail the split variants are validated against)
        #   'iconv2' — iconv2 + conv_fine in f32
        #   'split2' — f32 lerp + 2-pass activation-split convs for
        #              upconv2/iconv2 (+f32 conv_fine): the same operand
        #              de-rounding as 'up2' at 2x bf16 MXU cost instead
        #              of Precision.HIGHEST f32's 6x
        #   'split3' — 3-pass splits (+ hi-act x lo-weight term); matches
        #              the true-f32 up2 tail to 8e-6 at half HIGHEST's
        #              passes — the bf16 shipping candidate (PROOFS.md)
        #   'split3w'— split3 widened one level up (upconv3/iconv3 at
        #              H/8 too, +~0.5x the H/4 split cost): the prepared
        #              fallback if the full-size 8192-pt probe puts
        #              split3 over the 0.005 budget
        # These run at H/4 (a small fraction of trunk FLOPs); judged by
        # the trained-probe ΔMMA like the other gates.
        tail = os.environ.get("POSFEAT_DESC_TAIL_F32", "") or self.desc_tail
        bf16 = self.dtype == jnp.bfloat16
        split2, split_passes, up_f32, ic_f32, interp = _tail_plan(tail, bf16)
        wide = bf16 and tail == "split3w"
        y = UpConv(
            512, 3, 2, self.dtype, accum_f32=acc and not wide,
            interp_f32=wide,
            split2=wide, split_passes=3,
            name="upconv3",
        )(x3, train)
        # Concat-free skip iconvs (r5): compute conv(concat(skip, up))
        # as two partial convs summed in f32 — the 1024/512-ch concat
        # copies never materialize and the sum rounds ONCE (one fewer
        # rounding than the baseline). Device A/B: 279.16/279.26 vs
        # 278.61 im/s (two runs) — small, consistent, numerics
        # equal-or-better, so it is the bf16 EXTRACTION default. f32
        # keeps the reference concat dataflow (the exact-parity mode),
        # the f32/split tail variants keep theirs, and TRAINING keeps
        # the concat dataflow too: the f32-accumulator partial convs
        # have no mixed-dtype VJP (lax conv transpose requires matching
        # operand dtypes), and extraction is where the throughput
        # contract lives.
        splitcat = bf16 and not train
        if splitcat and not wide and not acc:
            y = ConvBNEluSplitCat(512, 3, self.dtype, name="iconv3")(
                x2, _skip_pad(y.astype(self.dtype), x2), train
            )
        else:
            y = _skipconnect(y if wide else y.astype(self.dtype), x2)
            y = ConvBNElu(
                512, 3, 1, self.dtype, accum_f32=acc and not wide,
                split2=wide, split_passes=3,
                name="iconv3",
            )(y, train)

        up2_dt = jnp.float32 if up_f32 else self.dtype
        ic2_dt = jnp.float32 if ic_f32 else self.dtype
        y = UpConv(
            256, 3, 2, up2_dt,
            accum_f32=acc and up2_dt != jnp.float32 and not split2,
            interp_f32=interp,
            split2=split2, split_passes=split_passes,
            name="upconv2",
        )(y.astype(up2_dt) if not wide else y, train)
        if splitcat and not split2 and ic2_dt == self.dtype and not acc:
            y = ConvBNEluSplitCat(256, 3, self.dtype, name="iconv2")(
                x1.astype(self.dtype),
                _skip_pad(y.astype(self.dtype), x1),
                train,
            )
        else:
            # under split2 the upconv2 block emits f32 and the concat
            # promotes the bf16 skip — both operands reach the split
            # conv unrounded
            y = _skipconnect(
                y if split2 else y.astype(ic2_dt), x1.astype(ic2_dt)
            )
            y = ConvBNElu(
                256, 3, 1, ic2_dt,
                accum_f32=acc and ic2_dt != jnp.float32 and not split2,
                split2=split2, split_passes=split_passes,
                name="iconv2",
            )(y, train)

        fine_dt = (
            jnp.float32
            if (os.environ.get("POSFEAT_DESC_F32") == "1" or (bf16 and tail))
            else self.dtype
        )
        x_fine = ConvBNElu(
            self.fine_out_ch, 1, 1, fine_dt,
            accum_f32=acc and fine_dt != jnp.float32,  # DESC_F32 wins
            name="conv_fine",
        )(y.astype(fine_dt), train)

        return {
            "global_map": x_coarse,
            "local_map": x_fine,
            "local_map_small": x_first,
        }

    @property
    def out_channels(self):
        return [self.fine_out_ch, self.coarse_out_ch]


class ResUNetHR(nn.Module):
    """High-res variant with one more decoder level to H/2 (DescNet.py:86-165)."""

    encoder: str = "resnet50"
    pretrained: bool = True
    coarse_out_ch: int = 128
    fine_out_ch: int = 128
    dtype: Any = jnp.float32
    desc_tail: str = ""  # same contract as ResUNet.desc_tail

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        # stem kept un-pooled for the H/2 skip (DescNet.py:142-143)
        h = _conv(64, 7, 2, self.dtype, "stem_conv")(x)
        h = _bn(train, self.dtype, "stem_bn")(h)
        x_first1 = nn.relu(h)
        x_first = nn.max_pool(
            x_first1, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )

        block_kind, counts, width_mult = _ENCODERS[self.encoder]
        out = x_first
        feats = []
        for li, (n_blocks, planes, stride) in enumerate(
            zip(counts, (64, 128, 256), (1, 2, 2))
        ):
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                if block_kind == "bottleneck":
                    out = Bottleneck(
                        planes, s, bi == 0, width_mult, self.dtype,
                        name=f"layer{li + 1}_{bi}",
                    )(out, train)
                else:
                    need_ds = bi == 0 and (s != 1 or li > 0)
                    out = BasicBlock(
                        planes, s, need_ds, self.dtype, name=f"layer{li + 1}_{bi}"
                    )(out, train)
            feats.append(out)
        x1, x2, x3 = feats

        x_coarse = ConvBNElu(self.coarse_out_ch, 1, 1, self.dtype, name="conv_coarse")(
            x3, train
        )

        import os

        acc = (
            os.environ.get("POSFEAT_DECODER_ACCUM") == "f32"
            and self.dtype == jnp.bfloat16
        )
        y = UpConv(512, 3, 2, self.dtype, accum_f32=acc, name="upconv3")(
            x3, train
        )
        y = _skipconnect(y, x2)
        y = ConvBNElu(512, 3, 1, self.dtype, accum_f32=acc, name="iconv3")(
            y, train
        )

        # POSFEAT_DESC_TAIL_F32 applies to the LAST decoder handoff —
        # here upconv1/iconv1 at H/2 (the level descriptors form at),
        # the analog of upconv2/iconv2 in ResUNet. Same variant names,
        # same contract (see ResUNet above and PROOFS.md).
        tail = os.environ.get("POSFEAT_DESC_TAIL_F32", "") or self.desc_tail
        bf16 = self.dtype == jnp.bfloat16
        y = UpConv(
            256, 3, 2, self.dtype, accum_f32=acc,
            name="upconv2",
        )(y, train)
        y = _skipconnect(y, x1)
        y = ConvBNElu(256, 3, 1, self.dtype, accum_f32=acc, name="iconv2")(
            y, train
        )

        # split3w maps to split3 here — HR has no second handoff level
        # below H/2 to widen into
        split2, split_passes, up_f32, ic_f32, interp = _tail_plan(tail, bf16)
        up1_dt = jnp.float32 if up_f32 else self.dtype
        ic1_dt = jnp.float32 if ic_f32 else self.dtype
        y = UpConv(
            192, 3, 2, up1_dt,
            accum_f32=acc and up1_dt != jnp.float32 and not split2,
            interp_f32=interp,
            split2=split2, split_passes=split_passes,
            name="upconv1",
        )(y.astype(up1_dt), train)
        y = _skipconnect(
            y if split2 else y.astype(ic1_dt), x_first1.astype(ic1_dt)
        )
        y = ConvBNElu(
            256, 3, 1, ic1_dt,
            accum_f32=acc and ic1_dt != jnp.float32 and not split2,
            split2=split2, split_passes=split_passes,
            name="iconv1",
        )(y, train)

        # same POSFEAT_DESC_F32 contract as ResUNet: the final
        # projection runs fully f32 when the knob is set (or any tail
        # variant is active, matching ResUNet)
        fine_dt = (
            jnp.float32
            if (os.environ.get("POSFEAT_DESC_F32") == "1" or (bf16 and tail))
            else self.dtype
        )
        x_fine = ConvBNElu(
            self.fine_out_ch, 1, 1, fine_dt,
            accum_f32=acc and fine_dt != jnp.float32,
            name="conv_fine",
        )(y.astype(fine_dt), train)
        return {
            "global_map": x_coarse,
            "local_map": x_fine,
            "local_map_small": x_first1,
        }

    @property
    def out_channels(self):
        return [self.fine_out_ch, self.coarse_out_ch]
