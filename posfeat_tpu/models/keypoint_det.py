"""Keypoint score head ("DeteNet") — reference networks/DeteNet.py:5-120.

Spatial-attention head over [fine_map, image]: a handcrafted prior
modulates both streams, trunk convs run at feature resolution, the score
is emitted at full image resolution. InstanceNorm layers are
non-affine (torch InstanceNorm2d defaults); the PReLU slope is a single
shared parameter reused at every activation site, as in the reference.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import interpolate_bilinear


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Non-affine InstanceNorm2d over spatial dims (NHWC), biased variance.

    Statistics accumulate in f32 regardless of compute dtype — a bf16
    reduction over ~300k pixels would lose all precision.
    """
    xf = x.astype(jnp.float32)
    n = x.shape[1] * x.shape[2]
    # single-traversal moments (XLA fuses both reductions into one pass
    # over HBM): var = E[x^2] - E[x]^2, biased, matching torch
    s1 = jnp.sum(xf, axis=(1, 2), keepdims=True)
    s2 = jnp.sum(xf * xf, axis=(1, 2), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _bilinear_taps_1d(k: int):
    """1-D bilinear ×k kernel u[m], m in [-(k//2 - ... )]; for
    align_corners=False the support is 2k taps centered off-grid. Returns
    (offsets list, values list) with u[m] = weight of x[j] in output
    o = 4j + ... (transposed-conv form o - k*j = m)."""
    import numpy as np

    taps = {}
    for r in range(k):
        off = (r + 0.5) / k - 0.5
        i0 = int(np.floor(off))
        w1 = off - i0
        # x[j' + i0] contributes to o = k*j' + r -> m = r - k*i0
        taps[r - k * i0] = taps.get(r - k * i0, 0.0) + (1.0 - w1)
        taps[r - k * (i0 + 1)] = taps.get(r - k * (i0 + 1), 0.0) + w1
    ms = sorted(taps)
    return ms, [taps[m] for m in ms]


def fused_upsample_conv3x3(
    trunk: jnp.ndarray, kernel: jnp.ndarray, k: int = 4
) -> jnp.ndarray:
    """conv3x3(bilinear_upsample_x{k}(trunk)) as ONE input-dilated conv.

    The head's hot path (DeteNet.py:108-112) materializes an H×W×192
    upsampled tensor (≈1 GB per batch at 480×640 bf16) only to feed a 3×3
    conv. Both ops are linear, so their composition is a single
    transposed convolution with the composite kernel
    w[m] = Σ_d c[d]·u[m+d] (support (2k+2)²), lowered by XLA to one MXU
    conv with lhs_dilation=k — the intermediate never exists.

    Border semantics: the upsample's edge clamping is reproduced by a
    1-px edge pad of the trunk; the 3×3 conv's zero padding differs from
    the composite in the outermost output row/column only (the reference
    zero-pads the upsampled map, the composite sees clamped values).
    The detector ignores the 1-px border (putils:226-228), so this does
    not affect extracted keypoints.

    trunk: [B, h, w, Cin]; kernel: [3, 3, Cin, Cout] -> [B, k*h, k*w, Cout].
    """
    import numpy as np

    ms, vals = _bilinear_taps_1d(k)
    lo, hi = ms[0], ms[-1]
    # composite support after convolving with the 3-tap conv: [lo-1, hi+1]
    n_taps = hi - lo + 3
    # u_ext[i] = u[m = i - 2 + lo], zero-padded 2 each side
    u_ext = np.zeros((n_taps + 2,), np.float32)
    for m, v in zip(ms, vals):
        u_ext[m - lo + 2] = v
    # comp_arr[t] = Σ_d K[d]·u_ext[t + d]  (t = m - (lo-1))
    A = jnp.asarray(
        np.stack([u_ext[d : d + n_taps] for d in range(3)], axis=1)
    )  # [n_taps, 3]
    kf = kernel.astype(jnp.float32)
    comp = jnp.einsum(
        "yd,xe,decf->yxcf", A, A, kf, precision=jax.lax.Precision.HIGHEST
    )  # [n_taps, n_taps, Cin, Cout]
    comp = comp.astype(trunk.dtype)

    B, h, w, Cin = trunk.shape
    # edge pad reproduces the upsample's source-index clamping
    tp = jnp.pad(trunk, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

    # cross-correlation over k-dilated padded input:
    #   y[o] = Σ_t W[t]·xp[(o + t - pl)/k]   for (o + t - pl) % k == 0
    # want y[o] = Σ_{j_p} comp[o + k - k*j_p]·xp[j_p]  (j_p = j + 1)
    # ⇒ W[t] = comp[k + pl - t]; pl = hi + 1 - k puts t in [0, n_taps).
    pl = hi + 1 - k
    # output length = pl + (k*(h+1)+1) + ph - n_taps + 1 == k*h
    ph = n_taps - pl - k - 2
    flip = comp[::-1, ::-1]  # W[t] = comp_arr[n_taps - 1 - t]
    # no preferred_element_type: a widened output dtype breaks the conv
    # VJP (transpose conv would mix bf16 primals with f32 cotangents);
    # the MXU accumulates in f32 internally either way
    out = jax.lax.conv_general_dilated(
        tp,
        flip,
        window_strides=(1, 1),
        padding=[(pl, ph), (pl, ph)],
        lhs_dilation=(k, k),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    assert out.shape[1] == k * h and out.shape[2] == k * w, out.shape
    out = _fix_border_ring(out, trunk, kernel, k)
    return out.astype(trunk.dtype)


def _fix_border_ring(out, trunk, kernel, k):
    """Overwrite the outermost output ring with the reference-exact values.

    The composite sees clamped upsample values where the reference conv2
    zero-pads the upsampled map — this differs only on the 1-px output
    ring. For k=4 the two outer upsampled rows/cols equal the edge
    row/col of the trunk exactly (both bilinear taps clamp), so the ring
    reduces to four 1-D convs on upsampled edge strips.
    """
    assert k == 4, "exact border fix derived for the head's x4 case"
    from ..ops.resize import _upsample_axis_int

    B, h, w, Cin = trunk.shape
    K = kernel.astype(jnp.float32)  # [3, 3, Cin, Cout]

    def conv1d(strip, k1d):
        # strip: [B, L, Cin]; k1d: [3, Cin, Cout]; zero 'same' padding
        return jax.lax.conv_general_dilated(
            strip[:, :, None, :],
            k1d[:, None, :, :],
            window_strides=(1, 1),
            padding=[(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )[:, :, 0, :]

    f32 = jnp.float32
    top_src = _upsample_axis_int(trunk[:, 0:1, :, :].astype(f32), k, 2)[:, 0]
    bot_src = _upsample_axis_int(trunk[:, h - 1 : h, :, :].astype(f32), k, 2)[:, 0]
    left_src = _upsample_axis_int(trunk[:, :, 0:1, :].astype(f32), k, 1)[:, :, 0]
    right_src = _upsample_axis_int(trunk[:, :, w - 1 : w, :].astype(f32), k, 1)[:, :, 0]

    # rows: z[0] uses Ux rows {0,1} (both = top_src); d=0 tap is zero-padded
    z_top = conv1d(top_src, K[1] + K[2])
    z_bot = conv1d(bot_src, K[0] + K[1])
    # cols: z[:,0] uses Ux cols {0,1} (both = left_src)
    z_left = conv1d(left_src, K[:, 1] + K[:, 2])
    z_right = conv1d(right_src, K[:, 0] + K[:, 1])

    dt = out.dtype
    # compose via concat (one materialization per axis) instead of four
    # full-tensor dynamic-update-slices
    mid = jnp.concatenate(
        [
            z_left.astype(dt)[:, 1:-1, None, :],
            out[:, 1:-1, 1:-1, :],
            z_right.astype(dt)[:, 1:-1, None, :],
        ],
        axis=2,
    )
    return jnp.concatenate(
        [z_top.astype(dt)[:, None], mid, z_bot.astype(dt)[:, None]], axis=1
    )


class _Conv2Params(nn.Module):
    """Raw conv2 parameters, shaped/named like nn.Conv's, shared by the
    fused and reference dataflows (checkpoint-layout compatible)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],), jnp.float32)
        return k, b


class KeypointDet(nn.Module):
    """Keypoint score head. `fused_upsample=True` (default) computes
    conv2 over the upsampled trunk as one dilated conv (see
    fused_upsample_conv3x3) — numerically identical except the outermost
    1-px border; set False for the literal reference dataflow."""

    in_channels: int
    out_channels: int = 1
    prior: str = "SSIM"
    act: str = "Sigmoid"
    fused_upsample: Any = True  # True=auto (bf16/f16), "always", False
    dtype: Any = jnp.float32

    def _prior(self, x):
        # per-channel priors (DeteNet methods keep gradients flowing)
        from ..ops import priors as P

        if self.prior == "SSIM":
            return P.ssim_prior(x)  # per-channel (no channel mean), DeteNet:24-45
        if self.prior == "D2":
            return P.d2_prior(x)
        if self.prior == "ASL_Peak":
            return P.asl_peak_prior(x)
        if self.prior == "identity":
            return jnp.ones_like(x).mean(axis=-1, keepdims=True)
        raise ValueError(f"unknown prior {self.prior}")

    def _act(self, x):
        if self.act == "Sigmoid":
            return jax.nn.sigmoid(x)
        if self.act == "Softplus":
            return jax.nn.softplus(x)
        raise ValueError(f"unknown act {self.act}")

    @nn.compact
    def __call__(self, fine_map: jnp.ndarray, img_tensor: jnp.ndarray):
        """fine_map: [B, h, w, C_in]; img_tensor: [B, H, W, 3] -> [B, H, W, out]."""
        conv = lambda ch, k, name: nn.Conv(
            ch,
            (k, k),
            padding=[((k - 1) // 2,) * 2] * 2,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
            name=name,
        )
        # single shared PReLU slope (torch nn.PReLU(), DeteNet.py:17)
        a = self.param("prelu", nn.initializers.constant(0.25), (1,), jnp.float32)
        prelu = lambda x: jnp.where(x >= 0, x, a.astype(x.dtype) * x)

        fine_map = fine_map.astype(self.dtype)
        img_tensor = img_tensor.astype(self.dtype)

        x_pf = self._prior(fine_map)
        x_pi = self._prior(img_tensor)

        trunk = prelu(
            instance_norm(conv(self.in_channels, 3, "conv1")(x_pf * fine_map))
        )
        img = instance_norm(conv(64, 3, "convimg")(x_pi * img_tensor))

        H, W = img_tensor.shape[1:3]
        h, w = trunk.shape[1:3]
        k2, b2 = _Conv2Params(
            (3, 3, self.in_channels + 64, 128), name="conv2"
        )()
        # fused path wins on the MXU's native bf16; in f32 the 10×10
        # composite kernel costs more HIGHEST passes than it saves, so
        # True means "auto" (low-precision only); "always" forces it
        fuse_ok = self.fused_upsample == "always" or (
            self.fused_upsample is True
            and self.dtype in (jnp.bfloat16, jnp.float16)
        )
        if fuse_ok and H == 4 * h and W == 4 * w:
            z = fused_upsample_conv3x3(trunk, k2[:, :, : self.in_channels, :], 4)
            z_img = jax.lax.conv_general_dilated(
                img,
                k2[:, :, self.in_channels :, :].astype(self.dtype),
                window_strides=(1, 1),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
            ).astype(self.dtype)
            x = z + z_img + b2.astype(self.dtype)
        else:
            xu = interpolate_bilinear(trunk, (H, W), align_corners=False)
            xcat = jnp.concatenate([xu, img], axis=-1)
            x = jax.lax.conv_general_dilated(
                xcat,
                k2.astype(self.dtype),
                window_strides=(1, 1),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
            ).astype(self.dtype) + b2.astype(self.dtype)
        x = prelu(instance_norm(x))
        score = self._act(instance_norm(conv(self.out_channels, 1, "conv3")(x)))

        score = (
            interpolate_bilinear(
                x_pf, img_tensor.shape[1:3], align_corners=False
            ).mean(axis=-1, keepdims=True)
            * x_pi.mean(axis=-1, keepdims=True)
            * score
        )
        return score
