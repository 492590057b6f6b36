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


def instance_norm(
    x: jnp.ndarray, eps: float = 1e-5, axes: tuple = (1, 2)
) -> jnp.ndarray:
    """Non-affine InstanceNorm2d over spatial dims (NHWC), biased variance.

    `axes` generalizes the spatial reduction so phase-layout tensors
    ([B, h, w, ky, kx, C], axes=(1,2,3,4)) normalize identically to their
    full-resolution counterparts. Statistics accumulate in f32 regardless
    of compute dtype — a bf16 reduction over ~300k pixels would lose all
    precision.
    """
    xf = x.astype(jnp.float32)
    n = 1
    for a in axes:
        n *= x.shape[a]
    # single-traversal moments (XLA fuses both reductions into one pass
    # over HBM): var = E[x^2] - E[x]^2, biased, matching torch
    s1 = jnp.sum(xf, axis=axes, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=axes, keepdims=True)
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


def _phase_mix_matrix(k: int):
    """Constant M[r, d, d'] expressing the phase decomposition of
    conv3x3 ∘ bilinear_upsample_×k: output phase r at trunk cell q is
    Σ_{d,d'} M[r,d,d']·K[d']·tp[q + d] per axis, tp = edge-padded trunk.

    Derivation: the composite transposed-conv kernel is
    comp[t] = Σ_{d'} u_ext[t + d']·K[d'] (t ∈ [0, n_taps)), and output
    o = k·q + r reads tap t = k·d + pl − r at padded cell q + d, with
    pl = hi + 1 − k. Flipping for cross-correlation gives tap index
    n_taps − 1 − (k·d + pl − r). Returns (M [k, D, 3], D).
    """
    import numpy as np

    ms, vals = _bilinear_taps_1d(k)
    lo, hi = ms[0], ms[-1]
    n_taps = hi - lo + 3  # composite support incl. the conv's ±1
    u_ext = np.zeros((n_taps + 2,), np.float32)
    for m, v in zip(ms, vals):
        u_ext[m - lo + 2] = v
    A = np.stack([u_ext[d : d + n_taps] for d in range(3)], axis=1)  # [t, d']
    pl = hi + 1 - k
    D = (n_taps + k - 1) // k
    M = np.zeros((k, D, 3), np.float32)
    for r in range(k):
        for d in range(D):
            t = n_taps - 1 - (k * d + pl - r)
            if 0 <= t < n_taps:
                M[r, d] = A[t]
    return M, D


def fused_upsample_conv3x3_phase(
    trunk: jnp.ndarray, kernel: jnp.ndarray, k: int = 4
) -> jnp.ndarray:
    """conv3x3(bilinear_upsample_×k(trunk)) in PHASE layout.

    The head's hot path (DeteNet.py:108-112) materializes an H×W×192
    upsampled tensor (≈1 GB per batch at 480×640 bf16) only to feed a 3×3
    conv. Both ops are linear, so each of the k² output phases is a small
    D×D conv over the trunk: one VALID conv with a [D, D, Cin, k²·Cout]
    kernel — ~k²/1.4 fewer MACs than convolving the upsampled map and no
    intermediate tensor. The result stays in phase layout
    [B, h, w, k, k, Cout] so downstream elementwise/1×1 stages never pay
    a full-resolution depth-to-space.

    Border semantics: the upsample's edge clamping is reproduced by a
    1-px edge pad of the trunk; the conv's zero padding differs from the
    composite on the outermost output ring only — fix with
    _fix_border_ring_phase for reference-exact values.
    """
    import numpy as np

    M, D = _phase_mix_matrix(k)
    kf = kernel.astype(jnp.float32)
    # Kph[d, e, c, r_y, r_x, o] = Σ_{d',e'} M[ry,d,d']·M[rx,e,e']·K[d',e',c,o]
    kph = jnp.einsum(
        "rda,sep,apcf->decrsf",
        jnp.asarray(M),
        jnp.asarray(M),
        kf,
        precision=jax.lax.Precision.HIGHEST,
    )
    B, h, w, Cin = trunk.shape
    Cout = kernel.shape[-1]
    kph = kph.reshape(D, D, Cin, k * k * Cout).astype(trunk.dtype)
    # edge pad reproduces the upsample's source-index clamping
    tp = jnp.pad(trunk, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # no preferred_element_type: a widened output dtype breaks the conv
    # VJP (transpose conv would mix bf16 primals with f32 cotangents);
    # the MXU accumulates in f32 internally either way
    z = jax.lax.conv_general_dilated(
        tp,
        kph,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    assert z.shape[1] == h and z.shape[2] == w, z.shape
    return z.reshape(B, h, w, k, k, Cout)


def space_to_phase(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """[B, k·h, k·w, C] -> [B, h, w, k, k, C] (phase/space-to-depth)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // k, k, W // k, k, C)
    return x.transpose(0, 1, 3, 2, 4, 5)


def phase_to_space(z: jnp.ndarray) -> jnp.ndarray:
    """[B, h, w, k, k, C] -> [B, k·h, k·w, C] (depth-to-space)."""
    B, h, w, ky, kx, C = z.shape
    return z.transpose(0, 1, 3, 2, 4, 5).reshape(B, h * ky, w * kx, C)


def fused_upsample_conv3x3_dilated(
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
    from posfeat_tpu.ops.resize import _upsample_axis_int

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


def fused_upsample_conv3x3(
    trunk: jnp.ndarray, kernel: jnp.ndarray, k: int = 4
) -> jnp.ndarray:
    """Reference-exact conv3x3(bilinear_upsample_×k(trunk)) at full
    resolution: phase conv + border-ring fix + depth-to-space.

    trunk: [B, h, w, Cin]; kernel: [3, 3, Cin, Cout] -> [B, k*h, k*w, Cout].
    """
    z = fused_upsample_conv3x3_phase(trunk, kernel, k)
    z = _fix_border_ring_phase(z, trunk, kernel, k)
    return phase_to_space(z).astype(trunk.dtype)


def ring_correction_strips(trunk, kernel, k: int = 4):
    """Additive border-correction strips for the phase-conv composite.

    The composite conv sees clamped upsample values where the reference
    conv2 zero-pads the upsampled map, so the composite output differs
    from the reference exactly by the padded-tap contributions: on the
    top output row the excess is conv1d(Ux[-1,·], K[0]) (Ux[-1,·] = edge
    strip, since every out-of-range bilinear tap clamps), and analogously
    for the other three edges; each corner term is counted by both
    adjacent edges, so it is removed once from the row strips. Returns
    f32 (T, Bo) [B, k·w, Cout] and (L, R) [B, k·h, Cout]. Single source
    of truth — the Pallas driver imports this.
    """
    assert k == 4, "exact border fix derived for the head's x4 case"
    from ..ops.resize import _upsample_axis_int

    B, h, w, Cin = trunk.shape
    K = kernel.astype(jnp.float32)  # [3, 3, Cin, Cout]
    f32 = jnp.float32
    # edge strips of the (virtual) upsampled map: Ux[-1,x]=top_src[x] etc.
    top_src = _upsample_axis_int(trunk[:, 0:1, :, :].astype(f32), k, 2)[:, 0]
    bot_src = _upsample_axis_int(trunk[:, h - 1 : h, :, :].astype(f32), k, 2)[:, 0]
    left_src = _upsample_axis_int(trunk[:, :, 0:1, :].astype(f32), k, 1)[:, :, 0]
    right_src = _upsample_axis_int(trunk[:, :, w - 1 : w, :].astype(f32), k, 1)[:, :, 0]

    def conv1d_edge(strip, k1d):
        # strip: [B, L, Cin]; k1d: [3, Cin, Cout]; EDGE 'same' padding —
        # the out-of-range taps of the virtual Ux clamp to the corners
        sp = jnp.pad(strip, ((0, 0), (1, 1), (0, 0)), mode="edge")
        return jax.lax.conv_general_dilated(
            sp[:, :, None, :],
            k1d[:, None, :, :],
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )[:, :, 0, :]

    T = conv1d_edge(top_src, K[0])
    Bo = conv1d_edge(bot_src, K[2])
    L = conv1d_edge(left_src, K[:, 0])
    R = conv1d_edge(right_src, K[:, 2])

    # corner double-counts (row and column strips both include them)
    prec = jax.lax.Precision.HIGHEST
    c00 = jnp.einsum("bc,cf->bf", trunk[:, 0, 0].astype(f32), K[0, 0], precision=prec)
    c0w = jnp.einsum("bc,cf->bf", trunk[:, 0, w - 1].astype(f32), K[0, 2], precision=prec)
    ch0 = jnp.einsum("bc,cf->bf", trunk[:, h - 1, 0].astype(f32), K[2, 0], precision=prec)
    chw = jnp.einsum("bc,cf->bf", trunk[:, h - 1, w - 1].astype(f32), K[2, 2], precision=prec)
    T = T.at[:, 0].add(-c00).at[:, -1].add(-c0w)
    Bo = Bo.at[:, 0].add(-ch0).at[:, -1].add(-chw)
    return T, Bo, L, R


def _fix_border_ring_phase(z, trunk, kernel, k):
    """Apply ring_correction_strips to a phase-layout tensor
    [B, h, w, k, k, Cout] as ADDITION of zero-padded thin strips — no
    dynamic-update-slice, so XLA fuses it into the downstream
    instance-norm pass instead of copying the ~GB phase tensor."""
    T, Bo, L, R = ring_correction_strips(trunk, kernel, k)
    B, h, w, Cin = trunk.shape
    C = z.shape[-1]

    def pad_row(strip, q_pos, r_pos):
        s = strip.reshape(B, 1, w, 1, k, C)
        return jnp.pad(
            s,
            (
                (0, 0),
                (q_pos, h - 1 - q_pos),
                (0, 0),
                (r_pos, k - 1 - r_pos),
                (0, 0),
                (0, 0),
            ),
        )

    def pad_col(strip, q_pos, r_pos):
        s = strip.reshape(B, h, 1, k, 1, C)
        return jnp.pad(
            s,
            (
                (0, 0),
                (0, 0),
                (q_pos, w - 1 - q_pos),
                (0, 0),
                (r_pos, k - 1 - r_pos),
                (0, 0),
            ),
        )

    D = (
        pad_row(T, 0, 0)
        + pad_row(Bo, h - 1, k - 1)
        + pad_col(L, 0, 0)
        + pad_col(R, w - 1, k - 1)
    )
    return z - D.astype(z.dtype)


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
    def __call__(
        self,
        fine_map: jnp.ndarray,
        img_tensor: jnp.ndarray,
        train: bool = False,
    ):
        """fine_map: [B, h, w, C_in]; img_tensor: [B, H, W, 3] -> [B, H, W, out].

        `train` mirrors the torch train/eval distinction for future
        mode-dependent behavior; it is currently unused here (the
        POSFEAT_SCORE_F32 path applies in both modes — its f32-operand
        DEFAULT-precision conv is the same single bf16 MXU pass with
        f32 accumulation AND differentiates cleanly, which matters
        because stage 2 trains the head under train=False for frozen-BN
        reference semantics)."""
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
        # image branch conv via raw params (nn.Conv-compatible names and
        # init) so the Pallas dataflow can fold convimg+IN+conv2img into
        # one composite kernel; stats replicate instance_norm exactly
        kimg, bimg = _Conv2Params((3, 3, 3, 64), name="convimg")()
        s_img = (x_pi * img_tensor).astype(self.dtype)
        y_img = jax.lax.conv_general_dilated(
            s_img,
            kimg.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        ) + bimg.astype(self.dtype)
        n_i = y_img.shape[1] * y_img.shape[2]
        # IN statistics in one fused pass: XLA folds the f32 convert and
        # the square into a single multi-output reduction over y_img —
        # one HBM read, f32 accumulation, no f32 copy materialized.
        # (A bf16 MXU-contraction variant — ones-vector s1 + gram-diag
        # s2 — was measured SLOWER on v5e: 0.239 vs 0.172 ms/img at
        # 16x480x640x64, tools/bench_instats.py 2026-08-19; converting
        # then squaring in f32 is numerically identical to the exact
        # bf16xbf16->f32 MAC either way.)
        y32f = y_img.astype(jnp.float32)
        s1_i = jnp.sum(y32f, axis=(1, 2))
        s2_i = jnp.sum(y32f * y32f, axis=(1, 2))
        mu_img = s1_i / n_i
        var_img = jnp.maximum(s2_i / n_i - mu_img * mu_img, 0.0)
        a_img = jax.lax.rsqrt(var_img + 1e-5)

        def img_feat():
            # IN-applied image features for the non-Pallas dataflows
            y32 = y_img.astype(jnp.float32)
            return (
                (y32 - mu_img[:, None, None, :]) * a_img[:, None, None, :]
            ).astype(self.dtype)

        H, W = img_tensor.shape[1:3]
        h, w = trunk.shape[1:3]
        k2, b2 = _Conv2Params(
            (3, 3, self.in_channels + 64, 128), name="conv2"
        )()
        # fused paths win on the MXU's native bf16; in f32 the composite
        # kernels cost more HIGHEST passes than they save, so True means
        # "auto" (low-precision only); "always" forces the composite
        # dilated conv; "phase" selects the phase-layout tail
        fuse_ok = self.fused_upsample in ("always", "phase") or (
            self.fused_upsample is True
            and self.dtype in (jnp.bfloat16, jnp.float16)
        )
        B = img_tensor.shape[0]
        size_ok = H == 4 * h and W == 4 * w
        phase = self.fused_upsample == "phase" and size_ok
        pallas_mode = self.fused_upsample == "pallas" and size_ok

        def conv2_img_part():
            # image-branch half of conv2 (shared by all fused dataflows)
            return jax.lax.conv_general_dilated(
                img_feat(),
                k2[:, :, self.in_channels :, :].astype(self.dtype),
                window_strides=(1, 1),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
            ).astype(self.dtype)

        if pallas_mode:
            # fully fused Pallas tail (forward-only; extraction path).
            # conv3 params use nn.Conv-compatible names/shapes so
            # checkpoints are interchangeable with the XLA dataflows.
            # The image branch ships as raw ingredients (scaled image,
            # unnormalized convimg output, IN stats, kernels) — the
            # driver folds them into a composite stride-4 conv (v3).
            from ..ops.pallas.fused_head import fused_head_tail

            k3, b3 = _Conv2Params(
                (1, 1, 128, self.out_channels), name="conv3"
            )()
            score = fused_head_tail(
                trunk,
                s_img,
                y_img,
                mu_img,
                a_img,
                kimg,
                bimg,
                k2[:, :, : self.in_channels, :],
                k2[:, :, self.in_channels :, :],
                b2,
                k3,
                b3,
                a,
                act=self.act,
                # Mosaic kernels are TPU-only; elsewhere run interpreted
                interpret=jax.default_backend() != "tpu",
            )
        elif phase:
            # stay in H/4 phase layout [B, h, w, 4, 4, C] through the
            # whole tail — only the 1-2 channel score map ever pays a
            # depth-to-space; numerically identical to the reference
            # dataflow (instance_norm reduces over all phases/pixels,
            # conv3 is 1×1, the rest is elementwise)
            kt = k2[:, :, : self.in_channels, :]
            z = fused_upsample_conv3x3_phase(trunk, kt, 4)
            z = _fix_border_ring_phase(z, trunk, kt, 4)
            z = z + space_to_phase(conv2_img_part(), 4) + b2.astype(self.dtype)
            x = prelu(instance_norm(z, axes=(1, 2, 3, 4)))
            x = x.reshape(B, h, w * 16, x.shape[-1])
        elif fuse_ok and size_ok:
            z = fused_upsample_conv3x3_dilated(
                trunk, k2[:, :, : self.in_channels, :], 4
            )
            x = prelu(
                instance_norm(z + conv2_img_part() + b2.astype(self.dtype))
            )
        else:
            xu = interpolate_bilinear(trunk, (H, W), align_corners=False)
            xcat = jnp.concatenate([xu, img_feat()], axis=-1)
            x = jax.lax.conv_general_dilated(
                xcat,
                k2.astype(self.dtype),
                window_strides=(1, 1),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
            ).astype(self.dtype) + b2.astype(self.dtype)
            x = prelu(instance_norm(x))
        if not pallas_mode:
            # POSFEAT_SCORE_F32 (default on): under a bf16 trunk, form
            # the SCORE VALUES in f32 — one bf16 MXU pass with the f32
            # accumulator surfaced on the 1x1 conv3 (out_channels wide:
            # ~2.5 MB/img extra bandwidth, zero extra passes) and f32
            # IN/activation. A bf16 score map collapses to ~133 distinct
            # values in a 76k-candidate top-8192 (measured, PROOFS.md) —
            # index tie-breaking then fills the budget in raster order,
            # a spatially-biased selection costing ~0.07 MMA at the
            # HPatches operating point. Exact f32 programs are
            # unaffected (ties are already rare there).
            import os as _os

            score_f32 = (
                self.dtype in (jnp.bfloat16, jnp.float16)
                and _os.environ.get("POSFEAT_SCORE_F32", "1") == "1"
            )
            if score_f32:
                k3s, b3s = _Conv2Params(
                    (1, 1, x.shape[-1], self.out_channels), name="conv3"
                )()
                # f32 operands at DEFAULT precision: on the MXU this is
                # the same single bf16 pass with the f32 accumulator
                # (operand VALUES are already bf16-rounded upstream),
                # but — unlike preferred_element_type on bf16 operands —
                # it differentiates cleanly (stage 2 trains the head
                # under train=False for frozen-BN reference semantics,
                # so the score conv must have a working VJP)
                z3 = jax.lax.conv_general_dilated(
                    x.astype(self.dtype).astype(jnp.float32),
                    k3s,
                    window_strides=(1, 1),
                    padding=[(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=jax.lax.Precision.DEFAULT,
                ) + b3s
                score = self._act(instance_norm(z3))
            else:
                score = self._act(
                    instance_norm(conv(self.out_channels, 1, "conv3")(x))
                )
            if phase:
                score = phase_to_space(
                    score.reshape(B, h, w, 4, 4, self.out_channels)
                )

        score = (
            interpolate_bilinear(
                x_pf, img_tensor.shape[1:3], align_corners=False
            ).mean(axis=-1, keepdims=True)
            * x_pi.mean(axis=-1, keepdims=True)
            * score
        )
        return score
