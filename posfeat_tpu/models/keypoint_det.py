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
    """Non-affine InstanceNorm2d over spatial dims (NHWC), biased variance."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class KeypointDet(nn.Module):
    in_channels: int
    out_channels: int = 1
    prior: str = "SSIM"
    act: str = "Sigmoid"
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

        x = prelu(instance_norm(conv(self.in_channels, 3, "conv1")(x_pf * fine_map)))
        x = interpolate_bilinear(x, img_tensor.shape[1:3], align_corners=False)
        img = instance_norm(conv(64, 3, "convimg")(x_pi * img_tensor))
        x = jnp.concatenate([x, img], axis=-1)
        x = prelu(instance_norm(conv(128, 3, "conv2")(x)))
        score = self._act(instance_norm(conv(self.out_channels, 1, "conv3")(x)))

        score = (
            interpolate_bilinear(
                x_pf, img_tensor.shape[1:3], align_corners=False
            ).mean(axis=-1, keepdims=True)
            * x_pi.mean(axis=-1, keepdims=True)
            * score
        )
        return score
