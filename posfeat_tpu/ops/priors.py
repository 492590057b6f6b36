"""Handcrafted saliency priors: SSIM self-dissimilarity, D2-Net ratio,
ASLFeat peakiness, identity (reference preprocess_utils.py:522-596 and
networks/DeteNet.py:24-99). NHWC.

The op-library call sites (stage-1 kps_generator map_init) wrap these in
stop_gradient, matching the reference's @torch.no_grad decorations; the
model head applies them with gradients intact (DeteNet methods).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pooling import avg_pool2d, pad2d


def ssim_prior(x: jnp.ndarray, channel_mean: bool = False) -> jnp.ndarray:
    """Self-dissimilarity via SSIM against the 1px-diagonal shift.

    x: [B, H, W, C] -> [B, H, W, C] (or [B, H, W, 1] with channel_mean).
    """
    C1 = 0.01**2
    C2 = 0.03**2

    x_pad = pad2d(jnp.abs(x), (0, 1, 0, 1), mode="reflect")
    x_lu = x_pad[:, :-1, :-1, :]
    x_rb = x_pad[:, 1:, 1:, :]

    x_lu = pad2d(x_lu, (1, 1, 1, 1), mode="reflect")
    x_rb = pad2d(x_rb, (1, 1, 1, 1), mode="reflect")

    m_lu = avg_pool2d(x_lu, 3, 1)
    m_rb = avg_pool2d(x_rb, 3, 1)

    sig_lu = avg_pool2d(x_lu**2, 3, 1) - m_lu**2
    sig_rb = avg_pool2d(x_rb**2, 3, 1) - m_rb**2
    sig_lu_rb = avg_pool2d(x_lu * x_rb, 3, 1) - m_lu * m_rb

    n = (2 * m_lu * m_rb + C1) * (2 * sig_lu_rb + C2)
    d = (m_lu**2 + m_rb**2 + C1) * (sig_lu + sig_rb + C2)

    out = jnp.clip((1 - n / d) / 2, 0, 1)
    if channel_mean:
        out = out.mean(axis=-1, keepdims=True)
    return out


def d2_prior(x: jnp.ndarray) -> jnp.ndarray:
    """D2-Net local-softmax × channel-ratio score. [B,H,W,C] -> [B,H,W,1]."""
    B = x.shape[0]
    window = 3
    pad = window // 2

    x = jax.nn.relu(x)
    max_per_sample = x.reshape(B, -1).max(axis=1).reshape(B, 1, 1, 1)
    e = jnp.exp(x / max_per_sample)
    sum_exp = window**2 * avg_pool2d(
        pad2d(e, (pad,) * 4, mode="constant", value=1.0), window, 1
    )
    local_max_score = e / sum_exp

    depth_max = x.max(axis=-1, keepdims=True)
    depth_score = x / depth_max

    return (local_max_score * depth_score).max(axis=-1, keepdims=True)


def asl_peak_prior(x: jnp.ndarray) -> jnp.ndarray:
    """ASLFeat softplus peakiness. [B,H,W,C] -> [B,H,W,1]."""
    B = x.shape[0]
    window = 3
    pad = window // 2

    max_per_sample = x.reshape(B, -1).max(axis=1).reshape(B, 1, 1, 1)
    x = x / max_per_sample

    alpha = jax.nn.softplus(
        x - avg_pool2d(pad2d(x, (pad,) * 4, mode="reflect"), window, 1)
    )
    beta = jax.nn.softplus(x - x.mean(axis=-1, keepdims=True))
    return (alpha * beta).max(axis=-1, keepdims=True)


def identity_prior(x: jnp.ndarray) -> jnp.ndarray:
    """Constant-1 prior. [B,H,W,C] -> [B,H,W,1]."""
    return jnp.ones_like(x[..., :1])


PRIORS = {
    "SSIM": ssim_prior,
    "D2": d2_prior,
    "ASL_Peak": asl_peak_prior,
    "identity": identity_prior,
}
