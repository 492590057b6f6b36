"""Descriptor correlation, match distributions, and alternative matchers
(log-space Sinkhorn OT, dual softmax) — reference preprocess_utils.py:55-194.

The m×n similarity products are the MXU hot path: keep them as single
batched dots in at least f32 accumulation (preferred_element_type).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .coords import gen_grid


def _bmm(a: jnp.ndarray, b_t: jnp.ndarray) -> jnp.ndarray:
    """a: [B, m, d] @ b_t: [B, n, d]^T -> [B, m, n], full-precision.

    HIGHEST keeps f32 inputs exact (no implicit bf16 downcast); descriptor
    dims are small (d=128) so the extra MXU passes are cheap relative to
    the m×n output traffic.
    """
    return jax.lax.dot_general(
        a,
        b_t,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def compute_prob(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    loss_distance: str = "cos",
    with_scale: bool = False,
    return_sim: bool = False,
):
    """Softmax match distribution between feature sets (putils:89-115).

    :param feat1: [B, m, d] query features
    :param feat2: [B, n, d] reference features
    :return: prob [B, m, n] (and sim if return_sim)
    """
    assert loss_distance in ("cos", "euc")
    if return_sim:
        assert loss_distance == "cos"
    if loss_distance == "cos":
        sim = _bmm(feat1, feat2)
        scale = jnp.sqrt(jnp.asarray(feat2.shape[1], sim.dtype)) if with_scale else 1.0
        prob = jax.nn.softmax(scale * sim, axis=-1)
    else:
        dist = (
            jnp.sum(feat1**2, axis=-1, keepdims=True)
            + jnp.sum(feat2**2, axis=-1, keepdims=True).transpose(0, 2, 1)
            - 2 * _bmm(feat1, feat2)
        )
        prob = jax.nn.softmax(-dist, axis=-1)
    if return_sim:
        return prob, sim
    return prob


def get_expected_correspondence_locs(
    feat1: jnp.ndarray, featmap2: jnp.ndarray, with_std: bool = False
):
    """Dense softmax-expected correspondence over a full map (putils:55-82).

    :param feat1: [B, n, d]; featmap2: [B, H, W, C]
    :return: expected normalized locs [B, n, 2] (+std [B,n], kurtosis, prob)
    """
    B, h2, w2, d = featmap2.shape
    grid_n = gen_grid(-1, 1, -1, 1, h2, w2, dtype=featmap2.dtype)  # [hw, 2]
    fm2 = featmap2.reshape(B, h2 * w2, d)
    prob = compute_prob(feat1, fm2)  # [B, n, hw]

    g = grid_n[None, None]  # [1, 1, hw, 2]
    expected = jnp.sum(g * prob[..., None], axis=2)  # [B, n, 2]

    if not with_std:
        return expected
    var = jnp.sum(g**2 * prob[..., None], axis=2) - expected**2
    std = jnp.sum(jnp.sqrt(jnp.clip(var, 1e-10, None)), axis=-1)
    kurt = jnp.power(g - expected[:, :, None, :], 4).mean(axis=-2) / jnp.power(var, 2)
    kurt = jnp.clip(kurt / 10.0, 0, 1)
    return expected, std, kurt.mean(-1), prob


def ot_sinkhorn_log(costs: jnp.ndarray, iters: int = 20, temperature: float = None):
    """Log-space Sinkhorn normalization of a cost matrix (putils:117-140)."""
    b, m, n = costs.shape
    norm = -jnp.log(jnp.asarray(float(m + n), costs.dtype))

    P = -temperature * costs
    log_m = norm * jnp.ones((b, m, 1), costs.dtype)
    log_n = norm * jnp.ones((b, 1, n), costs.dtype)
    u = jnp.zeros_like(log_m)
    v = jnp.zeros_like(log_n)
    for _ in range(iters):
        u = log_m - jax.nn.logsumexp(P + v, axis=2, keepdims=True)
        v = log_n - jax.nn.logsumexp(P + u, axis=1, keepdims=True)
    P = P + u + v - norm
    return jnp.exp(P), None


def ot_sinkhorn_log_unmatch(
    costs: jnp.ndarray, iters: int = 20, temperature: float = None
):
    """Sinkhorn with dustbin rows/cols for unmatched points (putils:142-174)."""
    b, m, n = costs.shape
    ms = jnp.asarray(float(m), costs.dtype)
    ns = jnp.asarray(float(n), costs.dtype)

    bins1 = 1 - costs.min(axis=2, keepdims=True)  # [b, m, 1]
    bins2 = 1 - costs.min(axis=1, keepdims=True)  # [b, 1, n]
    corner = (bins1.mean(axis=1, keepdims=True) + bins2.mean(axis=2, keepdims=True)) / 2

    costs = jnp.concatenate(
        [
            jnp.concatenate([costs, bins1], axis=-1),
            jnp.concatenate([bins2, corner], axis=-1),
        ],
        axis=1,
    )  # [b, m+1, n+1]
    norm = -jnp.log(ms + ns)

    P = -temperature * costs
    log_m = norm * jnp.ones((b, m + 1, 1), costs.dtype)
    log_n = norm * jnp.ones((b, 1, n + 1), costs.dtype)
    log_m = log_m.at[:, -1, :].set(jnp.log(ns) + norm)
    log_n = log_n.at[:, :, -1].set(jnp.log(ms) + norm)
    u = jnp.zeros_like(log_m)
    v = jnp.zeros_like(log_n)
    for _ in range(iters):
        u = log_m - jax.nn.logsumexp(P + v, axis=2, keepdims=True)
        v = log_n - jax.nn.logsumexp(P + u, axis=1, keepdims=True)
    P = P + u + v - norm
    optimal = jnp.exp(P)
    return optimal[:, :-1, :-1], optimal


def dual_softmax(costs: jnp.ndarray, iters=None, temperature: float = None):
    """Dual-softmax matcher (putils:176-194).

    Note: the product is prob_col*prob_col, faithfully reproducing the
    reference (putils:192), which squares the column softmax rather than
    multiplying row by column.
    """
    t = 15.0 if temperature is None else temperature
    costs_input = -t * costs
    prob_col = jax.nn.softmax(costs_input, axis=2)
    prob = prob_col * prob_col
    return prob, None
