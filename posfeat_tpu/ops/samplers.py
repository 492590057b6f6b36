"""Stochastic keypoint samplers with explicit PRNG keys.

Replaces the reference's torch.distributions / global-RNG sampling
(preprocess_utils.py:344-356, 467-488, 598-659; kploss.py:20-48) with
jax.random equivalents. All shapes static; cell sampling is a reshape
(no gather over H×W), which XLA lowers to pure layout ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .coords import gen_grid


def unfold(x: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/g, W/g, C, g*g] cell unfold (putils:344-350).

    Cell-internal flattening is row-major over (dy, dx), matching
    tensor.unfold(2).unfold(3). H, W need not be multiples of g; trailing
    remainder rows/cols are dropped (torch unfold semantics).
    """
    B, H, W, C = x.shape
    g = grid_size
    hg, wg = H // g, W // g
    x = x[:, : hg * g, : wg * g, :]
    x = x.reshape(B, hg, g, wg, g, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, hg, wg, C, g, g]
    return x.reshape(B, hg, wg, C, g * g)


def categorical_sample_logp(logits: jnp.ndarray, key: jax.Array):
    """Sample the trailing axis of logits; return (idx, log_prob)."""
    idx = jax.random.categorical(key, logits, axis=-1)
    logp_all = jax.nn.log_softmax(logits, axis=-1)
    logp = jnp.take_along_axis(logp_all, idx[..., None], axis=-1)[..., 0]
    return idx, logp


def bernoulli_sample_logp(logits: jnp.ndarray, key: jax.Array):
    """Bernoulli(logits) sample and its log-prob (torch parity).

    Returns (sample in {0.,1.}, log_prob).
    """
    p = jax.nn.sigmoid(logits)
    sample = jax.random.bernoulli(key, p).astype(logits.dtype)
    # log p(x) = x*log(p) + (1-x)*log(1-p), computed stably from logits:
    # log sigmoid(l) = -softplus(-l); log(1-sigmoid(l)) = -softplus(l)
    logp = jnp.where(
        sample > 0.5, -jax.nn.softplus(-logits), -jax.nn.softplus(logits)
    )
    return sample, logp


def grid_categorical_sample(kp_map: jnp.ndarray, grid_size: int, key: jax.Array):
    """Per-cell Categorical(logits=scores) pixel proposal (kploss.py:20-27).

    kp_map: [B, H, W, 1] -> (proposals [B,hg,wg] int, logp [B,hg,wg],
    cell_logits [B,hg,wg,g*g]).
    """
    cells = unfold(kp_map, grid_size)[:, :, :, 0, :]  # [B, hg, wg, g*g]
    idx, logp = categorical_sample_logp(cells, key)
    return idx, logp, cells


def grid_bernoulli_accept(cell_logits: jnp.ndarray, proposals: jnp.ndarray, key: jax.Array):
    """Bernoulli accept/reject of proposed cell pixels (kploss.py:26-31).

    Returns (accept_mask bool, accept_logp).
    """
    accept_logits = jnp.take_along_axis(
        cell_logits, proposals[..., None], axis=-1
    )[..., 0]
    sample, logp = bernoulli_sample_logp(accept_logits, key)
    return sample > 0.5, logp


def cell_coords_normalized(H: int, W: int, grid_size: int, proposals: jnp.ndarray):
    """Normalized (x, y) of proposed pixels, [B, hg, wg, 2]."""
    grids = gen_grid(-1, 1, -1, 1, H, W).reshape(1, H, W, 2)
    cells = unfold(grids, grid_size)  # [1, hg, wg, 2, g*g]
    sel = jnp.take_along_axis(
        cells, proposals[:, :, :, None, None].astype(jnp.int32), axis=-1
    )[..., 0]
    return sel  # [B, hg, wg, 2]


def cell_coords_pixel(H: int, W: int, grid_size: int, proposals: jnp.ndarray):
    """Pixel (x, y) of proposed pixels, [B, hg, wg, 2] (kploss.py:42-47)."""
    grids = gen_grid(0, H - 1, 0, W - 1, H, W).reshape(1, H, W, 2)
    cells = unfold(grids, grid_size)
    sel = jnp.take_along_axis(
        cells, proposals[:, :, :, None, None].astype(jnp.int32), axis=-1
    )[..., 0]
    return sel


def regular_grid_random_single(
    kp_map: jnp.ndarray,
    grid_size: int,
    random_select: str,
    key: jax.Array,
):
    """Stage-1 grid sampler (putils:624-659).

    kp_map: [B, H, W, 1]. Returns (kps_n [B, hg, wg, 2], score [B, hg, wg, 1]).
    'random': Categorical within each cell (logits = cell scores), score is
    the selected raw map value. 'regular_random': jittered regular grid
    (one shared jitter per image), score by grid_sample.
    """
    from .grid_sample import grid_sample

    B, H, W, _ = kp_map.shape
    if random_select == "random":
        proposals, _logp, cells = grid_categorical_sample(kp_map, grid_size, key)
        score = jnp.take_along_axis(cells, proposals[..., None], axis=-1)
        kps = cell_coords_normalized(H, W, grid_size, proposals)
        return kps, score
    elif random_select == "regular_random":
        start = 0.5 * grid_size / H
        num_h, num_w = H // grid_size, W // grid_size
        base = gen_grid(
            -1 + start, 1 - start, -1 + start, 1 - start, num_h, num_w
        ).reshape(1, num_h, num_w, 2)
        jitter = start * (
            2 * jax.random.uniform(key, (B, 1, 1, 2), kp_map.dtype) - 1
        )
        kps = jnp.broadcast_to(base, (B, num_h, num_w, 2)) + jitter
        score = grid_sample(kp_map, kps, padding_mode="zeros")
        return kps, score
    else:
        raise ValueError(f"unsupported random_select: {random_select}")


def generate_kpts_regular_grid_random(
    kp_map1: jnp.ndarray,
    kp_map2: jnp.ndarray,
    key: jax.Array,
    grid_size: int,
    random_select: str = "random",
    keep_spatial: bool = True,
):
    """Two-image wrapper (putils:598-622). Gradients stopped (@no_grad)."""
    k1, k2 = jax.random.split(key)
    kps1, s1 = regular_grid_random_single(kp_map1, grid_size, random_select, k1)
    kps2, s2 = regular_grid_random_single(kp_map2, grid_size, random_select, k2)
    if not keep_spatial:
        B = kps1.shape[0]
        kps1 = kps1.reshape(B, -1, 2)
        kps2 = kps2.reshape(B, -1, 2)
        s1 = s1.reshape(B, -1, 1)
        s2 = s2.reshape(B, -1, 1)
    return jax.tree.map(jax.lax.stop_gradient, (kps1, kps2, s1, s2))


def gumbel_noise(key: jax.Array, shape, dtype=jnp.float32, eps: float = 1e-20):
    u = jax.random.uniform(key, shape, dtype)
    return -jnp.log(-jnp.log(u + eps) + eps)


def gumbel_topk_select(
    prob: jnp.ndarray, num_points: int, key: jax.Array, temperature: float = 1.0
):
    """Soft Gumbel selection matrix [B, num_points, H*W] (putils:467-476)."""
    B, H, W, _ = prob.shape
    y = prob.reshape(B, 1, H * W) + gumbel_noise(
        key, (B, num_points, H * W), prob.dtype
    )
    return jax.nn.softmax(y / temperature, axis=2)
