"""sampled_similarity == grid_sample-then-dot, plus its gradient."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from posfeat_tpu.ops.grid_sample import grid_sample
from posfeat_tpu.ops.sampled_sim import sampled_similarity


def naive(featmap, feat1, pos, padding):
    samples = grid_sample(featmap, pos, padding_mode=padding)  # [B,N,S,D]
    return jnp.einsum(
        "bnsd,bnd->bns", samples, feat1, precision=jax.lax.Precision.HIGHEST
    )


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_sampled_similarity_matches_naive(rng, padding):
    B, H, W, D, N, S = 2, 12, 17, 16, 37, 9
    fm = jnp.asarray(rng.randn(B, H, W, D).astype(np.float32))
    f1 = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    pos = jnp.asarray((rng.rand(B, N, S, 2) * 2.4 - 1.2).astype(np.float32))

    ref = naive(fm, f1, pos, padding)
    ours = sampled_similarity(fm, f1, pos, padding=padding, chunk=16)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_sampled_similarity_grad(rng):
    B, H, W, D, N, S = 1, 8, 8, 4, 5, 3
    fm = jnp.asarray(rng.randn(B, H, W, D).astype(np.float32))
    f1 = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    pos = jnp.asarray((rng.rand(B, N, S, 2) * 1.6 - 0.8).astype(np.float32))

    def loss_fused(fm, f1):
        return jnp.sum(jnp.tanh(sampled_similarity(fm, f1, pos, chunk=4)))

    def loss_naive(fm, f1):
        return jnp.sum(jnp.tanh(naive(fm, f1, pos, "zeros")))

    g1 = jax.grad(loss_fused, argnums=(0, 1))(fm, f1)
    g2 = jax.grad(loss_naive, argnums=(0, 1))(fm, f1)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
