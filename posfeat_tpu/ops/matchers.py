"""Descriptor matchers: mutual-NN and Lowe's-ratio variants.

Reference: evaluations/aachen/matchers.py, preprocess_utils.py:795-803,
evaluations/ETH_local_feature/custom_matcher.py. The n×m similarity is one
MXU dot; match extraction returns variable-length index pairs, so these
run the similarity on device and finalize the boolean mask on host
(numpy) — identical to the reference's .cpu().numpy() boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _sim_and_nn(d1: jnp.ndarray, d2: jnp.ndarray):
    sim = jnp.dot(d1, d2.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    nn12 = jnp.argmax(sim, axis=1)
    nn21 = jnp.argmax(sim, axis=0)
    return sim, nn12, nn21


@jax.jit
def _top2_ratio(sim: jnp.ndarray):
    nns_sim, nns = jax.lax.top_k(sim, 2)
    nns_dist = jnp.sqrt(jnp.clip(2 - 2 * nns_sim, 0, None))
    ratios = nns_dist[:, 0] / (nns_dist[:, 1] + 1e-8)
    return ratios, nns[:, 0]


def mutual_nn_matcher(descriptors1, descriptors2, **_):
    """Mutual nearest neighbors for L2-normalized descriptors -> [k, 2]."""
    _, nn12, nn21 = _sim_and_nn(jnp.asarray(descriptors1), jnp.asarray(descriptors2))
    nn12, nn21 = np.asarray(nn12), np.asarray(nn21)
    ids1 = np.arange(nn12.shape[0])
    mask = ids1 == nn21[nn12]
    return np.stack([ids1[mask], nn12[mask]], axis=-1)


def ratio_matcher(descriptors1, descriptors2, ratio=0.95, **_):
    """Symmetric Lowe's ratio test -> [k, 2]."""
    sim, _, _ = _sim_and_nn(jnp.asarray(descriptors1), jnp.asarray(descriptors2))
    r12, nn12 = _top2_ratio(sim)
    r21, _ = _top2_ratio(sim.T)
    r12, nn12, r21 = np.asarray(r12), np.asarray(nn12), np.asarray(r21)
    ids1 = np.arange(nn12.shape[0])
    mask = (r12 <= ratio) & (r21[nn12] <= ratio)
    return np.stack([ids1[mask], nn12[mask]], axis=-1)


def mutual_nn_ratio_matcher(descriptors1, descriptors2, ratio=0.95, **_):
    """Mutual NN + symmetric ratio test -> [k, 2]."""
    sim, nn12a, nn21 = _sim_and_nn(
        jnp.asarray(descriptors1), jnp.asarray(descriptors2)
    )
    r12, nn12 = _top2_ratio(sim)
    r21, _ = _top2_ratio(sim.T)
    nn12, nn21 = np.asarray(nn12), np.asarray(nn21)
    r12, r21 = np.asarray(r12), np.asarray(r21)
    ids1 = np.arange(nn12.shape[0])
    mask = (ids1 == nn21[nn12]) & (r12 <= ratio) & (r21[nn12] <= ratio)
    return np.stack([ids1[mask], nn12[mask]], axis=-1)


def mnn_matcher(descriptors_a, descriptors_b):
    """Mutual-NN (putils:795-803 / hpatches evaluation.py:28). -> [k, 2]."""
    return mutual_nn_matcher(descriptors_a, descriptors_b)


MATCHERS = {
    "mutual_nn_matcher": mutual_nn_matcher,
    "ratio_matcher": ratio_matcher,
    "mutual_nn_ratio_matcher": mutual_nn_ratio_matcher,
}
