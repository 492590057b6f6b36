"""Streaming REINFORCE reduction over the m×n match volume (Pallas TPU).

The stage-2 DiskLoss (kploss.py:132-197) builds ~a dozen [m, n] tensors
(affinity, two log-softmaxes, match probabilities, pairwise epipolar
distances, rewards, masks, their products) only to reduce them to one
scalar and two vectors. With m = n = 4800 at 480×640 that is >1 GB of
HBM traffic per step in the XLA formulation.

In the shipped configuration (cor_detach=True, match_grad=False,
kploss.py:155-171) the entire volume is gradient-free: the loss is

    reinforce = Σ_ij W_ij·(dense_logp_ij + logp1_i + logp2_j),
    W = accept⊗accept · reward · dense_p,

and only logp1/logp2 carry gradients. So the volume reduces exactly to
    s0 = Σ W·dense_logp  (constant),  rowW_i = Σ_j W_ij,  colW_j = Σ_i W_ij,

all computable in three streaming passes over [Tm, n] affinity blocks
(flash-attention-style: block matmul on the MXU, online max/sum-exp, the
final pass fuses distances, rewards, masks and every diagnostic
statistic). Nothing of size m×n ever reaches HBM.

Outputs per batch element: s0, rowW [m], colW [n], p_rowsum [m],
p_colsum [n], p_max, p_sum — enough to reconstruct the loss and all 11
reference diagnostic components.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _row_ids(tm, offset):
    return jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + offset


def _affinity(f1_blk, f2, temperature):
    """aff = -T·(1 - f1·f2ᵀ) for one row block. [Tm, n] f32.

    HIGHEST only for f32 operands — Mosaic rejects precision overrides on
    bf16 (which is already the MXU-native path with f32 accumulation).
    """
    prec = (
        jax.lax.Precision.HIGHEST
        if f1_blk.dtype == jnp.float32
        else None
    )
    sim = jax.lax.dot_general(
        f1_blk,
        f2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    return temperature * sim - temperature


def _pass1_kernel(f1, f2, row_max, col_max, *, tm, m_real, n_real, temperature):
    i = pl.program_id(1)
    aff = _affinity(f1[0], f2[0], temperature)
    n_pad = aff.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    row_ok = _row_ids(tm, i * tm) < m_real
    col_ok = col_ids < n_real

    aff_rm = jnp.where(col_ok, aff, _NEG)  # for row max
    row_max[0] = jnp.max(aff_rm, axis=1, keepdims=True)

    aff_cm = jnp.where(row_ok, aff, _NEG)

    @pl.when(i == 0)
    def _():
        col_max[0] = jnp.full_like(col_max[0], _NEG)

    col_max[0] = jnp.maximum(
        col_max[0], jnp.max(aff_cm, axis=0, keepdims=True)
    )


def _pass2_kernel(
    f1, f2, row_max, col_max, row_se, col_se, *, tm, m_real, n_real, temperature
):
    i = pl.program_id(1)
    aff = _affinity(f1[0], f2[0], temperature)
    n_pad = aff.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    row_ok = _row_ids(tm, i * tm) < m_real
    col_ok = col_ids < n_real

    e_r = jnp.where(col_ok, jnp.exp(aff - row_max[0]), 0.0)
    row_se[0] = jnp.sum(e_r, axis=1, keepdims=True)

    e_c = jnp.where(row_ok, jnp.exp(aff - col_max[0]), 0.0)

    @pl.when(i == 0)
    def _():
        col_se[0] = jnp.zeros_like(col_se[0])

    col_se[0] = col_se[0] + jnp.sum(e_c, axis=0, keepdims=True)


def _pass3_kernel(
    f1, f2, l1, c2h, l2, c1h, acc1, acc2,
    row_lse, col_lse,
    s0, roww, colw, p_rowsum, p_colsum, p_max, p_sum,
    *, tm, m_real, n_real, temperature, thr, good_reward, bad_reward,
):
    i = pl.program_id(1)
    aff = _affinity(f1[0], f2[0], temperature)
    n_pad = aff.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    row_ok = _row_ids(tm, i * tm) < m_real
    col_ok = col_ids < n_real
    ok = row_ok & col_ok

    lp_i = aff - row_lse[0]
    lp_t = aff - col_lse[0]
    dense_logp = lp_i + lp_t
    p = jnp.where(ok, jnp.exp(dense_logp), 0.0)

    # bidirectional epipolar distances (lines pre-normalized by caller)
    d1 = jnp.abs(
        jax.lax.dot_general(
            l1[0], c2h[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    d2 = jnp.abs(
        jax.lax.dot_general(
            c1h[0], l2[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    good = (d1 < thr) & (d2 < thr)
    reward = jnp.where(good, good_reward, bad_reward)

    w = acc1[0] * acc2[0] * reward * p

    @pl.when(i == 0)
    def _():
        # scalar accumulators live as (1, 1) VMEM tiles
        s0[0] = jnp.zeros((1, 1), jnp.float32)
        p_max[0] = jnp.zeros((1, 1), jnp.float32)
        p_sum[0] = jnp.zeros((1, 1), jnp.float32)
        colw[0] = jnp.zeros_like(colw[0])
        p_colsum[0] = jnp.zeros_like(p_colsum[0])

    s0[0] = s0[0] + jnp.sum(jnp.where(ok, w * dense_logp, 0.0)).reshape(1, 1)
    roww[0] = jnp.sum(w, axis=1, keepdims=True)
    colw[0] = colw[0] + jnp.sum(w, axis=0, keepdims=True)
    p_rowsum[0] = jnp.sum(p, axis=1, keepdims=True)
    p_colsum[0] = p_colsum[0] + jnp.sum(p, axis=0, keepdims=True)
    p_max[0] = jnp.maximum(p_max[0], jnp.max(p).reshape(1, 1))
    p_sum[0] = p_sum[0] + jnp.sum(p).reshape(1, 1)


def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=(
        "temperature", "thr", "good_reward", "bad_reward", "tm", "interpret",
    ),
)
def reinforce_reduction(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    line1: jnp.ndarray,
    c2h: jnp.ndarray,
    line2: jnp.ndarray,
    c1h: jnp.ndarray,
    accept1: jnp.ndarray,
    accept2: jnp.ndarray,
    *,
    temperature: float,
    thr: float,
    good_reward: float,
    bad_reward: float,
    tm: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Streamed stage-2 reduction.

    :param f1: [B, m, D] cos-normalized descriptors (image 1)
    :param f2: [B, n, D]
    :param line1: [B, m, 3] F1ᵀ-normalized epipolar lines of coord1
    :param c2h: [B, n, 3] homogeneous coord2
    :param line2: [B, n, 3], c1h: [B, m, 3] (other direction)
    :param accept1/2: [B, m]/[B, n] float {0,1} Bernoulli accepts
    :returns: (s0 [B], rowW [B,m], colW [B,n], p_rowsum [B,m],
               p_colsum [B,n], p_max [B], p_sum [B]) — all stop-gradient.
    """
    B, m, D = f1.shape
    n = f2.shape[1]
    m_pad = -(-m // tm) * tm
    n_pad = -(-n // 128) * 128

    f1p = _pad_to(f1, m_pad, 1)
    f2p = _pad_to(f2, n_pad, 1)
    l1p = _pad_to(line1, m_pad, 1)
    c1p = _pad_to(c1h, m_pad, 1)
    l2p = _pad_to(line2, n_pad, 1)
    c2p = _pad_to(c2h, n_pad, 1)
    a1p = _pad_to(accept1.astype(jnp.float32), m_pad, 1)[..., None]
    a2p = _pad_to(accept2.astype(jnp.float32), n_pad, 1)[:, None, :]

    grid = (B, m_pad // tm)
    # vectors carry a trailing singleton so block shapes satisfy the
    # Mosaic (8, 128)-or-full tiling rule on the last two dims
    row_spec = pl.BlockSpec(
        (1, tm, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    # column vectors ride the lane dim ([B, 1, n_pad]) — a trailing-1
    # layout would lane-pad every vector to n_pad x 128 floats of VMEM
    col_spec = pl.BlockSpec(
        (1, 1, n_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    scal_spec = pl.BlockSpec(
        (1, 1, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )

    def vspec(shape_block, index):
        return pl.BlockSpec(shape_block, index, memory_space=pltpu.VMEM)

    f1_spec = vspec((1, tm, D), lambda b, i: (b, i, 0))
    f2_spec = vspec((1, n_pad, D), lambda b, i: (b, 0, 0))
    l1_spec = vspec((1, tm, 3), lambda b, i: (b, i, 0))
    c1_spec = vspec((1, tm, 3), lambda b, i: (b, i, 0))
    l2_spec = vspec((1, n_pad, 3), lambda b, i: (b, 0, 0))
    c2_spec = vspec((1, n_pad, 3), lambda b, i: (b, 0, 0))

    kw = dict(tm=tm, m_real=m, n_real=n, temperature=temperature)

    row_max, col_max = pl.pallas_call(
        functools.partial(_pass1_kernel, **kw),
        grid=grid,
        in_specs=[f1_spec, f2_spec],
        out_specs=(row_spec, col_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, n_pad), jnp.float32),
        ),
        interpret=interpret,
    )(f1p, f2p)

    row_se, col_se = pl.pallas_call(
        functools.partial(_pass2_kernel, **kw),
        grid=grid,
        in_specs=[f1_spec, f2_spec, row_spec, col_spec],
        out_specs=(row_spec, col_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, n_pad), jnp.float32),
        ),
        interpret=interpret,
    )(f1p, f2p, row_max, col_max)

    row_lse = row_max + jnp.log(jnp.clip(row_se, 1e-30))
    col_lse = col_max + jnp.log(jnp.clip(col_se, 1e-30))

    outs = pl.pallas_call(
        functools.partial(
            _pass3_kernel, **kw, thr=thr,
            good_reward=good_reward, bad_reward=bad_reward,
        ),
        grid=grid,
        in_specs=[
            f1_spec, f2_spec, l1_spec, c2_spec, l2_spec, c1_spec,
            row_spec, col_spec, row_spec, col_spec,
        ],
        out_specs=(
            scal_spec, row_spec, col_spec, row_spec, col_spec,
            scal_spec, scal_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(f1p, f2p, l1p, c2p, l2p, c1p, a1p, a2p, row_lse, col_lse)

    s0, roww, colw, p_rowsum, p_colsum, p_max, p_sum = outs
    out = (
        s0[:, 0, 0],
        roww[:, :m, 0],
        colw[:, 0, :n],
        p_rowsum[:, :m, 0],
        p_colsum[:, 0, :n],
        p_max[:, 0, 0],
        p_sum[:, 0, 0],
    )
    return jax.tree.map(jax.lax.stop_gradient, out)
