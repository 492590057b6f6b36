"""Per-stage timing of the Pallas fused head at bs=16 bf16 480x640.

Stages: K1 (conv kernel), K1NOZ (conv kernel minus the z_img phase
reorder), K2 (tail kernel), FULL (fused_head_tail driver).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from posfeat_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import posfeat_tpu.ops.pallas.fused_head as fh  # noqa: E402

B, h, w, cin, cout, out_ch = 16, 120, 160, 192, 128, 1
k, kk = 4, 16
cin_p = 256
th, tw = 8, 16
nty, ntx = h // th, w // tw
N_SCAN = 4
dt = jnp.bfloat16

cy = 64
keys = jax.random.split(jax.random.PRNGKey(0), 8)
trunks = jax.random.normal(keys[0], (N_SCAN, B, h, w, cin), dt)
z_img = jax.random.normal(keys[1], (B, 4 * h, 4 * w, cout), dt)
s_img = jax.random.normal(keys[6], (B, 4 * h, 4 * w, 3), dt)
k1i = jax.random.normal(keys[7], (3, 3, 3, cy), jnp.float32) * 0.2
b1i = jnp.zeros((cy,), jnp.float32)
k2i = jax.random.normal(keys[6], (3, 3, cy, cout), jnp.float32) * 0.05
k2t = jax.random.normal(keys[2], (3, 3, cin, cout), jnp.float32) * 0.05
b2 = jax.random.normal(keys[3], (cout,), jnp.float32) * 0.05
w3 = jax.random.normal(keys[4], (1, 1, cout, out_ch), jnp.float32) * 0.05
b3 = jnp.zeros((out_ch,), jnp.float32)
a = jnp.asarray([0.25], jnp.float32)
zs = jax.random.normal(keys[5], (N_SCAN, B, h, w, kk * cout), dt)


def timeit(name, run, args):
    run = jax.jit(run)
    float(run(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts) / (N_SCAN * B) * 1e3:.3f} ms/img", flush=True)


def k1_call(trunk, with_z=True):
    kph = fh._phase_kernel(k2t, k)
    kph = jnp.pad(kph, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0))).astype(dt)
    b2ph = jnp.tile(b2, kk)[None, :]
    tp = jnp.pad(trunk, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    tp = jnp.pad(tp, ((0, 0), (0, 0), (0, 6), (0, cin_p - cin)))
    kernel1 = functools.partial(
        fh._conv_kernel if with_z else _conv_kernel_noz,
        th=th, tw=tw, cin=cin_p, cout=cout, k=k,
    )
    return pl.pallas_call(
        kernel1,
        grid=(B, nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, cin_p, kk * cout), lambda b, i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * th, k * tw, cout), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk * cout), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, tw, kk * cout), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kk * cout),
                         lambda b, i, j: ((b * nty + i) * ntx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kk * cout),
                         lambda b, i, j: ((b * nty + i) * ntx + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, h, w, kk * cout), dt),
            jax.ShapeDtypeStruct((B * nty * ntx, 1, kk * cout), jnp.float32),
            jax.ShapeDtypeStruct((B * nty * ntx, 1, kk * cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 8, cin_p), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(tp, kph, z_img, b2ph)


def _conv_kernel_noz(tp_hbm, kph_ref, zimg_ref, b2_ref, z_ref, ssum_ref,
                     ssq_ref, scratch_tp, sems, *, th, tw, cin, cout, k):
    # identical to fh._conv_kernel minus the z_img phase reorder
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nty_ = pl.num_programs(1)
    ntx_ = pl.num_programs(2)
    kk_ = k * k
    tw_al = scratch_tp.shape[2]
    step = (b * nty_ + i) * ntx_ + j
    total = pl.num_programs(0) * nty_ * ntx_

    def dma_for(s, slot):
        bb = s // (nty_ * ntx_)
        rr = s % (nty_ * ntx_)
        return pltpu.make_async_copy(
            tp_hbm.at[bb, pl.ds((rr // ntx_) * th, th + 2),
                      pl.ds((rr % ntx_) * tw, tw_al), :],
            scratch_tp.at[slot],
            sems.at[slot],
        )

    @pl.when(step == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(step + 1 < total)
    def _():
        dma_for(step + 1, (step + 1) % 2).start()

    dma_for(step, step % 2).wait()
    tile = scratch_tp[step % 2]
    m = th * tw
    acc = jnp.zeros((m, kk_ * cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            blk = tile[dy : dy + th, dx : dx + tw, :].reshape(m, cin)
            acc = acc + jax.lax.dot_general(
                blk, kph_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b2_ref[0][None, :]
    z_ref[0] = acc.reshape(th, tw, kk_ * cout).astype(z_ref.dtype)
    ssum_ref[0, 0] = jnp.sum(acc, axis=0)
    ssq_ref[0, 0] = jnp.sum(acc * acc, axis=0)


def _conv_kernel_prephase(tp_hbm, kph_ref, zimg_ref, b2_ref, z_ref, ssum_ref,
                          ssq_ref, scratch_tp, sems, *, th, tw, cin, cout, k):
    # z_img arrives ALREADY in phase layout: block add, no reorder
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nty_ = pl.num_programs(1)
    ntx_ = pl.num_programs(2)
    kk_ = k * k
    tw_al = scratch_tp.shape[2]
    step = (b * nty_ + i) * ntx_ + j
    total = pl.num_programs(0) * nty_ * ntx_

    def dma_for(s, slot):
        bb = s // (nty_ * ntx_)
        rr = s % (nty_ * ntx_)
        return pltpu.make_async_copy(
            tp_hbm.at[bb, pl.ds((rr // ntx_) * th, th + 2),
                      pl.ds((rr % ntx_) * tw, tw_al), :],
            scratch_tp.at[slot],
            sems.at[slot],
        )

    @pl.when(step == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(step + 1 < total)
    def _():
        dma_for(step + 1, (step + 1) % 2).start()

    dma_for(step, step % 2).wait()
    tile = scratch_tp[step % 2]
    m = th * tw
    acc = jnp.zeros((m, kk_ * cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            blk = tile[dy : dy + th, dx : dx + tw, :].reshape(m, cin)
            acc = acc + jax.lax.dot_general(
                blk, kph_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + zimg_ref[0].astype(jnp.float32).reshape(m, kk_ * cout)
    acc = acc + b2_ref[0][None, :]
    z_ref[0] = acc.reshape(th, tw, kk_ * cout).astype(z_ref.dtype)
    ssum_ref[0, 0] = jnp.sum(acc, axis=0)
    ssq_ref[0, 0] = jnp.sum(acc * acc, axis=0)


z_img_ph = jax.random.normal(jax.random.PRNGKey(9), (B, h, w, kk * cout), dt)


def k1_call_prephase(trunk):
    kph = fh._phase_kernel(k2t, k)
    kph = jnp.pad(kph, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0))).astype(dt)
    b2ph = jnp.tile(b2, kk)[None, :]
    tp = jnp.pad(trunk, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    tp = jnp.pad(tp, ((0, 0), (0, 0), (0, 6), (0, cin_p - cin)))
    kernel1 = functools.partial(
        _conv_kernel_prephase, th=th, tw=tw, cin=cin_p, cout=cout, k=k
    )
    return pl.pallas_call(
        kernel1,
        grid=(B, nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, cin_p, kk * cout), lambda b, i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw, kk * cout), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk * cout), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, tw, kk * cout), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kk * cout),
                         lambda b, i, j: ((b * nty + i) * ntx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kk * cout),
                         lambda b, i, j: ((b * nty + i) * ntx + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, h, w, kk * cout), dt),
            jax.ShapeDtypeStruct((B * nty * ntx, 1, kk * cout), jnp.float32),
            jax.ShapeDtypeStruct((B * nty * ntx, 1, kk * cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 8, cin_p), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(tp, kph, z_img_ph, b2ph)


def run_k1pre(ts):
    def step(c, t):
        z, s1, s2 = k1_call_prephase(t)
        return c + jnp.sum(z[:, ::31, ::37].astype(jnp.float32)) + s1.sum(), None

    acc, _ = jax.lax.scan(step, 0.0, ts)
    return acc


def run_k1(ts):
    def step(c, t):
        z, s1, s2 = k1_call(t, True)
        return c + jnp.sum(z[:, ::31, ::37].astype(jnp.float32)) + s1.sum(), None

    acc, _ = jax.lax.scan(step, 0.0, ts)
    return acc


def run_k1noz(ts):
    def step(c, t):
        z, s1, s2 = k1_call(t, False)
        return c + jnp.sum(z[:, ::31, ::37].astype(jnp.float32)) + s1.sum(), None

    acc, _ = jax.lax.scan(step, 0.0, ts)
    return acc


def run_k2(zts):
    mu = jnp.zeros((B, 1, kk * cout), jnp.float32)
    sc = jnp.ones((B, 1, kk * cout), jnp.float32)
    op = 8
    w3p = jnp.pad(w3.reshape(cout, out_ch), ((0, 0), (0, op - out_ch)))
    b3p = jnp.pad(b3, (0, op - out_ch))[None, :]
    a_smem = a.reshape(1, 1)

    kernel2 = functools.partial(
        fh._tail_kernel, th=th, tw=tw, cout=cout, op=op, out_ch=out_ch, kk=kk
    )

    def one(z):
        return pl.pallas_call(
            kernel2,
            grid=(B, nty, ntx),
            in_specs=[
                pl.BlockSpec((1, th, tw, kk * cout),
                             lambda b, i, j: (b, i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, kk * cout), lambda b, i, j: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, kk * cout), lambda b, i, j: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda b, i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((cout, op), lambda b, i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, op), lambda b, i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, th, tw, kk * out_ch),
                             lambda b, i, j: (b, i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, op),
                             lambda b, i, j: ((b * nty + i) * ntx + j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, op),
                             lambda b, i, j: ((b * nty + i) * ntx + j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, h, w, kk * out_ch), jnp.float32),
                jax.ShapeDtypeStruct((B * nty * ntx, 1, op), jnp.float32),
                jax.ShapeDtypeStruct((B * nty * ntx, 1, op), jnp.float32),
            ],
        )(z, mu, sc, a_smem, w3p, b3p)

    def step(c, z):
        u, s1, s2 = one(z)
        return c + jnp.sum(u[:, ::31, ::37]) + s1.sum(), None

    acc, _ = jax.lax.scan(step, 0.0, zts)
    return acc


def run_full(ts):
    y_img = jax.lax.conv_general_dilated(
        s_img, k1i.astype(dt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    y32 = y_img.astype(jnp.float32)
    mu = y32.mean((1, 2))
    a_in = jax.lax.rsqrt(
        jnp.maximum((y32 * y32).mean((1, 2)) - mu * mu, 0.0) + 1e-5
    )

    def step(c, t):
        s = fh.fused_head_tail(
            t, s_img, y_img, mu, a_in, k1i, b1i, k2t, k2i, b2, w3, b3, a,
            act="Softplus",
        )
        return c + jnp.sum(s[:, ::63, ::61].astype(jnp.float32)), None

    acc, _ = jax.lax.scan(step, 0.0, ts)
    return acc


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "abcf"
    if "a" in which:
        timeit("K1", run_k1, (trunks,))
    if "p" in which:
        timeit("K1PRE(phase z_img)", run_k1pre, (trunks,))
    if "b" in which:
        timeit("K1NOZ", run_k1noz, (trunks,))
    if "c" in which:
        timeit("K2", run_k2, (zs,))
    if "f" in which:
        timeit("FULL", run_full, (trunks,))
