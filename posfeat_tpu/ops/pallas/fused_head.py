"""Fused KeypointDet tail (Pallas TPU): upsample+conv2 -> IN -> PReLU ->
conv3 -> IN -> act, without ever materializing a full-resolution
128-channel tensor in HBM *layout*.

Why: the reference head (DeteNet.py:108-113) upsamples the trunk x4 and
runs a 3x3 conv at full resolution. In XLA the best formulations cost
~2.5 ms/img (bs=16 bf16 @480x640): the composite dilated conv is
FLOP-inefficient, and the cheap phase-decomposed conv (1.5 ms) loses its
win to full-res layout shuffles (depth-to-space of a [B,480,640,128]
tensor alone measures ~1.5 ms on v5e). Here the conv runs as 9 MXU
matmuls per tile in PHASE layout ([B, h, w, 16*128], channel index
ch = (ry*4 + rx)*128 + c), the image-branch conv output is gathered
per-tile with a VMEM-local reorder, and the whole tail stays in phase
layout; only the 1-2 channel score map is ever depth-to-spaced (in XLA,
trivially).

Exactness: identical math to the reference dataflow. The conv's
zero-pad-vs-upsample-clamp border discrepancy is corrected additively on
boundary tiles from precomputed thin strips (same derivation as
keypoint_det._fix_border_ring_phase); instance-norm statistics accumulate
in f32 via per-tile partials pooled across phases in XLA.

Forward-only: used by the extraction path. Training keeps the XLA
dataflows (which have full autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------- helpers


def _phase_kernel(k2_trunk: jnp.ndarray, k: int = 4) -> jnp.ndarray:
    """[3,3,Cin,Cout] -> [3,3,Cin,k*k*Cout] phase kernel (f32)."""
    from ...models.keypoint_det import _phase_mix_matrix

    M, D = _phase_mix_matrix(k)
    assert D == 3
    kph = jnp.einsum(
        "rda,sep,apcf->decrsf",
        jnp.asarray(M),
        jnp.asarray(M),
        k2_trunk.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    Cin, Cout = k2_trunk.shape[2], k2_trunk.shape[3]
    return kph.reshape(3, 3, Cin, k * k * Cout)


def _ring_strips(trunk, kernel, k: int = 4):
    """Additive border-correction strips — canonical implementation lives
    in models.keypoint_det.ring_correction_strips (single source of
    truth for the 'phase' and 'pallas' dataflows)."""
    from ...models.keypoint_det import ring_correction_strips

    return ring_correction_strips(trunk, kernel, k)


# --------------------------------------------------------------- kernel 1


def _conv_kernel(
    tp_hbm,  # [B, h+2, w+8+..., Cin_p]  (ANY/HBM; double-buffered halo DMA)
    kph_ref,  # [3, 3, Cin_p, KK*Cout] VMEM (grid-invariant)
    zimg_ref,  # [1, k*th, k*tw, Cout] VMEM block
    b2_ref,  # [1, KK*Cout] VMEM
    z_ref,  # out: [1, th, tw, KK*Cout]
    ssum_ref,  # out: [1, 1, KK*Cout]  (flat tile index)
    ssq_ref,  # out: [1, 1, KK*Cout]
    scratch_tp,  # VMEM [2, th+2, tw+8, Cin_p]  (double buffer)
    sems,  # DMA semaphores [2]
    *,
    th: int,
    tw: int,
    cin: int,
    cout: int,
    k: int,
    zt: bool = False,
):
    """z = phase_conv(trunk) + z_img + b2 for one tile, plus IN partial
    moments. The trunk halo window is DMA'd HBM->VMEM with two buffers:
    each step starts the NEXT tile's copy before waiting on its own, so
    the ~120 KB transfer hides behind the 9 MXU matmuls. Border ring
    handling lives in XLA (thin-strip corrections in the driver)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nty = pl.num_programs(1)
    ntx = pl.num_programs(2)
    kk = k * k
    tw_al = scratch_tp.shape[2]

    step = (b * nty + i) * ntx + j
    total = pl.num_programs(0) * nty * ntx

    def dma_for(s, slot):
        bb = s // (nty * ntx)
        rr = s % (nty * ntx)
        ii = rr // ntx
        jj = rr % ntx
        return pltpu.make_async_copy(
            tp_hbm.at[bb, pl.ds(ii * th, th + 2), pl.ds(jj * tw, tw_al), :],
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
    acc = jnp.zeros((m, kk * cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            blk = tile[dy : dy + th, dx : dx + tw, :].reshape(m, cin)
            acc = acc + jax.lax.dot_general(
                blk,
                kph_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # image-branch: [k*th, k*tw, Cout] full-res block -> phase layout
    zi = (zimg_ref[...] if zt else zimg_ref[0]).astype(jnp.float32)
    zi = zi.reshape(th, k, tw, k, cout).transpose(0, 2, 1, 3, 4)
    acc = acc + zi.reshape(m, kk * cout)
    acc = acc + b2_ref[0][None, :]

    z_ref[0] = acc.reshape(th, tw, kk * cout).astype(z_ref.dtype)
    ssum_ref[0, 0] = jnp.sum(acc, axis=0)
    ssq_ref[0, 0] = jnp.sum(acc * acc, axis=0)


def _conv_kernel_v2(
    tp_hbm,  # [B, h+2, w+8+..., Cin_p]  (ANY/HBM; double-buffered halo DMA)
    yp_hbm,  # [B, k*h+2, k*w+8, Cy] (ANY/HBM; zero-padded image feats)
    kph_ref,  # [3, 3, Cin_p, KK*Cout] VMEM (grid-invariant)
    wimg_ref,  # [3, 3, Cy, Cout] VMEM
    b2_ref,  # [1, KK*Cout] VMEM
    z_ref,  # out: [1, th, tw, KK*Cout]
    ssum_ref,  # out: [1, 1, KK*Cout]  (flat tile index)
    ssq_ref,  # out: [1, 1, KK*Cout]
    scratch_tp,  # VMEM [2, th+2, tw+8, Cin_p]
    scratch_y,  # VMEM [2, k*th+2, k*tw+8, Cy]
    sems,  # DMA semaphores [2]
    sems_y,  # DMA semaphores [2]
    *,
    th: int,
    tw: int,
    cin: int,
    cout: int,
    k: int,
):
    """Like _conv_kernel, but the image branch's 3x3 conv over the
    (zero-padded) normalized image features runs IN the kernel instead of
    consuming a precomputed full-resolution z_img: XLA's conv emits a
    B-interleaved physical tiling that costs a full-res relayout to feed
    Mosaic, and the z_img HBM round-trip is pure bandwidth (measured
    ~1.1 ms/img of pad/concat/relayout fusions at bs=16 bf16 480x640).
    The conv here is 9 MXU matmuls contracting Cy=64 — half-lane
    contraction costs one extra half-used MXU pass per tap, far cheaper
    than the XLA-side data movement it replaces."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nty = pl.num_programs(1)
    ntx = pl.num_programs(2)
    kk = k * k
    tw_al = scratch_tp.shape[2]
    kth = k * th
    ktw = k * tw
    ytw_al = scratch_y.shape[2]
    cy = scratch_y.shape[3]

    step = (b * nty + i) * ntx + j
    total = pl.num_programs(0) * nty * ntx

    def dmas_for(s, slot):
        bb = s // (nty * ntx)
        rr = s % (nty * ntx)
        ii = rr // ntx
        jj = rr % ntx
        return (
            pltpu.make_async_copy(
                tp_hbm.at[bb, pl.ds(ii * th, th + 2), pl.ds(jj * tw, tw_al), :],
                scratch_tp.at[slot],
                sems.at[slot],
            ),
            pltpu.make_async_copy(
                yp_hbm.at[
                    bb, pl.ds(ii * kth, kth + 2), pl.ds(jj * ktw, ytw_al), :
                ],
                scratch_y.at[slot],
                sems_y.at[slot],
            ),
        )

    @pl.when(step == 0)
    def _():
        for d in dmas_for(0, 0):
            d.start()

    @pl.when(step + 1 < total)
    def _():
        for d in dmas_for(step + 1, (step + 1) % 2):
            d.start()

    for d in dmas_for(step, step % 2):
        d.wait()
    tile = scratch_tp[step % 2]
    tile_y = scratch_y[step % 2]

    m = th * tw
    acc = jnp.zeros((m, kk * cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            blk = tile[dy : dy + th, dx : dx + tw, :].reshape(m, cin)
            acc = acc + jax.lax.dot_general(
                blk,
                kph_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # image branch: out[T, X] = sum_dy,dx K2img[dy,dx] . ypad[T+dy, X+dx]
    mi = kth * ktw
    zacc = jnp.zeros((mi, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            blk = tile_y[dy : dy + kth, dx : dx + ktw, :].reshape(mi, cy)
            zacc = zacc + jax.lax.dot_general(
                blk,
                wimg_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    zi = zacc.reshape(th, k, tw, k, cout).transpose(0, 2, 1, 3, 4)
    acc = acc + zi.reshape(m, kk * cout)
    acc = acc + b2_ref[0][None, :]

    z_ref[0] = acc.reshape(th, tw, kk * cout).astype(z_ref.dtype)
    ssum_ref[0, 0] = jnp.sum(acc, axis=0)
    ssq_ref[0, 0] = jnp.sum(acc * acc, axis=0)


# --------------------------------------------------------------- kernel 2


def _tail_kernel(
    z_ref,  # [1, th, tw, KK*Cout]
    mu_ref,  # [1, 1, KK*Cout] (per-channel IN1 mean, phase-broadcast)
    s_ref,  # [1, 1, KK*Cout] (per-channel IN1 rsqrt(var+eps))
    a_ref,  # [1, 1] prelu slope (SMEM)
    w3_ref,  # [Cout, OP] conv3 kernel (padded out dim)
    b3_ref,  # [1, OP]
    u_ref,  # out: [1, th, tw, KK*OP]
    usum_ref,  # out: [1, 1, OP]  (flat tile index)
    usq_ref,  # out: [1, 1, OP]
    *,
    th: int,
    tw: int,
    cout: int,
    op: int,
    out_ch: int,
    kk: int,
):
    z = z_ref[0].astype(jnp.float32)  # [th, tw, kk*cout]
    x1 = (z - mu_ref[0, 0][None, None, :]) * s_ref[0, 0][None, None, :]
    a = a_ref[0, 0]
    x1 = jnp.where(x1 >= 0, x1, a * x1)
    m = th * tw * kk
    u = (
        jax.lax.dot_general(
            x1.reshape(m, cout),
            w3_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b3_ref[0][None, :]
    )  # [m, OP] (OP = lane-padded out channels)
    u_ref[0] = (
        u.reshape(th, tw, kk, op)[..., :out_ch]
        .reshape(th, tw, kk * out_ch)
        .astype(u_ref.dtype)
    )
    usum_ref[0, 0] = jnp.sum(u, axis=0)
    usq_ref[0, 0] = jnp.sum(u * u, axis=0)


# --------------------------------------------------------------- driver


def _pick_tile(n: int, pref: int) -> int:
    for t in (pref, pref // 2, pref // 4, 2, 1):
        if t >= 1 and n % t == 0:
            return t
    return 1


def fused_head_tail(
    trunk,
    img_feat,
    k2_trunk,
    k2_img,
    b2,
    w3,
    b3,
    prelu_a,
    act: str = "Softplus",
    k: int = 4,
    eps: float = 1e-5,
    interpret: bool = False,
    debug_intermediates: bool = False,
):
    """Public wrapper: resolves the kernel tile sizes (env-tunable via
    POSFEAT_HEAD_T1/T2, format "th,tw") and dataflow switches OUTSIDE the
    jit so changing them invalidates the compile cache.

    img_feat is the instance-normalized image-branch feature map
    [B, k*h, k*w, Cy]; its 3x3 conv2 half runs inside kernel 1 by
    default (POSFEAT_HEAD_V2=0 restores the XLA conv + z_img operand)."""
    import os

    _t1 = os.environ.get("POSFEAT_HEAD_T1", "8,32").split(",")
    _t2 = os.environ.get("POSFEAT_HEAD_T2", "8,32").split(",")
    tiles = (int(_t1[0]), int(_t1[1]), int(_t2[0]), int(_t2[1]))
    # zt (transpose-bitcast z_img) is numerically exact but NOT a win:
    # XLA replaces the relayout copy with an equally priced tiled
    # reshape — the conv's B-interleaved physical tiling can't feed
    # W-tiled kernel blocks without data movement. Kept for experiments
    # on the v1 (z_img) path.
    zt = os.environ.get("POSFEAT_HEAD_ZT", "0") == "1" and not interpret
    # v2 (in-kernel image conv) is numerically exact but NOT the default:
    # Mosaic rejects the 64-channel halo DMA ("slice along dim 3 must be
    # aligned to tiling (128)"), and the A/B numbers showed the XLA-side
    # data movement it saves (~0.53 ms/img) is nearly cancelled by the
    # extra half-lane MXU passes in-kernel. Kept for interpret-mode
    # experiments; the default path is v1 (XLA conv2img + z_img operand).
    v2 = os.environ.get("POSFEAT_HEAD_V2", "0") == "1"
    return _fused_head_tail(
        trunk, img_feat, k2_trunk, k2_img, b2, w3, b3, prelu_a,
        act=act, k=k, eps=eps, interpret=interpret,
        debug_intermediates=debug_intermediates, tiles=tiles, zt=zt, v2=v2,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "act", "k", "interpret", "debug_intermediates", "tiles", "zt", "v2"
    ),
)
def _fused_head_tail(
    trunk: jnp.ndarray,  # [B, h, w, Cin] (post conv1+IN+PReLU)
    img_feat: jnp.ndarray,  # [B, k*h, k*w, Cy] (IN'd image features)
    k2_trunk: jnp.ndarray,  # [3, 3, Cin, Cout] f32
    k2_img: jnp.ndarray,  # [3, 3, Cy, Cout] f32
    b2: jnp.ndarray,  # [Cout]
    w3: jnp.ndarray,  # [1, 1, Cout, out] conv3 kernel
    b3: jnp.ndarray,  # [out]
    prelu_a: jnp.ndarray,  # [1]
    act: str = "Softplus",
    k: int = 4,
    eps: float = 1e-5,
    interpret: bool = False,
    debug_intermediates: bool = False,
    tiles=(8, 32, 8, 32),
    zt: bool = False,
    v2: bool = True,
) -> jnp.ndarray:
    """Reference-exact head tail -> full-res score [B, k*h, k*w, out].

    Equivalent to (DeteNet.py:108-113, identity prior):
        z = conv3x3_zeropad(upsample_x4(trunk))
            + conv3x3_zeropad(img_feat) + b2
        x = prelu(instance_norm(z)); u = conv1x1(x) + b3
        score = act(instance_norm(u))
    """
    B, h, w, cin = trunk.shape
    cout = k2_trunk.shape[3]
    cy = k2_img.shape[2]
    out_ch = w3.shape[-1]
    kk = k * k
    dt = trunk.dtype

    th = _pick_tile(h, tiles[0])
    tw = _pick_tile(w, tiles[1])
    nty, ntx = h // th, w // tw
    th2 = _pick_tile(h, tiles[2])
    tw2 = _pick_tile(w, tiles[3])
    nty2, ntx2 = h // th2, w // tw2
    Hf, Wf = k * h, k * w

    if not v2:
        # v1 path: the image-branch conv2 half runs in XLA
        z_img = jax.lax.conv_general_dilated(
            img_feat,
            k2_img.astype(dt),
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        ).astype(dt)

    # Force canonical (row-major) layouts on the tensors that feed the
    # Mosaic kernels. Embedded in a larger XLA program, conv outputs can
    # arrive in conv-preferred layouts, which silently corrupts the
    # custom-call operands (observed on v5e: jitted-model scores diverged
    # while the identical standalone program was exact).
    if not interpret:
        from jax.experimental.layout import Layout, with_layout_constraint

        canon4 = Layout((0, 1, 2, 3))
        if v2:
            trunk, img_feat = with_layout_constraint(
                (trunk, img_feat), (canon4, canon4)
            )
        elif zt:
            # [B,Hf,Wf,C] in the conv-preferred {3,0,2,1} layout is
            # bit-identical to canonical [Hf,Wf,B,C]; flatten (B,C) so
            # the Mosaic block avoids a singleton dim (rejected as
            # "layout with implicit dimension")
            z_img = jnp.transpose(z_img, (1, 2, 0, 3)).reshape(
                Hf, Wf, B * cout
            )
            trunk, z_img = with_layout_constraint(
                (trunk, z_img), (canon4, Layout((0, 1, 2)))
            )
        else:
            trunk, z_img = with_layout_constraint(
                (trunk, z_img), (canon4, canon4)
            )

    # lane-align the contraction dim for the halo DMA (the MXU tiles K by
    # 128 internally, so zero-padded channels cost nothing extra)
    cin_p = ((cin + 127) // 128) * 128
    kph = _phase_kernel(k2_trunk, k)
    kph = jnp.pad(kph, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0))).astype(dt)
    T, Bo, L, R = _ring_strips(trunk, k2_trunk, k)
    b2ph = jnp.tile(b2.astype(jnp.float32), kk)[None, :]  # [1, kk*cout]
    # edge pad (upsample clamp) + zero overhang for the aligned halo DMA
    tp = jnp.pad(trunk, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    tp = jnp.pad(tp, ((0, 0), (0, 0), (0, 6), (0, cin_p - cin)))

    grid = (B, nty, ntx)
    if v2:
        # zero-padded image features: ONE fused pad materialization (the
        # IN-apply elementwise chain fuses into it); the kernel DMAs
        # halo windows out of it directly
        ktw = k * tw
        yp = jnp.pad(
            img_feat.astype(dt), ((0, 0), (1, 1), (1, 7), (0, 0))
        )  # [B, Hf+2, Wf+8, cy]
        wimg = k2_img.astype(dt)  # [3, 3, cy, cout]

        kernel1 = functools.partial(
            _conv_kernel_v2, th=th, tw=tw, cin=cin_p, cout=cout, k=k
        )
        z, ssum, ssq = pl.pallas_call(
            kernel1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # tp (manual halo DMA)
                pl.BlockSpec(memory_space=pl.ANY),  # yp (manual halo DMA)
                pl.BlockSpec(
                    (3, 3, cin_p, kk * cout),
                    lambda b, i, j: (0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (3, 3, cy, cout),
                    lambda b, i, j: (0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, kk * cout),
                    lambda b, i, j: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, th, tw, kk * cout),
                    lambda b, i, j: (b, i, j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, kk * cout),
                    lambda b, i, j: ((b * nty + i) * ntx + j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, kk * cout),
                    lambda b, i, j: ((b * nty + i) * ntx + j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, h, w, kk * cout), dt),
                jax.ShapeDtypeStruct(
                    (B * nty * ntx, 1, kk * cout), jnp.float32
                ),
                jax.ShapeDtypeStruct(
                    (B * nty * ntx, 1, kk * cout), jnp.float32
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, th + 2, tw + 8, cin_p), dt),
                pltpu.VMEM((2, k * th + 2, ktw + 8, cy), dt),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(tp, yp, kph, wimg, b2ph)
    else:
        kernel1 = functools.partial(
            _conv_kernel, th=th, tw=tw, cin=cin_p, cout=cout, k=k, zt=zt
        )
        z, ssum, ssq = pl.pallas_call(
            kernel1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # tp (manual halo DMA)
                pl.BlockSpec(
                    (3, 3, cin_p, kk * cout),
                    lambda b, i, j: (0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (k * th, k * tw, cout),
                    lambda b, i, j: (i, j, b),
                    memory_space=pltpu.VMEM,
                )
                if zt
                else pl.BlockSpec(
                    (1, k * th, k * tw, cout),
                    lambda b, i, j: (b, i, j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, kk * cout),
                    lambda b, i, j: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, th, tw, kk * cout),
                    lambda b, i, j: (b, i, j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, kk * cout),
                    lambda b, i, j: ((b * nty + i) * ntx + j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, kk * cout),
                    lambda b, i, j: ((b * nty + i) * ntx + j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, h, w, kk * cout), dt),
                jax.ShapeDtypeStruct(
                    (B * nty * ntx, 1, kk * cout), jnp.float32
                ),
                jax.ShapeDtypeStruct(
                    (B * nty * ntx, 1, kk * cout), jnp.float32
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, th + 2, tw + 8, cin_p), dt),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(tp, kph, z_img, b2ph)

    # ---- thin-strip border corrections (XLA; O(perimeter) work) ----
    # kernel z carries the clamped-composite values; the reference
    # zero-pads the upsampled map, differing on the outermost full-res
    # ring by the strips T/Bo/L/R. Compute the exact ring values, correct
    # the IN1 statistics analytically, and later rewrite u's ring — conv3
    # is 1x1, so interior pixels are untouched by ring errors.
    Hf, Wf = k * h, k * w
    f32 = jnp.float32

    z_top_raw = z[:, 0, :, : k * cout].astype(f32).reshape(B, Wf, cout)
    z_bot_raw = (
        z[:, h - 1, :, (kk - k) * cout :].astype(f32).reshape(B, Wf, cout)
    )
    z_l_raw = (
        z[:, :, 0, :].astype(f32).reshape(B, h, kk, cout)[:, :, ::k, :]
    ).reshape(B, Hf, cout)
    z_r_raw = (
        z[:, :, w - 1, :].astype(f32).reshape(B, h, kk, cout)[:, :, k - 1 :: k, :]
    ).reshape(B, Hf, cout)

    # corner-inclusive top/bottom corrections (corners belong to the
    # row strips; column strips are applied first and then overwritten)
    D_top = T.at[:, 0].add(L[:, 0]).at[:, -1].add(R[:, 0])
    D_bot = Bo.at[:, 0].add(L[:, -1]).at[:, -1].add(R[:, -1])

    e_left = z_l_raw - L  # full column (corner rows provisional)
    e_right = z_r_raw - R
    e_top = z_top_raw - D_top
    e_bot = z_bot_raw - D_bot

    # IN1 statistics: pool tile partials over tiles AND phases, then add
    # the ring deltas (disjoint accounting: full rows + interior columns)
    n_px = h * w * kk
    s1 = ssum.reshape(B, nty * ntx, kk, cout).sum(axis=(1, 2))  # [B, cout]
    s2 = ssq.reshape(B, nty * ntx, kk, cout).sum(axis=(1, 2))

    def _delta(e, zr):
        return (e - zr).sum(axis=1), (e * e - zr * zr).sum(axis=1)

    d1, d2 = _delta(e_top, z_top_raw)
    for e_, zr_ in (
        (e_bot, z_bot_raw),
        (e_left[:, 1:-1], z_l_raw[:, 1:-1]),
        (e_right[:, 1:-1], z_r_raw[:, 1:-1]),
    ):
        a_, b_ = _delta(e_, zr_)
        d1 = d1 + a_
        d2 = d2 + b_
    s1 = s1 + d1
    s2 = s2 + d2
    mu = s1 / n_px
    var = jnp.maximum(s2 / n_px - mu * mu, 0.0)
    sc = jax.lax.rsqrt(var + eps)
    mu_ph = jnp.tile(mu, (1, kk))[:, None, :]  # [B, 1, kk*cout]
    sc_ph = jnp.tile(sc, (1, kk))[:, None, :]

    op = max(out_ch, 8)  # pad tiny lane dim
    w3p = jnp.pad(
        w3.reshape(cout, out_ch).astype(jnp.float32),
        ((0, 0), (0, op - out_ch)),
    )
    b3p = jnp.pad(b3.astype(jnp.float32), (0, op - out_ch))[None, :]
    a_smem = prelu_a.reshape(1, 1).astype(jnp.float32)

    kernel2 = functools.partial(
        _tail_kernel, th=th2, tw=tw2, cout=cout, op=op, out_ch=out_ch, kk=kk
    )
    grid2 = (B, nty2, ntx2)
    u, usum, usq = pl.pallas_call(
        kernel2,
        grid=grid2,
        in_specs=[
            pl.BlockSpec(
                (1, th2, tw2, kk * cout),
                lambda b, i, j: (b, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, kk * cout), lambda b, i, j: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, kk * cout), lambda b, i, j: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1), lambda b, i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (cout, op), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, op), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, th2, tw2, kk * out_ch),
                lambda b, i, j: (b, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, op),
                lambda b, i, j: ((b * nty2 + i) * ntx2 + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, op),
                lambda b, i, j: ((b * nty2 + i) * ntx2 + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, h, w, kk * out_ch), jnp.float32),
            jax.ShapeDtypeStruct((B * nty2 * ntx2, 1, op), jnp.float32),
            jax.ShapeDtypeStruct((B * nty2 * ntx2, 1, op), jnp.float32),
        ],
        interpret=interpret,
    )(z, mu_ph, sc_ph, a_smem, w3p, b3p)

    # ---- ring rewrite on u (conv3 is 1x1: ring errors never spread) ----
    a_val = prelu_a.astype(f32)[0]
    w3f = w3.reshape(cout, out_ch).astype(f32)
    b3f = b3.astype(f32)

    def tail_plane(e):
        x1 = (e - mu[:, None, :]) * sc[:, None, :]
        x1 = jnp.where(x1 >= 0, x1, a_val * x1)
        return (
            jnp.einsum("bpc,cf->bpf", x1, w3f,
                       precision=jax.lax.Precision.HIGHEST)
            + b3f[None, None, :]
        )

    u_top_e = tail_plane(e_top)  # [B, Wf, out]
    u_bot_e = tail_plane(e_bot)
    u_left_e = tail_plane(e_left)  # [B, Hf, out]
    u_right_e = tail_plane(e_right)

    ko = k * out_ch
    u_top_raw = u[:, 0, :, :ko].reshape(B, Wf, out_ch)
    u_bot_raw = u[:, h - 1, :, (kk - k) * out_ch :].reshape(B, Wf, out_ch)
    u_l_raw = (
        u[:, :, 0, :].reshape(B, h, kk, out_ch)[:, :, ::k, :]
    ).reshape(B, Hf, out_ch)
    u_r_raw = (
        u[:, :, w - 1, :].reshape(B, h, kk, out_ch)[:, :, k - 1 :: k, :]
    ).reshape(B, Hf, out_ch)

    # IN2 statistics with ring deltas (same disjoint accounting)
    n2 = h * w * kk
    us = usum.reshape(B, nty2 * ntx2, op).sum(axis=1)[:, :out_ch]  # [B, out]
    uq = usq.reshape(B, nty2 * ntx2, op).sum(axis=1)[:, :out_ch]
    du1, du2 = _delta(u_top_e, u_top_raw)
    for e_, zr_ in (
        (u_bot_e, u_bot_raw),
        (u_left_e[:, 1:-1], u_l_raw[:, 1:-1]),
        (u_right_e[:, 1:-1], u_r_raw[:, 1:-1]),
    ):
        a_, b_ = _delta(e_, zr_)
        du1 = du1 + a_
        du2 = du2 + b_
    us = us + du1
    uq = uq + du2
    mu2 = us / n2
    var2 = jnp.maximum(uq / n2 - mu2 * mu2, 0.0)
    sc2 = jax.lax.rsqrt(var2 + eps)

    # overwrite the ring (columns first; rows then own the corners)
    ul = u[:, :, 0, :].reshape(B, h, kk, out_ch)
    ul = ul.at[:, :, ::k, :].set(u_left_e.reshape(B, h, k, out_ch))
    u = u.at[:, :, 0, :].set(ul.reshape(B, h, kk * out_ch))
    ur = u[:, :, w - 1, :].reshape(B, h, kk, out_ch)
    ur = ur.at[:, :, k - 1 :: k, :].set(u_right_e.reshape(B, h, k, out_ch))
    u = u.at[:, :, w - 1, :].set(ur.reshape(B, h, kk * out_ch))
    u = u.at[:, 0, :, :ko].set(u_top_e.reshape(B, w, ko))
    u = u.at[:, h - 1, :, (kk - k) * out_ch :].set(u_bot_e.reshape(B, w, ko))

    u = u.reshape(B, h, w, kk, out_ch)
    xn = (u - mu2[:, None, None, None, :]) * sc2[:, None, None, None, :]
    if act == "Softplus":
        s = jax.nn.softplus(xn)
    elif act == "Sigmoid":
        s = jax.nn.sigmoid(xn)
    else:
        raise ValueError(act)
    # phase -> space on the tiny score map
    s = s.reshape(B, h, w, k, k, out_ch)
    s = s.transpose(0, 1, 3, 2, 4, 5).reshape(B, h * k, w * k, out_ch)
    if debug_intermediates:
        return s.astype(dt), {
            "z": z, "ssum": ssum, "mu": mu, "sc": sc, "d1": d1,
            "u": u, "mu2": mu2, "sc2": sc2, "us": us,
            "e_top": e_top, "u_top_e": u_top_e,
        }
    return s.astype(dt)
