"""Inference keypoint detectors: NMS + threshold + coordinate refinement +
top-k (reference preprocess_utils.py:196-429).

TPU reformulation: XLA needs static shapes, so every detector returns a
fixed `num_pts` slate plus `valid_count` per image; the host-side
extractor trims to the reference's dynamic count
max(min(num_pts, valid_count), 128) (putils:249-261) before writing
features. Selection order is identical (top-k of the masked score map,
ties to the lower flat index, like torch.topk on contiguous maps).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from .coords import gen_grid
from .nms import nms, soft_nms
from .pooling import avg_pool2d, max_pool2d
from .samplers import unfold, gumbel_topk_select


def _top_k(x: jnp.ndarray, k: int, recall: float = 0.99):
    """Row-wise top-k. POSFEAT_TOPK=approx (read at trace time) selects
    jax.lax.approx_max_k — on TPU this lowers to the PartialReduce unit
    instead of a full sort of the candidate map (the sort is ~0.1 ms/img
    at 480x640) at a configurable recall (detector_config `topk_recall`,
    default 0.99; exact on CPU). The MMA impact of the approximation is
    judged by the trained-weights probe (tools/selection_stability.py);
    the default stays the exact, reference-ordered top-k
    (putils:249-261)."""
    import os

    if os.environ.get("POSFEAT_TOPK") == "approx":
        return jax.lax.approx_max_k(x, k, recall_target=recall)
    return jax.lax.top_k(x, k)


def _thr_mask(interior: jnp.ndarray, thr, thr_mod: str) -> jnp.ndarray:
    """interior: [B, h', w', 1] -> bool mask (putils:232-240)."""
    B = interior.shape[0]
    flat = interior.reshape(B, -1)
    if thr_mod == "max":
        kp_thr = flat.max(axis=1)
    elif thr_mod == "mean":
        kp_thr = flat.mean(axis=1)
    elif thr_mod == "abs":
        kp_thr = jnp.ones((B,), interior.dtype)
    else:
        raise ValueError(f"unknown thr_mod {thr_mod}")
    return interior > thr * kp_thr.reshape(B, 1, 1, 1)


def quad_refine_offsets(kp_map: jnp.ndarray) -> jnp.ndarray:
    """Dense quadratic-fit sub-pixel offset map [B, H, W, 2] in pixels.

    The interior offsets are the SIFT-style Taylor peak fit of
    `_quad_refine_grids` (clamped to ±0.5 px, zeroed where the Hessian
    is not a well-conditioned local max); the 1-px border ring is zero
    (no full 3×3 support). Used both by the eval-time ``refine='quad'``
    detector path and by DiskLoss's ``reward_at_refined`` lever, which
    computes the epipolar REINFORCE reward at the coordinates
    extraction would actually emit (VERDICT r4 item 1a; reference
    kploss.py:37-48 rewards the integer sample positions).
    """
    B, H, W, _ = kp_map.shape
    s = kp_map[..., 0].astype(jnp.float32)  # [B, H, W]
    c = s[:, 1:-1, 1:-1]
    px = s[:, 1:-1, 2:]
    mx = s[:, 1:-1, :-2]
    py = s[:, 2:, 1:-1]
    my = s[:, :-2, 1:-1]
    dx = 0.5 * (px - mx)
    dy = 0.5 * (py - my)
    dxx = px - 2.0 * c + mx
    dyy = py - 2.0 * c + my
    dxy = 0.25 * (s[:, 2:, 2:] - s[:, 2:, :-2] - s[:, :-2, 2:] + s[:, :-2, :-2])
    det = dxx * dyy - dxy * dxy
    # well-posed strict local max: negative-definite Hessian
    ok = (det > 1e-12) & (dxx < 0.0)
    safe_det = jnp.where(ok, det, 1.0)
    ox = jnp.where(ok, -(dyy * dx - dxy * dy) / safe_det, 0.0)
    oy = jnp.where(ok, -(dxx * dy - dxy * dx) / safe_det, 0.0)
    ox = jnp.clip(ox, -0.5, 0.5)
    oy = jnp.clip(oy, -0.5, 0.5)
    off = jnp.stack([ox, oy], axis=-1)  # [B, H-2, W-2, 2]
    return jnp.pad(off, ((0, 0), (1, 1), (1, 1), (0, 0)))


def softargmax3_offsets(
    kp_map: jnp.ndarray, temperature: float, window: int = 3
) -> jnp.ndarray:
    """Differentiable soft-argmax offset map [B, H, W, 2] in pixels.

    Per pixel, the expected offset of a softmax(temperature·score)
    distribution over its `window`×`window` neighborhood
    (edge-replicated at the border; window odd, default 3). Unlike
    `quad_refine_offsets` this is differentiable w.r.t. the score map,
    which is what DiskLoss's ``loc_weight`` localization term needs:
    penalizing the epipolar distance of the soft peak position gives
    the score surface a dense gradient toward sub-pixel-accurate peaks
    — the signal REINFORCE's integer-pixel sampling cannot see
    (VERDICT r4 item 1b). window=5 mirrors the eval-time 'quad5'
    refiner's support (the ×4-upsampled score peaks are wider than one
    pixel, PROOFS.md band decomposition).
    """
    assert window % 2 == 1 and window >= 3, window
    r = window // 2
    B, H, W, _ = kp_map.shape
    s = kp_map[..., 0]
    sp = jnp.pad(s, ((0, 0), (r, r), (r, r)), mode="edge")
    offs = range(-r, r + 1)
    patches = jnp.stack(
        [
            sp[:, r + dy : H + r + dy, r + dx : W + r + dx]
            for dy in offs
            for dx in offs
        ],
        axis=-1,
    )  # [B, H, W, window²]; tap order row-major over (dy, dx)
    w = jax.nn.softmax(temperature * patches, axis=-1)
    dxs = jnp.asarray([dx for _ in offs for dx in offs], s.dtype)
    dys = jnp.asarray([dy for dy in offs for _ in offs], s.dtype)
    ox = (w * dxs).sum(-1)
    oy = (w * dys).sum(-1)
    return jnp.stack([ox, oy], axis=-1)


def _quad_refine_grids(kp_map: jnp.ndarray) -> jnp.ndarray:
    """Dense SIFT-style quadratic (Taylor) sub-pixel peak fit.

    For every interior pixel, fits s(x) ≈ s + gᵀδ + ½δᵀHδ to the 3×3
    neighborhood via central differences and solves H·δ = −g; the
    offset is clamped to ±0.5 px (the NMS winner is the discrete
    argmax, so the true peak lies within half a pixel) and zeroed where
    the Hessian is not a well-conditioned local max. This is the
    classical sharper estimator than the reference's 3×3 center-of-mass
    (putils:242-247), which biases toward the window center; exposed as
    ``refine='quad'`` in detector_config (opt-in — the default stays
    reference-parity 'avg3').

    Returns the refined normalized-coordinate map [B, H-2, W-2, 2],
    index-aligned with the interior crop. Math in f32 (the derivatives
    are differences of near-equal values).
    """
    B, H, W, _ = kp_map.shape
    off = quad_refine_offsets(kp_map)[:, 1:-1, 1:-1, :]
    ox = off[..., 0]
    oy = off[..., 1]
    jj = jnp.arange(1, W - 1, dtype=jnp.float32)
    ii = jnp.arange(1, H - 1, dtype=jnp.float32)
    kx = -1.0 + 2.0 * (jj[None, None, :] + ox) / (W - 1)
    ky = -1.0 + 2.0 * (ii[None, :, None] + oy) / (H - 1)
    return jnp.stack([kx, ky], axis=-1).astype(kp_map.dtype)


def _quad5_filters():
    """Savitzky-Golay 5x5 filters for the 6 quadratic-surface
    coefficients s ~ a·x² + b·y² + c·xy + d·x + e·y + f (least squares
    over the window; each coefficient is a fixed linear filter)."""
    import numpy as np

    xs, ys = np.meshgrid(np.arange(-2, 3), np.arange(-2, 3))
    X = np.stack(
        [xs**2, ys**2, xs * ys, xs, ys, np.ones_like(xs)], axis=-1
    ).reshape(25, 6).astype(np.float64)
    F = np.linalg.pinv(X)  # [6, 25]
    return jnp.asarray(F.reshape(6, 5, 5), jnp.float32)


def _quad5_refine_grids(kp_map: jnp.ndarray) -> jnp.ndarray:
    """Dense 5x5 least-squares quadratic sub-pixel peak fit
    (``refine='quad5'``).

    Motivated by the budget-matched band decomposition (PROOFS.md,
    2026-08-20): the learned detector's whole SIFT gap is sub-3 px
    localization, and the head's ×4 upsample gives score peaks a wide
    support that a 3×3 central-difference fit (``'quad'``) can barely
    see across. Fitting the quadratic by least squares over 5×5
    averages the plateau noise and reads the true curvature; offsets
    clamp to ±1 px (a 3×3-NMS winner's true peak lies within one
    pixel). Falls back to the pixel center where the fitted Hessian is
    not a well-conditioned local max. Returns the refined
    normalized-coordinate map [B, H-2, W-2, 2], aligned with the
    interior crop (the outermost ring uses edge-replicated context).
    """
    B, H, W, _ = kp_map.shape
    s = kp_map[..., 0].astype(jnp.float32)
    # edge-replicate so every interior pixel has a full 5x5 window
    sp = jnp.pad(s, ((0, 0), (2, 2), (2, 2)), mode="edge")[..., None]
    F = _quad5_filters()  # [6, 5, 5]
    coeffs = jax.lax.conv_general_dilated(
        sp,
        F.transpose(1, 2, 0)[:, :, None, :],  # [5,5,1,6]
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, H, W, 6]
    a, b, c, d, e = (coeffs[..., i] for i in range(5))
    det = 4.0 * a * b - c * c
    ok = (det > 1e-12) & (a < 0.0)
    safe = jnp.where(ok, det, 1.0)
    ox = jnp.where(ok, -(2.0 * b * d - c * e) / safe, 0.0)
    oy = jnp.where(ok, -(2.0 * a * e - c * d) / safe, 0.0)
    ox = jnp.clip(ox, -1.0, 1.0)[:, 1:-1, 1:-1]
    oy = jnp.clip(oy, -1.0, 1.0)[:, 1:-1, 1:-1]
    jj = jnp.arange(1, W - 1, dtype=jnp.float32)
    ii = jnp.arange(1, H - 1, dtype=jnp.float32)
    kx = -1.0 + 2.0 * (jj[None, None, :] + ox) / (W - 1)
    ky = -1.0 + 2.0 * (ii[None, :, None] + oy) / (H - 1)
    return jnp.stack([kx, ky], axis=-1).astype(kp_map.dtype)


def generate_kpts_single(
    kp_map: jnp.ndarray,
    *,
    num_pts: int,
    nms_radius: int,
    use_nms=True,
    thr=False,
    thr_mod: str = "mean",
    stable: bool = True,
    temperature: float = 1.0,
    key: jax.Array = None,
    stride: int = 1,
    scale: int = 4,
    refine: str = "avg3",
    refine_temperature: float = 20.0,
    topk_recall: float = 0.99,
):
    """Full-image detector with 3×3 soft coordinate refinement (putils:215-278).

    kp_map: [B, H, W, 1] full-res score map. Returns
    (kps_n [B, num_pts, 2] normalized, scores [B, num_pts, 1],
    valid_count [B] int32 = #selectable positions, pre-floor).

    ``refine`` selects the sub-pixel estimator: 'avg3' (default —
    reference-parity 3×3 score-weighted center of mass) or 'quad'
    (quadratic Taylor peak fit, see _quad_refine_grids; stride-1 only).
    """
    B, H, W, _ = kp_map.shape
    interior = kp_map[:, 1:-1, 1:-1, :]  # [B, H-2, W-2, 1]

    if use_nms == "softnms":
        nms_mask = soft_nms(interior, nms_radius)
        count_src = None  # counted from thr_mask below
    elif use_nms:
        nms_mask = nms(interior, nms_radius).astype(kp_map.dtype)
        count_src = nms_mask
    else:
        nms_mask = jnp.ones_like(interior)
        count_src = nms_mask

    if thr:
        tmask = _thr_mask(interior, thr, thr_mod)
        nms_mask = tmask.astype(kp_map.dtype) * nms_mask
        if use_nms == "softnms":
            count_src = tmask.astype(kp_map.dtype)
        else:
            count_src = nms_mask

    # 3×3 score-weighted coordinate refinement (putils:242-247), the
    # 'pool' dataflow: pool three full-resolution 1-2 channel maps
    # densely, then fetch 3 values per selected point. The per-point
    # 9-neighbor-gather ('sel') and separable-window ('sep')
    # formulations were measured and retired in rounds 2-3: the v5e
    # microbench (tools/bench_refine.py, 2026-08-19) put the gather at
    # 1.08 ms/img vs 0.24 for the dense pools (TPU gathers are
    # row-at-a-time; stride-1 reduce_windows ride the VPU), and 'sep'
    # A/B'd neutral because XLA already fuses the score×grid product.
    # An NMS winner at radius>=1 is a strict local max over a window
    # that contains its 3x3 INTERIOR neighborhood, so the reference's
    # max-pooled output score (putils:249) at a winner is the winner's
    # own score — the value the top-k already returns — everywhere
    # except the interior-edge ring, where max_pool3 on the full map
    # peeks into the 1-px frame border that NMS never saw (~0.8% of
    # winners on a 22x22 test map, far fewer at 480x640). Reusing the
    # top-k value skips the dense full-res max_pool AND the [B*k]-row
    # score gather (together ~0.05 ms/img at 480x640/8192 pts, r4
    # trace) at the cost of ring winners reporting their own score.
    # Selection/order is untouched (it always ranked by the masked
    # interior map), so this rides the certified approx fast path only
    # (POSFEAT_TOPK=approx, judged by the trained-weights ΔMMA probe);
    # exact mode keeps the reference gather. Only the stable NMS path
    # qualifies (gumbel mixes scores; softnms winners are not argmaxes
    # of the rescored map).
    score_from_topk = (
        use_nms is True
        and nms_radius >= 1
        and stable
        and os.environ.get("POSFEAT_TOPK") == "approx"
    )
    refine_quad = refine in ("quad", "quad5", "soft", "soft5") and stride == 1
    if refine_quad:
        if refine in ("soft", "soft5"):
            # soft-argmax estimator matching DiskLoss's loc_weight
            # training term (same temperature/window family): for
            # checkpoints trained with the localization penalty, this
            # reads the peak with the exact statistic training
            # optimized. refine_temperature tunes the softmax.
            off = softargmax3_offsets(
                kp_map, refine_temperature,
                window=5 if refine == "soft5" else 3,
            )[:, 1:-1, 1:-1, :]
            jj = jnp.arange(1, W - 1, dtype=jnp.float32)
            ii = jnp.arange(1, H - 1, dtype=jnp.float32)
            kx = -1.0 + 2.0 * (jj[None, None, :] + off[..., 0]) / (W - 1)
            ky = -1.0 + 2.0 * (ii[None, :, None] + off[..., 1]) / (H - 1)
            grids = jnp.stack([kx, ky], axis=-1).astype(kp_map.dtype)
        else:
            grids = (
                _quad5_refine_grids(kp_map)
                if refine == "quad5"
                else _quad_refine_grids(kp_map)
            )
    else:
        grids_org = gen_grid(
            -1, 1, -1, 1, H, W, dtype=kp_map.dtype
        ).reshape(1, H, W, 2)
        grids = avg_pool2d(kp_map * grids_org, 3, stride) / avg_pool2d(
            kp_map, 3, stride
        )
    kp_score_map = (
        None if score_from_topk else max_pool2d(kp_map, 3, stride)
    )

    valid_count = count_src.reshape(B, -1).sum(axis=1).astype(jnp.int32)

    masked = (nms_mask * interior).reshape(B, -1)
    if stable:
        h2, w2 = H - 2, W - 2
        fold = 0
        if use_nms is True and nms_radius >= 1:
            # NMS winners are pairwise >nms_radius apart (Chebyshev), so a
            # (r+1)×(r+1) block holds at most one — block-max-reducing the
            # masked map before top_k is EXACT and shrinks it (r+1)²×
            fold = min(nms_radius + 1, 4)
        if fold > 1:
            hp = -(-h2 // fold) * fold
            wp = -(-w2 // fold) * fold
            mm = jnp.pad(
                masked.reshape(B, h2, w2), ((0, 0), (0, hp - h2), (0, wp - w2))
            )
            blocks = mm.reshape(B, hp // fold, fold, wp // fold, fold)
            blocks = blocks.transpose(0, 1, 3, 2, 4).reshape(
                B, (hp // fold) * (wp // fold), fold * fold
            )
            bmax = blocks.max(axis=-1)
            barg = jnp.argmax(blocks, axis=-1)
            k = min(num_pts, bmax.shape[1])
            if os.environ.get("POSFEAT_TOPK") == "approx":
                # Pack the in-block argmax (≤4 bits: fold ≤ 4) into the
                # mantissa LSBs of the f32 block-max before the top-k,
                # and decode it from the returned VALUES — this removes
                # a [B*k]-row gather from [B, hw/fold²] (0.083 ms/img at
                # the 480x640/8192-pt operating point, the single
                # largest op in the detector group, r4 trace). Scores
                # are Softplus-nonnegative, so integer ordering of the
                # f32 bits matches float ordering and masking 4 ulps
                # only reorders ties closer than 2⁻¹⁹ relative — well
                # inside approx_max_k's 0.99-recall contract (this path
                # is gated on it; exact mode keeps reference ordering).
                packed = jnp.bitwise_or(
                    jnp.bitwise_and(
                        jax.lax.bitcast_convert_type(
                            bmax.astype(jnp.float32), jnp.int32
                        ),
                        jnp.int32(~0xF),
                    ),
                    barg.astype(jnp.int32),
                )
                scores_sel, bidx = _top_k(
                    jax.lax.bitcast_convert_type(packed, jnp.float32), k,
                    topk_recall,
                )
                inner = jnp.bitwise_and(
                    jax.lax.bitcast_convert_type(scores_sel, jnp.int32),
                    jnp.int32(0xF),
                )
            else:
                scores_sel, bidx = _top_k(bmax, k, topk_recall)
                # recover flat indices in the (h2, w2) interior grid
                inner = jnp.take_along_axis(barg, bidx, axis=1)
            by = bidx // (wp // fold)
            bx = bidx % (wp // fold)
            yy = by * fold + inner // fold
            xx = bx * fold + inner % fold
            # zero-score pad blocks may decode past the interior; clip
            # (their slots are trimmed by valid_count anyway)
            idx = jnp.clip(yy * w2 + xx, 0, h2 * w2 - 1)
        else:
            # clamp k to the number of positions (tiny images), pad the
            # slate back to the static num_pts with zero-score entries
            k = min(num_pts, masked.shape[1])
            scores_sel, idx = _top_k(masked, k, topk_recall)
        kps = jnp.take_along_axis(
            grids.reshape(B, -1, 2), idx[..., None], axis=1
        )
        if score_from_topk:
            # strip the packed argmax bits back out of the values (the
            # approx+nms gate guarantees the fold>1 packed path ran)
            kp_score = jax.lax.bitcast_convert_type(
                jnp.bitwise_and(
                    jax.lax.bitcast_convert_type(scores_sel, jnp.int32),
                    jnp.int32(~0xF),
                ),
                jnp.float32,
            ).astype(kp_map.dtype)[..., None]
        else:
            kp_score = jnp.take_along_axis(
                kp_score_map.reshape(B, -1, 1), idx[..., None], axis=1
            )
        if k < num_pts:
            pad = num_pts - k
            kps = jnp.pad(kps, ((0, 0), (0, pad), (0, 0)))
            kp_score = jnp.pad(kp_score, ((0, 0), (0, pad), (0, 0)))
    else:
        assert key is not None, "gumbel sampling requires a PRNG key"
        select = gumbel_topk_select(
            nms_mask * interior, num_pts, key, temperature
        )  # [B, num_pts, h'w']
        h2, w2 = H - 2, W - 2
        kps = select @ grids.reshape(B, h2 * w2, 2)
        kp_score = select @ interior.reshape(B, h2 * w2, 1)

    return kps, kp_score, valid_count


def generate_kpts_single_noavg(
    kp_map: jnp.ndarray,
    *,
    num_pts: int,
    nms_radius: int,
    use_nms=True,
    thr=False,
    thr_mod: str = "mean",
    stable: bool = True,
    temperature: float = 1.0,
    key: jax.Array = None,
    stride: int = 1,
    scale: int = 4,
    topk_recall: float = 0.99,
):
    """Detector without coordinate refinement (putils:280-336).

    Operates on the full map (no interior crop). Same static-slate return.
    """
    B, H, W, _ = kp_map.shape
    if use_nms == "softnms":
        nms_mask = soft_nms(kp_map, nms_radius)
        count_src = None
    elif use_nms:
        nms_mask = nms(kp_map, nms_radius).astype(kp_map.dtype)
        count_src = nms_mask
    else:
        nms_mask = jnp.ones_like(kp_map)
        count_src = nms_mask

    if thr:
        tmask = _thr_mask(kp_map, thr, thr_mod)
        nms_mask = tmask.astype(kp_map.dtype) * nms_mask
        count_src = tmask.astype(kp_map.dtype) if use_nms == "softnms" else nms_mask

    grids = gen_grid(-1, 1, -1, 1, H, W, dtype=kp_map.dtype).reshape(1, H, W, 2)
    grids = jnp.broadcast_to(grids, (B, H, W, 2))
    valid_count = count_src.reshape(B, -1).sum(axis=1).astype(jnp.int32)

    masked = (nms_mask * kp_map).reshape(B, -1)
    k = min(num_pts, masked.shape[1])
    _, idx = _top_k(masked, k, topk_recall)
    kps = jnp.take_along_axis(grids.reshape(B, -1, 2), idx[..., None], axis=1)
    kp_score = jnp.take_along_axis(
        kp_map.reshape(B, -1, 1), idx[..., None], axis=1
    )
    if k < num_pts:
        pad = num_pts - k
        kps = jnp.pad(kps, ((0, 0), (0, pad), (0, 0)))
        kp_score = jnp.pad(kp_score, ((0, 0), (0, pad), (0, 0)))
    return kps, kp_score, valid_count


def generate_kpts_regular_grid_single(
    kp_map: jnp.ndarray,
    *,
    grid_size: int,
    num_pts: int = 0,
    stable: bool = True,
    use_nms=True,
    nms_radius: int = None,
    thr=None,
    thr_mod: str = "mean",
    key: jax.Array = None,
    topk_recall: float = 0.99,
):
    """Grid-cell argmax/sample detector (putils:375-429).

    Returns (kps_n [B, num_pts, 2], scores [B, num_pts, 1], valid_count [B]).
    If num_pts == 0 the full cell slate (hg*wg points) is returned.
    """
    B, H, W, _ = kp_map.shape
    if use_nms == "softnms":
        kp_map = soft_nms(kp_map, nms_radius) * kp_map
        nms_mask = jnp.ones_like(kp_map, dtype=bool)
    elif use_nms:
        nms_mask = nms(kp_map, nms_radius)
    else:
        nms_mask = jnp.ones_like(kp_map, dtype=bool)

    if thr is not None:
        nms_mask = _thr_mask(kp_map, thr, thr_mod) & nms_mask

    grids = gen_grid(-1, 1, -1, 1, H, W, dtype=kp_map.dtype).reshape(1, H, W, 2)
    grids_cells = unfold(jnp.broadcast_to(grids, (B, H, W, 2)), grid_size)
    map_cells = unfold(kp_map, grid_size)[:, :, :, 0, :]  # [B, hg, wg, g*g]
    nms_cells = unfold(nms_mask.astype(kp_map.dtype), grid_size)[:, :, :, 0, :]

    probs = jax.nn.softmax(map_cells, axis=-1)
    if stable:
        idx = jnp.argmax(probs, axis=-1)
    else:
        assert key is not None
        idx = jax.random.categorical(key, map_cells, axis=-1)

    kps = jnp.take_along_axis(
        grids_cells, idx[:, :, :, None, None].astype(jnp.int32), axis=-1
    )[..., 0]  # [B, hg, wg, 2]
    score = jnp.take_along_axis(map_cells, idx[..., None], axis=-1)
    mask = jnp.take_along_axis(nms_cells, idx[..., None], axis=-1)

    kps = kps.reshape(B, -1, 2)
    score = score.reshape(B, -1, 1)
    mask = mask.reshape(B, -1, 1)
    valid_count = mask[..., 0].sum(axis=1).astype(jnp.int32)

    if num_pts:
        k = min(num_pts, kps.shape[1])
        top_score, top_idx = _top_k((mask * score)[..., 0], k, topk_recall)
        kps = jnp.take_along_axis(kps, top_idx[..., None], axis=1)
        score = top_score[..., None]
        if k < num_pts:
            pad = num_pts - k
            kps = jnp.pad(kps, ((0, 0), (0, pad), (0, 0)))
            score = jnp.pad(score, ((0, 0), (0, pad), (0, 0)))
    return kps, score, valid_count


def generate_kpts(
    outputs,
    key: jax.Array,
    *,
    nms_radius: int,
    num_pts: int,
    stable_prob: float = 0.9,
    use_nms=True,
    stride: int = 1,
    epoch: int = 0,
):
    """Two-image whole-map detector (putils:196-213): stable top-k with
    probability stable_prob, else Gumbel sampling at 0.01/(epoch+1).

    Jit-safe: the stable/gumbel choice is a traced Bernoulli draw routed
    through ``lax.cond`` (both branches return identical static shapes),
    not a Python-level bool of a tracer."""
    k_choice, k1, k2 = jax.random.split(key, 3)
    kp_map1 = outputs["preds1"]["local_point"]
    kp_map2 = outputs["preds2"]["local_point"]
    temperature = 0.01 / (epoch + 1)
    kw = dict(
        num_pts=num_pts, nms_radius=nms_radius, use_nms=use_nms,
        stride=stride, temperature=temperature,
    )

    def run(stable):
        kps1, s1, _ = generate_kpts_single(kp_map1, key=k1, stable=stable, **kw)
        kps2, s2, _ = generate_kpts_single(kp_map2, key=k2, stable=stable, **kw)
        return kps1, kps2, s1, s2

    return jax.lax.cond(
        jax.random.uniform(k_choice) < stable_prob,
        lambda: run(True),
        lambda: run(False),
    )


def generate_kpts_regular_grid(
    outputs,
    key: jax.Array,
    *,
    grid_size: int,
    num_pts: int = 0,
    stable_prob: float = 0.9,
    use_nms=True,
    nms_radius: int = None,
):
    """Two-image grid-cell detector (putils:358-373). Jit-safe stable/gumbel
    choice via ``lax.cond`` (see generate_kpts)."""
    k_choice, k1, k2 = jax.random.split(key, 3)
    kp_map1 = outputs["preds1"]["local_point"]
    kp_map2 = outputs["preds2"]["local_point"]
    kw = dict(
        grid_size=grid_size, num_pts=num_pts,
        use_nms=use_nms, nms_radius=nms_radius,
    )

    def run(stable):
        kps1, s1, _ = generate_kpts_regular_grid_single(
            kp_map1, key=k1, stable=stable, **kw
        )
        kps2, s2, _ = generate_kpts_regular_grid_single(
            kp_map2, key=k2, stable=stable, **kw
        )
        return kps1, kps2, s1, s2

    return jax.lax.cond(
        jax.random.uniform(k_choice) < stable_prob,
        lambda: run(True),
        lambda: run(False),
    )


DETECTORS = {
    "generate_kpts_single": generate_kpts_single,
    "generate_kpts_single_noavg": generate_kpts_single_noavg,
    "generate_kpts_regular_grid_single": generate_kpts_regular_grid_single,
}
