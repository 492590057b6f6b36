"""Parity of the static-slate detectors vs the reference's dynamic top-k
formulation (torch re-implementation inline)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from posfeat_tpu.ops.detect import (
    generate_kpts_single,
    generate_kpts_regular_grid_single,
)
from tests.test_ops_parity import torch_nms


def torch_generate_kpts_single(kp_map, nms_radius, num_pts, thr=False, thr_mod="mean"):
    """Reference putils:215-278, stable path, hard NMS."""
    b, _, h, w = kp_map.shape
    x, y = torch.meshgrid(
        [torch.linspace(-1, 1, w), torch.linspace(-1, 1, h)], indexing="ij"
    )
    grids_org = (
        torch.stack((x, y), -1).transpose(0, 1).reshape(h, w, 2)[None]
        .repeat(b, 1, 1, 1)
        .permute(0, 3, 1, 2)
        .float()
    )

    nms_mask = torch_nms(kp_map[:, :, 1:-1, 1:-1], nms_radius).float()
    if thr:
        interior = kp_map[:, :, 1:-1, 1:-1]
        if thr_mod == "max":
            kp_thr = interior.reshape(b, 1, -1).max(2)[0]
        elif thr_mod == "mean":
            kp_thr = interior.reshape(b, 1, -1).mean(2)
        elif thr_mod == "abs":
            kp_thr = torch.tensor(1.0).repeat(b)
        thr_mask = interior > thr * kp_thr.view(b, 1, 1, 1)
        nms_mask = thr_mask * nms_mask

    grids = F.avg_pool2d(kp_map * grids_org, 3, stride=1, padding=0)
    kp_weight = F.avg_pool2d(kp_map, 3, stride=1, padding=0)
    grids = grids / kp_weight
    kp_score_map = F.max_pool2d(kp_map, 3, stride=1, padding=0)

    valid = int(nms_mask.view(b, -1).sum(1).min())
    k = num_pts
    if k > valid:
        k = valid
    if k < 128:
        k = 128

    _, idx = (
        (nms_mask * kp_map[:, :, 1:-1, 1:-1])
        .permute(0, 2, 3, 1)
        .contiguous()
        .view(b, -1)
        .topk(k)
    )
    kps = grids.permute(0, 2, 3, 1).reshape(b, -1, 2).gather(
        1, idx.unsqueeze(-1).repeat(1, 1, 2)
    )
    score = kp_score_map.permute(0, 2, 3, 1).reshape(b, -1, 1).gather(
        1, idx.unsqueeze(-1)
    )
    return kps, score, valid


@pytest.mark.parametrize("thr", [False, 0.9])
def test_generate_kpts_single_parity(rng, thr):
    kp_map_t = torch.from_numpy(
        (rng.rand(2, 1, 60, 76) + 0.01).astype(np.float32)
    )
    num_pts = 200
    ref_kps, ref_score, ref_valid = torch_generate_kpts_single(
        kp_map_t, nms_radius=1, num_pts=num_pts, thr=thr, thr_mod="abs"
    )

    kps, score, valid = generate_kpts_single(
        jnp.asarray(kp_map_t.permute(0, 2, 3, 1).numpy()),
        num_pts=num_pts,
        nms_radius=1,
        use_nms=True,
        thr=thr,
        thr_mod="abs",
    )
    n_emit = ref_kps.shape[1]
    assert int(np.asarray(valid).min()) == ref_valid
    np.testing.assert_allclose(
        np.asarray(kps)[:, :n_emit], ref_kps.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(score)[:, :n_emit], ref_score.numpy(), rtol=1e-4, atol=1e-6
    )


def test_generate_kpts_single_counts(rng):
    """Host-side trim rule reproduces the reference's dynamic k."""
    kp_map = jnp.asarray((rng.rand(1, 40, 40, 1) + 0.01).astype(np.float32))
    kps, score, valid = generate_kpts_single(
        kp_map, num_pts=2048, nms_radius=3, use_nms=True
    )
    v = int(np.asarray(valid)[0])
    n_emit = max(min(2048, v), 128)
    assert kps.shape == (1, 2048, 2)
    # everything beyond the valid slots is a masked zero-score entry
    sel = np.asarray(score)[0, :, 0]
    assert (sel[:v] > 0).all()


def test_regular_grid_single_runs(rng):
    kp_map = jnp.asarray((rng.rand(1, 64, 64, 1) + 0.01).astype(np.float32))
    kps, score, valid = generate_kpts_regular_grid_single(
        kp_map, grid_size=8, num_pts=32, use_nms=True, nms_radius=1
    )
    assert kps.shape == (1, 32, 2)
    assert score.shape == (1, 32, 1)
    assert (np.abs(np.asarray(kps)) <= 1).all()


def test_two_image_detectors_jit(rng):
    """generate_kpts / generate_kpts_regular_grid must compile under jit
    (the stable/gumbel choice is a lax.cond on a traced Bernoulli draw)."""
    import jax

    outputs = {
        "preds1": {
            "local_point": jnp.asarray(
                (rng.rand(1, 48, 48, 1) + 0.01).astype(np.float32)
            )
        },
        "preds2": {
            "local_point": jnp.asarray(
                (rng.rand(1, 48, 48, 1) + 0.01).astype(np.float32)
            )
        },
    }
    from posfeat_tpu.ops.detect import generate_kpts, generate_kpts_regular_grid

    f1 = jax.jit(
        lambda o, k: generate_kpts(o, k, nms_radius=1, num_pts=64, epoch=0)
    )
    kps1, kps2, s1, s2 = f1(outputs, jax.random.PRNGKey(0))
    assert kps1.shape == (1, 64, 2) and s2.shape == (1, 64, 1)
    assert np.isfinite(np.asarray(kps1)).all()

    # stable_prob=0 forces the gumbel branch; must also be finite
    f1g = jax.jit(
        lambda o, k: generate_kpts(
            o, k, nms_radius=1, num_pts=64, epoch=0, stable_prob=0.0
        )
    )
    kg, *_ = f1g(outputs, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(kg)).all()

    f2 = jax.jit(
        lambda o, k: generate_kpts_regular_grid(
            o, k, grid_size=8, num_pts=32, nms_radius=1
        )
    )
    g1, g2, gs1, gs2 = f2(outputs, jax.random.PRNGKey(2))
    assert g1.shape == (1, 32, 2)
    assert np.isfinite(np.asarray(g1)).all()


def _detect_px(kp_map, n, refine):
    """Run the detector and return pixel-space keypoints sorted by score."""
    kps, score, valid = generate_kpts_single(
        kp_map, num_pts=n, nms_radius=2, use_nms=True, refine=refine
    )
    _, H, W, _ = kp_map.shape
    k = np.asarray(kps)[0]
    return np.stack(
        [(k[:, 0] + 1) * (W - 1) / 2, (k[:, 1] + 1) * (H - 1) / 2], axis=-1
    )


def test_quad_refine_recovers_subpixel_peaks():
    """refine='quad' (Taylor peak fit) localizes known sub-pixel Gaussian
    peaks markedly better than the reference 3x3 center-of-mass ('avg3'),
    which biases toward the discrete argmax on a peaky map."""
    H, W = 48, 64
    peaks = [(20.3, 31.7), (10.6, 12.2), (35.2, 50.8), (40.45, 8.75)]
    yy, xx = np.mgrid[0:H, 0:W]
    m = np.zeros((H, W), np.float32)
    for py, px in peaks:
        m += np.exp(-((yy - py) ** 2 + (xx - px) ** 2) / (2 * 1.5**2))
    kp_map = jnp.asarray(m[None, :, :, None] + 0.01)

    errs = {}
    for refine in ("avg3", "quad"):
        det = _detect_px(kp_map, len(peaks), refine)
        e = []
        for py, px in peaks:
            d = np.hypot(det[:, 0] - px, det[:, 1] - py)
            e.append(d.min())
        errs[refine] = float(np.mean(e))
    assert errs["quad"] < 0.12, errs
    assert errs["quad"] < 0.5 * errs["avg3"], errs


def test_quad_refine_degenerate_maps_finite():
    """Flat and single-spike maps must not produce NaN offsets; the
    ill-conditioned-Hessian guard zeroes the offset instead."""
    for m in (
        np.ones((1, 32, 32, 1), np.float32),
        np.zeros((1, 32, 32, 1), np.float32),
    ):
        mm = m.copy()
        mm[0, 16, 16, 0] = 5.0
        kps, score, valid = generate_kpts_single(
            jnp.asarray(mm), num_pts=16, nms_radius=1, use_nms=True,
            refine="quad",
        )
        assert np.isfinite(np.asarray(kps)).all()
        assert np.isfinite(np.asarray(score)).all()


def test_quad_refine_contract_matches_avg3():
    """Same slate shapes, identical selection order, identical 3x3-max
    scores and valid counts — only the sub-pixel coordinates differ, and
    by at most one pixel in each axis."""
    r = np.random.RandomState(3)
    kp_map = jnp.asarray((r.rand(2, 60, 76, 1) + 0.01).astype(np.float32))
    kw = dict(num_pts=200, nms_radius=1, use_nms=True)
    kps_a, score_a, valid_a = generate_kpts_single(kp_map, refine="avg3", **kw)
    kps_q, score_q, valid_q = generate_kpts_single(kp_map, refine="quad", **kw)
    assert kps_q.shape == kps_a.shape and score_q.shape == score_a.shape
    np.testing.assert_array_equal(np.asarray(valid_q), np.asarray(valid_a))
    n = int(np.asarray(valid_a).min())
    np.testing.assert_allclose(
        np.asarray(score_q)[:, :n], np.asarray(score_a)[:, :n],
        rtol=1e-5, atol=1e-6,
    )
    # both refinements stay within the same 3x3 window of the argmax
    d = np.abs(np.asarray(kps_q)[:, :n] - np.asarray(kps_a)[:, :n])
    assert d[..., 0].max() * (76 - 1) / 2 <= 1.0 + 1e-5
    assert d[..., 1].max() * (60 - 1) / 2 <= 1.0 + 1e-5


def test_approx_score_from_topk(rng, monkeypatch):
    """POSFEAT_TOPK=approx reuses the top-k values as output scores
    (skipping the dense max_pool + per-point gather). Packing masks 4
    score ulps, so near-ties may swap order — comparison is by position
    set. Scores must equal the winner's own map value (off the
    interior-edge ring) and never exceed the reference max-pooled score
    (the 1-px frame-border peek the fast path gives up)."""
    kp_map_t = torch.from_numpy(
        (rng.rand(2, 1, 60, 76) + 0.01).astype(np.float32)
    )
    kp_map = jnp.asarray(kp_map_t.permute(0, 2, 3, 1).numpy())
    monkeypatch.setenv("POSFEAT_TOPK", "approx")
    kps, score, valid = generate_kpts_single(
        kp_map, num_pts=200, nms_radius=1, use_nms=True
    )
    ref_kps, _, ref_valid = torch_generate_kpts_single(
        kp_map_t, nms_radius=1, num_pts=200
    )
    n = ref_kps.shape[1]
    assert int(np.asarray(valid).min()) == ref_valid
    B, H, W = kp_map.shape[:3]
    h2, w2 = H - 2, W - 2
    m = np.asarray(kp_map)[..., 0]
    mp = F.max_pool2d(kp_map_t, 3, stride=1, padding=0).numpy()[:, 0]
    # the exact integer winner pixels, straight from the reference
    # selection rule (top-k of the NMS-masked interior)
    interior_t = kp_map_t[:, :, 1:-1, 1:-1]
    masked_t = torch_nms(interior_t, 1).float() * interior_t
    _, idx_t = masked_t.reshape(B, -1).topk(n)
    wy = (idx_t // w2 + 1).numpy()
    wx = (idx_t % w2 + 1).numpy()

    def to_px(xy):
        return np.stack(
            [(xy[..., 0] + 1) / 2 * (W - 1), (xy[..., 1] + 1) / 2 * (H - 1)],
            axis=-1,
        )

    got = np.asarray(score)[:, :n, 0]
    pts = to_px(np.asarray(kps)[:, :n])
    refined_ref = to_px(ref_kps.numpy())
    for b in range(2):
        # refined positions agree with the exact reference refinement
        sa = np.lexsort((pts[b][:, 1], pts[b][:, 0]))
        sb = np.lexsort((refined_ref[b][:, 1], refined_ref[b][:, 0]))
        np.testing.assert_allclose(
            pts[b][sa], refined_ref[b][sb], rtol=1e-4, atol=1e-3
        )
        # match each refined point to its winner (NMS keeps winners
        # >=2 px apart; the 3x3 refinement moves a point <1 px)
        winners = np.stack([wx[b], wy[b]], axis=-1).astype(np.float32)
        d = np.abs(pts[b][:, None, :] - winners[None, :, :]).max(-1)
        j = d.argmin(1)
        assert (d[np.arange(len(j)), j] < 1.0).all()
        xs, ys = wx[b][j], wy[b][j]
        own = m[b, ys, xs]
        # reported score is the winner's own (packed-LSB-stripped) value
        np.testing.assert_allclose(got[b], own, rtol=2e-5, atol=1e-6)
        # never above the reference max-pooled score; equal off-ring
        refmax = mp[b, ys - 1, xs - 1]
        assert (got[b] <= refmax + 1e-6).all()
        interior = (ys > 1) & (ys < H - 2) & (xs > 1) & (xs < W - 2)
        assert interior.sum() > 150
        np.testing.assert_allclose(
            got[b][interior], refmax[interior], rtol=2e-5, atol=1e-6
        )


def test_quad5_refine_contract():
    """refine='quad5' (5x5 least-squares quadratic fit): recovers known
    sub-pixel peaks far better than avg3, stays finite on degenerate
    maps, and matches quad/avg3's output contract."""
    H, W = 48, 64
    peaks = [(20.3, 31.7), (10.6, 12.2), (35.2, 50.8), (40.45, 8.75)]
    yy, xx = np.mgrid[0:H, 0:W]
    m = np.zeros((H, W), np.float32)
    for py, px in peaks:
        m += np.exp(-((yy - py) ** 2 + (xx - px) ** 2) / (2 * 1.5**2))
    kp_map = jnp.asarray(m[None, :, :, None] + 0.01)
    errs = {}
    for refine in ("avg3", "quad5"):
        det = _detect_px(kp_map, len(peaks), refine)
        e = [min(np.hypot(det[:, 0] - px, det[:, 1] - py)) for py, px in peaks]
        errs[refine] = float(np.mean(e))
    assert errs["quad5"] < 0.12, errs
    assert errs["quad5"] < 0.5 * errs["avg3"], errs
    # degenerate surfaces: flat, linear ramp -> finite, inside the image
    for mm in (np.ones((H, W), np.float32), (xx + 2.0 * yy).astype(np.float32)):
        kps, score, valid = generate_kpts_single(
            jnp.asarray(mm[None, :, :, None]), num_pts=16, nms_radius=1,
            use_nms=True, refine="quad5",
        )
        assert np.isfinite(np.asarray(kps)).all()
        assert (np.abs(np.asarray(kps)) <= 1.0 + 1e-6).all()


def test_soft_refine_paths():
    """refine='soft'/'soft5' (soft-argmax eval estimator matching the
    DiskLoss loc term's statistic) return valid slates and move
    coordinates toward score peaks. Measured on the r5 loc10 checkpoint
    they trail the quad5 least-squares fit at matched budget
    (0.8305/0.817 vs 0.8370) — kept as opt-in estimators."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from posfeat_tpu.ops.detect import generate_kpts_single

    s = np.zeros((1, 24, 32, 1), np.float32)
    s[0, 10, 12, 0] = 3.0
    s[0, 10, 13, 0] = 2.0  # true peak slightly right of the argmax
    kp = jnp.asarray(s) + 0.01
    for rf in ("soft", "soft5"):
        kps, score, valid = generate_kpts_single(
            kp, num_pts=8, nms_radius=1, use_nms=True, thr=False,
            refine=rf, refine_temperature=2.0,
        )
        assert kps.shape == (1, 8, 2)
        x_px = (float(kps[0, 0, 0]) + 1) / 2 * (32 - 1)
        y_px = (float(kps[0, 0, 1]) + 1) / 2 * (24 - 1)
        assert 12.0 < x_px < 13.0, x_px  # pulled toward the neighbor
        assert abs(y_px - 10.0) < 0.5, y_px
