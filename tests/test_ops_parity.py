"""Golden parity of the op library vs torch-CPU reference semantics.

Each test re-implements the reference's torch formulation inline (we may
not import /root/reference) and checks our NHWC JAX ops against it.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from posfeat_tpu.ops import (
    homogenize,
    normalize_coords,
    denormalize_coords,
    gen_grid,
    grid_sample,
    sample_feat_by_coord,
    compute_prob,
    nms,
    soft_nms,
    ssim_prior,
    d2_prior,
    asl_peak_prior,
    epipolar_cost,
    get_endpoints,
    unfold,
)
from posfeat_tpu.ops.epipolar import epipolar_pairwise_dist
from posfeat_tpu.ops.correlation import ot_sinkhorn_log, dual_softmax


def t2j_nchw(x):
    """torch NCHW tensor -> jnp NHWC array."""
    return jnp.asarray(x.permute(0, 2, 3, 1).numpy())


def j2t_nhwc(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)


# ---------------------------------------------------------------- coords


def test_normalize_denormalize_roundtrip(rng):
    coord = jnp.asarray(rng.rand(2, 100, 2) * 400)
    h, w = 480, 640
    n = normalize_coords(coord, h, w)
    back = denormalize_coords(n, h, w)
    np.testing.assert_allclose(back, coord, rtol=1e-5, atol=1e-4)
    # corners: pixel 0 -> -1, pixel size-1 -> +1
    c = jnp.asarray([[[0.0, 0.0], [w - 1.0, h - 1.0]]])
    np.testing.assert_allclose(
        normalize_coords(c, h, w), [[[-1, -1], [1, 1]]], atol=1e-6
    )


def test_gen_grid_matches_torch(rng):
    # reference gen_grid (putils:84-87)
    def torch_gen_grid(h_min, h_max, w_min, w_max, len_h, len_w):
        x, y = torch.meshgrid(
            [torch.linspace(w_min, w_max, len_w), torch.linspace(h_min, h_max, len_h)],
            indexing="ij",
        )
        return torch.stack((x, y), -1).transpose(0, 1).reshape(-1, 2).float()

    ours = gen_grid(-1, 1, -1, 1, 5, 7)
    ref = torch_gen_grid(-1, 1, -1, 1, 5, 7)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)

    ours = gen_grid(0, 9, 0, 19, 10, 20)
    ref = torch_gen_grid(0, 9, 0, 19, 10, 20)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def test_homogenize():
    c = jnp.asarray(np.random.rand(2, 5, 2))
    h = homogenize(c)
    assert h.shape == (2, 5, 3)
    np.testing.assert_allclose(h[..., 2], 1.0)


# ------------------------------------------------------------ grid_sample


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_matches_torch(rng, padding):
    img_t = torch.from_numpy(rng.rand(2, 8, 13, 17).astype(np.float32))
    # grid values straddling the border to exercise padding behavior
    grid_np = (rng.rand(2, 50, 2).astype(np.float32) * 2.6 - 1.3)
    grid_t = torch.from_numpy(grid_np).unsqueeze(2)  # [B, N, 1, 2]
    ref = F.grid_sample(
        img_t, grid_t, padding_mode=padding, align_corners=False
    ).squeeze(-1)  # [B, C, N]
    ours = grid_sample(t2j_nchw(img_t), jnp.asarray(grid_np), padding_mode=padding)
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 1).numpy(), rtol=1e-5, atol=1e-5
    )
    if padding == "zeros":
        # pair-gather / quad-gather formulations: identical values incl.
        # border straddles
        for impl in ("pair", "quad"):
            got = grid_sample(
                t2j_nchw(img_t), jnp.asarray(grid_np),
                padding_mode=padding, impl=impl,
            )
            np.testing.assert_allclose(
                np.asarray(got), ref.permute(0, 2, 1).numpy(),
                rtol=1e-5, atol=1e-5,
            )


def test_sample_feat_by_coord_norm(rng):
    img_t = torch.from_numpy(rng.rand(1, 16, 24, 32).astype(np.float32))
    grid_np = (rng.rand(1, 40, 2).astype(np.float32) * 1.8 - 0.9)
    feat_ref = F.grid_sample(
        img_t, torch.from_numpy(grid_np).unsqueeze(2),
        padding_mode="zeros", align_corners=False,
    ).squeeze(-1)
    feat_ref = F.normalize(feat_ref, p=2, dim=1).transpose(1, 2)
    ours = sample_feat_by_coord(t2j_nchw(img_t), jnp.asarray(grid_np), norm=True)
    np.testing.assert_allclose(np.asarray(ours), feat_ref.numpy(), rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------ correlation


def test_compute_prob_cos_euc(rng):
    f1 = torch.from_numpy(rng.rand(2, 12, 16).astype(np.float32))
    f2 = torch.from_numpy(rng.rand(2, 9, 16).astype(np.float32))
    ref_cos = F.softmax(f1.bmm(f2.transpose(1, 2)), dim=-1)
    ours_cos = compute_prob(jnp.asarray(f1.numpy()), jnp.asarray(f2.numpy()))
    np.testing.assert_allclose(np.asarray(ours_cos), ref_cos.numpy(), rtol=1e-5, atol=1e-6)

    dist = (
        torch.sum(f1**2, dim=-1, keepdim=True)
        + torch.sum(f2**2, dim=-1, keepdim=True).transpose(1, 2)
        - 2 * f1.bmm(f2.transpose(1, 2))
    )
    ref_euc = F.softmax(-dist, dim=-1)
    ours_euc = compute_prob(
        jnp.asarray(f1.numpy()), jnp.asarray(f2.numpy()), loss_distance="euc"
    )
    np.testing.assert_allclose(np.asarray(ours_euc), ref_euc.numpy(), rtol=1e-5, atol=1e-6)


def test_sinkhorn_log_matches_torch(rng):
    costs_np = rng.rand(2, 7, 9).astype(np.float32)
    costs = torch.from_numpy(costs_np)
    b, m, n = costs.shape
    norm = -torch.log(torch.tensor(float(m + n)))
    P = -30.0 * costs
    log_m = norm * torch.ones(b, m, 1)
    log_n = norm * torch.ones(b, 1, n)
    u, v = torch.zeros_like(log_m), torch.zeros_like(log_n)
    for _ in range(20):
        u = log_m - torch.logsumexp(P + v, dim=2, keepdim=True)
        v = log_n - torch.logsumexp(P + u, dim=1, keepdim=True)
    ref = (P + u + v - norm).exp()

    ours, _ = ot_sinkhorn_log(jnp.asarray(costs_np), iters=20, temperature=30.0)
    # 20 chained logsumexp/exp iterations amplify f32 rounding; 1e-3 rel is
    # the expected cross-library agreement here.
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-3, atol=1e-6)


def test_dual_softmax(rng):
    costs = rng.rand(2, 6, 8).astype(np.float32)
    ref = F.softmax(torch.from_numpy(-15.0 * costs), dim=2)
    ref = (ref * ref).numpy()
    ours, _ = dual_softmax(jnp.asarray(costs))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-7)


# -------------------------------------------------------------------- nms


def torch_nms(score, patch_radius):
    """Reference nms (putils:449-464)."""
    patch_size = 2 * patch_radius + 1
    score_pad = F.pad(
        score.detach(), (patch_radius,) * 4, mode="reflect"
    )
    _, idx = F.max_pool2d(
        score_pad, patch_size, stride=1, padding=0, return_indices=True
    )
    b, _, h, w = score.shape
    coords = (
        torch.arange((h + 2 * patch_radius) * (w + 2 * patch_radius))
        .reshape(1, 1, h + 2 * patch_radius, w + 2 * patch_radius)
        .repeat(b, 1, 1, 1)
    )
    coords = coords[:, :, patch_radius:-patch_radius, patch_radius:-patch_radius]
    return idx == coords


@pytest.mark.parametrize("radius", [1, 2, 3])
def test_nms_matches_torch(rng, radius):
    score_t = torch.from_numpy(rng.rand(2, 1, 37, 45).astype(np.float32))
    ref = torch_nms(score_t, radius)
    ours = nms(t2j_nchw(score_t), radius)
    np.testing.assert_array_equal(np.asarray(ours)[..., 0], ref.numpy()[:, 0])


def test_nms_tie_breaking(rng):
    # plateaus of equal scores: only one winner per plateau, same as torch
    s = np.zeros((1, 1, 12, 12), np.float32)
    s[0, 0, 3:6, 3:6] = 1.0
    s[0, 0, 8:10, 2:4] = 0.5
    score_t = torch.from_numpy(s)
    ref = torch_nms(score_t, 1)
    ours = nms(t2j_nchw(score_t), 1)
    np.testing.assert_array_equal(np.asarray(ours)[..., 0], ref.numpy()[:, 0])


def test_soft_nms_matches_torch(rng):
    score_t = torch.from_numpy(rng.rand(1, 1, 20, 24).astype(np.float32))
    r = 2
    window = 2 * r + 1
    ref = F.softplus(
        score_t - F.avg_pool2d(F.pad(score_t, [r] * 4, mode="reflect"), window, stride=1)
    )
    ours = soft_nms(t2j_nchw(score_t), r)
    np.testing.assert_allclose(
        np.asarray(ours)[..., 0], ref.numpy()[:, 0], rtol=1e-3, atol=1e-4
    )


# ------------------------------------------------------------------ priors


def torch_ssim(x):
    C1, C2 = 0.01**2, 0.03**2
    x_pad = F.pad(x.abs(), (0, 1, 0, 1), "reflect")
    x_lu, x_rb = x_pad[:, :, :-1, :-1], x_pad[:, :, 1:, 1:]
    x_lu = F.pad(x_lu, (1, 1, 1, 1), "reflect")
    x_rb = F.pad(x_rb, (1, 1, 1, 1), "reflect")
    m_lu, m_rb = F.avg_pool2d(x_lu, 3, 1), F.avg_pool2d(x_rb, 3, 1)
    s_lu = F.avg_pool2d(x_lu**2, 3, 1) - m_lu**2
    s_rb = F.avg_pool2d(x_rb**2, 3, 1) - m_rb**2
    s_lurb = F.avg_pool2d(x_lu * x_rb, 3, 1) - m_lu * m_rb
    n = (2 * m_lu * m_rb + C1) * (2 * s_lurb + C2)
    d = (m_lu**2 + m_rb**2 + C1) * (s_lu + s_rb + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_prior_matches_torch(rng):
    x_t = torch.from_numpy(rng.randn(2, 4, 18, 22).astype(np.float32))
    ref = torch_ssim(x_t)
    ours = ssim_prior(t2j_nchw(x_t))
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def test_d2_prior_matches_torch(rng):
    x_t = torch.from_numpy(rng.randn(2, 6, 14, 16).astype(np.float32))
    b, c, h, w = x_t.shape
    x = F.relu(x_t)
    mx = torch.max(x.reshape(b, -1), dim=1)[0]
    e = torch.exp(x / mx.view(b, 1, 1, 1))
    sum_exp = 9 * F.avg_pool2d(F.pad(e, [1] * 4, mode="constant", value=1.0), 3, stride=1)
    local = e / sum_exp
    depth_max = torch.max(x, dim=1)[0]
    depth_score = x / depth_max.unsqueeze(1)
    ref = torch.max(local * depth_score, dim=1)[0].unsqueeze(1)
    ours = d2_prior(t2j_nchw(x_t))
    np.testing.assert_allclose(
        np.asarray(ours)[..., 0], ref.numpy()[:, 0], rtol=1e-4, atol=1e-5
    )


def test_asl_peak_prior_matches_torch(rng):
    x_t = torch.from_numpy(rng.randn(2, 6, 14, 16).astype(np.float32))
    b = x_t.shape[0]
    mx = torch.max(x_t.reshape(b, -1), dim=1)[0]
    x = x_t / mx.view(b, 1, 1, 1)
    alpha = F.softplus(x - F.avg_pool2d(F.pad(x, [1] * 4, mode="reflect"), 3, stride=1))
    beta = F.softplus(x - x.mean(1, True))
    ref = (alpha * beta).max(1, True)[0]
    ours = asl_peak_prior(t2j_nchw(x_t))
    np.testing.assert_allclose(
        np.asarray(ours)[..., 0], ref.numpy()[:, 0], rtol=1e-3, atol=3e-4
    )


# ---------------------------------------------------------------- epipolar


def rand_fundamental(rng, b=2):
    """Random plausible fundamental matrices from random poses."""
    mats = []
    for _ in range(b):
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        angle = rng.randn(3) * 0.1
        from scipy.spatial.transform import Rotation  # noqa

        R = Rotation.from_rotvec(angle).as_matrix()
        t = rng.randn(3)
        tx = np.array(
            [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
        )
        E = tx @ R
        Fm = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
        Fm = Fm / (Fm[-1, -1] + 1e-10)
        mats.append(Fm)
    return np.stack(mats).astype(np.float32)


def test_epipolar_cost_matches_torch(rng):
    Fm = rand_fundamental(rng)
    c1 = rng.rand(2, 30, 2).astype(np.float32) * 400
    c2 = rng.rand(2, 30, 2).astype(np.float32) * 400

    c1_t, c2_t, F_t = map(torch.from_numpy, (c1, c2, Fm))
    c1h = torch.cat([c1_t, torch.ones_like(c1_t[..., :1])], -1).transpose(1, 2)
    c2h = torch.cat([c2_t, torch.ones_like(c2_t[..., :1])], -1).transpose(1, 2)
    line = F_t.bmm(c1h)
    line = line / torch.clamp(torch.norm(line[:, :2, :], dim=1, keepdim=True), min=1e-8)
    ref = torch.abs(torch.sum(c2h * line, dim=1))

    ours = epipolar_cost(jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(Fm))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_epipolar_pairwise_matches_torch(rng):
    Fm = rand_fundamental(rng)
    c1 = rng.rand(2, 10, 2).astype(np.float32) * 400
    c2 = rng.rand(2, 12, 2).astype(np.float32) * 400
    c1_t, c2_t, F_t = map(torch.from_numpy, (c1, c2, Fm))
    c1h = torch.cat([c1_t, torch.ones_like(c1_t[..., :1])], -1).transpose(1, 2)
    c2h = torch.cat([c2_t, torch.ones_like(c2_t[..., :1])], -1).transpose(1, 2)
    line = F_t.bmm(c1h)
    line = line / torch.clamp(torch.norm(line[:, :2, :], p=2, dim=1, keepdim=True), min=1e-8)
    ref = torch.abs(line.transpose(1, 2) @ c2h)
    ours = epipolar_pairwise_dist(jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(Fm))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_get_endpoints_matches_torch(rng):
    Fm = rand_fundamental(rng)
    coords = rng.rand(2, 25, 2).astype(np.float32) * 400
    h, w = 480, 640

    # torch reference (putils:696-719)
    c_t = torch.from_numpy(coords)
    F_t = torch.from_numpy(Fm)
    coord_h = torch.cat([c_t, torch.ones_like(c_t[..., :1])], -1).transpose(1, 2)
    line = F_t.bmm(coord_h)
    a, b_, c = line[:, 0, :], line[:, 1, :], line[:, 2, :]
    pl = torch.stack([torch.zeros_like(a), -c / b_], -1)
    pr = torch.stack([(w - 1) * torch.ones_like(a), -(a * (w - 1) + c) / b_], -1)
    pu = torch.stack([-(b_ * (h - 1) + c) / a, (h - 1) * torch.ones_like(a)], -1)
    pb = torch.stack([-c / a, torch.zeros_like(a)], -1)
    pts = torch.stack([pl, pr, pu, pb], -1).transpose(2, 3)
    mask = (
        (pts[..., 0] >= 0) & (pts[..., 0] <= w - 1) & (pts[..., 1] >= 0) & (pts[..., 1] <= h - 1)
    )
    valid = mask.sum(-1) == 2
    mask[~valid] = torch.tensor([True, True, False, False])
    sel = pts[mask].reshape(2, 25, 2, 2)
    ctr = torch.tensor([(w - 1) / 2.0, (h - 1) / 2.0])
    ref1 = (sel[:, :, 0, :] - ctr) / ctr
    ref2 = (sel[:, :, 1, :] - ctr) / ctr

    e1, e2, v = get_endpoints(jnp.asarray(coords), jnp.asarray(Fm), h, w)
    np.testing.assert_array_equal(np.asarray(v), valid.numpy())
    np.testing.assert_allclose(np.asarray(e1), ref1.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(e2), ref2.numpy(), rtol=1e-3, atol=1e-3)


# ------------------------------------------------------------------ unfold


def test_unfold_matches_torch(rng):
    x_t = torch.from_numpy(rng.rand(2, 3, 16, 24).astype(np.float32))
    g = 4
    ref = (
        x_t.unfold(2, g, g).unfold(3, g, g).reshape(2, 3, 4, 6, g * g)
    )
    ours = unfold(t2j_nchw(x_t), g)  # [B, hg, wg, C, g*g]
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2, 4), ref.numpy(), atol=1e-6
    )
