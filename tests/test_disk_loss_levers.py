"""Training-side sub-pixel localization levers in DiskLoss (VERDICT r4
item 1): reward at quad-refined coordinates and the differentiable
soft-argmax localization penalty. Both must be exact no-ops when off
(reference parity, kploss.py:132-197) and well-behaved when on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posfeat_tpu.losses.disk_loss import DiskLoss, _gather_at_pixels
from posfeat_tpu.ops.detect import (
    _quad_refine_grids,
    quad_refine_offsets,
    softargmax3_offsets,
)


def _disk_config(**extra):
    cfg = {
        "grid_size": 8,
        "loss_distance": "cos",
        "temperature_base": 60,
        "temperature_max": 60,
        "epipolar_reward": "constant_reward",
        "reward_config": {"reward_thr": 2, "rescale_thr": False},
        "cor_detach": True,
        "good_reward": 1,
        "bad_reward": -0.25,
        "kp_penalty": -0.001,
        "match_grad": False,
        "use_pallas": False,
    }
    cfg.update(extra)
    return cfg


def _toy_batch(key, B=2, H=32, W=48, C=16):
    ks = jax.random.split(key, 6)
    kp1 = jax.nn.softplus(jax.random.normal(ks[0], (B, H, W, 1)))
    kp2 = jax.nn.softplus(jax.random.normal(ks[1], (B, H, W, 1)))
    f1 = jax.random.normal(ks[2], (B, H // 4, W // 4, C))
    f2 = jax.random.normal(ks[3], (B, H // 4, W // 4, C))
    F = jax.random.normal(ks[4], (B, 3, 3))
    inputs = {"F1": F, "F2": F.transpose(0, 2, 1)}
    outputs = {
        "preds1": {"local_point": kp1, "local_map": f1},
        "preds2": {"local_point": kp2, "local_map": f2},
        "epoch": 1,
    }
    return inputs, outputs, ks[5]


def test_levers_off_is_reference_path():
    """Default config (levers absent) gives bit-identical loss to a
    config that names them with their off values."""
    inputs, outputs, key = _toy_batch(jax.random.PRNGKey(0))
    base = DiskLoss(_disk_config())
    named = DiskLoss(
        _disk_config(reward_at_refined=False, loc_weight=0.0)
    )
    l0, c0 = base(inputs, outputs, None, key)
    l1, c1 = named(inputs, outputs, None, key)
    assert float(l0) == float(l1)
    assert "loc_pen" not in c0 and "loc_pen" not in c1


def test_reward_at_refined_changes_reward_only():
    inputs, outputs, key = _toy_batch(jax.random.PRNGKey(1))
    on = DiskLoss(_disk_config(reward_at_refined=True))
    off = DiskLoss(_disk_config())
    assert not on._use_pallas()
    lon, con = on(inputs, outputs, None, key)
    loff, coff = off(inputs, outputs, None, key)
    # same sampler stream (same key), same kp stats; loss stays finite
    assert float(con["n_kps"]) == float(coff["n_kps"])
    assert jnp.isfinite(lon) and jnp.isfinite(loff)
    # the refinement itself must move a nontrivial share of sampled
    # coordinates (a binary reward only changes when a pair crosses the
    # threshold, so assert on the mechanism, not the loss value):
    # re-derive the refined coords the loss used
    kp1 = outputs["preds1"]["local_point"]
    k1, _ = jax.random.split(key)
    coord1, _, _ = on.point_sample(kp1, k1)
    coord1 = coord1.reshape(kp1.shape[0], -1, 2)
    offs = _gather_at_pixels(quad_refine_offsets(kp1), coord1)
    moved = float((jnp.abs(offs).max(-1) > 1e-4).mean())
    assert moved > 0.1, f"quad refinement moved only {moved:.0%} of samples"


def test_loc_weight_term_and_gradient():
    inputs, outputs, key = _toy_batch(jax.random.PRNGKey(2))
    loss_fn = DiskLoss(_disk_config(loc_weight=1.0, loc_temperature=10.0))
    assert not loss_fn._use_pallas()

    def f(kp1):
        out = dict(outputs)
        out["preds1"] = dict(outputs["preds1"], local_point=kp1)
        loss, comps = loss_fn(inputs, out, None, key)
        return loss, comps

    (loss, comps), grad = jax.value_and_grad(f, has_aux=True)(
        outputs["preds1"]["local_point"]
    )
    assert jnp.isfinite(loss)
    assert float(comps["loc_pen"]) >= 0.0
    assert jnp.isfinite(grad).all()
    # the loc term must contribute score-map gradient beyond REINFORCE:
    # compare against the lever-off gradient
    def f0(kp1):
        out = dict(outputs)
        out["preds1"] = dict(outputs["preds1"], local_point=kp1)
        return DiskLoss(_disk_config())(inputs, out, None, key)[0]

    g0 = jax.grad(f0)(outputs["preds1"]["local_point"])
    assert float(jnp.abs(grad - g0).max()) > 0.0


def test_quad_refine_offsets_matches_refine_grids():
    """quad_refine_offsets is the factored core of _quad_refine_grids:
    interior normalized coords must agree exactly."""
    key = jax.random.PRNGKey(3)
    kp = jax.nn.softplus(jax.random.normal(key, (2, 24, 30, 1)))
    B, H, W, _ = kp.shape
    grids = _quad_refine_grids(kp)
    off = quad_refine_offsets(kp)[:, 1:-1, 1:-1, :]
    jj = jnp.arange(1, W - 1, dtype=jnp.float32)
    ii = jnp.arange(1, H - 1, dtype=jnp.float32)
    kx = -1.0 + 2.0 * (jj[None, None, :] + off[..., 0]) / (W - 1)
    ky = -1.0 + 2.0 * (ii[None, :, None] + off[..., 1]) / (H - 1)
    np.testing.assert_allclose(grids[..., 0], kx, atol=1e-6)
    np.testing.assert_allclose(grids[..., 1], ky, atol=1e-6)
    # border ring carries no offset
    assert float(jnp.abs(quad_refine_offsets(kp)[:, 0]).max()) == 0.0


def test_softargmax3_offsets_point_toward_peak():
    """A score map with a peak one pixel right of (y, x) pulls the soft
    offset at (y, x) toward +x; offsets are bounded by ±1 and sharpen
    with temperature."""
    s = np.zeros((1, 9, 9, 1), np.float32)
    s[0, 4, 5, 0] = 3.0  # peak right of center
    s = jnp.asarray(s)
    off_soft = softargmax3_offsets(s, temperature=2.0)
    off_sharp = softargmax3_offsets(s, temperature=20.0)
    assert float(off_soft[0, 4, 4, 0]) > 0.1
    assert float(off_sharp[0, 4, 4, 0]) > float(off_soft[0, 4, 4, 0])
    assert float(jnp.abs(off_sharp).max()) <= 1.0
    # differentiable w.r.t. scores
    g = jax.grad(lambda m: softargmax3_offsets(m, 5.0).sum())(s)
    assert jnp.isfinite(g).all() and float(jnp.abs(g).max()) > 0.0


def test_gather_at_pixels_roundtrip():
    key = jax.random.PRNGKey(4)
    dense = jax.random.normal(key, (2, 8, 10, 2))
    coord = jnp.asarray(
        [[[3.0, 2.0], [9.0, 7.0]], [[0.0, 0.0], [5.0, 4.0]]]
    )  # (x, y)
    got = _gather_at_pixels(dense, coord)
    for b in range(2):
        for k in range(2):
            x, y = int(coord[b, k, 0]), int(coord[b, k, 1])
            np.testing.assert_allclose(got[b, k], dense[b, y, x])


@pytest.mark.parametrize("lever", ["reward_at_refined", "loc_weight"])
def test_levers_disable_pallas_eligibility(lever):
    val = True if lever == "reward_at_refined" else 0.5
    cfg = _disk_config(use_pallas="auto", **{lever: val})
    assert DiskLoss(cfg)._use_pallas() is False


def test_loc_window_5_runs_and_differs():
    """loc_window=5 widens the soft-argmax support; the loss must stay
    finite and differ from the 3x3 default (measured negative at the
    matched budget — kept as a config lever with recorded evidence)."""
    inputs, outputs, key = _toy_batch(jax.random.PRNGKey(5))
    l3, c3 = DiskLoss(_disk_config(loc_weight=10.0))(inputs, outputs, None, key)
    l5, c5 = DiskLoss(_disk_config(loc_weight=10.0, loc_window=5))(
        inputs, outputs, None, key
    )
    assert jnp.isfinite(l3) and jnp.isfinite(l5)
    assert float(c3["loc_pen"]) != float(c5["loc_pen"])
    # a peak 2 px away is visible to w=5 but not w=3
    s = np.zeros((1, 9, 9, 1), np.float32)
    s[0, 4, 6, 0] = 3.0
    o3 = softargmax3_offsets(jnp.asarray(s), 10.0, window=3)
    o5 = softargmax3_offsets(jnp.asarray(s), 10.0, window=5)
    assert abs(float(o3[0, 4, 4, 0])) < 0.2
    assert float(o5[0, 4, 4, 0]) > 1.0
