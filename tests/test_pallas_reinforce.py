"""The streamed Pallas REINFORCE reduction (interpret mode) matches the
naive XLA formulation, at the op level and through DiskLoss (values and
gradients)."""

import numpy as np
import jax
import jax.numpy as jnp

from posfeat_tpu.losses.disk_loss import DiskLoss
from posfeat_tpu.ops.coords import homogenize
from posfeat_tpu.ops.grid_sample import l2_normalize
from posfeat_tpu.ops.pallas.reinforce import reinforce_reduction
from tests.test_ops_parity import rand_fundamental


def _naive(f1, f2, line1, c2h, line2, c1h, a1, a2, T, thr, gr, br):
    aff = T * jnp.einsum("bmd,bnd->bmn", f1, f2,
                         precision=jax.lax.Precision.HIGHEST) - T
    lp_i = jax.nn.log_softmax(aff, axis=-1)
    lp_t = jax.nn.log_softmax(aff.transpose(0, 2, 1), axis=-1).transpose(0, 2, 1)
    p = jnp.exp(lp_i) * jnp.exp(lp_t)
    d1 = jnp.abs(jnp.einsum("bmk,bnk->bmn", line1, c2h))
    d2 = jnp.abs(jnp.einsum("bmk,bnk->bmn", c1h, line2))
    good = (d1 < thr) & (d2 < thr)
    reward = jnp.where(good, gr, br)
    w = a1[:, :, None] * a2[:, None, :] * reward * p
    s0 = jnp.sum(w * (lp_i + lp_t), axis=(1, 2))
    return (
        s0,
        w.sum(2),
        w.sum(1),
        p.sum(2),
        p.sum(1),
        p.reshape(p.shape[0], -1).max(-1),
        p.sum((1, 2)),
    )


def _random_problem(rng, B=2, m=37, n=29, D=16):
    f1 = l2_normalize(jnp.asarray(rng.randn(B, m, D).astype(np.float32)), -1)
    f2 = l2_normalize(jnp.asarray(rng.randn(B, n, D).astype(np.float32)), -1)
    c1 = jnp.asarray(rng.rand(B, m, 2).astype(np.float32) * 100)
    c2 = jnp.asarray(rng.rand(B, n, 2).astype(np.float32) * 100)
    F1 = jnp.asarray(rand_fundamental(rng, B))
    F2 = jnp.asarray(rand_fundamental(rng, B))

    def lines_of(fmat, coords):
        line = jnp.matmul(fmat, homogenize(coords).transpose(0, 2, 1))
        line = line / jnp.clip(
            jnp.linalg.norm(line[:, :2, :], axis=1, keepdims=True), 1e-8
        )
        return line.transpose(0, 2, 1)

    line1, line2 = lines_of(F1, c1), lines_of(F2, c2)
    a1 = jnp.asarray((rng.rand(B, m) > 0.4).astype(np.float32))
    a2 = jnp.asarray((rng.rand(B, n) > 0.4).astype(np.float32))
    return f1, f2, line1, homogenize(c2), line2, homogenize(c1), a1, a2


def test_reduction_matches_naive(rng):
    args = _random_problem(rng)
    T, thr, gr, br = 10.0, 5.0, 1.0, -0.25

    ref = _naive(*args, T, thr, gr, br)
    out = reinforce_reduction(
        *args, temperature=T, thr=thr, good_reward=gr, bad_reward=br,
        tm=16, interpret=True,
    )
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=2e-4, atol=1e-5)


def _disk_setup(rng, use_pallas):
    cfg = {
        "grid_size": 8,
        "loss_distance": "cos",
        "temperature_base": 10,
        "temperature_max": 10,
        "epipolar_reward": "constant_reward",
        "reward_config": {"reward_thr": 2, "rescale_thr": False},
        "cor_detach": True,
        "good_reward": 1,
        "bad_reward": -0.25,
        "kp_penalty": -0.001,
        "match_grad": False,
        "use_pallas": use_pallas,
    }
    return DiskLoss(cfg)


def test_diskloss_pallas_matches_xla(rng):
    B, H, W, C = 2, 32, 32, 8
    kp1 = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))
    kp2 = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))
    xf1 = jnp.asarray(rng.randn(B, H // 4, W // 4, C).astype(np.float32))
    xf2 = jnp.asarray(rng.randn(B, H // 4, W // 4, C).astype(np.float32))
    F = jnp.asarray(rand_fundamental(rng, B))
    inputs = {"F1": F, "F2": jnp.transpose(F, (0, 2, 1))}

    def outputs_with(kp1_, xf1_):
        return {
            "preds1": {"local_point": kp1_, "local_map": xf1_},
            "preds2": {"local_point": kp2, "local_map": xf2},
            "epoch": 1,
        }

    key = jax.random.PRNGKey(3)

    def loss_fn(kind):
        loss_mod = _disk_setup(rng, kind)

        def f(kp1_):
            l, comps = loss_mod(inputs, outputs_with(kp1_, xf1), None, key=key)
            return l, comps

        return f

    (l_ref, comps_ref), g_ref = jax.value_and_grad(loss_fn(False), has_aux=True)(kp1)
    (l_pal, comps_pal), g_pal = jax.value_and_grad(loss_fn("interpret"), has_aux=True)(kp1)

    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=2e-3, atol=1e-5)
    for k in ("reinforce", "kp_penalty", "cor max", "cor mean", "n_pairs",
              "cor summin", "cor summax", "cor minmax", "cor minmean"):
        np.testing.assert_allclose(
            float(comps_pal[k]), float(comps_ref[k]), rtol=2e-4, atol=1e-6,
            err_msg=k,
        )


def test_reward_thr_annealing(rng):
    """reward_thr_final + reward_anneal_epochs linearly anneal the
    epipolar reward threshold per (static) epoch, identically in the
    XLA and Pallas formulations; the effective value is reported in the
    loss components."""
    B, H, W, C = 1, 16, 16, 8
    kp1 = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))
    kp2 = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))
    xf1 = jnp.asarray(rng.randn(B, H // 4, W // 4, C).astype(np.float32))
    xf2 = jnp.asarray(rng.randn(B, H // 4, W // 4, C).astype(np.float32))
    F = jnp.asarray(rand_fundamental(rng, B))
    inputs = {"F1": F, "F2": jnp.transpose(F, (0, 2, 1))}
    key = jax.random.PRNGKey(0)

    def run(kind, epoch):
        loss_mod = _disk_setup(rng, kind)
        loss_mod.config["reward_config"] = {
            "reward_thr": 2, "rescale_thr": False,
            "reward_thr_final": 0.5, "reward_anneal_epochs": 3,
        }
        outputs = {
            "preds1": {"local_point": kp1, "local_map": xf1},
            "preds2": {"local_point": kp2, "local_map": xf2},
            "epoch": epoch,
        }
        return loss_mod(inputs, outputs, None, key=key)

    # epoch 1 -> base, epoch 2/3 interpolate, epoch >= 4 -> final
    for epoch, want in [(1, 2.0), (2, 1.5), (3, 1.0), (4, 0.5), (9, 0.5)]:
        _, comps = run(False, epoch)
        np.testing.assert_allclose(float(comps["reward_thr"]), want)

    # Pallas path consumes the same annealed threshold and agrees on loss
    for epoch in (1, 4):
        l_ref, c_ref = run(False, epoch)
        l_pal, c_pal = run("interpret", epoch)
        np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(
            float(c_pal["reward_thr"]), float(c_ref["reward_thr"])
        )

    # without the anneal keys the threshold stays fixed (back-compat)
    loss_mod = _disk_setup(rng, False)
    outputs = {
        "preds1": {"local_point": kp1, "local_map": xf1},
        "preds2": {"local_point": kp2, "local_map": xf2},
        "epoch": 7,
    }
    _, comps = loss_mod(inputs, outputs, None, key=key)
    np.testing.assert_allclose(float(comps["reward_thr"]), 2.0)


def test_diskloss_pallas_shard_map_multidevice(rng):
    """VERDICT r4 item 4: the production stage-2 fast path (streamed
    Pallas reduction) under a multi-device mesh. shard_map over the data
    axis — each device runs the Mosaic kernel (interpret) on its local
    shard, gradients pmean over the mesh — must match the XLA DiskLoss
    formulation on the same shards, loss and gradient."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    devices = jax.devices()
    if len(devices) < 2:
        import pytest

        pytest.skip("needs a multi-device mesh")
    n_dev = min(len(devices), 4)
    mesh = Mesh(np.array(devices[:n_dev]), ("data",))
    B, H, W, C = 2 * n_dev, 32, 32, 8
    kp1 = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))
    kp2 = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))
    xf1 = jnp.asarray(rng.randn(B, H // 4, W // 4, C).astype(np.float32))
    xf2 = jnp.asarray(rng.randn(B, H // 4, W // 4, C).astype(np.float32))
    F = jnp.asarray(rand_fundamental(rng, B))
    batch_sh = NamedSharding(mesh, P("data"))
    args = jax.device_put((kp1, kp2, xf1, xf2, F), batch_sh)
    key = jax.random.PRNGKey(7)

    def make_step(kind):
        loss_mod = _disk_setup(rng, kind)

        def local(kp1_, kp2_, xf1_, xf2_, F_):
            inputs = {"F1": F_, "F2": jnp.transpose(F_, (0, 2, 1))}
            outputs = {
                "preds1": {"local_point": kp1_, "local_map": xf1_},
                "preds2": {"local_point": kp2_, "local_map": xf2_},
                "epoch": 1,
            }

            def f(kp):
                out = dict(outputs)
                out["preds1"] = dict(outputs["preds1"], local_point=kp)
                return loss_mod(inputs, out, None, key=key)[0]

            loss, grad = jax.value_and_grad(f)(kp1_)
            return jax.lax.pmean(loss, "data"), jax.lax.pmean(
                jnp.abs(grad).sum(), "data"
            )

        return jax.jit(
            shard_map(
                local,
                mesh=mesh,
                in_specs=(P("data"),) * 5,
                out_specs=(P(), P()),
                check_vma=False,
            )
        )

    l_pal, g_pal = make_step("interpret")(*args)
    l_ref, g_ref = make_step(False)(*args)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(g_pal), float(g_ref), rtol=2e-3, atol=1e-5)
