"""Stage-2 DISK-style REINFORCE detector loss (reference losses/kploss.py).

Per-cell Categorical pixel proposals + Bernoulli accepts on both score
maps, a dual-Categorical match distribution over the m×n descriptor cost,
and a bidirectional epipolar reward. All boolean-mask reductions are
mask-multiplied sums (static shapes); sampling uses explicit PRNG keys.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.coords import normalize_coords
from ..ops.epipolar import epipolar_pairwise_dist
from ..ops.grid_sample import sample_feat_by_coord
from ..ops.samplers import (
    cell_coords_pixel,
    grid_bernoulli_accept,
    grid_categorical_sample,
)


def _gather_at_pixels(dense: jnp.ndarray, coord: jnp.ndarray) -> jnp.ndarray:
    """Gather a dense [B, H, W, C] map at integer pixel coords [B, k, 2]
    (x, y). The coords come from cell_coords_pixel so they are exact
    integers; gradients flow into `dense` (scatter-add on backward)."""
    B, H, W, C = dense.shape
    xi = coord[..., 0].astype(jnp.int32)
    yi = coord[..., 1].astype(jnp.int32)
    flat = (yi * W + xi)[..., None]  # [B, k, 1]
    return jnp.take_along_axis(
        dense.reshape(B, H * W, C), jnp.broadcast_to(flat, (*flat.shape[:2], C)), axis=1
    )


def _bmm(a, b):
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


class DiskLoss:
    __lossname__ = "DiskLoss"

    def __init__(self, configs: Dict[str, Any]):
        self.config = configs
        self.unfold_size = configs["grid_size"]
        self.t_base = configs["temperature_base"]
        self.t_max = configs["temperature_max"]
        self.reward_name = configs["epipolar_reward"]
        assert self.reward_name in ("constant_reward", "dynamic_reward")
        self.good_reward = configs["good_reward"]
        self.bad_reward = configs["bad_reward"]
        self.kp_penalty = configs["kp_penalty"]
        # Training-side sub-pixel localization levers (VERDICT r4 item 1;
        # the budget-matched band decomposition in PROOFS.md shows the
        # whole learned-vs-SIFT gap is sub-3 px localization while
        # selection is already SIFT-superior). Both default OFF —
        # reference parity (kploss.py:37-48 rewards integer positions).
        #   reward_at_refined: evaluate the epipolar reward at the
        #     quad-refined (stop-grad) sample coordinates, i.e. at the
        #     positions a refine='quad' extraction actually emits.
        #   loc_weight/loc_temperature: differentiable soft-argmax
        #     localization penalty — epipolar distance of each accepted
        #     good pair at its 3×3 soft-peak position, weighted by the
        #     detached match probability.
        self.reward_at_refined = configs.get("reward_at_refined", False)
        self.loc_weight = configs.get("loc_weight", 0.0)
        self.loc_temperature = configs.get("loc_temperature", 20.0)
        self.loc_window = configs.get("loc_window", 3)

    def name(self):
        return self.__lossname__

    # ------------------------------------------------------------ sample

    def point_sample(self, kp_map: jnp.ndarray, key: jax.Array):
        """kp_map [B, H, W, 1] -> (coords px [B, hg, wg, 2], logp, accept)
        (kploss.py:20-48)."""
        k_cat, k_bern = jax.random.split(key)
        proposals, proposal_logp, cells = grid_categorical_sample(
            kp_map, self.unfold_size, k_cat
        )
        accept_mask, accept_logp = grid_bernoulli_accept(cells, proposals, k_bern)
        logp = proposal_logp + accept_logp
        B, H, W, _ = kp_map.shape
        kps = cell_coords_pixel(H, W, self.unfold_size, proposals)
        return kps, logp, accept_mask

    # ------------------------------------------------------------ reward

    def _epipolar_dists(self, inputs, coord1, coord2):
        d1 = epipolar_pairwise_dist(coord1, coord2, inputs["F1"])  # [B, m, n]
        d2t = epipolar_pairwise_dist(coord2, coord1, inputs["F2"])  # [B, n, m]
        return d1, d2t.transpose(0, 2, 1)

    def _thresholds(self, d1, d2, reward_thr, rescale_thr):
        if not rescale_thr:
            one = jnp.ones((), d1.dtype)
            return reward_thr, reward_thr, one, one
        b = d1.shape[0]
        m1 = jax.lax.stop_gradient(d1).reshape(b, -1).mean(1, keepdims=True)
        m2 = jax.lax.stop_gradient(d2).reshape(b, -1).mean(1, keepdims=True)
        dmin = jnp.clip(jnp.minimum(m1, m2), 1e-6, None)
        scale1 = m1 / dmin
        scale2 = m2 / dmin
        thr1 = (reward_thr * scale1).reshape(b, 1, 1)
        thr2 = (reward_thr * scale2).reshape(b, 1, 1)
        return thr1, thr2, scale1, scale2

    def constant_reward(self, inputs, coord1, coord2, reward_thr, rescale_thr):
        d1, d2 = self._epipolar_dists(inputs, coord1, coord2)
        thr1, thr2, scale1, scale2 = self._thresholds(d1, d2, reward_thr, rescale_thr)
        good = (d1 < thr1) & (d2 < thr2)
        reward = self.good_reward * good + self.bad_reward * (~good)
        return jax.lax.stop_gradient(reward), scale1, scale2

    def dynamic_reward(self, inputs, coord1, coord2, reward_thr, rescale_thr):
        d1, d2 = self._epipolar_dists(inputs, coord1, coord2)
        thr1, thr2, scale1, scale2 = self._thresholds(d1, d2, reward_thr, rescale_thr)
        reward = (
            jnp.exp(-d1 / thr1) + jnp.exp(-d2 / thr2) - 2 / jnp.exp(1.0)
        )
        reward = jnp.clip(reward, self.bad_reward, None)
        return jax.lax.stop_gradient(reward), scale1, scale2

    # -------------------------------------------------------------- loss

    def _use_pallas(self):
        """The streamed kernel covers the shipped configuration (detached
        match distribution, constant un-rescaled reward); anything else
        falls back to the XLA formulation."""
        mode = self.config.get("use_pallas", "auto")
        if mode is False:
            return False
        eligible = (
            self.config["cor_detach"]
            and not self.config["match_grad"]
            and self.reward_name == "constant_reward"
            and not self.config["reward_config"].get("rescale_thr", False)
            and not self.reward_at_refined
            and not self.loc_weight
        )
        if mode == "interpret":
            return "interpret" if eligible else False
        return eligible and jax.default_backend() == "tpu"

    def _reward_config(self, epoch) -> Dict[str, Any]:
        """Per-epoch reward config with optional threshold annealing.

        ``reward_thr_final`` + ``reward_anneal_epochs`` linearly anneal
        the epipolar reward threshold from ``reward_thr`` (epoch 1) to
        ``reward_thr_final`` (epoch >= 1 + reward_anneal_epochs). The
        stage-2 sweeps measured a ~1 px optimum for the fixed threshold
        (PROOFS.md: rt1 0.799 vs rt2 0.768 vs rt05 0.551 — 0.5 px
        starves REINFORCE from scratch); the curriculum lets training
        start with the permissive threshold and finish with a tighter
        one than is trainable from scratch. ``epoch`` is static per
        jitted step (trainer._build_step), so this is trace-time math.
        """
        rcfg = dict(self.config["reward_config"])
        thr_final = rcfg.pop("reward_thr_final", None)
        anneal = rcfg.pop("reward_anneal_epochs", 0)
        if thr_final is not None and anneal:
            frac = min(max(epoch - 1, 0) / float(anneal), 1.0)
            base = rcfg["reward_thr"]
            rcfg["reward_thr"] = base + (thr_final - base) * frac
        return rcfg

    def _pallas_loss(self, inputs, feat1, feat2, coord1, coord2,
                     logp1, logp2, accept1, accept2, temperature,
                     reward_thr):
        """Loss via ops/pallas/reinforce.py streaming reduction."""
        from ..ops.pallas.reinforce import reinforce_reduction
        from ..ops.coords import homogenize

        b = feat1.shape[0]
        m = feat1.shape[1]
        n = feat2.shape[1]
        interpret = self._use_pallas() == "interpret"

        def lines_of(fmat, coords):
            line = jnp.matmul(
                fmat, homogenize(coords).transpose(0, 2, 1),
                precision=jax.lax.Precision.HIGHEST,
            )  # [B, 3, k]
            line = line / jnp.clip(
                jnp.linalg.norm(line[:, :2, :], axis=1, keepdims=True), 1e-8
            )
            return line.transpose(0, 2, 1)  # [B, k, 3]

        line1 = lines_of(inputs["F1"], coord1)
        line2 = lines_of(inputs["F2"], coord2)
        c1h = homogenize(coord1)
        c2h = homogenize(coord2)

        s0, roww, colw, p_rowsum, p_colsum, p_max, p_sum = reinforce_reduction(
            feat1, feat2, line1, c2h, line2, c1h,
            accept1.reshape(b, -1), accept2.reshape(b, -1),
            temperature=float(temperature),
            thr=float(reward_thr),
            good_reward=float(self.good_reward),
            bad_reward=float(self.bad_reward),
            interpret=interpret,
        )

        logp1f = logp1.reshape(b, -1)
        logp2f = logp2.reshape(b, -1)
        a1 = accept1.reshape(b, -1)
        a2 = accept2.reshape(b, -1)
        reinforce = (
            jnp.sum(s0) + jnp.sum(logp1f * roww) + jnp.sum(logp2f * colw)
        )
        kp_penalty = self.kp_penalty * (
            jnp.sum(a1 * logp1f) + jnp.sum(a2 * logp2f)
        )
        loss = -reinforce - kp_penalty

        mn = m * n
        one = jnp.ones((), jnp.float32)
        components = {
            "reinforce": jax.lax.stop_gradient(reinforce),
            "kp_penalty": jax.lax.stop_gradient(kp_penalty),
            "scale1": one,
            "scale2": one,
            "cor minmax": p_max.min(),
            "cor minmean": (p_sum / mn).min(),
            "cor max": p_max.max(),
            "cor mean": p_sum.sum() / (b * mn),
            "cor summin": jnp.minimum(p_rowsum.min(), p_colsum.min()),
            "cor summax": jnp.maximum(p_rowsum.max(), p_colsum.max()),
            "n_kps": (a1.sum(-1) + a2.sum(-1)).astype(jnp.float32).mean(),
            "n_pairs": p_sum.mean(),
            "temperature": jnp.asarray(temperature, jnp.float32),
            "reward_thr": jnp.asarray(reward_thr, jnp.float32),
        }
        return loss, components

    def __call__(self, inputs, outputs, processed, key: jax.Array):
        preds1, preds2 = outputs["preds1"], outputs["preds2"]
        kp_map1 = preds1["local_point"]
        kp_map2 = preds2["local_point"]
        xf1, xf2 = preds1["local_map"], preds2["local_map"]
        b = xf1.shape[0]
        H, W = kp_map1.shape[1:3]
        temperature = min(self.t_base + outputs["epoch"], self.t_max)
        rcfg = self._reward_config(outputs["epoch"])
        cos = self.config["loss_distance"] == "cos"

        k1, k2 = jax.random.split(key)
        coord1, logp1, accept1 = self.point_sample(kp_map1, k1)
        coord2, logp2, accept2 = self.point_sample(kp_map2, k2)
        coord1 = coord1.reshape(b, -1, 2)
        coord2 = coord2.reshape(b, -1, 2)

        coord1_n = normalize_coords(coord1, H, W)
        coord2_n = normalize_coords(coord2, H, W)
        feat1 = sample_feat_by_coord(xf1, coord1_n, cos)  # [B, m, c]
        feat2 = sample_feat_by_coord(xf2, coord2_n, cos)  # [B, n, c]

        if self._use_pallas():
            return self._pallas_loss(
                inputs, feat1, feat2, coord1, coord2,
                logp1, logp2, accept1, accept2, temperature,
                rcfg["reward_thr"],
            )

        costs = 1 - _bmm(feat1, feat2)  # [B, m, n] in [0, 2]
        if not self.config["match_grad"]:
            costs = jax.lax.stop_gradient(costs)
        affinity = -temperature * costs

        # dual Categorical match distribution (kploss.py:162-166);
        # torch Categorical .logits == log_softmax, .probs == softmax
        logp_I = jax.nn.log_softmax(affinity, axis=-1)
        logp_T = jax.nn.log_softmax(affinity.transpose(0, 2, 1), axis=-1)
        dense_p = jnp.exp(logp_I) * jnp.exp(logp_T).transpose(0, 2, 1)
        dense_logp = logp_I + logp_T.transpose(0, 2, 1)

        sample_p = (
            jax.lax.stop_gradient(dense_p) if self.config["cor_detach"] else dense_p
        )

        reward_fn = getattr(self, self.reward_name)
        rcoord1, rcoord2 = coord1, coord2
        if self.reward_at_refined:
            # reward what extraction emits: quad-refined peak positions
            # (stop-grad — the reward path carries no gradient anyway)
            from ..ops.detect import quad_refine_offsets

            rcoord1 = coord1 + jax.lax.stop_gradient(
                _gather_at_pixels(quad_refine_offsets(kp_map1), coord1)
            )
            rcoord2 = coord2 + jax.lax.stop_gradient(
                _gather_at_pixels(quad_refine_offsets(kp_map2), coord2)
            )
        reward, scale1, scale2 = reward_fn(inputs, rcoord1, rcoord2, **rcfg)

        logp1f = logp1.reshape(b, -1)
        logp2f = logp2.reshape(b, -1)
        kps_logp = logp1f[:, :, None] + logp2f[:, None, :]  # [B, m, n]
        sample_plogp = sample_p * (dense_logp + kps_logp)
        a1 = accept1.reshape(b, -1)
        a2 = accept2.reshape(b, -1)
        accept_mask = (a1[:, :, None] & a2[:, None, :]).astype(sample_plogp.dtype)

        reinforce = jnp.sum(accept_mask * reward * sample_plogp)
        kp_penalty = self.kp_penalty * (
            jnp.sum(a1 * logp1f) + jnp.sum(a2 * logp2f)
        )

        loss = -reinforce - kp_penalty

        loc_pen = jnp.zeros((), jnp.float32)
        if self.loc_weight:
            # Differentiable localization: each accepted pair that is
            # epipolar-consistent at its soft-argmax peak position gets
            # its refined-coordinate epipolar distance penalized,
            # weighted by the detached match probability. The gradient
            # flows only through the soft offsets into the score maps,
            # sharpening peaks toward sub-pixel-accurate positions.
            from ..ops.detect import softargmax3_offsets

            lcoord1 = coord1 + _gather_at_pixels(
                softargmax3_offsets(
                    kp_map1, self.loc_temperature, self.loc_window
                ),
                coord1,
            )
            lcoord2 = coord2 + _gather_at_pixels(
                softargmax3_offsets(
                    kp_map2, self.loc_temperature, self.loc_window
                ),
                coord2,
            )
            d1r, d2r = self._epipolar_dists(inputs, lcoord1, lcoord2)
            thr = rcfg["reward_thr"]
            good_loc = jax.lax.stop_gradient(
                ((d1r < thr) & (d2r < thr)).astype(jnp.float32)
            )
            w_pair = accept_mask * good_loc * jax.lax.stop_gradient(sample_p)
            denom = jnp.clip(jax.lax.stop_gradient(w_pair.sum()), 1.0, None)
            loc_pen = jnp.sum(w_pair * (d1r + d2r)) / denom
            loss = loss + self.loc_weight * loc_pen

        sp = jax.lax.stop_gradient(sample_p)
        components = {
            "reinforce": jax.lax.stop_gradient(reinforce),
            "kp_penalty": jax.lax.stop_gradient(kp_penalty),
            "scale1": jnp.mean(scale1),
            "scale2": jnp.mean(scale2),
            "cor minmax": sp.reshape(b, -1).max(-1).min(),
            "cor minmean": sp.reshape(b, -1).mean(-1).min(),
            "cor max": sp.max(),
            "cor mean": sp.mean(),
            "cor summin": jnp.minimum(sp.sum(1).min(), sp.sum(2).min()),
            "cor summax": jnp.maximum(sp.sum(1).max(), sp.sum(2).max()),
            "n_kps": (a1.sum(-1) + a2.sum(-1)).astype(jnp.float32).mean(),
            "n_pairs": sp.sum((-1, -2)).mean(),
            "temperature": jnp.asarray(temperature, jnp.float32),
            "reward_thr": jnp.asarray(rcfg["reward_thr"], jnp.float32),
        }
        if self.loc_weight:
            components["loc_pen"] = jax.lax.stop_gradient(loc_pen)
        return loss, components
