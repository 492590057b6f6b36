"""Stage-1 descriptor loss: masked, inverse-std-weighted epipolar cost of
the predicted correspondences (reference losses/epipolarloss.py:8-101)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.epipolar import epipolar_cost


class EpipolarLoss_full:
    __lossname__ = "EpipolarLoss_fullinfo"

    def __init__(self, configs: Dict[str, Any]):
        self.config = configs
        self.w_g = configs["weight_grid"]
        self.w_w = configs["weight_window"]

    def name(self):
        return self.__lossname__

    def _weight(self, inverse_std, mask=None):
        """Normalized, detached inverse-std weights (epipolarloss.py:25-36)."""
        if self.config["use_std_as_weight"]:
            weight = inverse_std / jnp.mean(inverse_std)
            weight = jax.lax.stop_gradient(weight)
        else:
            weight = jnp.ones_like(inverse_std)
        if mask is not None:
            weight = weight * mask.astype(weight.dtype)
            weight = weight / (jnp.mean(weight) + 1e-8)
        return weight

    def __call__(self, inputs, outputs, processed, key=None):
        coord1 = processed["coord1"]
        coord2 = processed["coord2"]

        Fmat1, Fmat2 = inputs["F1"], inputs["F2"]
        im_size1 = inputs["im1"].shape[1:3]
        shorter_edge = min(im_size1)

        cost_g1 = epipolar_cost(coord1, processed["feat1g_corloc"], Fmat1)
        cost_w1 = epipolar_cost(coord1, processed["feat1w_corloc"], Fmat1)
        cost_g2 = epipolar_cost(coord2, processed["feat2g_corloc"], Fmat2)
        cost_w2 = epipolar_cost(coord2, processed["feat2w_corloc"], Fmat2)

        mask_g1 = cost_g1 < (shorter_edge * self.config["grid_cost_thr"])
        mask_w1 = cost_w1 < (shorter_edge * self.config["win_cost_thr"])
        mask_g2 = cost_g2 < (shorter_edge * self.config["grid_cost_thr"])
        mask_w2 = cost_w2 < (shorter_edge * self.config["win_cost_thr"])

        if "valid_epi1" in processed:
            mask_g1 = mask_g1 & processed["valid_epi1"]
            mask_w1 = mask_w1 & processed["valid_epi1"]
            mask_g2 = mask_g2 & processed["valid_epi2"]
            mask_w2 = mask_w2 & processed["valid_epi2"]

        weight_g1 = self._weight(1 / jnp.clip(processed["feat1g_std"], 1e-10), mask_g1)
        weight_w1 = self._weight(1 / jnp.clip(processed["feat1w_std"], 1e-10), mask_w1)
        weight_g2 = self._weight(1 / jnp.clip(processed["feat2g_std"], 1e-10), mask_g2)
        weight_w2 = self._weight(1 / jnp.clip(processed["feat2w_std"], 1e-10), mask_w2)

        loss_g1 = jnp.mean(weight_g1 * cost_g1)
        loss_w1 = jnp.mean(weight_w1 * cost_w1)
        loss_g2 = jnp.mean(weight_g2 * cost_g2)
        loss_w2 = jnp.mean(weight_w2 * cost_w2)

        loss = self.w_g * (loss_g1 + loss_g2) + self.w_w * (loss_w1 + loss_w2)

        percent_g = (jnp.mean(mask_g1) + jnp.mean(mask_g2)) / 2
        percent_w = (jnp.mean(mask_w1) + jnp.mean(mask_w2)) / 2

        components = {
            "loss_g1": loss_g1,
            "loss_w1": loss_w1,
            "loss_g2": loss_g2,
            "loss_w2": loss_w2,
            "percent_g": percent_g,
            "percent_w": percent_w,
        }
        return loss, components
