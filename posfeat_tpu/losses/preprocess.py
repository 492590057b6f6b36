"""Stage-1 differentiable correspondence search ("Line2Window" engine).

Reference losses/preprocess.py:7-129. Per batch, between model forward and
loss: sample grid query points, run the dense m×n cosine correlation for
expected grid correspondences (+std), refine with an epipolar line search
and a windowed soft-argmax around the line hit.

All randomness flows through an explicit PRNG key; temperature is a static
Python number (the shipped recipe pins it at 60, preprocess.py:33).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.coords import denormalize_coords, normalize_coords
from ..ops.epipolar import (
    epipolar_line_search,
    get_expected_correspondence_within_window,
)
from ..ops.grid_sample import l2_normalize, sample_feat_by_coord
from ..ops.priors import PRIORS
from ..ops.resize import interpolate_bilinear
from ..ops.samplers import generate_kpts_regular_grid_random


def _bmm(a, b):
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


class Preprocess_Line2Window:
    __lossname__ = "Preprocess_Line2Window"

    def __init__(self, configs: Dict[str, Any]):
        self.config = configs
        self.t_base = configs["temperature_base"]
        self.t_max = configs["temperature_max"]
        assert configs["kps_generator"] == "generate_kpts_regular_grid_random", (
            "stage-1 sampler (the only one wired in the reference configs)"
        )

    def name(self):
        return self.__lossname__

    def _kp_maps(self, inputs, outputs):
        """kps_generator map_init (putils:598-610)."""
        gcfg = self.config["kps_generator_config"]
        map_init = gcfg.get("map_init", "identity")
        lp1 = outputs["preds1"]["local_point"]
        lp2 = outputs["preds2"]["local_point"]
        if map_init == "identity":
            return jnp.ones_like(lp1), jnp.ones_like(lp2)
        prior = PRIORS[map_init]
        lm1 = interpolate_bilinear(
            outputs["preds1"]["local_map"], inputs["im1"].shape[1:3]
        )
        lm2 = interpolate_bilinear(
            outputs["preds2"]["local_map"], inputs["im2"].shape[1:3]
        )
        cm = map_init == "SSIM"
        k1 = prior(lm1, channel_mean=True) if cm else prior(lm1)
        k2 = prior(lm2, channel_mean=True) if cm else prior(lm2)
        return jax.lax.stop_gradient(k1), jax.lax.stop_gradient(k2)

    def __call__(self, inputs, outputs, key: jax.Array):
        preds1, preds2 = outputs["preds1"], outputs["preds2"]
        xf1 = preds1["local_map"]
        xf2 = preds2["local_map"]
        h1i, w1i = inputs["im1"].shape[1:3]
        h2i, w2i = inputs["im2"].shape[1:3]
        b = xf1.shape[0]
        temperature = min(self.t_base + outputs["epoch"], self.t_max)
        cos = self.config["loss_distance"] == "cos"
        ws = self.config["window_size"]

        gcfg = self.config["kps_generator_config"]
        k_kps, k_ls1, k_ls2 = jax.random.split(key, 3)
        kp_map1, kp_map2 = self._kp_maps(inputs, outputs)
        coord1_n, coord2_n, score1, score2 = generate_kpts_regular_grid_random(
            kp_map1, kp_map2, k_kps,
            grid_size=gcfg["grid_size"],
            random_select=gcfg.get("random_select", "random"),
            keep_spatial=True,
        )
        coord1_n = coord1_n.reshape(b, -1, 2)
        coord2_n = coord2_n.reshape(b, -1, 2)
        coord1 = denormalize_coords(coord1_n, h1i, w1i)
        coord2 = denormalize_coords(coord2_n, h2i, w2i)

        feat1_fine = sample_feat_by_coord(xf1, coord1_n, cos)
        feat2_fine = sample_feat_by_coord(xf2, coord2_n, cos)

        # dense grid correlation -> expected locations (preprocess.py:59-81)
        cos_sim = _bmm(feat1_fine, feat2_fine)  # [B, m, n]
        # match_prob selects how the correlation becomes a probability:
        # 'softmax' (default, reference compute_prob putils:89-115) or
        # the reference's alternative matchers (putils:117-194 — defined
        # there but left unwired): a JOINT matrix from Sinkhorn OT
        # (plain / dustbin-augmented) or dual-softmax, conditioned per
        # row/column for the two directed expectations.
        match_prob = self.config.get("match_prob", "softmax")
        if match_prob == "softmax":
            p12 = jax.nn.softmax(temperature * cos_sim, axis=2)
            p21 = jax.nn.softmax(temperature * cos_sim, axis=1)
        else:
            from ..ops.correlation import (
                dual_softmax,
                ot_sinkhorn_log,
                ot_sinkhorn_log_unmatch,
            )

            fn = {
                "ot_sinkhorn": ot_sinkhorn_log,
                "ot_sinkhorn_unmatch": ot_sinkhorn_log_unmatch,
                "dual_softmax": dual_softmax,
            }[match_prob]
            joint, _ = fn(
                -cos_sim,
                iters=int(self.config.get("sinkhorn_iters", 20)),
                temperature=temperature,
            )
            joint = jnp.clip(joint, 1e-12, None)
            p12 = joint / joint.sum(axis=2, keepdims=True)
            p21 = joint / joint.sum(axis=1, keepdims=True)
        feat1g_corloc = jnp.sum(p12[..., None] * coord2[:, None, :, :], axis=2)
        feat2g_corloc = jnp.sum(p21[..., None] * coord1[:, :, None, :], axis=1)

        feat1g_corloc_n = jax.lax.stop_gradient(
            normalize_coords(feat1g_corloc, h2i, w2i)
        )
        feat2g_corloc_n = jax.lax.stop_gradient(
            normalize_coords(feat2g_corloc, h1i, w1i)
        )

        feat1g_std = jnp.sum(
            p12[..., None] * (coord2_n[:, None, :, :] ** 2), axis=2
        ) - feat1g_corloc_n**2
        feat1g_std = jnp.sqrt(jnp.clip(feat1g_std, 1e-6, None)).sum(-1)
        feat2g_std = jnp.sum(
            p21[..., None] * (coord1_n[:, :, None, :] ** 2), axis=1
        ) - feat2g_corloc_n**2
        feat2g_std = jnp.sqrt(jnp.clip(feat2g_std, 1e-6, None)).sum(-1)

        # temperature-scaled normalized maps for the search ops
        xf2_n = temperature * l2_normalize(xf2, axis=-1)
        xf1_n = temperature * l2_normalize(xf1, axis=-1)

        engine = self.config.get("engine", "fused")
        if self.config["use_line_search"] and engine == "fused":
            # TPU-fused engine (ops/line_window.py): dense per-chunk
            # correlation maps drive a band-argmax line stage and the
            # exact reference window expectation — no descriptor gathers
            from ..ops.line_window import fused_line_window

            lcfg = self.config["line_search_config"]
            c1n_, c1n_org, valid1, feat1w_corloc_n, feat1w_std = fused_line_window(
                xf2_n, feat1_fine, coord1, inputs["F1"], h2i, w2i,
                key=k_ls1, window_size=ws,
                use_nn=lcfg.get("use_nn", True),
                loc_rand=lcfg.get("loc_rand", True),
            )
            c2n_, c2n_org, valid2, feat2w_corloc_n, feat2w_std = fused_line_window(
                xf1_n, feat2_fine, coord2, inputs["F2"], h1i, w1i,
                key=k_ls2, window_size=ws,
                use_nn=lcfg.get("use_nn", True),
                loc_rand=lcfg.get("loc_rand", True),
            )
            feat1c_corloc_org = denormalize_coords(c1n_org, h2i, w2i)
        else:
            if self.config["use_line_search"]:
                lcfg = self.config["line_search_config"]
                c1n_, c1n_org, valid1, _std1 = epipolar_line_search(
                    coord1, inputs["F1"], feat1_fine, xf2_n, h2i, w2i,
                    key=k_ls1, window_size=ws, **lcfg,
                )
                c2n_, c2n_org, valid2, _std2 = epipolar_line_search(
                    coord2, inputs["F2"], feat2_fine, xf1_n, h1i, w1i,
                    key=k_ls2, window_size=ws, **lcfg,
                )
                feat1c_corloc_org = denormalize_coords(c1n_org, h2i, w2i)
            else:
                c1n_ = feat1g_corloc_n
                c2n_ = feat2g_corloc_n
                c2n_org = c2n_
                feat1c_corloc_org = c1n_
                valid1 = jnp.ones_like(feat1g_std, dtype=bool)
                valid2 = jnp.ones_like(feat2g_std, dtype=bool)

            feat1w_corloc_n, _, feat1w_std, _ = (
                get_expected_correspondence_within_window(
                    feat1_fine, xf2_n, c1n_, ws, with_std=True
                )
            )
            feat2w_corloc_n, _, feat2w_std, _ = (
                get_expected_correspondence_within_window(
                    feat2_fine, xf1_n, c2n_, ws, with_std=True
                )
            )

        feat1w_corloc = denormalize_coords(feat1w_corloc_n, h2i, w2i)
        feat2w_corloc = denormalize_coords(feat2w_corloc_n, h1i, w1i)

        return {
            "coord1": coord1,
            "coord2": coord2,
            "feat1g_corloc": feat1g_corloc,
            "feat2g_corloc": feat2g_corloc,
            "feat1w_corloc": feat1w_corloc,
            "feat2w_corloc": feat2w_corloc,
            "feat1c_corloc_org": feat1c_corloc_org,
            # kept normalized for image-2, mirroring preprocess.py:113
            "feat2c_corloc_org": c2n_org,
            "feat1g_std": feat1g_std,
            "feat2g_std": feat2g_std,
            "feat1w_std": feat1w_std,
            "feat2w_std": feat2w_std,
            "temperature": temperature,
            "valid_epi1": valid1,
            "valid_epi2": valid2,
        }


class Preprocess_Skip:
    """No-op preprocess for stage-2 (reference preprocess.py:120-129)."""

    __lossname__ = "Preprocess_Skip"

    def __init__(self, **kwargs):
        pass

    def name(self):
        return self.__lossname__

    def __call__(self, inputs, outputs, key=None):
        return None
