"""PoSFeat composite model: descriptor backbone + keypoint score head.

Functional JAX counterpart of the reference composite
(networks/PoSFeat_model.py:15-147): holds module *definitions*; parameters
travel as an explicit variables pytree {'backbone': ..., 'localheader': ...}
so training stages can freeze/optimize modules by subtree, exactly like the
reference's per-module checkpoint layout (backbone.pth + localheader.pth).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from ..core.checkpoint import load_module_variables, save_module_variables


class PoSFeat:
    """Composite of `backbone` and `localheader` flax modules.

    config keys (reference PoSFeat_model.py:16-46): backbone,
    backbone_config, localheader, localheader_config, align_local_grad,
    local_input_elements, local_with_img.
    """

    modules = ("localheader", "backbone")

    def __init__(self, config: Dict[str, Any], dtype=jnp.float32):
        from . import BACKBONES, HEADS

        self.config = config
        self.dtype = dtype
        self.align_local_grad = config["align_local_grad"]
        self.local_input_elements = list(config["local_input_elements"])
        self.local_with_img = config["local_with_img"]

        backbone_cls = BACKBONES[config["backbone"]]
        self.backbone = backbone_cls(**(config.get("backbone_config") or {}),
                                     dtype=dtype)

        head_name = config.get("localheader")
        if head_name and head_name != "None":
            self.localheader = HEADS[head_name](
                **(config.get("localheader_config") or {}), dtype=dtype
            )
        else:
            # default head (PoSFeat_model.py:37-42)
            self.localheader = HEADS["KeypointDet"](
                in_channels=self.backbone.out_channels[0], out_channels=2,
                dtype=dtype,
            )

    # ------------------------------------------------------------- init

    def init(self, key: jax.Array, im_shape=(1, 64, 64, 3)) -> Dict[str, Any]:
        kb, kh = jax.random.split(key)
        dummy = jnp.zeros(im_shape, jnp.float32)
        bvars = self.backbone.init(kb, dummy, train=False)
        feats = self.backbone.apply(bvars, dummy, train=False)
        local_in = jnp.concatenate(
            [feats[n] for n in self.local_input_elements], axis=-1
        )
        hvars = self.localheader.init(kh, local_in, dummy)
        return {"backbone": bvars, "localheader": hvars}

    # ---------------------------------------------------------- forward

    def extract(
        self,
        variables: Dict[str, Any],
        tensor: jnp.ndarray,
        train: bool = False,
        mutable_bn: bool = False,
    ):
        """Single-image feature extraction (PoSFeat_model.py:91-134).

        Returns the reference output dict (NHWC), plus updated backbone
        batch stats as a second value when mutable_bn.
        """
        if mutable_bn:
            feat_maps, bn_updates = self.backbone.apply(
                variables["backbone"], tensor, train=train,
                mutable=["batch_stats"],
            )
        else:
            feat_maps = self.backbone.apply(
                variables["backbone"], tensor, train=train
            )
            bn_updates = None

        b, h16, w16, _ = feat_maps["global_map"].shape
        g_map = jnp.ones((b, h16, w16, 1), feat_maps["local_map"].dtype)

        local_input = jnp.concatenate(
            [feat_maps[n] for n in self.local_input_elements], axis=-1
        )
        if not self.align_local_grad:
            local_input = jax.lax.stop_gradient(local_input)
        assert self.local_with_img, (
            "KeypointDet requires local_with_img=True (reference DeteNet "
            "forward consumes [feat, image])"
        )
        l_map = self.localheader.apply(
            variables["localheader"], local_input, tensor, train
        )

        if l_map.shape[-1] == 1:
            local_thr = jnp.zeros_like(l_map)
        else:
            local_thr = l_map[..., 1:]
            l_map = l_map[..., :1]

        g_desc = g_map * feat_maps["global_map"]
        g_desc = g_desc / jnp.clip(
            jnp.linalg.norm(g_desc, axis=-1, keepdims=True), 1e-12, None
        )
        g_desc = g_desc.mean(axis=(1, 2))

        outputs = {
            "local_map": feat_maps["local_map"],
            "global_map": feat_maps["global_map"],
            "global_feat": g_desc,
            "local_point": l_map,
            "local_thr": local_thr,
            "global_point": g_map,
        }
        if mutable_bn:
            return outputs, bn_updates
        return outputs

    def forward(
        self,
        variables: Dict[str, Any],
        inputs: Dict[str, jnp.ndarray],
        train: bool = False,
        mutable_bn: bool = False,
    ):
        """Two-view forward (PoSFeat_model.py:136-147)."""
        if mutable_bn:
            preds1, upd1 = self.extract(variables, inputs["im1"], train, True)
            vars2 = dict(variables)
            vars2["backbone"] = {**variables["backbone"], **upd1}
            preds2, upd2 = self.extract(vars2, inputs["im2"], train, True)
            return {"preds1": preds1, "preds2": preds2}, upd2
        preds1 = self.extract(variables, inputs["im1"], train)
        preds2 = self.extract(variables, inputs["im2"], train)
        return {"preds1": preds1, "preds2": preds2}

    # ------------------------------------------------------- checkpoints

    def save_checkpoint(self, variables: Dict[str, Any], save_path: str):
        os.makedirs(save_path, exist_ok=True)
        for name in ("backbone", "localheader"):
            save_module_variables(variables[name], os.path.join(save_path, name))

    def load_checkpoint(self, variables: Dict[str, Any], load_path: str):
        """Load per-module files; missing modules keep current params
        (PoSFeat_model.py:57-72 — how stage 2 starts with a fresh head)."""
        out = dict(variables)
        for name in ("backbone", "localheader"):
            loaded = load_module_variables(
                os.path.join(load_path, name), template=variables[name]
            )
            if loaded is not None:
                print(f"load {name} from checkpoint")
                out[name] = loaded
            else:
                print(f"{name} does not exist, skipping load")
        return out
