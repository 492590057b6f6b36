"""YAML config system with the reference's checkpoint merge-on-load rule.

The reference resolves strings to classes by reflection over module
namespaces (trainer.py:74,96,106,118,126); here every resolvable name
lives in an explicit registry (models.MODELS/BACKBONES/HEADS,
losses.LOSSES/PREPROCESSES, data.DATASETS, ops.detect.DETECTORS,
ops.matchers.MATCHERS) — same flexibility, no getattr on arbitrary
module namespaces.

`merge_from_checkpoint` reproduces trainer.py:53-63 / extractor.py:62-68:
the run dir's saved config.yaml overrides the new run's model section so
architecture always matches weights.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import yaml


def load_config(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def dump_config(config: Dict[str, Any], path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)


def merge_from_checkpoint(config: Dict[str, Any]) -> Dict[str, Any]:
    """If config has load_path, merge the checkpoint run's model section.

    load_path points at an epoch dir (e.g. ckpts/descriptor/010); the
    run-level config.yaml lives one directory up (extractor.py:62-68).
    """
    load_path = config.get("load_path")
    if not load_path:
        return config
    cfg_path = os.path.join(os.path.dirname(str(load_path).rstrip("/")), "config.yaml")
    if not os.path.exists(cfg_path):
        return config
    pre = load_config(cfg_path)
    merged = dict(config)
    model_cfg = dict(merged.get("model_config") or {})
    model_cfg.update(pre.get("model_config") or {})
    merged["model_config"] = model_cfg
    if "model" in pre:
        merged["model"] = pre["model"]
    return merged
