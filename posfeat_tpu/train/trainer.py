"""Two-stage training orchestrator (reference managers/trainer.py:41-544).

TPU architecture:
  * one jitted SPMD train step over a 1-D `data` mesh — batch sharded,
    params replicated, gradient all-reduce inserted by XLA (the DDP/NCCL
    equivalent, SURVEY §2.7);
  * module freezing exactly as the reference (optimal_modules,
    trainer.py:78-87): gradients are only taken w.r.t. the optimized
    modules' params; frozen modules run in eval mode (BN uses running
    stats, trainer.py:293-296);
  * per-module optimizers/lrs via optax.multi_transform, StepLR schedule,
    optional per-module global-norm clipping;
  * non-finite-loss guard: the step skips the parameter update on device
    and dumps a forensic error.npz on host (trainer.py:320-328);
  * epoch-dir checkpoints (`ckpts/<name>/<epoch:03d>/`) with per-module
    msgpack payloads, plus optimizer state for exact resume (an upgrade —
    the reference drops optimizer state);
  * metrics to metrics.jsonl (+ TensorBoard if available) and periodic
    score-map/match visual validation dumps — the reference's documented
    stopping criterion for stage 2 (README.md:72-77).
"""

from __future__ import annotations

import json
import os
import threading
import time
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.checkpoint import load_module_variables, save_module_variables
from ..core.config import dump_config, load_config, merge_from_checkpoint
from ..core.logging_utils import make_logger
from ..core.mesh import data_mesh, replicated, shard_batch
from ..data import DATASETS
from ..data.loader import PrefetchLoader
from ..losses import LOSSES, PREPROCESSES
from ..models import MODELS

_DEVICE_KEYS = (
    "im1", "im2", "F1", "F2", "pose1", "pose2",
    "intrinsic1", "intrinsic2", "coord1", "coord2",
)


class Trainer:
    def __init__(self, config, ckpt_root: str = "./ckpts", overwrite: bool = False):
        if isinstance(config, str):
            config = load_config(config)
        # multi-host (DCN) training: jax.distributed.initialize must run
        # before the first backend query. The reference's analog is the
        # env:// NCCL process group (trainer.py:152-173); here one
        # config block both wires the coordinator and switches the mesh
        # below to the global device set.
        if config.get("multihost"):
            from ..core.mesh import init_multihost

            init_multihost(config["multihost"])
        self.process_id = jax.process_index()
        self.num_processes = jax.process_count()

        from ..core.cache import enable_compilation_cache

        enable_compilation_cache()
        self.config = merge_from_checkpoint(config)

        self.save_root = os.path.join(ckpt_root, self.config["checkpoint_name"])
        self.resume = bool(self.config.get("resume", False))
        if (
            self.process_id == 0
            and os.path.exists(os.path.join(self.save_root, "config.yaml"))
            and not overwrite
            and not self.resume
        ):
            raise FileExistsError(
                f"The save path {self.save_root} already exists, please change "
                "checkpoint_name (reference trainer.py:177-182 semantics) or "
                "set resume: True"
            )
        os.makedirs(self.save_root, exist_ok=True)
        if self.process_id == 0:
            dump_config(self.config, os.path.join(self.save_root, "config.yaml"))
        log_name = (
            "logging_file.txt" if self.process_id == 0
            else f"logging_file.proc{self.process_id}.txt"
        )
        self.logger = make_logger(
            "trainer", os.path.join(self.save_root, log_name)
        )
        self.metrics_path = os.path.join(self.save_root, "metrics.jsonl")

        # ----------------------------------------------------------- mesh
        # single-host: use the largest device count that divides the
        # batch (the reference's DistributedSampler analog: batch must
        # split evenly; a 2-image batch on an 8-device host just uses 2
        # devices). Multi-host: the mesh spans the GLOBAL device set
        # (ICI within hosts, DCN across) and the global batch must
        # divide it — every process runs this same SPMD program.
        bs = self.config["data_config_train"]["batch_size"]
        devs = jax.devices()
        if self.num_processes > 1:
            if bs % len(devs):
                raise ValueError(
                    f"multihost: global batch_size {bs} must divide the "
                    f"{len(devs)}-device global mesh"
                )
            self.mesh = data_mesh(devs)
            self.logger.info(
                f"multi-host data mesh: {self.num_processes} processes x "
                f"{jax.local_device_count()} local devices = {len(devs)}"
            )
        else:
            n = len(devs)
            while bs % n:
                n -= 1
            self.mesh = data_mesh(devs[:n])
            self.logger.info(
                f"data-parallel mesh over {n} of {len(devs)} device(s)"
            )

        # ---------------------------------------------------------- model
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            self.config.get("compute_dtype", "float32")
        ]
        self.model = MODELS[self.config.get("model", "PoSFeat")](
            self.config["model_config"], dtype=dtype
        )
        self.variables = self.model.init(jax.random.PRNGKey(self.config.get("seed", 0)))
        load_path = self.config.get("load_path")
        if load_path and os.path.isdir(str(load_path)):
            self.variables = self.model.load_checkpoint(self.variables, str(load_path))

        self.optimal_modules = list(self.config["optimal_modules"])
        self.optimal_lrs = [float(lr) for lr in self.config["optimal_lrs"]]
        self.train_backbone = "backbone" in self.optimal_modules

        # ------------------------------------------------------ optimizer
        self.steps_per_epoch = int(self.config["epoch_step"])
        self.optimizer = self._build_optimizer()
        self.trainable = {
            m: self.variables[m]["params"] for m in self.optimal_modules
        }
        self.opt_state = self.optimizer.init(self.trainable)
        self.start_epoch = 1

        # elastic resume: pick up the latest epoch dir + optimizer state
        # (an upgrade over the reference, which restarts optimizer state)
        if self.resume:
            epochs = sorted(
                int(d) for d in os.listdir(self.save_root)
                if d.isdigit() and os.path.isdir(os.path.join(self.save_root, d))
            ) if os.path.isdir(self.save_root) else []
            if epochs:
                latest = os.path.join(self.save_root, f"{epochs[-1]:03d}")
                self.variables = self.model.load_checkpoint(self.variables, latest)
                self.trainable = {
                    m: self.variables[m]["params"] for m in self.optimal_modules
                }
                opt = load_module_variables(os.path.join(latest, "opt_state"))
                if opt is not None:
                    leaves = [opt[k] for k in sorted(opt)]
                    self.opt_state = jax.tree.unflatten(
                        jax.tree.structure(self.opt_state), leaves
                    )
                self.start_epoch = epochs[-1] + 1
                self.logger.info(
                    f"resumed from {latest}; continuing at epoch {self.start_epoch}"
                )

        # --------------------------------------------------------- losses
        pp_name = self.config.get("preprocess_train")
        if pp_name:
            self.preprocess = PREPROCESSES[pp_name](
                self.config.get("preprocess_train_config", {})
            )
        else:
            self.preprocess = PREPROCESSES["Preprocess_Skip"]()
        self.loss_fns = []
        for name, weight in zip(self.config["losses"], self.config["losses_weight"]):
            self.loss_fns.append(
                (name, float(weight), LOSSES[name](self.config[f"{name}_config"]))
            )

        # ----------------------------------------------------------- data
        dcfg = self.config["data_config_train"]
        dataset_cls = DATASETS[self.config["data"]]
        self.train_dataset = dataset_cls(configs=dcfg, is_train=True)
        # multi-host: each process loads its 1/num_processes slice of the
        # global batch from a disjoint index shard; shard_batch assembles
        # the global array from the process-local slices
        local_bs = dcfg["batch_size"] // self.num_processes
        self.train_loader = PrefetchLoader(
            self.train_dataset,
            batch_size=local_bs,
            shuffle=True,
            num_workers=dcfg.get("workers", 4),
            seed=self.config.get("seed", 0),
            infinite=True,
            num_shards=self.num_processes,
            shard_index=self.process_id,
        )
        self.batch_size = dcfg["batch_size"]

        self._step_cache: Dict[Any, Any] = {}
        self._tb = self._try_tensorboard()

    # ------------------------------------------------------------ helpers

    def _try_tensorboard(self):
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(self.save_root)
        except Exception:
            return None

    def _lr_schedule(self, base_lr: float):
        decay_step = int(self.config["lr_decay_step"])
        factor = float(self.config["lr_decay_factor"])
        spe = self.steps_per_epoch

        def schedule(count):
            epoch = count // spe
            return base_lr * (factor ** (epoch // decay_step))

        return schedule

    def _build_optimizer(self):
        opts = {}
        for mod, lr in zip(self.optimal_modules, self.optimal_lrs):
            sched = self._lr_schedule(lr)
            name = self.config.get("optimizer", "Adam")
            if name == "Adam":
                tx = optax.adam(sched)
            elif name == "SGD":
                tx = optax.sgd(sched)
            elif name == "AdamW":
                tx = optax.adamw(sched)
            else:
                raise ValueError(f"unsupported optimizer {name}")
            if self.config.get("grad_clip"):
                tx = optax.chain(
                    optax.clip_by_global_norm(float(self.config["clip_norm"])), tx
                )
            opts[mod] = tx
        return optax.multi_transform(opts, param_labels={m: m for m in opts})

    def _merge_variables(self, trainable):
        merged = {}
        for mod in ("backbone", "localheader"):
            v = dict(self.variables[mod])
            if mod in trainable:
                v["params"] = trainable[mod]
            merged[mod] = v
        return merged

    # --------------------------------------------------------- train step

    def _build_step(self, epoch: int):
        """Jitted SPMD step; epoch is static (temperature schedule)."""
        if epoch in self._step_cache:
            return self._step_cache[epoch]

        model = self.model
        preprocess = self.preprocess
        loss_fns = self.loss_fns
        optimizer = self.optimizer
        train_backbone = self.train_backbone

        def loss_fn(trainable, frozen, batch, key):
            variables = {}
            for mod in ("backbone", "localheader"):
                v = dict(frozen[mod])
                if mod in trainable:
                    v = dict(v)
                    v["params"] = trainable[mod]
                variables[mod] = v

            if train_backbone:
                outputs, bn_updates = model.forward(
                    variables, batch, train=True, mutable_bn=True
                )
            else:
                outputs = model.forward(variables, batch, train=False)
                bn_updates = None
            outputs["epoch"] = epoch

            k_pp, k_loss = jax.random.split(key)
            processed = preprocess(batch, outputs, k_pp)

            total = 0.0
            components = {}
            for i, (name, weight, fn) in enumerate(loss_fns):
                ki = jax.random.fold_in(k_loss, i)
                li, comps = fn(batch, outputs, processed, key=ki)
                total = total + weight * li
                components[name] = li
                components.update(comps)
            return total, (components, bn_updates)

        def step(trainable, opt_state, frozen, batch, key):
            (total, (components, bn_updates)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(trainable, frozen, batch, key)

            finite = jnp.isfinite(total)
            for g in jax.tree.leaves(grads):
                finite = finite & jnp.all(jnp.isfinite(g))

            grads = jax.tree.map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
            )
            updates, new_opt_state = optimizer.update(grads, opt_state, trainable)
            updates = jax.tree.map(
                lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates
            )
            new_trainable = optax.apply_updates(trainable, updates)

            grad_norms = {
                m: optax.global_norm(grads[m]) for m in grads
            }
            return new_trainable, new_opt_state, total, components, grad_norms, finite, bn_updates

        jitted = jax.jit(step, donate_argnums=(0, 1))
        self._step_cache[epoch] = jitted
        return jitted

    # -------------------------------------------------------------- train

    def save_checkpoint(self, epoch: int, block: bool = True):
        """Write the epoch-dir checkpoint (reference trainer.py:263-267).

        ``block=False`` snapshots device state to host synchronously (the
        arrays are immutable, so one ``device_get`` is the only part that
        must happen on the training thread) and pushes the msgpack file
        I/O to a daemon thread — the intra-epoch cadence (reference saves
        every 100 steps, trainer.py:367-368) no longer stalls the input
        pipeline on disk writes. Writers are serialized: a new save joins
        the previous one first, so the checkpoint dir is never written
        concurrently.
        """
        if self.process_id != 0:
            # params are replicated; one writer suffices (the reference's
            # output_flag rank gate, trainer.py:363-368)
            return
        if getattr(self, "_ckpt_thread", None) is not None:
            self._ckpt_thread.join()
            self._ckpt_thread = None
        path = os.path.join(self.save_root, f"{epoch:03d}")
        os.makedirs(path, exist_ok=True)
        variables = jax.device_get(self._merge_variables(self.trainable))
        # optax states are namedtuple pytrees msgpack can't hold; store the
        # leaves (resume unflattens against a freshly-built state template)
        leaves = {
            f"{i:04d}": np.asarray(leaf)
            for i, leaf in enumerate(jax.tree.leaves(self.opt_state))
        }

        def _write():
            self.model.save_checkpoint(variables, path)
            # losses that carry state may expose save_checkpoint (reference
            # save_loss hook, trainer.py:257-261; none of the shipped do)
            for _name, _w, fn in self.loss_fns:
                if hasattr(fn, "save_checkpoint"):
                    fn.save_checkpoint(path)
            save_module_variables(leaves, os.path.join(path, "opt_state"))

        if block:
            _write()
        else:
            self._ckpt_thread = threading.Thread(target=_write, daemon=True)
            self._ckpt_thread.start()

    def save_error_dump(self, batch, loss_val, step):
        path = os.path.join(
            self.save_root,
            f"error_step{step}.npz" if self.process_id == 0
            else f"error_step{step}.proc{self.process_id}.npz",
        )
        arrs = {
            k: np.asarray(v)
            for k, v in batch.items()
            if not isinstance(v, (str, list, tuple))
        }
        arrs["loss"] = np.asarray(loss_val)
        np.savez(path, **arrs)
        self.logger.error(f"non-finite loss at step {step}; dumped {path}")

    def _log_metrics(self, record: Dict):
        if self.process_id != 0:
            return
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            step = record["global_step"]
            for k, v in record.items():
                if isinstance(v, (int, float)) and k != "global_step":
                    self._tb.add_scalar(k, v, step)

    def train(self):
        cfg = self.config
        n_epochs = int(cfg["epoch"])
        log_freq = int(cfg.get("log_freq", 100))
        # intra-epoch safety-save cadence (reference hard-codes 100,
        # trainer.py:367-368); configurable because the async write still
        # costs a host device_get per save
        ckpt_freq = int(cfg.get("ckpt_freq", 100))
        tb_keys = cfg.get("tb_component", [])
        key = jax.random.PRNGKey(cfg.get("seed", 0) + 1)

        if self.num_processes > 1:
            # absorb per-process init/IO skew behind a generous
            # coordination-service barrier instead of eating into the
            # first all-reduce's short collective-join window
            from ..core.mesh import multihost_barrier

            multihost_barrier("trainer_start")
        if self.start_epoch == 1:
            self.save_checkpoint(0)
        data_iter = iter(self.train_loader)
        global_step = (self.start_epoch - 1) * self.steps_per_epoch

        from ..core.profiling import StepTimer, trace

        timer = StepTimer(
            sink_path=os.path.join(self.save_root, "step_times.jsonl")
        )
        # optional device-trace capture of the first profiled steps
        # (config: profile_trace_dir; view with TensorBoard)
        trace_dir = cfg.get("profile_trace_dir")
        trace_cm = trace(trace_dir) if trace_dir else None
        if trace_cm is not None:
            trace_cm.__enter__()
        self._open_trace = trace_cm
        try:
            self._train_epochs(n_epochs, log_freq, ckpt_freq, tb_keys, key,
                               data_iter, global_step, timer, trace_dir)
        finally:
            # an exception anywhere in the loop (non-finite dump, loader
            # error, interrupt) must still close an open device trace
            if self._open_trace is not None:
                self._open_trace.__exit__(None, None, None)
                self._open_trace = None
            # join a pending async checkpoint write so process exit can't
            # tear a multi-file epoch dir (ADVICE r4: each file is
            # tmp+os.replace atomic, but a daemon thread killed between
            # files would leave e.g. a new backbone.msgpack with a stale
            # opt_state — broken for exact resume)
            if getattr(self, "_ckpt_thread", None) is not None:
                self._ckpt_thread.join()
                self._ckpt_thread = None

    def _train_epochs(self, n_epochs, log_freq, ckpt_freq, tb_keys, key,
                      data_iter, global_step, timer, trace_dir):
        first_mh_step = self.num_processes > 1
        for epoch in range(self.start_epoch, n_epochs + 1):
            step_fn = self._build_step(epoch)
            t_epoch = time.time()
            for idx in range(self.steps_per_epoch):
                timer.start()
                batch_np = next(data_iter)
                batch = shard_batch(
                    {k: v for k, v in batch_np.items() if k in _DEVICE_KEYS},
                    self.mesh,
                )
                key, sub = jax.random.split(key)

                if first_mh_step:
                    # multihost: compile AHEAD of executing — the first
                    # all-reduce creates the cross-process collective
                    # context, whose join window (~30 s for gloo) is
                    # shorter than per-process jit-compile skew can be
                    # on loaded hosts. AOT-compiling here populates the
                    # persistent compile cache, and the barrier lines
                    # all processes up BEFORE the jitted call (which
                    # then loads from cache in seconds).
                    from ..core.mesh import multihost_barrier

                    step_fn.lower(
                        self.trainable, self.opt_state, self.variables,
                        batch, sub,
                    ).compile()
                    multihost_barrier("first_step_compiled")
                    first_mh_step = False

                (
                    self.trainable,
                    self.opt_state,
                    total,
                    components,
                    grad_norms,
                    finite,
                    bn_updates,
                ) = step_fn(self.trainable, self.opt_state, self.variables, batch, sub)

                if bn_updates is not None:
                    self.variables["backbone"] = {
                        **self.variables["backbone"],
                        **bn_updates,
                    }

                global_step += 1
                # the finite fetch blocks until the device step completes, so
                # the timer (stopped after it) measures the full step, not
                # just host-side dispatch (step_fn is async under jit)
                finite_val = bool(finite)
                timer.stop(step=global_step, epoch=epoch)
                if self._open_trace is not None and global_step >= 3:
                    # a few steps are enough for an XLA op trace
                    self._open_trace.__exit__(None, None, None)
                    self._open_trace = None
                    self.logger.info(f"device trace written to {trace_dir}")
                if not finite_val:
                    self.save_error_dump(batch_np, total, global_step)
                    continue

                if global_step % log_freq == 0 or idx == 0:
                    comp_np = {k: float(np.asarray(v)) for k, v in components.items()}
                    rec = {
                        "global_step": global_step,
                        "epoch": epoch,
                        "total_loss": float(np.asarray(total)),
                        "sec_per_step": (time.time() - t_epoch) / (idx + 1),
                        **{f"step_time/{k}": v for k, v in timer.stats().items()},
                        **{
                            f"grad_norm/{m}": float(np.asarray(g))
                            for m, g in grad_norms.items()
                        },
                        **{k: comp_np[k] for k in comp_np},
                    }
                    self._log_metrics(rec)
                    shown = {k: round(comp_np[k], 4) for k in tb_keys if k in comp_np}
                    self.logger.info(
                        f"epoch {epoch} step {idx} total {rec['total_loss']:.4f} "
                        f"{shown} ({rec['sec_per_step']:.3f}s/step)"
                    )
                    self.val_and_vis(epoch, global_step)

                if global_step % ckpt_freq == 0:
                    self.save_checkpoint(epoch, block=False)

            self.save_checkpoint(epoch)
            self.logger.info(
                f"epoch {epoch} done in {time.time() - t_epoch:.1f}s"
            )

    # ------------------------------------------------------ visualization

    _VIS_FOLDERS = (
        "0_original_images",
        "1_score_maps",
        "2_all_keypoints",
        "3_matched_keypoints",
        "4_matches_less",
        "5_matches_all",
    )

    def _load_val_samples(self):
        """Persisted validation samples (reference trainer.py:136-145):
        drawn from ``val_config['data_config_val']`` when present (else
        the train set) and cached to ``val_data.npz`` so every run — and
        every resume — validates on the same samples."""
        if hasattr(self, "_val_samples"):
            return self._val_samples
        path = os.path.join(self.save_root, "val_data.npz")
        if os.path.exists(path):
            data = np.load(path, allow_pickle=True)
            self._val_samples = list(data["val_data"])
            return self._val_samples
        vcfg = self.config.get("val_config") or {}
        n_vis = int(vcfg.get("n_vis", 2))
        dccfg = vcfg.get("data_config_val")
        if dccfg:
            ds = DATASETS[self.config["data"]](configs=dccfg, is_train=False)
        else:
            ds = self.train_dataset
        samples = []
        for i in range(len(ds)):
            s = ds[i]
            if s is not None:
                samples.append(s)
            if len(samples) >= n_vis:
                break
        self._val_samples = samples
        if samples:
            arr = np.empty(len(samples), dtype=object)
            for i, s in enumerate(samples):
                arr[i] = s
            np.savez(path, val_data=arr)
        return samples

    def val_and_vis(self, epoch: int, step: int):
        """Visual validation dumps (reference trainer.py:380-544): the six
        reference image sets per val sample — original pair, score maps,
        all keypoints, matched keypoints, top-k matches, and all matches
        with RdYlGn epipolar-error color coding — the reference's
        documented stopping criterion for stage 2 (README.md:72-77).
        ``val_config['detector']`` is honored, including the ``'sift'``
        passthrough used by train_desc.yaml."""
        vcfg = self.config.get("val_config")
        if not vcfg or self.process_id != 0:
            return
        try:
            variables = self._merge_variables(self.trainable)
            for si, sample in enumerate(self._load_val_samples()):
                self._vis_sample(si, sample, variables, vcfg, step)
        except Exception as e:  # vis must never kill training
            self.logger.warning(f"val_and_vis failed: {e}")

    def _vis_sample(self, si: int, sample: Dict, variables, vcfg: Dict, step: int):
        import cv2

        from ..data.utils import tensor2array
        from ..ops.coords import denormalize_coords, normalize_coords
        from ..ops.detect import DETECTORS
        from ..ops.grid_sample import sample_feat_by_coord
        from ..ops.matchers import mnn_matcher

        mid_pad = 20  # reference trainer.py:385
        # MegaDepth pairs are read at native sizes — the two images of a
        # pair can differ; every normalize/denormalize must use ITS
        # image's dims and the canvases pad to the max height
        dims = {t: sample[t].shape[:2] for t in ("im1", "im2") if t in sample}
        sample_dir = os.path.join(self.save_root, "vis", f"sample{si}")
        for folder in self._VIS_FOLDERS:
            os.makedirs(os.path.join(sample_dir, folder), exist_ok=True)

        outs = {}
        for tag in ("im1", "im2"):
            if tag not in sample:
                return
            im = jnp.asarray(sample[tag])[None]
            outs[tag] = self.model.extract(variables, im, train=False)

        cos = vcfg.get("loss_distance", "cos") == "cos"
        det_name = vcfg.get("detector", "sift")
        feats = {}
        for tag, ctag in (("im1", "coord1"), ("im2", "coord2")):
            o = outs[tag]
            h, w = dims[tag]
            if det_name == "sift":
                # SIFT passthrough (reference trainer.py:459-466): the val
                # sample's query keypoints, unit scores
                kps = np.asarray(sample[ctag], np.float32)[:, :2]
                score = np.ones((len(kps), 1), np.float32)
                kps_n = normalize_coords(jnp.asarray(kps)[None], h, w)
            else:
                det_cfg = dict(
                    vcfg.get("detector_config")
                    or {"num_pts": 512, "nms_radius": 1, "use_nms": True, "thr": False}
                )
                det_cfg.pop("scale", None)
                kps_n, score_j, valid = DETECTORS[det_name](
                    o["local_point"].astype(jnp.float32), **det_cfg
                )
                n = max(min(int(valid[0]), kps_n.shape[1]), 8)
                kps_n = kps_n[:, :n]
                kps = np.asarray(denormalize_coords(kps_n, h, w), np.float32)[0]
                score = np.asarray(score_j, np.float32)[0, :n]
            desc = np.asarray(
                sample_feat_by_coord(o["local_map"], kps_n, cos), np.float32
            )[0]
            feats[tag] = (kps, score, desc)

        k1, s1, d1 = feats["im1"]
        k2, s2, d2 = feats["im2"]
        matches = mnn_matcher(d1, d2)
        mk1 = k1[matches[:, 0]] if len(matches) else np.zeros((0, 2), np.float32)
        mk2 = k2[matches[:, 1]] if len(matches) else np.zeros((0, 2), np.float32)
        mscore = (
            s1[matches[:, 0], 0] + s2[matches[:, 1], 0]
            if len(matches)
            else np.zeros((0,), np.float32)
        )
        topk = min(int(vcfg.get("vis_topk", 50)), len(matches))
        topk_idx = np.argsort(-mscore)[:topk]

        # epipolar error of matched pairs, clamped (reference :491-500)
        thr_px = float(vcfg.get("vis_err_thr", 5))
        F12 = np.asarray(sample["F1"], np.float64)
        if len(matches):
            p1h = np.concatenate([mk1, np.ones((len(mk1), 1))], 1)  # [m, 3]
            lines = p1h @ F12.T  # epipolar lines in image 2
            lines = lines / np.maximum(
                np.linalg.norm(lines[:, :2], axis=1, keepdims=True), 1e-8
            )
            p2h = np.concatenate([mk2, np.ones((len(mk2), 1))], 1)
            epi_dist = np.clip(np.abs((p2h * lines).sum(1)), 0, thr_px)
        else:
            epi_dist = np.zeros((0,))
        # RdYlGn: green = low error (reference :502-506)
        colors = tensor2array(
            (thr_px - epi_dist)[:, None], max_value=thr_px, colormap="RdYlGn"
        )  # [3, m, 1]
        colors = (255 * colors[:, :, 0].T).astype(np.uint8)  # [m, 3] RGB

        im1 = np.asarray(sample["im1_ori"], np.uint8)
        im2 = np.asarray(sample["im2_ori"], np.uint8)
        hmax = max(im1.shape[0], im2.shape[0])

        def vpad(a, H_t):  # bottom-pad to the canvas height
            return np.pad(a, ((0, H_t - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))

        gap = np.zeros((hmax, mid_pad, 3), np.uint8)
        comb = np.concatenate([vpad(im1, hmax), gap, vpad(im2, hmax)], axis=1)

        def save(folder, img_rgb):
            cv2.imwrite(
                os.path.join(sample_dir, folder, f"{step}.jpg"),
                cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR),
            )

        # 0: original pair
        save("0_original_images", comb)

        # 1: score maps side by side (colormapped)
        sc1 = np.asarray(outs["im1"]["local_point"], np.float32)[0, :, :, 0]
        sc2 = np.asarray(outs["im2"]["local_point"], np.float32)[0, :, :, 0]
        shmax = max(sc1.shape[0], sc2.shape[0])
        sgap = np.zeros((shmax, mid_pad), np.float32)
        comb_score = np.concatenate(
            [vpad(sc1, shmax), sgap, vpad(sc2, shmax)], axis=1
        )
        score_rgb = (
            255 * tensor2array(comb_score).transpose(1, 2, 0)
        ).astype(np.uint8)
        save("1_score_maps", score_rgb)

        x_off = im1.shape[1] + mid_pad
        green = (0, 255, 0)

        # 2: all keypoints
        img = comb.copy()
        for x, y in k1:
            cv2.circle(img, (int(x), int(y)), 2, green, -1)
        for x, y in k2:
            cv2.circle(img, (int(x) + x_off, int(y)), 2, green, -1)
        save("2_all_keypoints", img)

        # 3: matched keypoints
        img = comb.copy()
        for (x1p, y1p), (x2p, y2p) in zip(mk1, mk2):
            cv2.circle(img, (int(x1p), int(y1p)), 2, green, -1)
            cv2.circle(img, (int(x2p) + x_off, int(y2p)), 2, green, -1)
        save("3_matched_keypoints", img)

        def draw_matches(idxs):
            img = comb.copy()
            for mi in idxs:
                p1 = (int(mk1[mi][0]), int(mk1[mi][1]))
                p2 = (int(mk2[mi][0]) + x_off, int(mk2[mi][1]))
                color = tuple(int(c) for c in colors[mi])
                cv2.line(img, p1, p2, color, 2)
                cv2.circle(img, p1, 2, green, -1)
                cv2.circle(img, p2, 2, green, -1)
            return img

        # 4: top-k (by summed keypoint score) matches; 5: all matches
        save("4_matches_less", draw_matches(topk_idx))
        save("5_matches_all", draw_matches(range(len(matches))))
