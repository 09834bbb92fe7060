"""Generic training driver: the ONE runtime that replaces the reference's 26
``tools/train_*.py`` scripts (canonical skeleton:
tools/train_classification_model.py:33-277). Task adapters provide
loss/eval functions; everything else (mesh, data, optimizer, schedule, EMA,
accumulation, NaN-skip, checkpoint/resume, logging) lives here.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import (MeshConfig, batch_sharding, infer_param_sharding,
                             make_mesh, replicated)
from .checkpoint import CheckpointManager, load_state_dict_partial
from .engine import EngineConfig, TrainState, create_train_state, make_eval_step, make_train_step
from .logging_utils import get_logger
from .meters import AverageMeter
from .optim import OptimizerConfig, build_optimizer, current_lr
from .schedule import SchedulerConfig


def optimizer_config_from_reference(opt_tuple) -> OptimizerConfig:
    """Accepts the reference's ('SGD'|'AdamW', {param dict}) format
    (e.g. 0.classification_training/cifar100/resnet18cifar/train_config.py:66-80)."""
    name, p = opt_tuple
    kwargs = dict(
        name=name,
        lr=p["lr"],
        weight_decay=p.get("weight_decay", 0.0),
        global_weight_decay=p.get("global_weight_decay", False),
        no_weight_decay_layer_name_list=tuple(
            p.get("no_weight_decay_layer_name_list", ())),
        sub_layer_lr=p.get("sub_layer_lr"),
        sub_layer_weight_decay=p.get("sub_layer_weight_decay"),
        momentum=p.get("momentum", 0.9),
        nesterov=p.get("nesterov", False),
        beta1=p.get("beta1", 0.9),
        beta2=p.get("beta2", 0.999),
        eps=p.get("eps", 1e-8),
        lr_layer_decay=p.get("lr_layer_decay"),
        lr_layer_decay_block_nums=p.get("lr_layer_decay_block_nums"),
        block_name=p.get("block_name"),
        clip_grad_value=p.get("clip_grad_value"),
        clip_max_norm=p.get("clip_max_norm"),
        frozen_layer_name_list=tuple(p.get("frozen_layer_name_list", ())),
    )
    return OptimizerConfig(**kwargs)


def scheduler_config_from_reference(sched_tuple, opt_tuple,
                                    epochs: int) -> SchedulerConfig:
    name, p = sched_tuple
    return SchedulerConfig(
        scheduler=name,
        lr=opt_tuple[1]["lr"],
        epochs=epochs,
        warm_up_epochs=p.get("warm_up_epochs", 0),
        milestones=tuple(p.get("milestones", ())),
        gamma=p.get("gamma", 0.1),
        power=p.get("power", 0.9),
        min_lr=p.get("min_lr", 0.0),
    )


class Trainer:

    def __init__(self, config, work_dir: str,
                 make_loss_fn: Callable,
                 make_eval_fn: Optional[Callable] = None,
                 evaluate: Optional[Callable] = None,
                 init_batch: Optional[dict] = None):
        self.config = config
        self.work_dir = os.path.abspath(work_dir)
        self.logger = get_logger("train",
                                 os.path.join(self.work_dir, "log"))

        # ---- mesh ----
        mesh_cfg = MeshConfig(
            data=getattr(config, "mesh_data", -1),
            fsdp=getattr(config, "mesh_fsdp", 1))
        self.mesh = make_mesh(mesh_cfg)
        self.batch_sharding = batch_sharding(self.mesh)

        # ---- model + init ----
        self.model = config.model
        seed = getattr(config, "seed", 0)
        np.random.seed(seed)
        rng = jax.random.PRNGKey(seed)
        self.rng, init_rng = jax.random.split(rng)

        if init_batch is None:
            s = config.input_image_size
            init_batch = {"image": jnp.zeros((2, s, s, 3), jnp.float32)}
        variables = self._init_variables(self.model, init_rng, init_batch)
        params = variables["params"]
        state_vars = {k: v for k, v in variables.items() if k != "params"}

        # optional pretrained partial load (reference load_state_dict)
        trained_path = getattr(config, "trained_model_path", "")
        if trained_path:
            import orbax.checkpoint as ocp
            saved = ocp.StandardCheckpointer().restore(trained_path)
            if "params" in saved:
                saved = saved["params"]
            params, n = load_state_dict_partial(saved, params)
            self.log(f"partially loaded {n} tensors from {trained_path}")

        self.param_sharding = infer_param_sharding(self.mesh, params)
        params = jax.device_put(params, self.param_sharding)
        state_vars = jax.device_put(state_vars, replicated(self.mesh))

        # ---- data ----
        from ..data.loader import DataLoader
        from ..data.packed import PackedDataset, PackedLoader
        bs = config.batch_size
        workers = getattr(config, "num_workers", 4)
        # loader_worker_mode "process" parallelises GIL-bound python/PIL
        # augmentation (AutoAugment) across fork workers; "thread" (default)
        # is right for cv2/native-decode pipelines (data/loader.py)
        wmode = getattr(config, "loader_worker_mode", "thread")
        from ..data.collater import ClassificationCollater
        tc = getattr(config, "train_collater", None)
        # the PackedLoader fast path replaces the per-sample collater with a
        # batch-dict cast; that is only sound when the collater is a plain
        # stack+cast (ClassificationCollater). Recipes whose collater does
        # real work (mixup, detection padding, ...) keep the DataLoader path
        # so they train identically on packed and folder datasets.
        plain_collate = tc is None or type(tc) is ClassificationCollater
        # task packs (data/packed_tasks.py) ship batch-dict collaters that
        # declare themselves pack-native
        packed_batch_collate = getattr(tc, "packed_batch", False)
        if (isinstance(config.train_dataset, PackedDataset)
                and config.train_dataset.transform is None
                and packed_batch_collate):
            self.train_loader = PackedLoader(
                config.train_dataset, bs, shuffle=True, drop_last=True,
                seed=seed, n_threads=workers, collate=tc)
        elif (isinstance(config.train_dataset, PackedDataset)
                and config.train_dataset.transform is None
                and plain_collate):
            # decode-once packed cache (data/packed.py): per-batch single
            # C-memcpy gather replaces per-sample decode + collate + pickle;
            # uint8 transport feeds the on-device augmentation pipeline
            import numpy as _np
            if tc is not None:
                target_dtype = _np.dtype(tc.image_dtype)
            elif getattr(config, "device_augment", None) is not None:
                target_dtype = _np.dtype(_np.uint8)  # pack-native transport
            else:
                target_dtype = _np.dtype(_np.float32)  # host-normalized

            collate = None
            if target_dtype != _np.uint8:  # pack records are uint8

                def collate(b):
                    out = dict(b)
                    out["image"] = b["image"].astype(target_dtype)
                    return out
            self.train_loader = PackedLoader(
                config.train_dataset, bs, shuffle=True, drop_last=True,
                seed=seed, n_threads=workers, collate=collate)
        else:
            self.train_loader = DataLoader(config.train_dataset, bs,
                                           config.train_collater,
                                           shuffle=True,
                                           drop_last=True,
                                           num_workers=workers,
                                           seed=seed, worker_mode=wmode)
        # `test_dataset` may be a single dataset, or — like the reference's
        # SAM validation across several test sets each epoch
        # (tools/interactive_segmentation_scripts.py:87-105) — a dict
        # {name: dataset} / list of datasets. `test_loaders` always maps
        # name -> loader; `test_loader` stays the single/primary loader for
        # tasks that evaluate one set.
        self.test_loader = None
        self.test_loaders = {}
        tds = getattr(config, "test_dataset", None)
        if tds is not None:
            if isinstance(tds, (list, tuple)):
                tds = {getattr(d, "name", f"test{i}"): d
                       for i, d in enumerate(tds)}
            if not isinstance(tds, dict):
                tds = {"test": tds}
            self.test_loaders = {
                name: DataLoader(d, bs, config.test_collater, shuffle=False,
                                 drop_last=False, num_workers=workers,
                                 seed=seed)
                for name, d in tds.items()}
            self.test_loader = next(iter(self.test_loaders.values()))

        steps_per_epoch = max(len(self.train_loader), 1)
        self.steps_per_epoch = steps_per_epoch

        # ---- optimizer + schedule ----
        self.opt_cfg = optimizer_config_from_reference(config.optimizer)
        self.sched_cfg = scheduler_config_from_reference(
            config.scheduler, config.optimizer, config.epochs)
        self.tx, group_table = build_optimizer(self.opt_cfg, self.sched_cfg,
                                               steps_per_epoch, params)
        # startup dumps (parity: reference per-parameter lr/wd table +
        # full config dump, tools/train_classification_model.py:96-134)
        if jax.process_index() == 0:
            from .config import config_repr
            self.logger.info(config_repr(config))
            for name, lr, scale, wd in group_table:
                self.logger.info(
                    f"param {name}: lr {lr} lr_scale {scale} wd {wd}")

        # ---- engine ----
        self.engine_cfg = EngineConfig(
            accumulation_steps=getattr(config, "accumulation_steps", 1),
            use_ema=getattr(config, "use_ema_model", False),
            ema_decay=getattr(config, "ema_model_decay", 0.9999),
            clip_grad_value=getattr(config, "clip_grad_value", 0.0),
            clip_max_norm=getattr(config, "clip_max_norm", 0.0),
        )
        self.state = create_train_state(params, state_vars, self.tx,
                                        self.engine_cfg)

        loss_kw = {}
        if hasattr(config, "moe_aux_weight"):  # MoE recipes only
            loss_kw["moe_aux_weight"] = config.moe_aux_weight
        loss_fn = make_loss_fn(self.model, config.train_criterion, **loss_kw)
        # On-device batched augmentation (data/device_augment.py): runs
        # inside the jitted step on the sharded global batch — replaces the
        # reference's host DataLoader-worker PIL augmentation, which needs
        # dozens of host cores to keep a chip fed (zero host-aug stalls by
        # construction).
        self.train_step = make_train_step(
            loss_fn, self.tx, self.engine_cfg,
            augment_fn=getattr(config, "device_augment", None))
        self.eval_step = None
        self.evaluate = evaluate
        if make_eval_fn is not None:
            self.eval_step = make_eval_step(make_eval_fn(self.model))

        # ---- checkpointing / resume ----
        self.ckpt = CheckpointManager(os.path.join(self.work_dir,
                                                   "checkpoints"))
        self.start_epoch = 1
        self.best_metric = -float("inf")
        restored = None
        try:
            from jax.sharding import NamedSharding
            repl = replicated(self.mesh)

            def abstract_leaf(x):
                if not hasattr(x, "sharding"):
                    return x
                # Uncommitted leaves (fresh jnp scalars like state.step)
                # carry a SingleDeviceSharding; restoring with it would
                # produce a committed single-device array that conflicts
                # with the mesh-sharded params inside the jitted step.
                # Restore such leaves replicated over the mesh instead.
                sh = x.sharding
                if not isinstance(sh, NamedSharding):
                    sh = repl
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)

            abstract = jax.tree.map(abstract_leaf, self.state)
            restored = self.ckpt.restore_latest(
                abstract, {"best_metric": -float("inf"), "time": 0.0})
        except Exception as e:  # no checkpoint yet
            restored = None
        if restored is not None:
            epoch, self.state, extra = restored
            self.start_epoch = epoch + 1
            self.best_metric = float(extra.get("best_metric", -float("inf")))
            self.log(f"resumed from epoch {epoch}")

        self.print_interval = getattr(config, "print_interval", 50)

    def _init_variables(self, model, rng, init_batch):
        """Overridable model initialisation (SAM etc. need extra call args).
        Jitted: eager init dispatches every op individually, which is
        minutes-slow through a relayed TPU backend."""
        @jax.jit
        def _init(r, image):
            return model.init({"params": r, "dropout": r}, image, True)
        return _init(rng, init_batch["image"])

    def log(self, msg: str):
        if jax.process_index() == 0:
            self.logger.info(msg)

    def shard(self, batch):
        def numeric(x):
            try:
                arr = np.asarray(x)
            except (ValueError, TypeError):
                return False  # ragged host payloads (e.g. polygon lists)
            return np.issubdtype(arr.dtype, np.number) or \
                np.issubdtype(arr.dtype, np.bool_)

        if isinstance(batch, dict):
            # host-side payloads (e.g. raw text labels) stay off-device and
            # out of the jitted step
            batch = {k: v for k, v in batch.items()
                     if v is not None and numeric(v)}
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                self.batch_sharding, np.asarray(x)), batch)

    def _device_prefetch(self, loader):
        """Double-buffered host->device transfer: the next batch is sharded
        (device_put) while the current step is still executing (dispatch is
        async), so input transfer overlaps compute — the reference's
        num_workers prefetch only overlaps AUGMENTATION, not the H2D copy."""
        it = iter(loader)
        buf = None
        for batch in it:
            nxt = self.shard(batch)
            if buf is not None:
                yield buf
            buf = nxt
        if buf is not None:
            yield buf

    def train_epoch(self, epoch: int) -> float:
        self.train_loader.set_epoch(epoch)
        loss_meter = AverageMeter()
        t0 = time.time()
        n_images = 0
        for i, gbatch in enumerate(self._device_prefetch(self.train_loader),
                                   start=1):
            # one constant base rng: the jitted step folds state.step in
            # on-device, so no eager per-step RNG dispatch (engine.py)
            self.state, metrics = self.train_step(self.state, gbatch,
                                                  self.rng)
            n_images += self.config.batch_size
            if i % self.print_interval == 0 or i == self.steps_per_epoch:
                loss = float(metrics["loss"])
                loss_meter.update(loss)
                lr = current_lr(self.opt_cfg, self.sched_cfg,
                                self.steps_per_epoch, int(self.state.step))
                ips = n_images / max(time.time() - t0, 1e-6)
                self.log(
                    f"epoch {epoch} iter {i}/{self.steps_per_epoch} "
                    f"loss {loss:.4f} lr {lr:.6f} imgs/s {ips:.1f}"
                    + (" [SKIPPED]" if float(metrics["skipped"]) else ""))
        return loss_meter.avg

    def eval_params(self):
        if self.engine_cfg.use_ema and self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    def run(self):
        cfg = self.config
        self.log(f"devices: {jax.device_count()} mesh: {self.mesh.shape}")
        for epoch in range(self.start_epoch, cfg.epochs + 1):
            loss = self.train_epoch(epoch)
            key_metric = None
            # first-class task-eval protocol: `evaluate` owns the pass and may
            # ignore `eval_step` (e.g. detection decodes + COCOevals itself);
            # evaluate.needs_loader=False runs without a test set (diffusion
            # sample grids)
            if self.evaluate is not None and (
                    self.test_loader is not None or
                    getattr(self.evaluate, "needs_loader", True) is False):
                metrics = self.evaluate(self.eval_step, self.eval_params(),
                                        self.state.state_vars,
                                        self.test_loader, self.shard)
                key_metric = metrics.pop("key_metric", None)
                self.log(f"epoch {epoch} eval: {metrics}")
            if key_metric is None:
                key_metric = -loss  # loss-only tasks: lower loss = better
            if key_metric > self.best_metric:
                self.best_metric = key_metric
                if jax.process_index() == 0:
                    self.ckpt.save_best(self.eval_params(), key_metric)
            self.ckpt.save_latest(epoch, self.state,
                                  {"best_metric": self.best_metric,
                                   "time": time.time()})
            self.log(f"epoch {epoch} done; loss {loss:.4f} "
                     f"best {self.best_metric:.4f}")
        network = getattr(cfg, "network", "model")
        self.ckpt.wait()                 # drain overlapped async saves
        if jax.process_index() == 0:
            self.ckpt.finalize_best(network, self.best_metric)
        return self.best_metric
