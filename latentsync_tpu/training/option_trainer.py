"""Option-file-driven generic trainer (basicsr train.py parity).

Re-derivation of ref:basicsr/train.py:24-280 + ref:options/*.yml for
the TPU stack: a YAML/dict of options selects the dataset, generator/
discriminator archs, optimizer, LR schedule, EMA decay and trainer
stage from the registries (training/registry.py), then runs a jitted
step loop with MessageLogger-style JSON lines, periodic metric
validation and Orbax checkpointing.

Differences from basicsr are deliberate TPU-first choices: optax
optimizer chains instead of torch.optim; EMA as a pure tree map; the
data path is a host-side `EnlargedSampler` + `Prefetcher`
(training/loader.py) instead of torch DataLoader processes.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .registry import (
    ARCH_REGISTRY,
    DATASET_REGISTRY,
    METRIC_REGISTRY,
    SCHEDULER_REGISTRY,
    register_builtin,
)
from .restoration_trainer import (
    CodeFormerStageII,
    CodeFormerStageIII,
    VQGANTrainer,
    ema_update,
)

# basicsr model_type → trainer-stage factory (ref:options/*.yml model_type)
_MODEL_TYPES = {
    "VQGANModel": "vqgan",
    "CodeFormerIdxModel": "code",
    "CodeFormerJointModel": "joint",
}


def parse_options(path_or_dict) -> Dict[str, Any]:
    """YAML path or dict → options dict (ref:basicsr/utils/options.py)."""
    if isinstance(path_or_dict, dict):
        return path_or_dict
    import yaml

    with open(path_or_dict) as f:
        return yaml.safe_load(f)


def _filter_kwargs(cls, kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Keep only kwargs the (dataclass-style flax) arch actually takes,
    coercing lists to tuples — option files carry extra bookkeeping keys
    (fix_modules, vqgan_path, …) that basicsr also strips."""
    names = {f.name for f in dataclasses.fields(cls)} - {"dtype", "parent", "name"}
    out = {}
    for k, v in kwargs.items():
        if k in names:
            out[k] = tuple(v) if isinstance(v, list) else v
    return out


def build_optimizer(opt: Dict[str, Any], schedule=None):
    import optax

    kind = opt.get("type", "Adam").lower()
    lr = schedule if schedule is not None else opt.get("lr", 1e-4)
    betas = opt.get("betas", [0.9, 0.999])
    wd = opt.get("weight_decay", 0.0)
    if kind == "adam" and not wd:
        return optax.adam(lr, b1=betas[0], b2=betas[1])
    if kind in ("adam", "adamw"):
        return optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=wd)
    if kind == "sgd":
        return optax.sgd(lr, momentum=opt.get("momentum", 0.0))
    raise ValueError(f"unknown optimizer type {opt.get('type')}")


def build_schedule(opt: Optional[Dict[str, Any]], base_lr: float):
    if not opt:
        return None
    kind = opt["type"]
    if kind in ("MultiStepLR", "MultiStepRestartLR"):
        fn = SCHEDULER_REGISTRY.get("MultiStepRestartLR")
        return fn(base_lr, milestones=opt.get("milestones", []),
                  gamma=opt.get("gamma", 0.1),
                  restarts=opt.get("restarts", (0,)),
                  restart_weights=opt.get("restart_weights", (1.0,)))
    if kind == "CosineAnnealingRestartLR":
        fn = SCHEDULER_REGISTRY.get("CosineAnnealingRestartLR")
        return fn(base_lr, periods=opt["periods"],
                  restart_weights=opt.get("restart_weights"),
                  eta_min=opt.get("eta_min", 1e-7))
    raise ValueError(f"unknown scheduler type {kind}")


class OptionTrainer:
    """Generic registry-driven trainer: `OptionTrainer(opt).run()`."""

    def __init__(self, opt: Dict[str, Any], data_source=None,
                 log_fn: Callable[[str], None] = print):
        register_builtin()
        self.opt = opt
        self.log = log_fn
        self.stage = _MODEL_TYPES.get(opt.get("model_type"))
        if self.stage is None:
            raise ValueError(f"unsupported model_type {opt.get('model_type')}")

        dtype = jnp.bfloat16 if opt.get("bf16", True) else jnp.float32
        g_opt = dict(opt["network_g"])
        g_cls = ARCH_REGISTRY.get(g_opt.pop("type"))
        self.net_g = g_cls(**_filter_kwargs(g_cls, g_opt), dtype=dtype)

        d_opt = dict(opt.get("network_d", {"type": "VQGANDiscriminator"}))
        d_cls = ARCH_REGISTRY.get(d_opt.pop("type"))
        self.net_d = d_cls(**_filter_kwargs(d_cls, d_opt), dtype=dtype)

        train = opt.get("train", {})
        base_lr = train.get("optim_g", {}).get("lr", 1e-4)
        schedule = build_schedule(train.get("scheduler"), base_lr)
        self.g_tx = build_optimizer(train.get("optim_g", {}), schedule)
        self.d_tx = build_optimizer(train.get("optim_d",
                                              train.get("optim_g", {})), schedule)
        self.ema_decay = train.get("ema_decay", 0.0)
        self.total_iter = int(train.get("total_iter", 1000))

        if data_source is not None:
            self.source = data_source
        else:
            ds_opt = dict(opt["datasets"]["train"])
            ds_cls = DATASET_REGISTRY.get(ds_opt.pop("type"))
            self.source = ds_cls(ds_opt.pop("dataroot_gt"))
        self.batch_size = opt.get("datasets", {}).get("train", {}).get(
            "batch_size_per_gpu", 4)

    # ------------------------------------------------------------------

    def _init_params(self, seed: int, img_size: int):
        from ..utils.params import fast_init

        x0 = jnp.zeros((1, img_size, img_size, 3))
        g_params = fast_init(
            lambda x: self.net_g.init(jax.random.PRNGKey(seed), x), x0)
        d_params = fast_init(
            lambda x: self.net_d.init(jax.random.PRNGKey(seed + 1), x), x0,
            seed=seed + 1)
        return g_params, d_params

    def run(self, max_steps: Optional[int] = None, img_size: int = 512,
            output_dir: Optional[str] = None, log_every: int = 10,
            batch_fn: Optional[Callable[[int], Dict[str, np.ndarray]]] = None):
        from ..utils.checkpoint import save_checkpoint
        from .loggers import build_loggers

        logger = build_loggers(self.opt, output_dir, console=self.log)
        steps = min(self.total_iter, max_steps or self.total_iter)
        g_params, d_params = self._init_params(
            int(self.opt.get("manual_seed", 0)), img_size)
        ema_params = g_params if self.ema_decay else None

        if self.stage == "vqgan":
            trainer = VQGANTrainer(self.net_g, self.net_d)
            step_fn = trainer.make_steps(self.g_tx, self.d_tx)
        elif self.stage == "code":
            trainer = CodeFormerStageII(self.net_g)
            step2 = trainer.make_step(self.g_tx)
        else:
            trainer = CodeFormerStageIII(self.net_g, self.net_d)
            step_fn = trainer.make_step(self.g_tx, self.d_tx)

        g_opt = self.g_tx.init(g_params)
        d_opt = self.d_tx.init(d_params)
        metrics: Dict[str, float] = {}
        t0 = time.time()
        try:
            for step in range(1, steps + 1):
                if batch_fn is not None:
                    batch = batch_fn(step)
                else:
                    samples = [self.source.sample() for _ in range(self.batch_size)]
                    batch = {k: jnp.asarray(np.stack([s[k] for s in samples]))
                             for k in ("lq", "gt")}
                if self.stage == "code":
                    g_params, g_opt, m = step2(g_params, g_opt, batch)
                else:
                    g_params, d_params, g_opt, d_opt, m = step_fn(
                        g_params, d_params, g_opt, d_opt, batch)
                if self.ema_decay:
                    ema_params = ema_update(ema_params, g_params, self.ema_decay)
                metrics = {k: float(v) for k, v in m.items()}
                if step % log_every == 0 or step == steps:
                    logger(step, {
                        "iters_per_sec": round(step / (time.time() - t0), 3),
                        **metrics,
                    })
        finally:
            # a crash (OOM, NaN guard) must not abandon the tb/wandb
            # writer with its last events unflushed
            logger.close()
        if output_dir:
            save_checkpoint(output_dir, steps,
                            ema_params if ema_params is not None else g_params)
        return {"g_params": g_params, "d_params": d_params,
                "ema_params": ema_params, "metrics": metrics}


def validate(params, net, pairs, metrics=("psnr", "ssim")) -> Dict[str, float]:
    """basicsr-style metric validation over (lq, gt) pairs
    (ref:basicsr/train.py validation + metrics registry)."""
    register_builtin()
    out: Dict[str, float] = {}
    fns = {m: METRIC_REGISTRY.get(m) for m in metrics}
    acc = {m: [] for m in metrics}
    for lq, gt in pairs:
        pred = net.apply(params, jnp.asarray(lq)[None])
        pred_img = np.asarray(pred[0] if isinstance(pred, tuple) else pred,
                              np.float32)[0]
        for m, fn in fns.items():
            acc[m].append(float(fn(pred_img, np.asarray(gt, np.float32))))
    for m in metrics:
        out[m] = float(np.mean(acc[m])) if acc[m] else float("nan")
    return out
