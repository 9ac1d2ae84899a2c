"""Converters for eval-model checkpoints: the classic SyncNet
`syncnet_v2.model` (ref:eval/syncnet/syncnet.py layer layout) → SyncNetS
flax params."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .convert import _conv2d, _linear, _set


def _conv3d(w):  # torch (O, I, kt, kh, kw) → flax (kt, kh, kw, I, O)
    return np.transpose(w, (2, 3, 4, 1, 0))


# torch nn.Sequential indices → our module names
# (ref:eval/syncnet/syncnet.py:26-86: conv/bn pairs inside Sequentials)
_AUD_CONV = {0: "aud_0", 4: "aud_1", 8: "aud_2", 11: "aud_3", 14: "aud_4", 18: "aud_5"}
_AUD_BN = {1: "aud_0", 5: "aud_1", 9: "aud_2", 12: "aud_3", 15: "aud_4", 19: "aud_5"}
_LIP_CONV = {0: "lip_0", 4: "lip_1", 8: "lip_2", 11: "lip_3", 14: "lip_4", 18: "lip_5"}
_LIP_BN = {1: "lip_0", 5: "lip_1", 9: "lip_2", 12: "lip_3", 15: "lip_4", 19: "lip_5"}
_FC = {  # netfcaud/netfclip Sequential: Linear(0), BN(1), ReLU, Linear(3)
    ("netfcaud", "0"): ("aud_fc1", "linear"),
    ("netfcaud", "1"): ("aud_bn", "bn"),
    ("netfcaud", "3"): ("aud_fc2", "linear"),
    ("netfclip", "0"): ("lip_fc1", "linear"),
    ("netfclip", "1"): ("lip_bn", "bn"),
    ("netfclip", "3"): ("lip_fc2", "linear"),
}


def convert_syncnet_s(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(base, key, w):
        if key == "weight":
            _set(params, base + ("bn", "scale"), w)
        elif key == "bias":
            _set(params, base + ("bn", "bias"), w)
        elif key == "running_mean":
            _set(stats, base + ("bn", "mean"), w)
        elif key == "running_var":
            _set(stats, base + ("bn", "var"), w)

    for key, w in sd.items():
        parts = key.split(".")
        if parts[0] in ("__S__",):
            parts = parts[1:]
        tower = parts[0]
        if tower == "netcnnaud":
            idx = int(parts[1])
            leaf = parts[2]
            if idx in _AUD_CONV and leaf in ("weight", "bias"):
                name = "kernel" if leaf == "weight" else "bias"
                val = _conv2d(w) if leaf == "weight" else w
                _set(params, (_AUD_CONV[idx], "conv", name), val)
            elif idx in _AUD_BN:
                put_bn((_AUD_BN[idx],), leaf, w)
        elif tower == "netcnnlip":
            idx = int(parts[1])
            leaf = parts[2]
            if idx in _LIP_CONV and leaf in ("weight", "bias"):
                name = "kernel" if leaf == "weight" else "bias"
                val = _conv3d(w) if leaf == "weight" else w
                _set(params, (_LIP_CONV[idx], "conv", name), val)
            elif idx in _LIP_BN:
                put_bn((_LIP_BN[idx],), leaf, w)
        elif tower in ("netfcaud", "netfclip"):
            spec = _FC.get((tower, parts[1]))
            if spec is None:
                continue
            name, kind = spec
            leaf = parts[2]
            if kind == "linear":
                if leaf == "weight":
                    _set(params, (name, "kernel"), _linear(w))
                else:
                    _set(params, (name, "bias"), w)
            else:
                if leaf == "weight":
                    _set(params, (name, "scale"), w)
                elif leaf == "bias":
                    _set(params, (name, "bias"), w)
                elif leaf == "running_mean":
                    _set(stats, (name, "mean"), w)
                elif leaf == "running_var":
                    _set(stats, (name, "var"), w)
    return {"params": params, "batch_stats": stats}
