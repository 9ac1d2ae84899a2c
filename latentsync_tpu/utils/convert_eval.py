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


# ---------------------------------------------------------------------------
# 2D-FAN (face_alignment 2DFAN4 checkpoint → models.face_detection.FAN2D)
# ---------------------------------------------------------------------------

# torch ConvBlock submodule → our ConvBlock name prefix
_CB = {
    "bn1": ("b1_bn", "bn"), "conv1": ("b1_conv", "conv"),
    "bn2": ("b2_bn", "bn"), "conv2": ("b2_conv", "conv"),
    "bn3": ("b3_bn", "bn"), "conv3": ("b3_conv", "conv"),
}


def _fan_convblock(params, stats, base, sub, leaf, w):
    """Map one torch ConvBlock tensor (bn1/conv1/.../downsample.{0,2})
    into our ConvBlock naming (b1_bn/b1_conv/.../ds_bn/ds_conv)."""
    if sub == "downsample":
        ours, kind = ("ds_bn", "bn") if leaf[0] == "0" else ("ds_conv", "conv")
        leaf = leaf[1]
    else:
        ours, kind = _CB[sub]
        leaf = leaf[0]
    if kind == "conv":
        if leaf == "weight":
            _set(params, base + (ours, "kernel"), _conv2d(w))
    else:
        if leaf == "weight":
            _set(params, base + (ours, "scale"), w)
        elif leaf == "bias":
            _set(params, base + (ours, "bias"), w)
        elif leaf == "running_mean":
            _set(stats, base + (ours, "mean"), w)
        elif leaf == "running_var":
            _set(stats, base + (ours, "var"), w)


def convert_fan(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """face_alignment 2DFAN4 state dict → FAN2D variables.

    torch naming (face_alignment.models.FAN): conv1/bn1, ConvBlocks
    conv2-4, per stack i: hourglass `m{i}` with ConvBlocks
    b1_{l}/b2_{l}/b2_plus_1/b3_{l}, then top_m_{i}, conv_last{i},
    bn_end{i}, heads l{i}/bl{i}/al{i}. Our FAN2D names the same graph
    conv1/bn1/conv2-4, m{i}_hg with up1_{l}/low1_{l}/low2_1/low3_{l},
    m{i}_top, m{i}_conv_last, m{i}_bn_end, m{i}_l, m{i}_bl, m{i}_al
    (models/face_detection.py:245-340)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    _HG = {"b1": "up1", "b2": "low1", "b2_plus": "low2", "b3": "low3"}

    for key, w in sd.items():
        parts = key.split(".")
        head = parts[0]
        if head == "conv1":  # plain 7×7 conv with bias
            if parts[1] == "weight":
                _set(params, ("conv1", "kernel"), _conv2d(w))
            else:
                _set(params, ("conv1", "bias"), w)
        elif head == "bn1":
            if parts[1] == "weight":
                _set(params, ("bn1", "scale"), w)
            elif parts[1] == "bias":
                _set(params, ("bn1", "bias"), w)
            elif parts[1] == "running_mean":
                _set(stats, ("bn1", "mean"), w)
            elif parts[1] == "running_var":
                _set(stats, ("bn1", "var"), w)
        elif head in ("conv2", "conv3", "conv4"):  # ConvBlocks
            _fan_convblock(params, stats, (head,), parts[1], parts[2:], w)
        elif head.startswith("m") and head[1:].isdigit():  # hourglass m{i}
            name, lvl = parts[1].rsplit("_", 1)
            ours = f"{_HG[name]}_{lvl}"
            _fan_convblock(
                params, stats, (f"{head}_hg", ours), parts[2], parts[3:], w
            )
        elif head.startswith("top_m_"):
            i = head.split("_")[-1]
            _fan_convblock(params, stats, (f"m{i}_top",), parts[1], parts[2:], w)
        elif head.startswith("conv_last") or head.startswith("bn_end"):
            kind = "conv_last" if head.startswith("conv_last") else "bn_end"
            i = head[len(kind):]
            tgt = f"m{i}_{kind}"
            if kind == "conv_last":
                if parts[1] == "weight":
                    _set(params, (tgt, "kernel"), _conv2d(w))
                else:
                    _set(params, (tgt, "bias"), w)
            else:
                if parts[1] == "weight":
                    _set(params, (tgt, "scale"), w)
                elif parts[1] == "bias":
                    _set(params, (tgt, "bias"), w)
                elif parts[1] == "running_mean":
                    _set(stats, (tgt, "mean"), w)
                elif parts[1] == "running_var":
                    _set(stats, (tgt, "var"), w)
        elif head[0] in "lba" and (
            head[1:].isdigit() or head[:2] in ("bl", "al")
        ):  # heads l{i}, bl{i}, al{i}
            kind = "l" if head[0] == "l" else head[:2]
            i = head[len(kind):]
            tgt = f"m{i}_{kind}"
            if parts[1] == "weight":
                _set(params, (tgt, "kernel"), _conv2d(w))
            else:
                _set(params, (tgt, "bias"), w)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# BiSeNet face parser (facelib parsing_bisenet.pth → models.parsing.BiSeNet)
# ---------------------------------------------------------------------------


def _put_bn2(params, stats, base, leaf, w):
    if leaf == "weight":
        _set(params, base + ("scale",), w)
    elif leaf == "bias":
        _set(params, base + ("bias",), w)
    elif leaf == "running_mean":
        _set(stats, base + ("mean",), w)
    elif leaf == "running_var":
        _set(stats, base + ("var",), w)


def convert_bisenet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """ref:facelib/parsing/bisenet.py naming → BiSeNet variables.

    torch: cp.resnet.{conv1,bn1,layer{L}.{i}.(conv1|bn1|conv2|bn2|
    downsample.{0,1})}, cp.{arm16,arm32}.(conv.(conv|bn)|conv_atten|
    bn_atten), cp.conv_head{16,32}/cp.conv_avg (ConvBNReLU), ffm.(convblk.
    (conv|bn)|conv1|conv2), conv_out{,16,32}.(conv.(conv|bn)|conv_out).
    Ours: cp_resnet/layer{L}_{i}/(conv1|bn1|conv2|bn2|ds_conv|ds_bn),
    cp_arm*/(conv/(conv|bn)|conv_atten|bn_atten), cp_conv_head*/(conv|bn),
    ffm/(convblk/(conv|bn)|conv1|conv2), conv_out*/(conv/(conv|bn)|
    conv_out) (models/parsing.py BiSeNet)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_bn_relu(base, rest, w):
        # rest = ("conv"|"bn", leaf)
        if rest[0] == "conv":
            if rest[1] == "weight":
                _set(params, base + ("conv", "kernel"), _conv2d(w))
        else:
            _put_bn2(params, stats, base + ("bn",), rest[1], w)

    for key, w in sd.items():
        parts = key.split(".")
        if parts[0] == "cp":
            if parts[1] == "resnet":
                if parts[2] == "conv1":
                    _set(params, ("cp_resnet", "conv1", "kernel"), _conv2d(w))
                elif parts[2] == "bn1":
                    _put_bn2(params, stats, ("cp_resnet", "bn1"), parts[3], w)
                elif parts[2].startswith("layer"):
                    blk = f"{parts[2]}_{parts[3]}"
                    sub, leaf = parts[4], parts[5]
                    base = ("cp_resnet", blk)
                    if sub == "downsample":
                        if leaf == "0":
                            _set(params, base + ("ds_conv", "kernel"), _conv2d(w))
                        else:  # "1" = BN
                            _put_bn2(params, stats, base + ("ds_bn",), parts[6], w)
                    elif sub in ("conv1", "conv2"):
                        if leaf == "weight":
                            _set(params, base + (sub, "kernel"), _conv2d(w))
                    else:  # bn1 / bn2
                        _put_bn2(params, stats, base + (sub,), leaf, w)
            elif parts[1] in ("arm16", "arm32"):
                base = (f"cp_{parts[1]}",)
                if parts[2] == "conv":
                    conv_bn_relu(base + ("conv",), parts[3:5], w)
                elif parts[2] == "conv_atten":
                    if parts[3] == "weight":
                        _set(params, base + ("conv_atten", "kernel"), _conv2d(w))
                elif parts[2] == "bn_atten":
                    _put_bn2(params, stats, base + ("bn_atten",), parts[3], w)
            elif parts[1] in ("conv_head16", "conv_head32", "conv_avg"):
                conv_bn_relu((f"cp_{parts[1]}",), parts[2:4], w)
        elif parts[0] == "ffm":
            if parts[1] == "convblk":
                conv_bn_relu(("ffm", "convblk"), parts[2:4], w)
            elif parts[1] in ("conv1", "conv2") and parts[2] == "weight":
                _set(params, ("ffm", parts[1], "kernel"), _conv2d(w))
        elif parts[0] in ("conv_out", "conv_out16", "conv_out32"):
            base = (parts[0],)
            if parts[1] == "conv":
                conv_bn_relu(base + ("conv",), parts[2:4], w)
            elif parts[1] == "conv_out" and parts[2] == "weight":
                _set(params, base + ("conv_out", "kernel"), _conv2d(w))
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# S3FD (ref:eval/detectors/s3fd/nets.py) → models/face_detection.S3FD
# ---------------------------------------------------------------------------

# torch vgg ModuleList conv indices → flax module names
_S3FD_VGG = {
    0: "vgg_0", 2: "vgg_1", 5: "vgg_2", 7: "vgg_3",
    10: "vgg_4", 12: "vgg_5", 14: "vgg_6",
    17: "vgg_7", 19: "vgg_8", 21: "vgg_9",
    24: "vgg_10", 26: "vgg_11", 28: "vgg_12",
    31: "fc6", 33: "fc7",
}
_S3FD_EXTRAS = {0: "conv6_1", 1: "conv6_2", 2: "conv7_1", 3: "conv7_2"}
_S3FD_L2 = {"L2Norm3_3": "l2norm3", "L2Norm4_3": "l2norm4", "L2Norm5_3": "l2norm5"}


def convert_s3fd(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """sfd_face.pth state dict → S3FD flax params. Detection heads map
    loc.{i} → box_{i}, conf.{i} → cls_{i} (per-scale convs)."""
    params: Dict[str, Any] = {}
    unmapped = []
    for key, w in sd.items():
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "vgg":
            name = _S3FD_VGG.get(int(parts[1]))
        elif parts[0] == "extras":
            name = _S3FD_EXTRAS.get(int(parts[1]))
        elif parts[0] == "loc":
            name = f"box_{parts[1]}"
        elif parts[0] == "conf":
            name = f"cls_{parts[1]}"
        elif parts[0] in _S3FD_L2:
            _set(params, (_S3FD_L2[parts[0]], "weight"), w)
            continue
        else:
            name = None
        if name is None:
            unmapped.append(key)
            continue
        if leaf == "weight":
            _set(params, (name, "kernel"), _conv2d(w))
        else:
            _set(params, (name, "bias"), w)
    if unmapped:
        raise ValueError(f"unmapped S3FD keys: {unmapped[:10]}")
    return {"params": params}
