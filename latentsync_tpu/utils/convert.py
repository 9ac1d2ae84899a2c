"""PyTorch checkpoint → flax param-tree converters.

Reads the reference's released weights (SURVEY §7 step 1):
- whisper tiny.pt / small.pt ({"dims", "model_state_dict"}, openai layout)
- latentsync_unet.pt ({"global_step", "state_dict"},
  ref:latentsync/models/unet.py:494-512)
- stable_syncnet.pt ({"state_dict"}, ref:scripts/train_syncnet.py)
- diffusers AutoencoderKL (sd-vae-ft-mse) state dicts

Tensor layout transforms: torch Conv2d (O,I,kh,kw) → flax (kh,kw,I,O);
Conv1d (O,I,k) → (k,I,O); Linear (O,I) → (I,O); *.weight of norms → scale.

The tolerant-load semantics of the reference (drop shape-mismatched
conv_in/conv_out/attn2 k/v, ref:unet.py:473-492) are reproduced in
`convert_unet`.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], int]:
    """Load a .pt checkpoint to numpy; returns (state_dict, global_step)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    step = 0
    if isinstance(ckpt, dict):
        if "state_dict" in ckpt:
            step = int(ckpt.get("global_step", 0) or 0)
            ckpt = ckpt["state_dict"]
        elif "model_state_dict" in ckpt:
            ckpt = ckpt["model_state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}, step


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _conv1d(w):
    return np.transpose(w, (2, 1, 0))


def _linear(w):
    return np.transpose(w)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# ---------------------------------------------------------------------------
# whisper
# ---------------------------------------------------------------------------


def convert_whisper_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """openai whisper checkpoint → WhisperEncoder params
    (decoder.* keys are ignored; only the encoder exists in our stack)."""
    params: Dict[str, Any] = {}
    for key, w in sd.items():
        if not key.startswith("encoder."):
            continue
        k = key[len("encoder."):]
        if k == "positional_embedding":
            continue  # recomputed sinusoid table
        parts = k.split(".")
        if parts[0] in ("conv1", "conv2"):
            name = "kernel" if parts[1] == "weight" else "bias"
            _set(params, (parts[0], name), _conv1d(w) if name == "kernel" else w)
        elif parts[0] == "ln_post":
            _set(params, ("ln_post", "scale" if parts[1] == "weight" else "bias"), w)
        elif parts[0] == "blocks":
            i = parts[1]
            rest = parts[2:]
            base = f"blocks_{i}"
            if rest[0] in ("attn_ln", "mlp_ln"):
                _set(params, (base, rest[0], "scale" if rest[1] == "weight" else "bias"), w)
            elif rest[0] == "attn":
                proj = rest[1]  # query/key/value/out
                name = "kernel" if rest[2] == "weight" else "bias"
                _set(params, (base, "attn", proj, name), _linear(w) if name == "kernel" else w)
            elif rest[0] == "mlp":
                idx = rest[1]  # 0 or 2 (1 is GELU)
                name = "kernel" if rest[2] == "weight" else "bias"
                _set(params, (base, f"mlp_{idx}", name), _linear(w) if name == "kernel" else w)
    return {"params": params}


def load_whisper(path: str):
    """tiny.pt/small.pt → (WhisperConfig, params)."""
    import torch

    from ..config import WhisperConfig

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    dims = ckpt.get("dims", {})
    cfg = WhisperConfig(
        n_mels=dims.get("n_mels", 80),
        n_audio_ctx=dims.get("n_audio_ctx", 1500),
        n_audio_state=dims.get("n_audio_state", 384),
        n_audio_head=dims.get("n_audio_head", 6),
        n_audio_layer=dims.get("n_audio_layer", 4),
    )
    sd = {k: v.detach().cpu().numpy() for k, v in ckpt["model_state_dict"].items()}
    return cfg, convert_whisper_encoder(sd)


# ---------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL)
# ---------------------------------------------------------------------------


def _vae_attn_key(name: str) -> Optional[str]:
    # modern + legacy diffusers attention naming
    table = {
        "group_norm": "group_norm",
        "to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
        "query": "to_q", "key": "to_k", "value": "to_v",
        "to_out.0": "to_out", "proj_attn": "to_out",
    }
    return table.get(name)


def convert_vae(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """diffusers AutoencoderKL state dict → AutoencoderKL params."""
    params: Dict[str, Any] = {}

    def put(path, key, w):
        is_weight = key == "weight"
        if w.ndim == 4:
            w = _conv2d(w)
            name = "kernel"
        elif w.ndim == 2:
            w = _linear(w)
            name = "kernel"
        elif is_weight:
            name = "scale"  # norm weight
        else:
            name = "bias"
        if not is_weight:
            name = "bias"
        _set(params, tuple(path) + (name,), w)

    resnet_sub = {"norm1", "conv1", "norm2", "conv2", "conv_shortcut"}

    for key, w in sd.items():
        parts = key.split(".")
        leaf = parts[-1]  # weight/bias
        if parts[0] in ("quant_conv", "post_quant_conv"):
            # flax Conv on (1,1) kernels
            put([parts[0]], leaf, w)
            continue
        scope = parts[0]  # encoder/decoder
        rest = parts[1:-1]
        if rest[0] == "conv_in" or rest[0] == "conv_out":
            put([scope, rest[0]], leaf, w)
        elif rest[0] == "conv_norm_out":
            put([scope, "conv_norm_out"], leaf, w)
        elif rest[0] in ("down_blocks", "up_blocks"):
            i = int(rest[1])
            kind = "down" if rest[0] == "down_blocks" else "up"
            if rest[2] == "resnets":
                j = int(rest[3])
                sub = rest[4]
                assert sub in resnet_sub, key
                put([scope, f"{kind}_{i}_block_{j}", sub], leaf, w)
            elif rest[2] in ("downsamplers", "upsamplers"):
                put([scope, f"{kind}_{i}_{rest[2][:-1].replace('r','r')}"
                     .replace("downsampler", "downsample")
                     .replace("upsampler", "upsample"), "conv"], leaf, w)
        elif rest[0] == "mid_block":
            if rest[1] == "resnets":
                j = int(rest[2])
                put([scope, f"mid_block_{j + 1}", rest[3]], leaf, w)
            elif rest[1] == "attentions":
                sub = ".".join(rest[3:])
                mapped = _vae_attn_key(sub)
                if mapped is None:
                    continue
                if w.ndim == 4:  # legacy conv-style 1x1 projections
                    w = w[:, :, 0, 0]
                put([scope, "mid_attn", mapped], leaf, w)
    return {"params": params}


# ---------------------------------------------------------------------------
# UNet3D
# ---------------------------------------------------------------------------

_RES_SUB = {
    "norm1": "norm1", "conv1": ("conv1", "conv"), "time_emb_proj": "time_emb_proj",
    "norm2": "norm2", "conv2": ("conv2", "conv"), "conv_shortcut": ("conv_shortcut", "conv"),
}


def _unet_flax_path(torch_key: str) -> Optional[Tuple[str, ...]]:
    """Translate one torch state-dict key (minus .weight/.bias) to the
    flax param path. Returns None for buffers we recompute (pos tables)."""
    k = torch_key
    if k.startswith("conv_in"):
        return ("conv_in", "conv")
    if k.startswith("conv_out"):
        return ("conv_out", "conv")
    if k.startswith("conv_norm_out"):
        return ("conv_norm_out",)
    if k.startswith("time_embedding.linear_1"):
        return ("time_embedding_linear_1",)
    if k.startswith("time_embedding.linear_2"):
        return ("time_embedding_linear_2",)

    m = re.match(r"(down_blocks|up_blocks)\.(\d+)\.(.+)", k)
    mid = re.match(r"mid_block\.(.+)", k)
    if m:
        prefix = (f"{m.group(1)[:-1]}s_{m.group(2)}".replace("blockss", "blocks"),)
        rest = m.group(3)
    elif mid:
        prefix = ("mid_block",)
        rest = mid.group(1)
    else:
        return None

    # resnets
    rm = re.match(r"resnets\.(\d+)\.(\w+)", rest)
    if rm:
        sub = _RES_SUB[rm.group(2)]
        sub = sub if isinstance(sub, tuple) else (sub,)
        return prefix + (f"resnets_{rm.group(1)}",) + sub

    # downsamplers / upsamplers
    sm = re.match(r"(downsamplers|upsamplers)\.0\.conv", rest)
    if sm:
        return prefix + (f"{sm.group(1)}_0", "conv", "conv")

    # spatial transformer
    am = re.match(r"attentions\.(\d+)\.(.+)", rest)
    if am:
        base = prefix + (f"attentions_{am.group(1)}",)
        r = am.group(2)
        if r.startswith("norm"):
            return base + ("norm",)
        if r.startswith("proj_in"):
            return base + ("proj_in",)
        if r.startswith("proj_out"):
            return base + ("proj_out",)
        tm = re.match(r"transformer_blocks\.(\d+)\.(.+)", r)
        if tm:
            tb = base + (f"transformer_blocks_{tm.group(1)}",)
            rr = tm.group(2)
            for norm in ("norm1", "norm2", "norm3"):
                if rr.startswith(norm):
                    return tb + (norm,)
            qm = re.match(r"(attn[12])\.(to_q|to_k|to_v)", rr)
            if qm:
                return tb + (qm.group(1), qm.group(2))
            om = re.match(r"(attn[12])\.to_out\.0", rr)
            if om:
                return tb + (om.group(1), "to_out_0")
            if rr.startswith("ff.net.0.proj"):
                return tb + ("ff", "net_0_proj")
            if rr.startswith("ff.net.2"):
                return tb + ("ff", "net_2")
        return None

    # temporal module
    mm = re.match(r"motion_modules\.(\d+)\.temporal_transformer\.(.+)", rest)
    if mm:
        base = prefix + (f"motion_modules_{mm.group(1)}",)
        r = mm.group(2)
        if r.startswith("norm"):
            return base + ("norm",)
        if r.startswith("proj_in"):
            return base + ("proj_in",)
        if r.startswith("proj_out"):
            return base + ("proj_out",)
        tm = re.match(r"transformer_blocks\.(\d+)\.(.+)", r)
        if tm:
            tbi = tm.group(1)
            rr = tm.group(2)
            bm = re.match(r"attention_blocks\.(\d+)\.(to_q|to_k|to_v)", rr)
            if bm:
                return base + (
                    f"transformer_blocks_{tbi}_attention_blocks_{bm.group(1)}",
                    "attn", bm.group(2),
                )
            bo = re.match(r"attention_blocks\.(\d+)\.to_out\.0", rr)
            if bo:
                return base + (
                    f"transformer_blocks_{tbi}_attention_blocks_{bo.group(1)}",
                    "attn", "to_out_0",
                )
            if "pos_encoder" in rr:
                return None  # recomputed sinusoid table
            nm = re.match(r"norms\.(\d+)", rr)
            if nm:
                return base + (f"transformer_blocks_{tbi}_norms_{nm.group(1)}",)
            if rr.startswith("ff_norm"):
                return base + (f"transformer_blocks_{tbi}_ff_norm",)
            if rr.startswith("ff.net.0.proj"):
                return base + (f"transformer_blocks_{tbi}_ff", "net_0_proj")
            if rr.startswith("ff.net.2"):
                return base + (f"transformer_blocks_{tbi}_ff", "net_2")
    return None


def convert_unet(
    sd: Dict[str, np.ndarray],
    in_channels: int = 13,
    out_channels: int = 4,
    cross_attention_dim: int = 384,
) -> Dict[str, Any]:
    """LatentSync UNet state dict → UNet3DConditionModel params, with the
    reference's tolerant-load drops (ref:unet.py:473-492)."""
    sd = dict(sd)
    # drop shape-mismatched conv_in/conv_out (channel-count changes)
    if "conv_in.weight" in sd and sd["conv_in.weight"].shape[1] != in_channels:
        sd.pop("conv_in.weight"), sd.pop("conv_in.bias", None)
    if "conv_out.weight" in sd and sd["conv_out.weight"].shape[0] != out_channels:
        sd.pop("conv_out.weight"), sd.pop("conv_out.bias", None)
    for key in list(sd):
        if ("attn2.to_k." in key or "attn2.to_v." in key) and sd[key].shape[1] != cross_attention_dim:
            del sd[key]

    params: Dict[str, Any] = {}
    unmapped = []
    for key, w in sd.items():
        if not (key.endswith(".weight") or key.endswith(".bias")):
            continue
        leaf = key.rsplit(".", 1)[1]
        path = _unet_flax_path(key.rsplit(".", 1)[0])
        if path is None:
            if "pos_encoder" not in key:
                unmapped.append(key)
            continue
        if leaf == "weight":
            if w.ndim == 4:
                w, name = _conv2d(w), "kernel"
            elif w.ndim == 2:
                w, name = _linear(w), "kernel"
            else:
                name = "scale"
        else:
            name = "bias"
        _set(params, path + (name,), w)
    if unmapped:
        raise ValueError(f"unmapped UNet keys: {unmapped[:10]} (+{len(unmapped)-10 if len(unmapped)>10 else 0})")
    return {"params": params}


def convert_stable_syncnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """stable_syncnet.pt state dict → StableSyncNet params.

    Torch naming (ref:latentsync/models/stable_syncnet.py):
    {audio,visual}_encoder.{conv_in,norm_out}.* and
    .down_blocks.{i}.<resnet: norm1/conv1/norm2/conv2/conv_shortcut/
    downsample_conv | attn: norm1/conv_in/norm2/attn.to_{q,k,v}/
    attn.to_out.0/norm3/ff.net.0.proj/ff.net.2/conv_out>.*
    down_blocks indexes resnets AND attention blocks interleaved, which
    the flax model mirrors as down_blocks_{i} (models/syncnet.py:129-140).
    """
    params: Dict[str, Any] = {}
    unmapped = []
    for key, w in sd.items():
        if not (key.endswith(".weight") or key.endswith(".bias")):
            continue
        base, leaf = key.rsplit(".", 1)
        parts = base.split(".")
        enc = parts[0]
        if enc not in ("audio_encoder", "visual_encoder"):
            unmapped.append(key)
            continue
        if parts[1] == "down_blocks":
            mod = f"down_blocks_{parts[2]}"
            rest = parts[3:]
            if rest[0] == "attn":
                name = "attn_to_out" if rest[1] == "to_out" else f"attn_{rest[1]}"
                path = (enc, mod, name)
            elif rest[0] == "ff":
                path = (enc, mod, "ff",
                        "net_0_proj" if rest[2] == "0" else "net_2")
            else:
                path = (enc, mod, rest[0])
        else:
            path = (enc, parts[1])
        if leaf == "weight":
            if w.ndim == 4:
                w, name = _conv2d(w), "kernel"
            elif w.ndim == 2:
                w, name = _linear(w), "kernel"
            else:
                name = "scale"  # GroupNorm / LayerNorm affine
        else:
            name = "bias"
        _set(params, path + (name,), w)
    if unmapped:
        raise ValueError(f"unmapped StableSyncNet keys: {unmapped[:10]}")
    return {"params": params}


def merge_params(init_params: Dict, loaded: Dict) -> Dict:
    """Overlay loaded params onto an init tree (missing keys keep their
    init values — mirrors strict=False loading, ref:unet.py:505)."""
    import jax

    def merge(a, b):
        if isinstance(a, dict):
            return {k: merge(a[k], b[k]) if isinstance(b, dict) and k in b else a[k]
                    for k in a}
        return b if b is not None else a

    out = merge(init_params, loaded)
    return jax.tree.map(lambda x: x, out)
