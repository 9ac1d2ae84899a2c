"""CodeFormer/VQGAN torch checkpoint → flax param-tree converter.

Maps the released codeformer.pth / vqgan state dicts (block-list naming
`encoder.blocks.N.*`, ref:basicsr/archs/vqgan_arch.py) onto the
`blocks_N` flax modules. Attention q/k/v/proj_out are 1×1 convs in both;
norms land under `<name>/gn` (see models/codeformer._gn).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

from .convert import _conv2d, _linear, _set


def _put(params, path, leaf, w):
    if leaf == "weight":
        if w.ndim == 4:
            _set(params, path + ("kernel",), _conv2d(w))
        elif w.ndim == 2:
            _set(params, path + ("kernel",), _linear(w))
        else:
            _set(params, path + ("scale",), w)
    else:
        _set(params, path + ("bias",), w)


def _block_path(stack: str, rest: str):
    m = re.match(r"blocks\.(\d+)\.(.+)", rest)
    if not m:
        return None
    i, sub = m.group(1), m.group(2)
    base = (stack, f"blocks_{i}")
    parts = sub.split(".")
    leaf = parts[-1]
    mid = parts[:-1]
    if not mid:  # plain conv block (conv_in/out) or GroupNorm block
        return base, leaf, ()
    name = mid[0]
    if name in ("norm", "norm1", "norm2"):
        return base, leaf, (name, "gn")
    if name == "conv":  # up/down sample conv
        return base, leaf, ("conv",)
    if name in ("conv1", "conv2", "conv_out", "q", "k", "v", "proj_out"):
        return base, leaf, (name,)
    return None


def convert_codeformer(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for key, w in sd.items():
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] in ("encoder", "generator"):
            res = _block_path(parts[0], ".".join(parts[1:]))
            if res is None:
                # bare GroupNorm blocks appear as blocks.N.weight/bias
                m = re.match(rf"{parts[0]}\.blocks\.(\d+)\.(weight|bias)", key)
                if m:
                    _put(params, (parts[0], f"blocks_{m.group(1)}", "gn"), leaf, w)
                continue
            base, leaf2, mid = res
            if mid == ():
                # top-level blocks.N.{weight,bias} is either a plain conv
                # (conv_in/out) or a bare GroupNorm — disambiguate by the
                # sibling weight's rank
                wkey = key.rsplit(".", 1)[0] + ".weight"
                is_norm = sd.get(wkey, w).ndim < 2
                if is_norm:
                    _put(params, base + ("gn",), leaf2, w)
                else:
                    _put(params, base, leaf2, w)
            else:
                _put(params, base + mid, leaf2, w)
        elif parts[0] == "quantize":
            _set(params, ("quantize", "embedding"), sd[key])
        elif parts[0] == "position_emb":
            _set(params, ("position_emb",), w)
        elif parts[0] == "feat_emb":
            _put(params, ("feat_emb",), leaf, w)
        elif parts[0] == "ft_layers":
            i = parts[1]
            sub = parts[2]
            if sub == "self_attn":
                # torch MultiheadAttention: in_proj (3E, E) + out_proj
                if parts[3] == "in_proj_weight":
                    q, k, v = np.split(w, 3, axis=0)
                    for n, ww in (("q_proj", q), ("k_proj", k), ("v_proj", v)):
                        _set(params, (f"ft_layers_{i}", n, "kernel"), _linear(ww))
                elif parts[3] == "in_proj_bias":
                    q, k, v = np.split(w, 3, axis=0)
                    for n, ww in (("q_proj", q), ("k_proj", k), ("v_proj", v)):
                        _set(params, (f"ft_layers_{i}", n, "bias"), ww)
                elif parts[3] == "out_proj":
                    _put(params, (f"ft_layers_{i}", "out_proj"), leaf, w)
            elif sub in ("linear1", "linear2", "norm1", "norm2"):
                _put(params, (f"ft_layers_{i}", sub), leaf, w)
        elif parts[0] == "idx_pred_layer":
            if parts[1] == "0":  # LayerNorm
                _put(params, ("idx_pred_norm",), leaf, w)
            else:  # Linear
                _put(params, ("idx_pred_linear",), leaf, w)
        elif parts[0] == "fuse_convs_dict":
            f_size = parts[1]
            sub = parts[2]
            base = (f"fuse_convs_{f_size}",)
            if sub == "encode_enc":
                inner = parts[3]
                if inner in ("norm1", "norm2"):
                    _put(params, base + ("encode_enc", inner, "gn"), leaf, w)
                else:
                    _put(params, base + ("encode_enc", inner), leaf, w)
            elif sub in ("scale", "shift"):
                layer = parts[3]  # 0 or 2
                _put(params, base + (f"{sub}_{layer}",), leaf, w)
    return {"params": params}
