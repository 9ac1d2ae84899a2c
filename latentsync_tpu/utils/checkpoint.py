"""Checkpoint I/O (Orbax), replacing torch.save state dicts
(ref:scripts/train_unet.py:446-453, train_syncnet.py:255-262).

Carries params + optimizer state + global_step + arbitrary aux (e.g. the
SyncNet loss-history lists the reference keeps in its ckpt) — the
reference never saves optimizer state (SURVEY §5.4); we do.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(ckpt_dir: str, step: int, params, opt_state=None, aux: Optional[Dict] = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if aux is not None:
        np.savez(os.path.join(path, "aux.npz"),
                 step=step, **{k: np.asarray(v) for k, v in aux.items()})
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        d for d in os.listdir(ckpt_dir) if d.startswith("step_")
    )
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def restore_host(path: str) -> Dict[str, Any]:
    """Restore an Orbax checkpoint as plain numpy arrays, ignoring the
    saved device shardings — serving a trainer checkpoint on a machine
    with a different device topology (e.g. a dp=4 training mesh →
    single-chip inference) must not require the training devices."""
    import jax.tree_util as jtu
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jtu.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)))
    return ckptr.restore(path, restore_args=restore_args)


def restore_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, template)
    aux_path = os.path.join(path, "aux.npz")
    if os.path.isfile(aux_path):
        with np.load(aux_path, allow_pickle=True) as f:
            restored["aux"] = {k: f[k] for k in f.files}
    return restored


def save_pytree(path: str, tree) -> None:
    """Flat .npz pytree serialization ('/'-joined key paths) — the
    lightweight sibling of the Orbax checkpoints above, used for
    converted detector/eval weights."""
    import jax
    import numpy as np

    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    arrays = {
        "/".join(str(getattr(p, "key", p)) for p in kp): np.asarray(leaf)
        for kp, leaf in flat
    }
    np.savez(path, **arrays)


def load_pytree(path: str):
    """Inverse of save_pytree: .npz → nested dict."""
    import numpy as np

    out: Dict[str, Any] = {}
    with np.load(path) as data:
        for key in data.files:
            node = out
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = data[key]
    return out
