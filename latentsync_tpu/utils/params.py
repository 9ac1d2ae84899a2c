"""Parameter-tree utilities: compile-free initialization, counting,
dtype casting.

`fast_init` exists because `model.init` compiles one XLA program per
distinct parameter shape for its PRNG calls — ~5 minutes for the UNet on
CPU. For converted-checkpoint or test workflows the init distribution is
irrelevant; we eval_shape the init (no compilation at all) and fill with
host-side numpy RNG, preserving zero-init params (detected via the real
initializers would be wrong here, so callers needing exact zero-init
semantics pass `zero_paths`).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fast_init(
    init_fn: Callable,
    *args,
    seed: int = 0,
    scale: float = 0.02,
    zero_paths: Sequence[str] = (),
    **kwargs,
) -> Any:
    """Shape-evaluate `init_fn(*args)` and fill with N(0, scale²) numpy
    values (biases/scales get 0/1). `zero_paths`: substrings of the
    '/'-joined path whose kernels are forced to zero (mirroring zero-init
    modules like conv_in/conv_out/temporal proj_out)."""
    shapes = jax.eval_shape(init_fn, *args, **kwargs)
    rng = np.random.default_rng(seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    leaves = []
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        last = name.rsplit("/", 1)[-1]
        if last in ("bias", "mean"):
            arr = np.zeros(leaf.shape, leaf.dtype)
        elif last in ("scale", "var"):
            # batch_stats var must stay positive (sqrt downstream)
            arr = np.ones(leaf.shape, leaf.dtype)
        elif any(z in name for z in zero_paths):
            arr = np.zeros(leaf.shape, leaf.dtype)
        else:
            arr = (rng.standard_normal(leaf.shape) * scale).astype(leaf.dtype)
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


UNET_ZERO_PATHS = ("conv_in/conv/kernel", "conv_out/conv/kernel", "proj_out/kernel")


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def cast_floating(params, dtype):
    """Cast floating-point leaves to dtype (e.g. bf16 inference weights)."""
    def cast(p):
        if jnp.issubdtype(p.dtype, jnp.floating):
            return p.astype(dtype)
        return p
    return jax.tree.map(cast, params)
