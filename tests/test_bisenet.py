"""BiSeNet face parser + converter (ref:facelib/parsing/bisenet.py,
resnet.py — coverage row 50)."""

import jax
import jax.numpy as jnp
import numpy as np

from latentsync_tpu.models.parsing import BiSeNet
from latentsync_tpu.utils.convert_eval import convert_bisenet


def _bn(sd, prefix, c):
    for leaf, val in (("weight", 1.0), ("bias", 0.0),
                      ("running_mean", 0.0), ("running_var", 1.0)):
        sd[f"{prefix}.{leaf}"] = np.full((c,), val, np.float32)


def _conv(sd, key, cout, cin, k):
    sd[key] = (np.random.default_rng(abs(hash(key)) % 2**31)
               .standard_normal((cout, cin, k, k)).astype(np.float32)
               / np.sqrt(cin * k * k))


def _cbr(sd, prefix, cout, cin, k=3):
    _conv(sd, f"{prefix}.conv.weight", cout, cin, k)
    _bn(sd, f"{prefix}.bn", cout)


def _torch_bisenet_sd(num_class=19):
    """Independent enumeration of the facelib BiSeNet checkpoint keys."""
    sd = {}
    # resnet18 trunk
    _conv(sd, "cp.resnet.conv1.weight", 64, 3, 7)
    _bn(sd, "cp.resnet.bn1", 64)
    plan = [("layer1", 64, 64, 1), ("layer2", 64, 128, 2),
            ("layer3", 128, 256, 2), ("layer4", 256, 512, 2)]
    for layer, cin, cout, stride in plan:
        for i in range(2):
            pre = f"cp.resnet.{layer}.{i}"
            bin_, bout = (cin, cout) if i == 0 else (cout, cout)
            _conv(sd, f"{pre}.conv1.weight", bout, bin_, 3)
            _bn(sd, f"{pre}.bn1", bout)
            _conv(sd, f"{pre}.conv2.weight", bout, bout, 3)
            _bn(sd, f"{pre}.bn2", bout)
            if i == 0 and (bin_ != bout or stride != 1):
                _conv(sd, f"{pre}.downsample.0.weight", bout, bin_, 1)
                _bn(sd, f"{pre}.downsample.1", bout)
    # context path heads
    for arm, cin in (("arm16", 256), ("arm32", 512)):
        _cbr(sd, f"cp.{arm}.conv", 128, cin)
        _conv(sd, f"cp.{arm}.conv_atten.weight", 128, 128, 1)
        _bn(sd, f"cp.{arm}.bn_atten", 128)
    _cbr(sd, "cp.conv_head32", 128, 128)
    _cbr(sd, "cp.conv_head16", 128, 128)
    _cbr(sd, "cp.conv_avg", 128, 512, k=1)
    # ffm
    _cbr(sd, "ffm.convblk", 256, 256, k=1)
    _conv(sd, "ffm.conv1.weight", 64, 256, 1)
    _conv(sd, "ffm.conv2.weight", 256, 64, 1)
    # outputs
    _cbr(sd, "conv_out.conv", 256, 256)
    _conv(sd, "conv_out.conv_out.weight", num_class, 256, 1)
    _cbr(sd, "conv_out16.conv", 64, 128)
    _conv(sd, "conv_out16.conv_out.weight", num_class, 64, 1)
    _cbr(sd, "conv_out32.conv", 64, 128)
    _conv(sd, "conv_out32.conv_out.weight", num_class, 64, 1)
    return sd


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def test_convert_bisenet_bijection_and_forward():
    model = BiSeNet()
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    conv = convert_bisenet(_torch_bisenet_sd())
    ref_flat = _flatten(ref)
    conv_flat = _flatten(conv)
    assert set(ref_flat) == set(conv_flat), (
        f"missing={sorted(set(ref_flat) - set(conv_flat))[:6]} "
        f"extra={sorted(set(conv_flat) - set(ref_flat))[:6]}"
    )
    bad = {k for k in ref_flat if ref_flat[k] != conv_flat[k]}
    assert not bad, sorted(bad)[:6]

    conv = jax.tree.map(jnp.asarray, conv)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, 64, 64, 3)), jnp.float32
    )
    out, out16, out32 = jax.jit(lambda p, v: model.apply(p, v))(conv, x)
    assert out.shape == (1, 64, 64, 19)
    assert out16.shape == out32.shape == (1, 64, 64, 19)
    assert np.all(np.isfinite(np.asarray(out)))


def test_bilinear_align_corners_matches_torch_semantics():
    """Endpoint invariance: corners map exactly to corners."""
    from latentsync_tpu.models.parsing import _resize_bilinear_align_corners

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 5, 7, 2)), jnp.float32
    )
    y = _resize_bilinear_align_corners(x, (9, 13))
    assert y.shape == (1, 9, 13, 2)
    np.testing.assert_allclose(y[0, 0, 0], x[0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(y[0, -1, -1], x[0, -1, -1], rtol=1e-6)
    np.testing.assert_allclose(y[0, 0, -1], x[0, 0, -1], rtol=1e-6)
    # midpoint of a 2-point axis = average (align_corners linearity)
    x2 = jnp.asarray([[[[0.0], [1.0]]]])  # (1, 1, 2, 1)
    y2 = _resize_bilinear_align_corners(x2, (1, 3))
    np.testing.assert_allclose(np.asarray(y2)[0, 0, :, 0], [0.0, 0.5, 1.0])
