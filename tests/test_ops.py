"""Op tests: upfirdn2d vs torch reference math, DCNv2 degenerate cases,
flash-attention fallback parity, device restore."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from latentsync_tpu.ops.deform_conv import modulated_deform_conv2d
from latentsync_tpu.ops.upfirdn import fused_leaky_relu, upfirdn2d


def upfirdn2d_torch(x, k, up, down, pad0, pad1):
    """Straightforward torch recomputation of the op's definition."""
    b, h, w, c = x.shape
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).reshape(b * c, 1, h, w)
    # zero-stuff upsample
    if up > 1:
        t2 = torch.zeros(b * c, 1, h * up, w * up)
        t2[:, :, ::up, ::up] = t
        t = t2
    t = F.pad(t, (pad0, pad1, pad0, pad1))
    kt = torch.from_numpy(np.ascontiguousarray(k)).flip(0, 1)[None, None]
    t = F.conv2d(t, kt)
    t = t[:, :, ::down, ::down]
    oh, ow = t.shape[2:]
    return np.transpose(t.reshape(b, c, oh, ow).numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1))])
def test_upfirdn2d_matches_definition(rng, up, down, pad):
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    k = rng.standard_normal((4, 4)).astype(np.float32)
    mine = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad))
    ref = upfirdn2d_torch(x, k, up, down, pad[0], pad[1])
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=1e-4, rtol=1e-4)


def test_fused_leaky_relu():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    bias = jnp.asarray([1.0])
    out = np.asarray(fused_leaky_relu(x[:, None], bias))
    expected = np.asarray([0.0, 1.0, 3.0]) * np.sqrt(2)
    np.testing.assert_allclose(out[:, 0], expected, atol=1e-6)


def test_dcn_zero_offset_equals_conv(rng):
    """With zero offsets and unit mask, DCNv2 must equal a plain conv."""
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32) * 0.1
    offset = np.zeros((1, 8, 8, 18), np.float32)
    mask = np.ones((1, 8, 8, 9), np.float32)
    out = np.asarray(modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(w)
    ))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-4)


def test_dcn_integer_offset_shifts_sampling(rng):
    """A +1 x-offset on every tap equals shifting the input left by 1."""
    x = rng.standard_normal((1, 10, 10, 2)).astype(np.float32)
    w = rng.standard_normal((3, 3, 2, 3)).astype(np.float32) * 0.1
    offset = np.zeros((1, 10, 10, 18), np.float32)
    offset[..., 1::2] = 1.0  # x offsets
    mask = np.ones((1, 10, 10, 9), np.float32)
    out = np.asarray(modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(w)
    ))
    x_shift = np.zeros_like(x)
    x_shift[:, :, :-1] = x[:, :, 1:]
    ref = np.asarray(modulated_deform_conv2d(
        jnp.asarray(x_shift), jnp.asarray(np.zeros_like(offset)),
        jnp.asarray(mask), jnp.asarray(w)
    ))
    # interior matches exactly (borders differ due to zero extension)
    np.testing.assert_allclose(out[:, 2:-2, 2:-2], ref[:, 2:-2, 2:-2], atol=1e-4)


def test_dcn_mask_scales_output(rng):
    x = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    w = rng.standard_normal((3, 3, 2, 2)).astype(np.float32)
    offset = np.zeros((1, 6, 6, 18), np.float32)
    m1 = np.ones((1, 6, 6, 9), np.float32)
    half = np.asarray(modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(m1 * 0.5), jnp.asarray(w)
    ))
    full = np.asarray(modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(m1), jnp.asarray(w)
    ))
    np.testing.assert_allclose(half, full * 0.5, atol=1e-5)


def test_device_restore_composites(rng):
    from latentsync_tpu.ops.restore import restore_frames_device
    from latentsync_tpu.utils.face import AlignRestore, similarity_from_points

    frame = (rng.random((1, 120, 100, 3)) * 255).astype(np.uint8)
    face = np.full((1, 280, 210, 3), 200, np.uint8)
    ar = AlignRestore()
    anchors = np.array([[30.0, 40.0], [70.0, 40.0], [50.0, 60.0]])
    m, _ = similarity_from_points(anchors, ar.face_template, smooth=False)
    out = restore_frames_device(frame, face, m[None])
    assert out.shape == frame.shape
    # center of the face region should now be ~200
    cy, cx = 50, 50
    assert abs(int(out[0, cy, cx].mean()) - 200) < 30
    # far corner untouched
    np.testing.assert_array_equal(out[0, 0, 0], frame[0, 0, 0])
