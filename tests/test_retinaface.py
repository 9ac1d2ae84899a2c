"""RetinaFace structural tests."""

import numpy as np

import jax
import jax.numpy as jnp

from latentsync_tpu.models.retinaface import (
    RetinaFaceDetector,
    RetinaFaceMobile,
    prior_boxes,
)
from latentsync_tpu.utils.params import fast_init


def test_prior_count_matches_heads():
    """#priors must equal total head positions × 2 anchors."""
    h = w = 128
    priors = prior_boxes((h, w))
    expected = sum(
        -(-h // s) * -(-w // s) * 2 for s in (8, 16, 32)
    )
    assert len(priors) == expected
    assert priors.min() >= 0 and priors[:, :2].max() <= 1.0 + 1e-6


def test_retinaface_forward_and_detect(rng):
    model = RetinaFaceMobile()
    x = jnp.zeros((1, 128, 128, 3))
    params = fast_init(lambda x: model.init(jax.random.PRNGKey(0), x), x)
    outs = model.apply(params, x)
    assert len(outs) == 3
    for i, (cls, box, ldm) in enumerate(outs):
        stride = 8 * 2**i
        assert cls.shape == (1, 128 // stride, 128 // stride, 4)
        assert box.shape[-1] == 8 and ldm.shape[-1] == 20

    det = RetinaFaceDetector(params)
    img = (rng.random((128, 128, 3)) * 255).astype(np.uint8)
    dets = det.detect(img, conf_thresh=0.0)  # random weights: accept all
    assert dets.shape[1] == 15
