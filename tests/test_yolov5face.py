"""YOLOv5-face (ref:facelib/detection/yolov5face/ — coverage row 49):
converter bijection against an independently enumerated torch state
dict, decoded-output shapes, and NMS behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from latentsync_tpu.models.yolov5face import (
    YOLOv5FaceDetector,
    YOLOv5nFace,
    _nms_face,
    channel_shuffle,
    convert_yolov5face,
)


def _conv(sd, key, cout, cin, k):
    sd[key] = (np.random.default_rng(abs(hash(key)) % 2**31)
               .standard_normal((cout, cin, k, k)).astype(np.float32)
               / np.sqrt(cin * k * k))


def _bn(sd, prefix, c):
    for leaf, val in (("weight", 1.0), ("bias", 0.0),
                      ("running_mean", 0.0), ("running_var", 1.0)):
        sd[f"{prefix}.{leaf}"] = np.full((c,), val, np.float32)


def _convbn(sd, prefix, cout, cin, k):
    _conv(sd, f"{prefix}.conv.weight", cout, cin, k)
    _bn(sd, f"{prefix}.bn", cout)


def _shuffle(sd, prefix, inp, oup, stride):
    bf = oup // 2
    if stride > 1:
        sd[f"{prefix}.branch1.0.weight"] = np.zeros((inp, 1, 3, 3), np.float32)
        _bn(sd, f"{prefix}.branch1.1", inp)
        _conv(sd, f"{prefix}.branch1.2.weight", bf, inp, 1)
        _bn(sd, f"{prefix}.branch1.3", bf)
        c2in = inp
    else:
        c2in = bf
    _conv(sd, f"{prefix}.branch2.0.weight", bf, c2in, 1)
    _bn(sd, f"{prefix}.branch2.1", bf)
    sd[f"{prefix}.branch2.3.weight"] = np.zeros((bf, 1, 3, 3), np.float32)
    _bn(sd, f"{prefix}.branch2.4", bf)
    _conv(sd, f"{prefix}.branch2.5.weight", bf, bf, 1)
    _bn(sd, f"{prefix}.branch2.6", bf)


def _c3(sd, prefix, cin, cout):
    c_ = cout // 2
    _convbn(sd, f"{prefix}.cv1", c_, cin, 1)
    _convbn(sd, f"{prefix}.cv2", c_, cin, 1)
    _convbn(sd, f"{prefix}.cv3", cout, 2 * c_, 1)
    _convbn(sd, f"{prefix}.m.0.cv1", c_, c_, 1)
    _convbn(sd, f"{prefix}.m.0.cv2", c_, c_, 3)


def _torch_yolov5n_sd():
    """yolov5n-face checkpoint keys, enumerated from the yaml layer plan
    (ref:models/yolov5n.yaml) independently of our model code."""
    sd = {}
    for name, cout, cin, k in (("stem_1", 32, 3, 3), ("stem_2a", 16, 32, 1),
                               ("stem_2b", 32, 16, 3), ("stem_3", 32, 64, 1)):
        _convbn(sd, f"model.0.{name}", cout, cin, k)
    _shuffle(sd, "model.1", 32, 128, 2)
    for j in range(3):
        _shuffle(sd, f"model.2.{j}", 128, 128, 1)
    _shuffle(sd, "model.3", 128, 256, 2)
    for j in range(7):
        _shuffle(sd, f"model.4.{j}", 256, 256, 1)
    _shuffle(sd, "model.5", 256, 512, 2)
    for j in range(3):
        _shuffle(sd, f"model.6.{j}", 512, 512, 1)
    _convbn(sd, "model.7", 128, 512, 1)
    _c3(sd, "model.10", 384, 128)
    _convbn(sd, "model.11", 128, 128, 1)
    _c3(sd, "model.14", 256, 128)
    _convbn(sd, "model.15", 128, 128, 3)
    _c3(sd, "model.17", 256, 128)
    _convbn(sd, "model.18", 128, 128, 3)
    _c3(sd, "model.20", 256, 128)
    for li in range(3):
        _conv(sd, f"model.21.m.{li}.weight", 48, 128, 1)
        sd[f"model.21.m.{li}.bias"] = np.zeros((48,), np.float32)
    return sd


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def test_convert_yolov5face_bijection_and_forward():
    model = YOLOv5nFace()
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    )
    conv = convert_yolov5face(_torch_yolov5n_sd())
    ref_flat = _flatten(ref)
    conv_flat = _flatten(conv)
    assert set(ref_flat) == set(conv_flat), (
        f"missing={sorted(set(ref_flat) - set(conv_flat))[:6]} "
        f"extra={sorted(set(conv_flat) - set(ref_flat))[:6]}"
    )
    bad = {k for k in ref_flat if ref_flat[k] != conv_flat[k]}
    assert not bad, sorted(bad)[:6]

    conv = jax.tree.map(jnp.asarray, conv)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 128, 128, 3)),
                    jnp.float32)
    out = jax.jit(lambda p, v: model.apply(p, v))(conv, x)
    # P3 16², P4 8², P5 4², ×3 anchors = 1008 candidates at 128² input
    assert out.shape == (1, (16 * 16 + 8 * 8 + 4 * 4) * 3, 16)
    assert np.all(np.isfinite(np.asarray(out)))
    # decoded xy must land inside the input frame
    xy = np.asarray(out[0, :, :2])
    assert xy.min() > -64 and xy.max() < 192


def test_channel_shuffle_matches_torch_semantics():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 1, 8)
    out = np.asarray(channel_shuffle(x, 2))[0, 0, 0]
    # torch: view(g=2, cpg=4) transpose → order 0,4,1,5,2,6,3,7
    np.testing.assert_array_equal(out, [0, 4, 1, 5, 2, 6, 3, 7])


def test_nms_face_merges_overlaps_and_keeps_landmarks():
    # two near-identical candidates + one far box
    rows = []
    for cx, cy, conf in ((50, 50, 0.9), (51, 50, 0.8), (200, 200, 0.7)):
        row = np.zeros(16, np.float32)
        row[:4] = (cx, cy, 40, 40)
        row[4] = conf
        row[5:15] = np.arange(10) + cx
        row[15] = 1.0
        rows.append(row)
    dets = _nms_face(np.stack(rows), conf_thres=0.25, iou_thres=0.45)
    assert dets.shape == (2, 16)
    assert dets[0, 4] >= dets[1, 4]
    np.testing.assert_allclose(dets[0, :4], [30, 30, 70, 70])
    np.testing.assert_allclose(dets[0, 5:15], np.arange(10) + 50)


def test_detector_wrapper_runs():
    det = YOLOv5FaceDetector(img_size=128)
    img = (np.random.default_rng(0).uniform(0, 255, (96, 72, 3))).astype(np.uint8)
    out = det.detect(img, conf_thres=0.0)  # random weights → just shape/scale
    assert out.ndim == 2 and out.shape[1] == 15


def test_yolov5face_parity():
    """Full numerical parity vs a torch mirror of the yolov5n-face graph
    (stem maxpool-concat order, shuffle branch structure, C3 necks,
    grid/anchor decode) through convert_yolov5face."""
    import torch

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_ref_models import TorchYOLOv5nFace, randomize_

    t = TorchYOLOv5nFace()
    randomize_(t, seed=51, scale=0.05)
    g = torch.Generator().manual_seed(52)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    t.eval()
    variables = convert_yolov5face(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )
    f = YOLOv5nFace()

    rng = np.random.default_rng(13)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    f_out = np.asarray(f.apply(variables, jnp.asarray(x)))
    assert f_out.shape == t_out.shape
    np.testing.assert_allclose(f_out, t_out, atol=3e-3, rtol=3e-3)


def test_yolov5l_face_parity():
    """yolov5l-face (CSP C3 stages, SPP, PANet head — VERDICT r3 missing
    #1's second backbone) vs a torch mirror through convert_yolov5l_face."""
    import torch

    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_ref_models import TorchYOLOv5lFace, randomize_

    from latentsync_tpu.models.yolov5face import (
        YOLOv5lFace,
        convert_yolov5l_face,
    )

    t = TorchYOLOv5lFace()
    randomize_(t, seed=61, scale=0.05)
    g = torch.Generator().manual_seed(62)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
    t.eval()
    variables = convert_yolov5l_face(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )
    f = YOLOv5lFace()

    rng = np.random.default_rng(17)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    f_out = np.asarray(f.apply(variables, jnp.asarray(x)))
    assert f_out.shape == t_out.shape
    np.testing.assert_allclose(f_out, t_out, atol=3e-3, rtol=3e-3)


def test_detector_wrapper_network_variants():
    """The detector wrapper accepts both YOLO backbone names (facelib
    init_detection_model naming, ref:facelib/detection/__init__.py:8-51)."""
    import pytest

    det = YOLOv5FaceDetector(img_size=64, network="YOLOv5l")
    img = (np.random.default_rng(0).random((48, 64, 3)) * 255).astype(np.uint8)
    out = det.detect(img, conf_thres=0.0)
    assert out.shape[1] == 15
    with pytest.raises(ValueError):
        YOLOv5FaceDetector(img_size=64, network="YOLOv6")
