"""Parity against the ACTUAL reference implementations (not self-written
oracles) for the modules that import cleanly in this environment
(VERDICT r02 missing #3 / next #4):

- latentsync/utils/affine_transform.py — transformation_from_points,
  AlignRestore.align_warp_face / restore_img, laplacianSmooth
- facelib/parsing/bisenet.py — BiSeNet (through the repo converter)
- eval/hyper_iqa.py — HyperNet + TargetNet (through the repo converter)

These close the shared-misreading risk: every other parity test checks
against a torch model written from the same reading of the reference.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot not mounted")


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _ref_affine():
    return _load("ref_affine", f"{REF}/latentsync/utils/affine_transform.py")


def _ref_bisenet():
    pkg = types.ModuleType("refparsing")
    pkg.__path__ = [f"{REF}/facelib/parsing"]
    sys.modules["refparsing"] = pkg
    pkg.resnet = _load("refparsing.resnet", f"{REF}/facelib/parsing/resnet.py")
    return _load("refparsing.bisenet", f"{REF}/facelib/parsing/bisenet.py")


def _ref_hyperiqa():
    mod = _load("ref_hyper_iqa", f"{REF}/eval/hyper_iqa.py")
    # HyperNet.__init__ downloads ImageNet resnet50 weights (zero egress
    # here); the randomize_ sweep overwrites them anyway — feed an empty
    # state dict so the update-then-load path is a no-op.
    mod.model_zoo.load_url = lambda *a, **k: {}
    return mod


# ---------------------------------------------------------------------------
# affine_transform
# ---------------------------------------------------------------------------


def test_transformation_from_points_vs_reference():
    """similarity_from_points must equal the reference byte-for-byte over
    a smoothed multi-frame sequence (the EMA bias chains across calls)."""
    ref = _ref_affine()
    from latentsync_tpu.utils.face import similarity_from_points

    rng = np.random.default_rng(0)
    template = np.array([[17.0, 20.0], [58.0, 20.0], [37.5, 40.0]]) * 2.8
    p_bias_ref, p_bias_ours = None, None
    for _ in range(5):
        pts = template + rng.standard_normal((3, 2)) * 4 + rng.uniform(-30, 30)
        m_ref, p_bias_ref = ref.transformation_from_points(
            pts.copy(), template.copy(), smooth=True, p_bias=p_bias_ref)
        m_ours, p_bias_ours = similarity_from_points(
            pts, template, smooth=True, prev_bias=p_bias_ours)
        np.testing.assert_allclose(m_ours, m_ref, atol=1e-10)
        np.testing.assert_allclose(p_bias_ours, p_bias_ref, atol=1e-10)


def test_transformation_from_points_unsmoothed_vs_reference():
    ref = _ref_affine()
    from latentsync_tpu.utils.face import similarity_from_points

    rng = np.random.default_rng(1)
    dst = np.array([[17.0, 20.0], [58.0, 20.0], [37.5, 40.0]]) * 2.8
    src = dst * 1.7 + rng.standard_normal((3, 2)) * 5 + 40
    m_ref, _ = ref.transformation_from_points(
        src.copy(), dst.copy(), smooth=False)
    m_ours, _ = similarity_from_points(src, dst, smooth=False)
    np.testing.assert_allclose(m_ours, m_ref, atol=1e-10)


def test_align_restore_vs_reference():
    """align_warp_face + restore_img against the reference class on a
    synthetic frame: warp fidelity gates SyncNet crops (VERDICT r02)."""
    ref = _ref_affine()
    from latentsync_tpu.utils.face import AlignRestore

    r_ref = ref.AlignRestore()
    r_ours = AlignRestore()
    np.testing.assert_allclose(r_ours.face_template, r_ref.face_template)
    assert r_ours.face_size == tuple(r_ref.face_size)

    rng = np.random.default_rng(2)
    frame = (rng.uniform(0, 255, (480, 640, 3))).astype(np.uint8)
    # anchors roughly where a face would sit
    anchors = np.array([[260.0, 200.0], [380.0, 205.0], [320.0, 280.0]])

    face_ref, m_ref = r_ref.align_warp_face(frame.copy(), anchors.copy(),
                                            smooth=True)
    face_ours, m_ours = r_ours.align_warp_face(frame, anchors, smooth=True)
    np.testing.assert_allclose(m_ours, m_ref, atol=1e-10)
    np.testing.assert_array_equal(face_ours, face_ref)

    edited = face_ref.astype(np.float32)
    edited[140:, :, :] = np.clip(edited[140:, :, :] * 0.5 + 40, 0, 255)
    edited = edited.astype(np.uint8)
    out_ref = r_ref.restore_img(frame.copy(), edited.copy(), m_ref)
    out_ours = r_ours.restore_img(frame, edited, m_ours)
    assert out_ref.dtype == np.uint8
    diff = np.abs(out_ours.astype(np.int16) - out_ref.astype(np.int16))
    # identical math; allow ±1 quantization at the float→uint8 edge
    assert diff.max() <= 1, f"max abs diff {diff.max()}"
    assert (diff > 0).mean() < 0.01


def test_laplacian_smooth_vs_reference():
    ref = _ref_affine()
    from latentsync_tpu.utils.face import LandmarkSmoother

    s_ref = ref.laplacianSmooth()
    s_ours = LandmarkSmoother()
    rng = np.random.default_rng(3)
    pts = rng.uniform(50, 200, (68, 2))
    for _ in range(4):
        pts = pts + rng.standard_normal((68, 2)) * 2
        np.testing.assert_allclose(s_ours(pts.copy()),
                                   s_ref.smooth(pts.copy()), atol=1e-10)


# ---------------------------------------------------------------------------
# facelib BiSeNet — the reference torch module through the repo converter
# ---------------------------------------------------------------------------


def test_bisenet_vs_reference_module():
    bisenet = _ref_bisenet()
    from latentsync_tpu.models.parsing import BiSeNet
    from latentsync_tpu.utils.convert_eval import convert_bisenet
    from torch_ref_models import randomize_

    t = bisenet.BiSeNet(num_class=19)
    randomize_(t, seed=11, scale=0.05)
    g = torch.Generator().manual_seed(12)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
    t.eval()
    variables = convert_bisenet(
        {k: v.detach().numpy() for k, v in t.state_dict().items()})
    f = BiSeNet()

    rng = np.random.default_rng(13)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_outs = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    f_outs = f.apply(variables, jnp.asarray(x))
    for fo, to in zip(f_outs, t_outs):
        np.testing.assert_allclose(
            np.transpose(np.asarray(fo), (0, 3, 1, 2)), to.numpy(),
            atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------------
# eval HyperIQA — the reference HyperNet/TargetNet through the converter
# ---------------------------------------------------------------------------


def test_hyperiqa_vs_reference_module():
    hi = _ref_hyperiqa()
    from latentsync_tpu.models.hyper_iqa import HyperIQA, convert_hyperiqa
    from torch_ref_models import randomize_

    t = hi.HyperNet(16, 112, 224, 112, 56, 28, 14, 7)
    randomize_(t, seed=21, scale=0.05)
    g = torch.Generator().manual_seed(22)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
    t.eval()
    variables = convert_hyperiqa(
        {k: v.detach().numpy() for k, v in t.state_dict().items()})
    f = HyperIQA()

    rng = np.random.default_rng(23)
    x = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        paras = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        target = hi.TargetNet(paras)
        ref_score = target(paras["target_in_vec"]).reshape(-1).numpy()
    f_out = np.atleast_1d(np.asarray(f.apply(variables, jnp.asarray(x))))
    np.testing.assert_allclose(f_out, ref_score, atol=1e-3, rtol=1e-3)
