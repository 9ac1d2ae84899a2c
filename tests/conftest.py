"""Test config: force the CPU backend with an 8-device virtual mesh so
sharding/pjit logic is exercised without TPU hardware (SURVEY §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon bootstrap (sitecustomize) force-sets jax_platforms="axon,cpu"
# AFTER env parsing, which silently routes every test op through the TPU
# tunnel. Override it back to cpu before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
# jax is already imported above — the env default was read at import
# time, so it must also be pushed through the live config
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"

# ---------------------------------------------------------------------------
# test tiers (VERDICT r4 next #10): the full suite exceeds a 10-minute
# budget on the 1-core CI host (kernel-interpreter runs, torch-oracle
# parity, tiny-training loops). The QUICK tier is the designated
# per-round correctness signal:
#
#     python -m pytest tests/ -m "not slow" -q        (< 10 min here)
#
# It covers every subsystem at smoke/regression level; the `slow` files
# add torch parity oracles, Pallas-interpreter kernel equivalence, and
# end-to-end training/pipeline runs, and are expected on feature work
# in the area they cover:
#
#     python -m pytest tests/ -q                      (full, ~1 h here)
#
# Classification is file-level from measured per-file wall times
# (>~70 s on this host ⇒ slow), kept here in one place rather than as
# per-file pytestmark lines.
SLOW_FILES = {
    "test_attn_block.py",       # fused-attn Pallas interpreter equivalence
    "test_audio_segments.py",   # long-audio segment math sweeps
    "test_restoration.py",      # restoration trainer loops
    "test_configs.py",          # loads every release config through model init
    "test_flop_cuts.py",        # DeepCache bitwise-equality on real UNet blocks
    "test_int8.py",             # int8 conv family vs bf16 reference sweeps
    "test_mesh_serving.py",     # full-model tp=2 numeric equality on 8-dev mesh
    "test_model_zoo.py",        # VideoMAE/HyperIQA/… torch parity oracles
    "test_models.py",           # release-size UNet/VAE/SyncNet forwards
    "test_option_trainer.py",   # option-driven trainer steps
    "test_parity_codeformer.py",
    "test_parity_syncnet.py",
    "test_parity_unet_vae.py",
    "test_pipeline.py",         # tiny end-to-end pipeline runs
    "test_preprocess_e2e.py",   # 8-stage preprocess on synthesized clips
    "test_serving_batched.py",  # continuous batcher under a live worker
    "test_training.py",         # dp-equality + trainer loops (~4 min alone)
    "test_whisper.py",          # encoder torch parity + transcriber
    "test_whisper_decoder.py",  # beam/greedy torch oracles
    "test_yolov5face.py",       # YOLOv5l/n torch parity
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in SLOW_FILES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1247)


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference snapshot not mounted")
    return REFERENCE_DIR
